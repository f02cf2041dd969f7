"""spark-submit entry point: pages -> geo extraction -> tile assignment ->
MVT encode -> tile-table write, with per-partition lineage + row-count
metrics (north rule: resumable, metered, shipped via --py-files).

    spark-submit --master local[8] \
        --py-files dist/vector_tile_go_spark.zip \
        jobs/tile_pipeline.py /root/testdata/sf0.001 /tmp/tileout 12

On a cluster the same invocation takes --master yarn/k8s and executor
sizing flags; the code is unchanged. The tile store write goes through the
snapshot store (vector_tile_go_spark/store/tilestore.py): every run is a
new snapshot with a manifest recording per-partition row counts, so a
killed job resumes from the last committed snapshot instead of recomputing.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tile_pipeline_out"
    zoom = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    keep_last = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    spark = SparkSession.builder.appName("tile_pipeline").getOrCreate()

    from vector_tile_go_spark.sparkops.udfs import encode_point_tiles
    from vector_tile_go_spark.store.tilestore import (expire_snapshots,
                                                      resume_info,
                                                      write_tiles)
    from vector_tile_go_spark.text.pages import (assign_tiles, build_pages,
                                                 extract_geo_entities)

    prior = resume_info(out_dir)
    if prior is not None:
        print(f"RESUME from snapshot {prior['snapshot_id']} "
              f"rows={prior.get('total_rows')}")

    ents = assign_tiles(extract_geo_entities(build_pages(spark, sf_dir)), zoom)
    tiles = encode_point_tiles(ents, layer_name="geo",
                               prop_cols=("url", "mention_idx"))
    snap_id = write_tiles(tiles, out_dir,
                          snapshot_meta={"sf_dir": sf_dir, "zoom": zoom})
    info = resume_info(out_dir)
    print(f"SNAPSHOT {snap_id} rows={info['total_rows']} "
          f"partitions={len(info['partitions'])}")
    # store maintenance: bound the snapshot chain (a scheduled production
    # job commits one table-size per run; unexpired stores grow forever)
    expired = expire_snapshots(out_dir, keep_last=keep_last)
    if expired:
        print(f"EXPIRED {len(expired)} snapshots (keep_last={keep_last})")
    spark.stop()


if __name__ == "__main__":
    main()
