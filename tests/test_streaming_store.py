"""Streaming tile maintenance + snapshot store tests: watermark windows,
foreachBatch upsert, checkpoint resume, manifest lineage."""

import json
import os

import pytest
from pyspark.sql import functions as F


def test_stream_windows_match_batch(spark, sf_dir):
    from vector_tile_go_spark.queries import q_events_stream_windows, q_events_windows
    batch = q_events_windows(spark, sf_dir).orderBy("window_start", "event_type") \
        .toPandas()
    stream = q_events_stream_windows(spark, sf_dir) \
        .orderBy("window_start", "event_type").toPandas()
    import pandas as pd
    pd.testing.assert_frame_equal(batch.reset_index(drop=True),
                                  stream.reset_index(drop=True))


def test_tilestore_snapshot_commit_and_resume(spark, sf_dir, tmp_path):
    from vector_tile_go_spark.queries import entities_df
    from vector_tile_go_spark.sparkops.udfs import encode_point_tiles
    from vector_tile_go_spark.store.tilestore import (read_tiles, resume_info,
                                                      write_tiles)
    store = str(tmp_path / "tiles")
    e = entities_df(spark, sf_dir)
    t1 = encode_point_tiles(e.filter(F.col("doc_id") % 2 == 0),
                            prop_cols=("mention_idx",))
    s1 = write_tiles(t1, store)
    n1 = read_tiles(spark, store).count()
    t2 = encode_point_tiles(e, prop_cols=("mention_idx",))
    s2 = write_tiles(t2, store)
    n2 = read_tiles(spark, store).count()
    assert n2 >= n1
    info = resume_info(store)
    assert info["snapshot_id"] == s2
    assert info["lineage"] == [s2, s1]
    assert info["total_rows"] == n2
    assert sum(p["rows"] for p in info["partitions"].values()) == n2


def test_stream_upsert_tiles_end_to_end(spark, sf_dir, tmp_path):
    """Entities streamed in micro-batches -> foreachBatch upsert into the
    store; final decoded counts equal the batch pipeline's."""
    from vector_tile_go_spark.queries import entities_df
    from vector_tile_go_spark.sparkops.udfs import decode_tiles
    from vector_tile_go_spark.store.tilestore import read_tiles, resume_info
    from vector_tile_go_spark.streaming.events import stream_upsert_tiles

    e = entities_df(spark, sf_dir).select(
        "z", "x", "y", "lng", "lat", "doc_id", "mention_idx")
    n_total = e.count()
    src_dir = str(tmp_path / "src")
    # write as several files so the stream sees multiple micro-batches
    e.repartition(3).write.parquet(src_dir)

    stream = (spark.readStream.schema(e.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    q = stream_upsert_tiles(stream, store, ckpt, prop_cols=("mention_idx",))
    q.awaitTermination()

    tiles = read_tiles(spark, store)
    feats = decode_tiles(tiles, mode="props")
    assert feats.count() == n_total
    # exact per-tile equivalence with the batch pipeline
    got = feats.groupBy("z", "x", "y").count().orderBy("z", "x", "y").toPandas()
    exp = e.groupBy("z", "x", "y").count().orderBy("z", "x", "y").toPandas()
    import pandas as pd
    pd.testing.assert_frame_equal(got, exp)
    info = resume_info(store)
    assert len(info["lineage"]) >= 2  # one snapshot per micro-batch


def test_stream_upsert_resume_is_idempotent(spark, sf_dir, tmp_path):
    """Restarting the stream with the same checkpoint reprocesses nothing:
    the store is unchanged (exactly-once via checkpoint)."""
    from vector_tile_go_spark.queries import entities_df
    from vector_tile_go_spark.store.tilestore import read_tiles, resume_info
    from vector_tile_go_spark.streaming.events import stream_upsert_tiles

    e = entities_df(spark, sf_dir).select(
        "z", "x", "y", "lng", "lat", "doc_id", "mention_idx") \
        .filter(F.col("doc_id") < 300)
    src_dir = str(tmp_path / "src")
    e.repartition(2).write.parquet(src_dir)
    stream = (spark.readStream.schema(e.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    stream_upsert_tiles(stream, store, ckpt,
                        prop_cols=("mention_idx",)).awaitTermination()
    snap_before = resume_info(store)["snapshot_id"]

    # restart with the same checkpoint: no new data -> no new snapshot
    stream2 = (spark.readStream.schema(e.schema)
               .option("maxFilesPerTrigger", 1).parquet(src_dir))
    stream_upsert_tiles(stream2, store, ckpt,
                        prop_cols=("mention_idx",)).awaitTermination()
    assert resume_info(store)["snapshot_id"] == snap_before


def test_stateful_running_totals_cross_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState carries state across real micro-batches: with
    the source split into 4 files at one file per trigger, a key appearing
    in several batches emits several increasing cumulative rows."""
    from pyspark.sql import functions as F

    from vector_tile_go_spark.streaming.events import (
        run_stream_to_memory, split_events_source, stateful_running_totals)
    src = str(tmp_path / "evsplit")
    s = stateful_running_totals(split_events_source(spark, sf_dir, src))
    tbl = run_stream_to_memory(s, spark, output_mode="update")
    rows = tbl.collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r.event_type, []).append(r.cum_events)
    # at least one key spans multiple batches with strictly growing counts
    multi = [sorted(v) for v in per_key.values() if len(v) > 1]
    assert multi, "expected cross-batch state updates"
    assert all(a < b for v in multi for a, b in zip(v, v[1:]))
    # final totals equal the batch aggregate
    batch = dict(spark.read.parquet(f"{sf_dir}/events.parquet")
                 .groupBy("event_type").agg(F.count("*").alias("n"))
                 .collect())
    final = {k: max(v) for k, v in per_key.items()}
    assert final == {r[0]: r[1] for r in batch.items()} or \
        final == batch


def test_stream_upsert_splice_mode_matches_batch(spark, sf_dir, tmp_path):
    """Streaming upsert in byte-splice mode (O(appended bytes)/tile) must
    produce the same decoded tile contents as the batch pipeline."""
    from vector_tile_go_spark.queries import entities_df
    from vector_tile_go_spark.sparkops.udfs import decode_tiles
    from vector_tile_go_spark.store.tilestore import read_tiles
    from vector_tile_go_spark.streaming.events import stream_upsert_tiles

    e = entities_df(spark, sf_dir).select(
        "z", "x", "y", "lng", "lat", "doc_id", "mention_idx") \
        .filter(F.col("doc_id") < 400)
    src_dir = str(tmp_path / "src")
    e.repartition(3).write.parquet(src_dir)
    stream = (spark.readStream.schema(e.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    stream_upsert_tiles(stream, store, ckpt, prop_cols=("mention_idx",),
                        mode="splice").awaitTermination()

    feats = decode_tiles(read_tiles(spark, store), mode="props")
    got = feats.select(
        "z", "x", "y", "feature_id",
        F.col("properties")["mention_idx"].alias("mi")) \
        .orderBy("z", "x", "y", "feature_id", "mi").toPandas()
    exp = e.select(
        "z", "x", "y", F.col("doc_id").cast("long").alias("feature_id"),
        F.col("mention_idx").cast("string").alias("mi")) \
        .orderBy("z", "x", "y", "feature_id", "mi").toPandas()
    import pandas as pd
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True))


def test_decode_tile_stats_quarantine(spark, sf_dir):
    """Corrupt tile bytes must become zero-count error rows, not stage
    failures — and valid tiles in the same batch still count."""
    import pandas as pd
    from vector_tile_go_spark.queries import entities_df
    from vector_tile_go_spark.sparkops.udfs import (decode_tile_stats,
                                                    encode_point_tiles)
    e = entities_df(spark, sf_dir).filter(F.col("doc_id") < 200)
    tiles = encode_point_tiles(e, prop_cols=("url", "mention_idx")).toPandas()
    # frame claims 5 body bytes, buffer ends mid-varint -> decode raises
    tiles.loc[tiles.index[0], "tile_pbf"] = b"\x1a\x05\x0a\x84"
    df = spark.createDataFrame(tiles)
    out = decode_tile_stats(df, quarantine=True).toPandas()
    bad = out[out["error"].notna()]
    good = out[out["error"].isna()]
    assert len(bad) == 1 and int(bad["n_features"].iloc[0]) == 0
    assert len(good) == len(tiles) - 1
    assert (good["n_features"] > 0).all()


def test_tilestore_time_travel(spark, sf_dir, tmp_path):
    """read_tiles(snapshot_id=...) reads a historical snapshot verbatim
    (Iceberg VERSION AS OF over the snapshot chain)."""
    from vector_tile_go_spark.queries import entities_df
    from vector_tile_go_spark.sparkops.udfs import encode_point_tiles
    from vector_tile_go_spark.store.tilestore import (read_tiles,
                                                      resume_info,
                                                      write_tiles)
    store = str(tmp_path / "tt")
    e = entities_df(spark, sf_dir)
    s1 = write_tiles(encode_point_tiles(e.filter(F.col("doc_id") < 200),
                                        prop_cols=("mention_idx",)), store)
    n1 = read_tiles(spark, store).count()
    s2 = write_tiles(encode_point_tiles(e, prop_cols=("mention_idx",)), store)
    assert read_tiles(spark, store).count() > n1          # CURRENT = s2
    assert read_tiles(spark, store, snapshot_id=s1).count() == n1
    assert resume_info(store)["lineage"] == [s2, s1]
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        read_tiles(spark, store, snapshot_id="nope")


def test_salted_encode_hot_tile(spark, sf_dir):
    """Explicit skew case: thousands of points in ONE tile; the salted
    encode spreads them over n_salts partial layers and the concat tile
    still decodes to the exact feature set."""
    import pandas as pd
    from vector_tile_go_spark import tilemath as tm
    from vector_tile_go_spark.codec.decode import parse_tile
    from vector_tile_go_spark.sparkops.udfs import (decode_tile_stats,
                                                    encode_point_tiles_salted)
    z, x, y = 12, 701, 1635
    w, s, e, n = tm.tile_bounds(z, x, y)
    N = 5000
    pdf = pd.DataFrame({
        "z": z, "x": x, "y": y,
        "lng": [w + (e - w) * (i % 100) / 100 + 1e-5 for i in range(N)],
        "lat": [s + (n - s) * (i // 100) / 50 * 0.5 + 1e-5 for i in range(N)],
        "doc_id": range(1, N + 1),
        "url": [f"u{i % 97}" for i in range(N)],
        "mention_idx": [str(i % 3) for i in range(N)]})
    tiles = encode_point_tiles_salted(spark.createDataFrame(pdf),
                                      n_salts=8,
                                      prop_cols=("url", "mention_idx"))
    rows = tiles.collect()
    assert len(rows) == 1
    frames = parse_tile(bytes(rows[0]["tile_pbf"]))
    assert len(frames) > 1          # really spread over partial layers
    assert sum(len(f.feature_spans) for f in frames) == N
    stats = decode_tile_stats(tiles).first()
    assert stats["n_features"] == N and stats["n_urls"] == 97


def test_expire_and_compact_maintenance(spark, tmp_path):
    """The 100 TB maintenance pair: many small commits -> compaction folds
    files per bucket, expiry bounds the snapshot chain, and resume/time
    travel survive both."""
    import glob

    from vector_tile_go_spark.store.tilestore import (compact_snapshot,
                                                      current_snapshot,
                                                      expire_snapshots,
                                                      read_tiles, resume_info,
                                                      write_tiles)
    store = str(tmp_path / "tiles")
    df = (spark.range(64)
          .select(F.lit(8).alias("z"), (F.col("id") % 4).alias("x"),
                  (F.col("id") % 2).alias("y"), F.lit("geo").alias("layer"),
                  F.lit(b"\x00").alias("tile_pbf"),
                  F.lit(1).alias("n_features")))
    snaps = [write_tiles(df, store, partition_buckets=4) for _ in range(4)]
    assert current_snapshot(store) == snaps[-1]

    # compaction commits a NEW snapshot with a lineage marker
    comp = compact_snapshot(spark, store, partition_buckets=4)
    info = resume_info(store)
    assert info["snapshot_id"] == comp
    assert info["meta"]["compaction_of"] == snaps[-1]
    assert info["total_rows"] == 64
    files = glob.glob(os.path.join(store, "snapshots", comp, "data",
                                   "bucket=*", "*.parquet"))
    # one file per (non-empty) bucket — 8 distinct tiles may hash into
    # fewer than 4 buckets
    assert len(files) == len(info["partitions"]) >= 2

    # expiry keeps the last 2 of the chain, deletes the other 3 commits
    deleted = expire_snapshots(store, keep_last=2)
    assert set(deleted) == set(snaps[:-1])
    assert sorted(os.listdir(os.path.join(store, "snapshots"))) == sorted(
        [comp, snaps[-1]])
    # current still reads; lineage walks only the surviving suffix
    assert read_tiles(spark, store).count() == 64
    assert resume_info(store)["lineage"] == [comp, snaps[-1]]
    # time travel on a surviving parent still works
    assert read_tiles(spark, store, snapshot_id=snaps[-1]).count() == 64


def test_stream_upsert_with_expiry_bounds_store(spark, sf_dir, tmp_path):
    """expire_keep_last on the streaming upsert bounds the snapshot chain
    while the final table stays exactly correct."""
    from vector_tile_go_spark.queries import entities_df
    from vector_tile_go_spark.sparkops.udfs import decode_tiles
    from vector_tile_go_spark.store.tilestore import read_tiles, resume_info
    from vector_tile_go_spark.streaming.events import stream_upsert_tiles

    e = entities_df(spark, sf_dir).select(
        "z", "x", "y", "lng", "lat", "doc_id", "mention_idx")
    n_total = e.count()
    src_dir = str(tmp_path / "src")
    e.repartition(4).write.parquet(src_dir)
    stream = (spark.readStream.schema(e.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    store = str(tmp_path / "store")
    q = stream_upsert_tiles(stream, store, str(tmp_path / "ckpt"),
                            prop_cols=("mention_idx",), mode="splice",
                            expire_keep_last=2)
    q.awaitTermination()

    snaps = os.listdir(os.path.join(store, "snapshots"))
    assert len(snaps) == 2  # 4 micro-batches committed, chain bounded
    assert len(resume_info(store)["lineage"]) == 2
    assert decode_tiles(read_tiles(spark, store),
                        mode="props").count() == n_total


def test_expire_spares_inflight_orphan(spark, tmp_path):
    """expire_snapshots must not delete a concurrent writer's in-flight
    snapshot dir (data written, CURRENT not yet swapped): young orphans
    survive the grace window, stale orphans are still collected."""
    from vector_tile_go_spark.store.tilestore import (expire_snapshots,
                                                      write_tiles)
    store = str(tmp_path / "tiles")
    df = (spark.range(8)
          .select(F.lit(8).alias("z"), (F.col("id") % 4).alias("x"),
                  (F.col("id") % 2).alias("y"), F.lit("geo").alias("layer"),
                  F.lit(b"\x00").alias("tile_pbf"),
                  F.lit(1).alias("n_features")))
    snaps = [write_tiles(df, store, partition_buckets=2) for _ in range(3)]

    snaps_dir = os.path.join(store, "snapshots")
    young = os.path.join(snaps_dir, "zz-inflight-young")
    stale = os.path.join(snaps_dir, "zz-orphan-stale")
    os.makedirs(young)
    os.makedirs(stale)
    old = 1_000_000.0
    os.utime(stale, (old, old))

    deleted = expire_snapshots(store, keep_last=2, orphan_grace_sec=600)
    # expired chain ancestor + stale orphan go; the young in-flight dir stays
    assert set(deleted) == {snaps[0], "zz-orphan-stale"}
    assert os.path.isdir(young)
    assert not os.path.isdir(stale)
    # once past the grace window it is collected like any orphan
    os.utime(young, (old, old))
    assert expire_snapshots(store, keep_last=2,
                            orphan_grace_sec=600) == ["zz-inflight-young"]
