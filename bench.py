"""Engine benchmark — the driver contract: prints ONE JSON line
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Headline: the north-star pipeline (pages -> geo extraction -> z12 tile
assignment -> MVT encode -> decode round-trip -> PIP spatial join) plus the
operator suite. The `documents` table is small (~5k rows at sf0.1), so the
tiling pipeline is deterministically amplified (doc_id' = doc_id * K + k) to
give the codec real work; relational/dedup queries run on the driver tables
unamplified.

Scaling mode (north rule: throughput efficiency >= 0.8 from N to 4N):
    python bench.py --scaling
runs the same job in fresh JVMs at local[8] and local[32] and reports both
throughputs + efficiency (the sandbox proxy for two cluster sizes).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all), SPARK_GRAFT_AMPLIFY (default 24).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


BENCH_ZOOM = int(os.environ.get("SPARK_GRAFT_BENCH_ZOOM", "8"))


def amplified_entities(spark, sf_dir: str, k: int):
    """Deterministic K-fold amplification of the pages->entities pipeline:
    replica r derives doc_id' = doc_id * K + r, giving distinct geo scatter
    per replica (formulas are mod-based).

    Tiled at z8 (~65k distinct tiles, tens of features per tile at high
    amplify) — the realistic Common-Crawl geo-density shape; z12 would give
    one-feature tiles where per-tile framing, not the codec, dominates."""
    from pyspark.sql import functions as F

    from vector_tile_go_spark.text import geo
    from vector_tile_go_spark.text.pages import assign_tiles

    # the base table is one small parquet file = one input split; without an
    # explicit repartition the k-fold explode (and the shuffle write feeding
    # the encode) would run in a SINGLE task — the classic small-dim fan-out
    # trap. Distribute the base rows first so amplification is parallel.
    n_parts = spark.sparkContext.defaultParallelism * 2
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
         .repartition(n_parts))
    amp = (d.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
           .select((F.col("doc_id") * k + F.col("r")).alias("doc_id")))
    j = amp.withColumn("mention_idx", F.explode(F.sequence(F.lit(0), F.lit(2)))) \
        .filter(F.col("mention_idx") < F.col("doc_id") % 4)
    ents = j.select(
        "doc_id", "mention_idx",
        (geo.lat_udeg_col(F.col("doc_id"), F.col("mention_idx")) / 1e6).alias("lat"),
        (geo.lng_udeg_col(F.col("doc_id"), F.col("mention_idx")) / 1e6).alias("lng"),
        F.concat(F.lit("https://www.ex.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"))
    return assign_tiles(ents, BENCH_ZOOM)


def run_suite(cores: int, sf_dir: str, amplify: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from pyspark.sql import functions as F

    from vector_tile_go_spark.session import get_spark
    spark = get_spark("bench", cores=cores, shuffle_partitions=max(cores, 8))
    # warmup: JVM + the python worker pool, excluded from timings. Every
    # worker slot must import the engine's kernel modules once — at high
    # parallelism a cold pool pays cores * (pandas+numpy+codec import) inside
    # the first timed stage otherwise (measured: ~20 s at local[32]).
    spark.range(1000000).select(F.sum("id")).collect()

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        from vector_tile_go_spark.codec import decode, encode_fast  # noqa: F401
        for pdf in batches:
            yield pdf

    spark.range(64 * cores, numPartitions=2 * cores).mapInPandas(
        _warm, "id long").count()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    ents = amplified_entities(spark, sf_dir, amplify)

    n_mentions = timed("extract_assign", ents.count)

    from vector_tile_go_spark.sparkops.udfs import decode_tiles, encode_point_tiles

    # materialize tiles between the two codec UDFs: chaining two python
    # stages in one task pipeline doubles worker pressure per core and
    # anti-scales (measured 62s vs 25s at local[32]); a real pipeline
    # persists the tile table anyway (Iceberg write between jobs).
    tiles = encode_point_tiles(ents, layer_name="geo",
                               prop_cols=("url", "mention_idx")).persist()
    n_tiles = timed("mvt_encode", tiles.count)

    def decode():
        feats = decode_tiles(tiles, mode="props", prop_cols=("url",))
        row = (feats.groupBy("z", "x", "y").count()
               .agg(F.count("*").alias("nt"), F.sum("count").alias("nf")).first())
        return int(row.nt), int(row.nf)

    (n_tiles_d, n_decoded) = timed("mvt_decode", decode)
    assert n_decoded == n_mentions, (n_decoded, n_mentions)
    assert n_tiles_d == n_tiles

    from vector_tile_go_spark.spatial.pip import pip_join
    from vector_tile_go_spark.spatial.polygons import query_points, triangles_df

    def pip():
        tri = triangles_df(spark, sf_dir)
        return pip_join(ents.select("lat", "lng", "doc_id", "mention_idx"),
                        tri, point_cols=("doc_id", "mention_idx")).count()

    n_pip = timed("pip_join", pip)

    from vector_tile_go_spark.spatial.knn import knn_join

    def knn():
        q = query_points(spark, sf_dir)
        return knn_join(q, ents.select("lat", "lng", "doc_id", "mention_idx"),
                        k=5).count()

    timed("knn", knn)

    from vector_tile_go_spark.spatial.raster import rasterize

    timed("rasterize", lambda: rasterize(ents).count())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from vector_tile_go_spark.text.dedup import minhash_lsh_pairs, simhash_pairs
    timed("minhash_lsh", lambda: minhash_lsh_pairs(docs, threshold=0.3).count())
    timed("simhash", lambda: simhash_pairs(docs, max_hamming=3).count())

    from vector_tile_go_spark.similarity.ann import brute_force_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 16) \
        .select(F.col("vec_id").alias("qid"), "embedding").toPandas()
    timed("ann_topk", lambda: brute_force_topk(emb, qs, k=10).count())

    from vector_tile_go_spark.queries import q_events_windows, q_lineitem_pricing
    timed("lineitem_pricing", lambda: q_lineitem_pricing(spark, sf_dir).count())
    timed("events_windows", lambda: q_events_windows(spark, sf_dir).count())

    pipeline_sec = timings["extract_assign"] + timings["mvt_encode"] + \
        timings["mvt_decode"] + timings["pip_join"]
    extra["tiles_per_sec"] = round(n_tiles / pipeline_sec, 1)
    extra["mentions_per_sec"] = round(n_mentions / pipeline_sec, 1)
    extra["n_tiles"] = n_tiles
    extra["n_mentions"] = n_mentions
    extra["n_pip_matches"] = n_pip

    tiles.unpersist()
    spark.stop()
    return {
        "metric": "tiles encoded+decoded+spatially-joined pipeline, total suite seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "cores": cores,
        "amplify": amplify,
        **extra,
    }


def run_scaling(sf_dir: str, amplify: int, lo: int = 8, hi: int = 32) -> dict:
    """North-rule scaling evidence: same job, fresh JVM, local[lo] vs
    local[hi]; efficiency = (thr_hi / thr_lo) / (hi / lo).

    Each run is PINNED to its core budget with taskset: local[N] only caps
    JVM task slots — python UDF workers are separate processes the OS would
    otherwise schedule on every machine core, silently giving the "small
    cluster" run the big cluster's CPUs (measured: unpinned local[8] matched
    local[32] throughput). cpuset pinning is the honest sandbox proxy for
    an N-core cluster. Amplify is raised 16x over the suite default so each
    stage runs tens of seconds and fixed task overheads amortize the way
    they do on long cluster jobs."""
    import shutil
    amplify = amplify * 16
    results = {}
    for cores in (lo, hi):
        cmd = [sys.executable, os.path.abspath(__file__), "--cores", str(cores),
               "--sf-dir", sf_dir, "--amplify", str(amplify)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
    thr_lo = results[lo]["mentions_per_sec"]
    thr_hi = results[hi]["mentions_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "throughput scaling efficiency",
        "lo_cores": lo, "hi_cores": hi,
        "lo_mentions_per_sec": thr_lo, "hi_mentions_per_sec": thr_hi,
        "lo_pipeline_sec": round(sum(results[lo]["queries"][q] for q in
                                     ("extract_assign", "mvt_encode",
                                      "mvt_decode", "pip_join")), 3),
        "hi_pipeline_sec": round(sum(results[hi]["queries"][q] for q in
                                     ("extract_assign", "mvt_encode",
                                      "mvt_decode", "pip_join")), 3),
        "efficiency": round(eff, 3),
        "detail": results,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS",
                                               os.cpu_count() or 8)))
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--amplify", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_AMPLIFY", "24")))
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()
    if args.scaling:
        print(json.dumps(run_scaling(args.sf_dir, args.amplify)))
    else:
        print(json.dumps(run_suite(args.cores, args.sf_dir, args.amplify)))


if __name__ == "__main__":
    main()
