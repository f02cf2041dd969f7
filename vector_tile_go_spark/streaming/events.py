"""Structured Streaming surface of the engine.

The reference is batch-only; its incremental-append semantics
(AddFeaturesToLayer, operations.go:60-91) become streaming tile maintenance
here:

- windowed_event_counts: tumbling windows + watermark over the events table
  read as a file stream (the batch twin is queries.q_events_windows — the
  correctness gate runs the stream to completion and compares to the same
  DuckDB oracle).
- run_stream_to_memory: drive a streaming query on the parquet-file source
  until exhausted, return the result as a batch DataFrame.
- stream_upsert_tiles: foreachBatch tile maintenance — each micro-batch of
  geo entities is merged into a tile store via the distributed upsert
  (sparkops/compositing.upsert_features), checkpointed so a killed job
  resumes from the last committed batch. On Iceberg this foreachBatch body
  becomes a MERGE INTO on (z, x, y, layer).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def events_stream(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int = 1) -> DataFrame:
    # the file-stream source wants a directory: stream the sf dir with a
    # glob filter selecting the events file(s)
    return (spark.readStream
            .schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("pathGlobFilter", "events*.parquet")
            .format("parquet")
            .load(sf_dir))


def windowed_event_counts(stream: DataFrame,
                          watermark: str = "1 hour",
                          window: str = "10 minutes") -> DataFrame:
    """Tumbling window counts with late-data watermark; epoch-second window
    start for timezone-free comparison."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value"))
            .select(F.unix_timestamp(F.col("w.start")).alias("window_start"),
                    "event_type", "n_events", "total_value"))


def run_stream_to_memory(df: DataFrame, spark: SparkSession,
                         output_mode: str = "complete") -> DataFrame:
    """Run a streaming aggregation to exhaustion into a memory sink and
    return the final table (used by the correctness gate to oracle-check the
    streaming operator with the same SQL as its batch twin)."""
    name = "s" + uuid.uuid4().hex[:12]
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def split_events_source(spark: SparkSession, sf_dir: str, out_dir: str,
                        n_files: int = 4) -> DataFrame:
    """Split the events table into n files and stream them one per trigger —
    n real micro-batches, so cross-batch state is actually exercised."""
    (spark.read.parquet(f"{sf_dir}/events.parquet")
     .repartition(n_files).write.mode("overwrite").parquet(out_dir))
    return (spark.readStream
            .schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(out_dir))


def stateful_running_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per event_type
    running (count, value-sum) carried in GroupState across micro-batches,
    one update row emitted per key per batch. The streaming analog of a
    hypertable running rollup; the reference has no streaming surface, so
    this is a north-rule addition (SURVEY.md §2.9)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n = 0
        v = 0.0
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        if state.exists:
            pn, pv = state.get
            n += pn
            v += pv
        state.update((n, v))
        yield pd.DataFrame({"event_type": [key[0]],
                            "cum_events": [n], "cum_value": [v]})

    return (stream.groupBy("event_type").applyInPandasWithState(
        update,
        "event_type string, cum_events bigint, cum_value double",
        "cum_events bigint, cum_value double",
        "update", GroupStateTimeout.NoTimeout))


def stream_upsert_tiles(entity_stream: DataFrame, store_path: str,
                        checkpoint_path: str, layer_name: str = "geo",
                        prop_cols: tuple[str, ...] = ("mention_idx",),
                        mode: str = "reencode",
                        expire_keep_last: int | None = None):
    """foreachBatch tile maintenance: merge each micro-batch of entities
    (z, x, y, lng, lat, doc_id, props...) into the parquet tile store.
    Exactly-once per batch via the streaming checkpoint + full-snapshot
    store rewrite (an Iceberg MERGE INTO in production).

    ``mode="splice"`` uses the byte-splice lazy append
    (AddFeaturesToLayer parity) — the right choice for the streaming shape,
    where each micro-batch appends a few features into many large tiles:
    O(appended bytes) instead of O(tile bytes) per touched tile.

    ``expire_keep_last``: run snapshot expiry after each commit, keeping
    that many snapshots — a stream that commits one snapshot per
    micro-batch otherwise grows the store by a full table-size per batch
    (tilestore.expire_snapshots). Leave None to retain everything."""
    from ..sparkops.compositing import upsert_features
    from ..sparkops.udfs import encode_point_tiles
    from ..store.tilestore import expire_snapshots, read_tiles, write_tiles

    def merge_batch(batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        existing = read_tiles(spark, store_path)
        if existing is None:
            tiles = encode_point_tiles(batch_df, layer_name=layer_name,
                                       prop_cols=prop_cols)
        else:
            tiles = upsert_features(existing, batch_df, layer_name=layer_name,
                                    prop_cols=prop_cols, mode=mode)
        write_tiles(tiles, store_path, snapshot_meta={"batch_id": batch_id})
        if expire_keep_last is not None:
            expire_snapshots(store_path, keep_last=expire_keep_last)

    return (entity_stream.writeStream
            .foreachBatch(merge_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())
