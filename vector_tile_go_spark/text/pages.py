"""Synthetic Common-Crawl-style pages table + geo-entity extraction.

``build_pages`` derives the engine's authoritative input shape
(BASELINE.json ``input_hint``: url, warc_ts, html, text, lang) from the
driver's ``documents`` parquet deterministically — no randomness, no
external data. ~1% of pages land on a single hot domain to exercise the
skew path, mirroring real crawl domain skew.

``extract_geo_entities`` is the engine's EP1: pages -> (url, doc_id,
mention_idx, mention, lat, lng) rows. It runs entirely on JVM built-ins
(regexp_extract_all + posexplode + cast), so Catalyst keeps it inside
whole-stage codegen and pushes column pruning into the parquet scan — the
Spark-native equivalent of the reference's lazy property reads
(/root/reference/read_feature_lazy.go:66-134).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import geo


def load_documents(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def build_pages(spark, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> pages(url, warc_ts,
    html, text, lang). Deterministic: text embeds ``doc_id % 4`` geo
    mentions per geo.py; url encodes doc_id; hot-domain skew when
    doc_id % 100 == 0."""
    d = load_documents(spark, sf_dir)
    doc_id = F.col("doc_id")
    domain = F.when(doc_id % 100 == 0, F.lit("hot.example.com")) \
        .otherwise(F.concat(F.lit("www."), F.col("source"), F.lit(".example.org")))
    mentions = F.concat(*[
        F.when(doc_id % 4 > j, geo.mention_str(doc_id, F.lit(j)))
        .otherwise(F.lit("")) for j in range(3)
    ])
    text = F.concat(F.col("text"), mentions)
    return d.select(
        F.concat(F.lit("https://"), domain, F.lit("/doc/"),
                 doc_id.cast("string")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=(doc_id % 2592000).cast("double"))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body><p>"), text,
                          F.lit("</p></body></html>")), "utf-8").alias("html"),
        text.alias("text"),
        F.col("lang"),
    )


def extract_geo_entities(pages: DataFrame) -> DataFrame:
    """pages -> one row per geo mention: (url, doc_id, mention_idx, mention,
    lat, lng). ``mention`` is the exact matched substring — byte-identical
    per url (the per-row invariant vs the reference)."""
    m = pages.select(
        "url",
        F.regexp_extract(F.col("url"), r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        F.regexp_extract_all(F.col("text"), F.lit(geo.MENTION_RE), F.lit(0)).alias("ms"),
    )
    e = m.select(
        "url", "doc_id",
        F.posexplode("ms").alias("mention_idx", "mention"),
    )
    return e.select(
        "url", "doc_id", "mention_idx", "mention",
        F.regexp_extract("mention", geo.MENTION_RE, 1).cast("double").alias("lat"),
        F.regexp_extract("mention", geo.MENTION_RE, 2).cast("double").alias("lng"),
    )


def assign_tiles(entities: DataFrame, zoom: int = 12) -> DataFrame:
    """Add (z, x, y) slippy-tile assignment columns — JVM-side math only."""
    tx, ty = geo.tile_xy_cols(zoom, F.col("lat"), F.col("lng"))
    return entities.withColumn("z", F.lit(zoom)) \
        .withColumn("x", tx).withColumn("y", ty)
