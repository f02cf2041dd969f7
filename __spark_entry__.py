"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in the ``vector_tile_go_spark`` package; this module is
the thin registry the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Common-Crawl-style pages -> geo-entity extraction ->
    z12 tile assignment -> MVT layer encode -> decode -> per-tile summary."""
    from vector_tile_go_spark.queries import q_roundtrip_counts
    return q_roundtrip_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vector_tile_go_spark.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from vector_tile_go_spark.queries import oracle_queries
    return oracle_queries()
