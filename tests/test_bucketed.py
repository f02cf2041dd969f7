"""Bucketed tile tables: two tables bucketed on (z, x, y) join with NO
shuffle exchange — the cross-job co-location design for 100 TB tile
tables (PLANS.md invariant: reuse a partitioning across stages)."""

from pyspark.sql import functions as F


def test_bucketed_tile_join_has_no_exchange(spark, sf_dir):
    from vector_tile_go_spark.queries import entities_df
    from vector_tile_go_spark.sparkops.udfs import encode_point_tiles
    from vector_tile_go_spark.store.tilestore import write_tiles_bucketed

    e = entities_df(spark, sf_dir)
    # overlapping doc ranges so the two tile tables share tile keys
    t_even = encode_point_tiles(e, prop_cols=("mention_idx",))
    t_odd = encode_point_tiles(e.filter(F.col("doc_id") % 2 == 1),
                               prop_cols=("mention_idx",))
    for name in ("tb_even", "tb_odd"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_tiles_bucketed(t_even, "tb_even", n_buckets=8)
        write_tiles_bucketed(t_odd, "tb_odd", n_buckets=8)
        # at sf0.001 both sides fit the broadcast threshold and the planner
        # rightly broadcasts (bucketing disabled); at the 100 TB scale this
        # design targets, neither side broadcasts — force that regime
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("tb_even").alias("a")
        b = spark.table("tb_odd").alias("b")
        joined = a.join(b, ["z", "x", "y"]).select(
            "z", "x", "y", F.col("a.n_features").alias("na"),
            F.col("b.n_features").alias("nb"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # and the join is real: overlapping tiles exist and counts add up
        row = joined.agg(F.count("*").alias("n"),
                         F.sum(F.col("na") + F.col("nb")).alias("s")).first()
        assert row["n"] > 0 and row["s"] > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("tb_even", "tb_odd"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
