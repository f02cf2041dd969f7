"""Cell-ring kNN join (north-rule operator; no reference analog).

Exact k-nearest-neighbors of each query point over a point table, by
escalating ring search on the uniform grid (cells.grid_cell_cols):

  round r: join queries to all points within Chebyshev cell-radius r,
  take top-k per query (row_number window), and accept the result iff the
  kth distance is <= the guaranteed-covered radius (distance from the query
  to the edge of the searched cell square). Unsatisfied queries escalate r.

The guarantee makes the result *exact* (identical to brute force), which is
what the DuckDB oracle checks; the ring plan just avoids the cross join.
Metric: squared euclidean in degrees (documented engine metric — keeps the
oracle bit-exact; a haversine variant would be a drop-in kernel swap).

Determinism: ties broken by (dist2, doc_id, mention_idx) ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import cells


def escalating_knn(q: DataFrame, p: DataFrame, k: int, qkey: str,
                   expand_fn, join_on, drop_cols: tuple[str, ...],
                   margin_fn, max_rounds: int) -> DataFrame:
    """Shared exact-kNN escalation loop, parameterized by the cell system:

    - ``expand_fn(pending, rad)`` explodes pending queries into candidate
      cells at escalation radius ``rad``;
    - ``join_on(expanded, p)`` is the cell equi-join condition;
    - ``margin_fn(rad)`` is the guaranteed-covered euclidean radius as a
      Column over the candidate row (query-functional), against which the
      kth distance is tested for exactness;
    - ``drop_cols`` are the point-side cell columns to drop post-join.

    Rounds: satisfied queries are emitted; the rest escalate (rad doubles);
    stragglers after ``max_rounds`` fall back to brute force. Lineage is
    localCheckpoint'ed per round, the result is materialized and the
    cached point table released. Used by the quadtree-grid knn_join and
    the hex-grid hex_knn_join so the loop semantics can never diverge."""
    dist2 = ((F.col("lat") - F.col("qlat")) * (F.col("lat") - F.col("qlat")) +
             (F.col("lng") - F.col("qlng")) * (F.col("lng") - F.col("qlng")))
    w = Window.partitionBy(qkey).orderBy("dist2", "doc_id", "mention_idx")

    results = None
    pending = q
    rad = 1
    for _ in range(max_rounds):
        exp = expand_fn(pending, rad)
        # localCheckpoint: cand is dimension-sized after the top-k filter
        # (<= k rows per pending query), but downstream it feeds stats,
        # the semi-join emit, AND the final results checkpoint — without
        # materialization the ring join + window would re-run ~3x per
        # round (measured: the whole kNN query dropped ~40% at bench shape)
        cand = (exp.join(p, join_on(exp, p)).drop(*drop_cols)
                .withColumn("dist2", dist2)
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .withColumn("__margin", margin_fn(rad))
                .localCheckpoint())
        stats = (cand.groupBy(qkey)
                 .agg(F.count("*").alias("nc"), F.max("dist2").alias("kth"),
                      F.first("__margin").alias("m")))
        # strict <: at sqrt(kth) == margin an unsearched point at exactly
        # the margin distance could win the (doc_id, mention_idx) tie-break;
        # boundary ties escalate one more round instead (ADVICE r2)
        satisfied = stats.filter(
            (F.col("nc") >= k) & (F.sqrt("kth") < F.col("m"))).select(qkey)
        done = cand.join(satisfied, qkey, "left_semi") \
            .select(qkey, "rank", "doc_id", "mention_idx", "dist2")
        results = done if results is None else results.unionByName(done)
        # localCheckpoint: truncate the union/anti-join lineage each round
        # (the per-round take(1) below re-evaluates pending otherwise, and
        # the plan would double every escalation)
        pending = pending.join(satisfied, qkey, "left_anti") \
            .localCheckpoint()
        if not pending.take(1):
            break
        rad *= 2
    else:
        # fallback: brute force for stragglers (correctness over elegance)
        cand = pending.crossJoin(p.drop(*drop_cols)) \
            .withColumn("dist2", dist2) \
            .withColumn("rank", F.row_number().over(w)) \
            .filter(F.col("rank") <= k) \
            .select(qkey, "rank", "doc_id", "mention_idx", "dist2")
        results = cand if results is None else results.unionByName(cand)
    # materialize the (dimension-sized) result so the cached point table can
    # be released immediately instead of leaking until session teardown
    results = results.localCheckpoint()
    p.unpersist()
    return results


def knn_join(queries: DataFrame, points: DataFrame, k: int = 5,
             qkey: str = "qid", max_rounds: int = 6) -> DataFrame:
    """queries(qkey, qlat, qlng) x points(lat, lng, doc_id, mention_idx) ->
    (qkey, rank, doc_id, mention_idx, dist2), exactly k rows per query
    (fewer only if the whole table has < k points)."""
    qx, qy = cells.grid_cell_cols(F.col("qlat"), F.col("qlng"))
    q = queries.select(qkey, "qlat", "qlng").withColumn("gx", qx).withColumn("gy", qy)
    px, py = cells.grid_cell_cols(F.col("lat"), F.col("lng"))
    p = points.select("lat", "lng", "doc_id", "mention_idx") \
        .withColumn("pgx", px).withColumn("pgy", py)
    p.cache()

    def expand(pending, rad):
        return cells.ring_cells(pending, "gx", "gy", rad)

    def margin(rad):
        # guarantee radius: distance from q to the nearest edge of the
        # searched square [ (gx-rad)*step-180, (gx+rad+1)*step-180 ] etc.;
        # clamped edges (grid border) count as covered -> infinite margin
        step = cells.GRID_STEP
        gxl = (F.col("gx") - rad) * step - 180.0
        gxr = (F.col("gx") + rad + 1) * step - 180.0
        gyl = (F.col("gy") - rad) * step - 90.0
        gyr = (F.col("gy") + rad + 1) * step - 90.0
        return F.least(
            F.when((F.col("gx") - rad) <= 0, F.lit(1e9))
            .otherwise(F.col("qlng") - gxl),
            F.when((F.col("gx") + rad) >= cells.GRID_NX - 1, F.lit(1e9))
            .otherwise(gxr - F.col("qlng")),
            F.when((F.col("gy") - rad) <= 0, F.lit(1e9))
            .otherwise(F.col("qlat") - gyl),
            F.when((F.col("gy") + rad) >= cells.GRID_NY - 1, F.lit(1e9))
            .otherwise(gyr - F.col("qlat")),
        )

    return escalating_knn(
        q, p, k, qkey, expand,
        lambda e, pp: (e.rx == pp.pgx) & (e.ry == pp.pgy),
        ("pgx", "pgy"), margin, max_rounds)


def knn_bruteforce(queries: DataFrame, points: DataFrame, k: int = 5,
                   qkey: str = "qid") -> DataFrame:
    """Reference implementation (cross join + window) — the oracle twin and
    the baseline the ring plan must beat at scale."""
    dist2 = ((F.col("lat") - F.col("qlat")) * (F.col("lat") - F.col("qlat")) +
             (F.col("lng") - F.col("qlng")) * (F.col("lng") - F.col("qlng")))
    w = Window.partitionBy(qkey).orderBy("dist2", "doc_id", "mention_idx")
    return (queries.select(qkey, "qlat", "qlng")
            .crossJoin(points.select("lat", "lng", "doc_id", "mention_idx"))
            .withColumn("dist2", dist2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qkey, "rank", "doc_id", "mention_idx", "dist2"))
