"""Physical-plan invariants over the registered queries (PLANS.md):

- No CartesianProduct / BroadcastNestedLoopJoin anywhere.
- Python appears only at the codec/kernel boundary: every Python node is
  Arrow-batched (MapInPandas / FlatMapGroupsInPandas / ArrowEvalPython) —
  never a row-at-a-time BatchEvalPython.

Queries whose *construction* triggers driver actions (the escalating kNN
rounds, streaming runs, stateful ops) are exercised by their own tests and
the oracle gate; this test covers the declaratively-built plans.
"""

import pytest

SKIP = {
    # construction runs driver actions / streams; plan string not one tree
    "knn", "hex_knn", "events_stream_windows", "events_stateful_totals",
}

BAD_NODES = ("CartesianProduct", "BroadcastNestedLoopJoin")
ROW_PYTHON = ("BatchEvalPython",)


def _plans(spark, sf_dir):
    from vector_tile_go_spark.queries import QUERIES
    for name, fn in QUERIES.items():
        if name in SKIP:
            continue
        df = fn(spark, sf_dir)
        yield name, df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_or_nested_loop_joins(spark, sf_dir):
    offenders = []
    for name, plan in _plans(spark, sf_dir):
        for bad in BAD_NODES:
            if bad in plan:
                offenders.append((name, bad))
    assert not offenders, offenders


def test_python_only_at_arrow_batched_boundaries(spark, sf_dir):
    offenders = []
    for name, plan in _plans(spark, sf_dir):
        for bad in ROW_PYTHON:
            if bad in plan:
                offenders.append((name, bad))
    assert not offenders, offenders
