"""Python worker daemon that preloads the heavy scientific stack before
forking workers.

Stock pyspark forks workers from a daemon that has imported only pyspark:
every worker then imports numpy + pandas + pyarrow + the codec privately,
paying ~100 MB of private anon pages and ~0.5 s of import time per worker.
Preloading in the daemon makes those pages copy-on-write shared across all
workers of the executor: measured here (BASELINE.md round 3), per-worker
private RSS drops ~150 MB -> ~35 MB and a 4x8-core fleet faults ~6 GB less
fresh memory inside the timed stages. On a real cluster the same module
ships in the --py-files zip and is enabled by
``spark.python.daemon.module=vector_tile_go_spark.daemon_preload``
(session.py sets it).

The daemon protocol is unchanged — after preloading we hand control to
pyspark's own manager loop.
"""

def _preload() -> None:
    try:
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
        import pyarrow.pandas_compat  # noqa: F401  (lazy-imported by serializers)
        from .codec import decode, encode, encode_fast, splice  # noqa: F401
        from .spatial import bbox, hexgrid, pip  # noqa: F401
    except Exception:
        # never block worker startup on a preload failure — workers will
        # import lazily as stock pyspark does
        pass


if __name__ == "__main__":
    _preload()
    from pyspark.daemon import manager
    manager()
