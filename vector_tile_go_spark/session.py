"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for correctness at local[N] and designed for multi-executor clusters:
AQE (runtime re-plan + skew-join splitting), Arrow for every pandas UDF
boundary, shuffle partitions sized to parallelism rather than the 200
default. On a real cluster the same code runs unchanged via
``spark-submit --py-files vector_tile_go_spark.zip job.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vector_tile_go_spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark sets -Xms = -Xmx = driver.memory: size it to the core budget
        # so several executor JVMs co-exist without over-committing the box
        # (4 x 48g heaps on 125 GB RAM = reclaim storms, measured 3x
        # slowdown); 1.5 GB/core mirrors a common executor shape.
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", f"{max(8, cores * 3 // 2)}g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"))
        # shuffle/spill on tmpfs: this sandbox's virtio disk writes ~120MB/s
        # and dirty-page writeback throttling stalls concurrent shuffles in
        # the kernel (measured: sys 30%, idle 33% with 4 pinned JVMs);
        # cluster nodes put spark.local.dir on local NVMe, tmpfs is the
        # sandbox equivalent
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR",
                                                  "/dev/shm/spark-local"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
