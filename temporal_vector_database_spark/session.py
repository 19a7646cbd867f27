"""SparkSession factory with engine-appropriate defaults.

Tuned for correctness-testing on ``local[*]`` while keeping settings that
transfer to a large cluster: AQE on (runtime re-planning, skew-join
handling), Arrow enabled for pandas interchange, UTC session timezone so
timestamp semantics match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tvdb-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # joins between frames already hash-partitioned on a PREFIX of the
        # join keys (e.g. everything keyed by content_id in reconstruct)
        # should reuse that partitioning instead of re-shuffling on the
        # full key set; default=true re-shuffles both sides.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("TVDB_DRIVER_MEMORY", "32g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
