"""Readers for the driver-generated parquet tables (TESTDATA.md).

These replace the reference's HDF5 group traversal
(``storage/storage_engine.py:94-103,377-415``) with columnar parquet scans —
predicate pushdown, column pruning and partition pruning come from
Catalyst/the parquet reader for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table from ``<sf_dir>/<name>.parquet``."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
