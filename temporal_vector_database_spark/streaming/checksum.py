"""Streaming table-fingerprint maintenance for APPEND-ONLY tables.

XOR is its own inverse and commutative, so an append-only stream's
fingerprint folds per batch: ``xor_state ⊕= xor(batch)``, ``n_rows +=
count(batch)`` — after any batching the committed fingerprint is
BIT-IDENTICAL to ``operators/relational.py table_checksum`` over
everything streamed (pinned in tests). Updates/deletes are out of scope
by design (a mutation is not an append; recompute on compaction — the
IVF-store discipline).

Use: continuous verification that a replicated/migrated copy of an
append-only event log matches the source without rescanning history —
per-batch cost is the batch, state is one row per group.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.relational import table_checksum
from temporal_vector_database_spark.streaming._state import committed_versions, replay_guard


def _committed_versions(state_dir: str) -> list[int]:
    return committed_versions(state_dir)


def process_checksum_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    key_cols: tuple = ("doc_id",),
    compare_cols: tuple = ("text",),
    group_cols: tuple = (),
) -> None:
    """Fold one append-only micro-batch's fingerprint into the state."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    vs = _committed_versions(state_dir)
    if replay_guard(vs, batch_id, state_dir):
        return
    gk = list(group_cols)
    part = table_checksum(batch_df, key_cols, compare_cols, group_cols)
    if vs:
        prev = spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))
        merged_aggs = [
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.expr("bit_xor(xor_hi)").cast("long").alias("xor_hi"),
            F.expr("bit_xor(xor_lo)").cast("long").alias("xor_lo"),
        ]
        part = (
            prev.unionByName(part).groupBy(*gk).agg(*merged_aggs)
            if gk
            else prev.unionByName(part).agg(*merged_aggs)
        )
    part.write.mode("overwrite").parquet(os.path.join(state_dir, f"v={batch_id}"))
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def read_checksum_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))
