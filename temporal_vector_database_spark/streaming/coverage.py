"""Streaming interval-coverage maintenance (beyond-reference; the
streaming half of ``operators/temporal.py::coalesce_intervals``).

Keyed activity intervals arrive as a stream; a compact coverage-span
state stays equal to the one-shot coalesce over all intervals-so-far.
Soundness rests on two pinned properties of interval coalescing:
geometry is ASSOCIATIVE (coalesce(coalesce(A) ∪ B) == coalesce(A ∪ B)),
and with ``weight_col`` threading prior ``n_merged`` values through the
re-coalesce, source counts stay exact too — so per-batch cost is
|state spans| + |batch|, never history.

State versioning: the ``v=<batch_id>/`` commit scheme shared with
``streaming/rollup.py`` / ``streaming/ohlc.py`` — committed replays are
no-ops, uncommitted replays recompute from the pre-batch state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.temporal import coalesce_intervals
from temporal_vector_database_spark.streaming._state import committed_versions, replay_guard


def _committed_versions(state_dir: str) -> list[int]:
    return committed_versions(state_dir)


def read_coverage_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current coverage spans (keys, span_start, span_end, n_merged)."""
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))


def process_coverage_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    key_cols: tuple[str, ...] = ("user_id",),
    start_col: str = "iv_start",
    end_col: str = "iv_end",
) -> None:
    """One micro-batch of raw intervals: union with current spans
    (weights carried), re-coalesce, commit a new state version.
    Replaying a committed ``batch_id`` is a no-op; late intervals merge
    exactly like on-time ones (coalescing is order-free)."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    vs = _committed_versions(state_dir)
    if replay_guard(vs, batch_id, state_dir):
        return
    keys = list(key_cols)
    fresh = batch_df.select(
        *keys,
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        F.lit(1).cast("long").alias("_w"),
    )
    prev = (
        spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}")) if vs else None
    )
    if prev is not None:
        fresh = fresh.unionByName(
            prev.select(
                *keys,
                F.col("span_start").alias("_s"),
                F.col("span_end").alias("_e"),
                F.col("n_merged").alias("_w"),
            )
        )
    merged = coalesce_intervals(fresh, keys, "_s", "_e", weight_col="_w")
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, f"v={batch_id}"))
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def run_coverage_stream(
    interval_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> None:
    """Drain available interval batches (Trigger.AvailableNow); after
    the drain the state equals the one-shot ``coalesce_intervals`` over
    everything streamed (pinned in tests)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_coverage_batch(batch_df, batch_id, state_dir, **kwargs)

    q = (
        interval_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
