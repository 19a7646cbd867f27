"""Streaming maintenance of OHLC bars (beyond-reference; the streaming
half of ``operators/timeseries.py`` — same pattern as the version-rollup
continuous aggregate in ``streaming/rollup.py``).

Events arrive as a stream; each micro-batch aggregates to MERGEABLE
per-(keys, bucket) partial state (``ohlc_state``) and folds it into the
parquet-backed state table with ``ohlc_merge`` — per-batch cost is
proportional to the batch's buckets, never to history, and a LATE event
correctly re-opens its bar (the struct-extremum open/close carries the
event time, so merging is order-free).

State versioning (identical scheme to ``streaming/rollup.py``): each
batch writes merged state to a NEW ``v=<batch_id>/`` directory and
readers take the highest committed version — replays of an
already-committed batch are no-ops, replays of an uncommitted one
recompute from the pre-batch state and overwrite only their own version
dir. On a production lake this body becomes a transactional MERGE INTO
keyed by (keys, bucket_start_ms); the mergeable-state design is what
makes either sink work.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from temporal_vector_database_spark.operators.timeseries import ohlc_merge, ohlc_state
from temporal_vector_database_spark.streaming._state import committed_versions, replay_guard


def _committed_versions(state_dir: str) -> list[int]:
    return committed_versions(state_dir)


def read_ohlc_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The current (highest committed version) OHLC state, or None."""
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))


def process_ohlc_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    time_col: str = "ts_ms",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    bucket_ms: int = 86_400_000,
    tiebreak_cols: tuple[str, ...] = ("event_id",),
) -> None:
    """One micro-batch: aggregate to partial state, merge, commit a new
    state version. Replaying a committed ``batch_id`` is a no-op."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    vs = _committed_versions(state_dir)
    if replay_guard(vs, batch_id, state_dir):
        return
    part = ohlc_state(batch_df, time_col, key_cols, value_col, bucket_ms, tiebreak_cols)
    prev = spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}")) if vs else None
    merged = ohlc_merge(prev, part) if prev is not None else part
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, f"v={batch_id}"))
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def run_ohlc_stream(
    event_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> None:
    """Drain available event batches (Trigger.AvailableNow), maintaining
    OHLC state at ``state_dir``; afterwards ``ohlc_report(state)`` equals
    the one-shot ``ohlc`` over everything streamed (pinned in tests)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_ohlc_batch(batch_df, batch_id, state_dir, **kwargs)

    q = (
        event_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
