"""Streaming maintenance of M4 downsample state — the streaming half of
``operators/timeseries.m4_downsample`` (same versioned-commit scheme as
``streaming/ohlc.py``; the state is the mergeable struct-extremum table
of ``m4_state``/``m4_merge``, so a LATE point correctly re-opens its
pixel's first/last/min/max)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from temporal_vector_database_spark.operators.timeseries import m4_merge, m4_state
from temporal_vector_database_spark.streaming._state import committed_versions, replay_guard


def _committed_versions(state_dir: str) -> list[int]:
    return committed_versions(state_dir)


def read_m4_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))


def process_m4_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    time_col: str = "ts_ms",
    key_cols: tuple = ("event_type",),
    value_col: str = "value",
    bucket_ms: int = 86_400_000,
    tiebreak_cols: tuple = ("event_id",),
) -> None:
    """One micro-batch: partial M4 state, merge, commit. Replaying a
    committed ``batch_id`` is a no-op."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    vs = _committed_versions(state_dir)
    if replay_guard(vs, batch_id, state_dir):
        return
    part = m4_state(batch_df, time_col, key_cols, value_col, bucket_ms, tiebreak_cols)
    prev = spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}")) if vs else None
    merged = m4_merge(prev, part) if prev is not None else part
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, f"v={batch_id}"))
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def run_m4_stream(
    event_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> None:
    """Drain available batches; afterwards ``m4_report(state)`` equals
    the one-shot ``m4_downsample`` over everything streamed."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_m4_batch(batch_df, batch_id, state_dir, **kwargs)

    q = (
        event_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
