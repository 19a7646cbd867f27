"""Streaming maintenance for cross-series correlation — the streaming
half of ``operators/timeseries.series_correlation``.

The correlation's input is the per-(series, bucket) value-sum table,
which is PURELY ADDITIVE (integer sums fold by integer sum), so the
state discipline is the ``streaming/dsir.py`` one: each micro-batch
aggregates to its own (series, bucket, x) partial and folds in by sum;
the pairwise moments and the corr doubles are derived on the READ side
(``correlation_from_state``), bit-identical to the one-shot operator
over everything streamed. Late events are handled for free — a late
row simply adds into its bucket, exactly like the batch aggregate.

State versioning: the ``v=<batch_id>`` commit scheme; replays of a
committed batch are no-ops.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.timeseries import _bucket_expr
from temporal_vector_database_spark.streaming._state import committed_versions, replay_guard


def _committed_versions(state_dir: str) -> list[int]:
    return committed_versions(state_dir)


def read_series_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))


def process_series_sum_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    time_col: str = "ts_ms",
    series_col: str = "event_type",
    value_col: str = "value",
    bucket_ms: int = 86_400_000,
    value_scale: int = 1,
) -> None:
    """Fold one event micro-batch into the (series, bucket, x) sums."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    vs = _committed_versions(state_dir)
    if replay_guard(vs, batch_id, state_dir):
        return
    scale = int(value_scale)
    delta = batch_df.groupBy(
        F.col(series_col).alias("s"), _bucket_expr(time_col, bucket_ms)
    ).agg(
        F.sum(F.round(F.col(value_col) * float(scale), 0).cast("long"))
        .cast("long")
        .alias("x")
    )
    prev = spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}")) if vs else None
    merged = (
        delta
        if prev is None
        else prev.unionByName(delta)
        .groupBy("s", "bucket_start_ms")
        .agg(F.sum("x").cast("long").alias("x"))
    )
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, f"v={batch_id}"))
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def correlation_from_state(state: DataFrame) -> DataFrame:
    """Pairwise Pearson from maintained per-bucket sums — the read side
    of ``series_correlation`` (same moments, same IEEE-deterministic
    corr expression), never rescanning events."""
    a = state.select(
        F.col("s").alias("series_a"), "bucket_start_ms", F.col("x").alias("xa")
    )
    b = state.select(
        F.col("s").alias("series_b"), "bucket_start_ms", F.col("x").alias("xb")
    )
    pairs = a.join(F.broadcast(b), "bucket_start_ms").where(
        F.col("series_a") < F.col("series_b")
    )
    m = pairs.groupBy("series_a", "series_b").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum("xa").cast("long").alias("sx"),
        F.sum("xb").cast("long").alias("sy"),
        F.sum(F.col("xa") * F.col("xb")).cast("long").alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).cast("long").alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).cast("long").alias("syy"),
    )
    num = (F.col("n_buckets") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    va = (F.col("n_buckets") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vb = (F.col("n_buckets") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.withColumn(
        "corr",
        F.when((va > 0) & (vb > 0), num / (F.sqrt(va) * F.sqrt(vb))).otherwise(
            F.lit(None).cast("double")
        ),
    )


def acf_from_state(
    spark: SparkSession,
    state_dir: str,
    bucket_ms: int = 86_400_000,
    max_lag: int = 3,
) -> DataFrame | None:
    """Serve per-series AUTOCORRELATION from the maintained per-bucket
    sums (r08) — the same additive state ``correlation_from_state``
    reads, so the two analytics share one maintenance stream. Same
    per-bucket table ⟹ bit-identical to the one-shot
    ``operators/timeseries.series_acf`` over everything streamed
    (pinned in tests); None before the first commit."""
    from temporal_vector_database_spark.operators.timeseries import (
        acf_from_per_bucket,
    )

    state = read_series_state(spark, state_dir)
    if state is None:
        return None
    # pin: the per-bucket table feeds BOTH sides of the lag self-join
    # (r11, the multi-consumer state-serve discipline)
    return acf_from_per_bucket(state.localCheckpoint(), bucket_ms, max_lag)


def run_series_sum_stream(
    event_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> None:
    """Drain available event batches into the sums state."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_series_sum_batch(batch_df, batch_id, state_dir, **kwargs)

    q = (
        event_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
