"""Streaming maintenance of counter (increase/rate) aggregates — the
streaming half of ``operators/timeseries.counter_agg``, following the
versioned-state commit scheme of ``streaming/ohlc.py``.

Counter deltas need the PREVIOUS sample of each key, which straddles
micro-batch boundaries, so the state is two tables per version:

* ``buckets/`` — per-(key, bucket) ``(increase_units, n_resets,
  n_samples)``, purely ADDITIVE, merged by integer sum;
* ``last/`` — one row per key: the latest quantized sample
  (``_t``, tiebreaks…, ``_v``), fed back into the next batch's
  ``counter_agg(carry=…)`` so the cross-batch delta (and a reset that
  happens exactly at a batch boundary) is attributed correctly.

Arrival contract: per-key event-time monotone across batches (the
``streaming/curation.py`` discipline); out-of-order repair belongs to
the OOO-ingest machinery, not here. Each batch writes BOTH tables
under a new ``v=<batch_id>/`` directory; a version is committed only
when both parquet ``_SUCCESS`` markers exist, so replays of a
committed batch no-op and a crash mid-write leaves the previous
version current.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.timeseries import counter_agg
from temporal_vector_database_spark.streaming._state import committed_versions, replay_guard


def _committed_versions(state_dir: str) -> list[int]:
    return committed_versions(state_dir, markers=("buckets", "last"))


def read_counter_state(
    spark: SparkSession, state_dir: str
) -> tuple[DataFrame, DataFrame] | None:
    """(buckets, last) at the highest committed version, or None."""
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    base = os.path.join(state_dir, f"v={vs[-1]}")
    return (
        spark.read.parquet(os.path.join(base, "buckets")),
        spark.read.parquet(os.path.join(base, "last")),
    )


def counter_report(buckets: DataFrame, bucket_ms: int, value_scale: int = 1000) -> DataFrame:
    """Read-side projection: attach the single-division rate column
    (identical to the batch operator's published rate)."""
    return buckets.withColumn(
        "rate_per_sec",
        F.col("increase_units").cast("double")
        / (float(int(value_scale)) * (int(bucket_ms) / 1000.0)),
    )


def process_counter_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    time_col: str = "ts_ms",
    key_cols: tuple = ("user_id",),
    value_col: str = "value",
    bucket_ms: int = 86_400_000,
    tiebreak_cols: tuple = ("event_id",),
    value_scale: int = 1000,
) -> None:
    """One micro-batch: seeded counter deltas → additive bucket merge →
    refreshed last-sample table → commit ``v=<batch_id>``."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    vs = _committed_versions(state_dir)
    if replay_guard(vs, batch_id, state_dir):
        return
    keys = list(key_cols)
    prev = (
        (
            spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}", "buckets")),
            spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}", "last")),
        )
        if vs
        else (None, None)
    )
    prev_buckets, prev_last = prev

    delta = counter_agg(
        batch_df, time_col, key_cols, value_col, bucket_ms,
        tiebreak_cols, value_scale, carry=prev_last,
    ).drop("rate_per_sec")
    if prev_buckets is not None:
        merged = (
            prev_buckets.unionByName(delta)
            .groupBy(*keys, "bucket_start_ms")
            .agg(
                F.sum("increase_units").cast("long").alias("increase_units"),
                F.sum("n_resets").cast("long").alias("n_resets"),
                F.sum("n_samples").cast("long").alias("n_samples"),
            )
        )
    else:
        merged = delta

    scale = int(value_scale)
    quant = batch_df.select(
        *keys,
        F.col(time_col).cast("long").alias("_t"),
        *[F.col(c) for c in tiebreak_cols],
        F.round(F.col(value_col) * float(scale), 0).cast("long").alias("_v"),
    )
    pool = quant if prev_last is None else quant.unionByName(prev_last)
    s = F.struct(
        F.col("_t").alias("t"),
        *[F.col(c).alias(f"tb{i}") for i, c in enumerate(tiebreak_cols)],
        F.col("_v").alias("v"),
    )
    new_last = pool.groupBy(*keys).agg(F.max(s).alias("_s")).select(
        *keys,
        F.col("_s").getField("t").alias("_t"),
        *[
            F.col("_s").getField(f"tb{i}").alias(c)
            for i, c in enumerate(tiebreak_cols)
        ],
        F.col("_s").getField("v").alias("_v"),
    )

    base = os.path.join(state_dir, f"v={batch_id}")
    merged.write.mode("overwrite").parquet(os.path.join(base, "buckets"))
    new_last.write.mode("overwrite").parquet(os.path.join(base, "last"))
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def run_counter_stream(
    event_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> None:
    """Drain available batches (Trigger.AvailableNow); afterwards
    ``counter_report(buckets)`` equals the one-shot ``counter_agg``
    over everything streamed (pinned in tests)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_counter_batch(batch_df, batch_id, state_dir, **kwargs)

    q = (
        event_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
