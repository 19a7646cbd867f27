"""Time-series resampling operators (beyond-reference: the hypertable
surface a temporal engine is expected to ship — TimescaleDB's
``time_bucket`` family, kdb+ bar aggregation).

The reference's temporal machinery is per-content version timelines
(``core/data_structures.py``); these operators generalize its
time-bucketing to the classic OHLC bar aggregate and gap-filled
last-observation-carried-forward (LOCF) resampling over arbitrary keyed
event streams.

All bucketing is TZ-free integer math over epoch-milliseconds (the r01/r02
``version_rollup`` lesson: any calendar function routes through the
session timezone somewhere; integer division does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ohlc(
    df: DataFrame,
    time_col: str,
    key_cols: tuple[str, ...],
    value_col: str,
    bucket_ms: int,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Open/high/low/close bar aggregate per (keys, bucket).

    Open/close are the value of the FIRST/LAST event in the bucket —
    ties on the timestamp broken by ``tiebreak_cols``, so the bars are
    deterministic under any partitioning (``first()``/``max_by`` with
    non-unique ordering keys are not). No sums of floats anywhere:
    open/high/low/close are raw selected values, exact in any engine.

    Plan shape: ONE exchange — the endpoint-ranking window and the final
    aggregate share the (keys, bucket) hash partitioning.
    """
    keys = list(key_cols)
    bucket = (F.expr(f"{time_col} div {int(bucket_ms)}") * int(bucket_ms)).alias(
        "bucket_start_ms"
    )
    base = df.select(*keys, bucket, F.col(time_col).alias("_t"),
                     *[F.col(c) for c in tiebreak_cols],
                     F.col(value_col).alias("_v"))
    order = [F.asc("_t")] + [F.asc(c) for c in tiebreak_cols]
    rorder = [F.desc("_t")] + [F.desc(c) for c in tiebreak_cols]
    w_o = Window.partitionBy(*keys, "bucket_start_ms").orderBy(*order)
    w_c = Window.partitionBy(*keys, "bucket_start_ms").orderBy(*rorder)
    ranked = base.withColumn("_rno", F.row_number().over(w_o)).withColumn(
        "_rnc", F.row_number().over(w_c)
    )
    return ranked.groupBy(*keys, "bucket_start_ms").agg(
        F.max(F.when(F.col("_rno") == 1, F.col("_v"))).alias("open"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        F.max(F.when(F.col("_rnc") == 1, F.col("_v"))).alias("close"),
        F.count("*").cast("long").alias("n_events"),
    )


def resample_locf(
    df: DataFrame,
    time_col: str,
    key_cols: tuple[str, ...],
    value_col: str,
    bucket_ms: int,
    lo_ms: int,
    hi_ms: int,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gap-filled LOCF resample: one row per (key, bucket) on the full
    ``[lo_ms, hi_ms]`` grid; ``value`` is the key's LAST observation
    at-or-before the bucket's end (NULL before the first observation),
    ``is_observed`` marks buckets with a real event. TimescaleDB's
    ``time_bucket_gapfill + locf``, as a composition of explode + two
    keyed windows.

    Grid bounds are explicit (not data-inferred) so the operator is
    deterministic for incremental/streaming use. Grid size is
    |keys| x n_buckets — choose ``bucket_ms`` accordingly; the event
    table itself is touched once.
    """
    keys = list(key_cols)
    lo_b = (int(lo_ms) // int(bucket_ms)) * int(bucket_ms)
    hi_b = (int(hi_ms) // int(bucket_ms)) * int(bucket_ms)
    grid = (
        df.select(*keys)
        .distinct()
        .withColumn(
            "bucket_start_ms",
            F.explode(
                F.sequence(
                    F.lit(lo_b).cast("long"),
                    F.lit(hi_b).cast("long"),
                    F.lit(int(bucket_ms)).cast("long"),
                )
            ),
        )
    )
    # per-(key, bucket) closing observation, deterministically tie-broken
    bucket = (F.expr(f"{time_col} div {int(bucket_ms)}") * int(bucket_ms)).alias(
        "bucket_start_ms"
    )
    rorder = [F.desc(time_col)] + [F.desc(c) for c in tiebreak_cols]
    w_c = Window.partitionBy(*keys, "bucket_start_ms").orderBy(*rorder)
    close = (
        df.select(*keys, bucket, F.col(time_col), *[F.col(c) for c in tiebreak_cols],
                  F.col(value_col).alias("_v"))
        .withColumn("_rnc", F.row_number().over(w_c))
        .where(F.col("_rnc") == 1)
        .select(*keys, "bucket_start_ms", F.col("_v").alias("_close"))
    )
    w_fill = (
        Window.partitionBy(*keys)
        .orderBy("bucket_start_ms")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(close, [*keys, "bucket_start_ms"], "left")
        .withColumn("value", F.last("_close", ignorenulls=True).over(w_fill))
        .withColumn("is_observed", F.col("_close").isNotNull())
        .select(*keys, "bucket_start_ms", "value", "is_observed")
    )
