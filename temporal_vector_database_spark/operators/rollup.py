"""Hypertable-style continuous aggregate over the ``versions`` table.

A time-bucketed rollup (per content per day: version/base/delta counts,
delta-magnitude stats) maintained INCREMENTALLY: the stored rollup keeps
mergeable partial state (sums + counts, not averages), so appending a
batch of freshly encoded versions folds into the rollup with one
partial-aggregate merge — no rescan of history. This is the continuous-
aggregate pattern (TimescaleDB hypertable rollups, Druid rollup
segments) expressed as plain Spark aggregation.

Scale posture: both the initial build and every refresh are
partial+final hash aggregations keyed by (content_id, bucket) — the
merge shuffles only rollup rows (≤ contents × touched buckets), never
raw versions. At 100 TB the refresh cost is proportional to the NEW
data, which is the entire point.

Reference: no counterpart (the reference recomputes stats per call,
e.g. ``get_change_statistics`` ``core/data_structures.py:277-291``);
this is the beyond-reference warehouse surface over the same numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# mergeable partial-state columns of the stored rollup
_STATE_COLS = (
    "n_versions",
    "n_bases",
    "n_deltas",
    "mag_sum_e9",
    "mag_max_e9",
    "changed_sum",
)

# fixed bucket widths in microseconds — bucketing is integer epoch math,
# NOT date_trunc: Spark's date_trunc truncates in the SESSION timezone,
# so the same query returns different instants under different session
# TZs (the only way a run-anywhere oracle comparison can diverge while
# row counts stay equal). Integer floor-division of unix_micros is
# timezone-free by construction and reproduces date_trunc-under-UTC.
_BUCKET_US = {
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
}
# epoch day 0 (1970-01-01) is a Thursday; shifting by +3 days aligns the
# modulus grid to Mondays, matching date_trunc('week') in both engines.
_WEEK_SHIFT_US = 3 * 86_400_000_000


def bucket_start_expr(bucket: str, df: DataFrame, ts_col: str = "ts"):
    """TZ-free bucket floor of a timestamp column, always producing
    ``timestamp_ntz`` (naive — collected/compared identically under any
    session timezone, matching the oracle's naive TIMESTAMP).

    ``date_trunc`` is deliberately avoided on BOTH branches: it floors
    in the SESSION timezone, and (verified empirically on Spark 4) even
    a ``timestamp_ntz`` input is first coerced to LTZ through a
    session-TZ cast — the one expression class that diverges between a
    UTC and a non-UTC driver session while row counts stay equal.

    Input handling depends on how the parquet was read (environments
    differ on ``inferTimestampNTZ``):

    - ``timestamp_ntz``: floor the naive FIELDS directly (cast to DATE
      drops time fields; DATE→NTZ re-adds midnight — both naive-space
      ops, no timezone involved).
    - ``timestamp`` (LTZ): floor ``unix_micros`` with integer
      arithmetic and rebuild a naive timestamp by adding a day-time
      interval to the naive epoch — every step session-TZ-independent.
    """
    if bucket not in _BUCKET_US:
        raise ValueError(
            f"bucket must be one of {sorted(_BUCKET_US)}, got {bucket!r}"
        )
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "timestamp_ntz":
        d = F.col(ts_col).cast("date")
        if bucket == "day":
            return d.cast("timestamp_ntz")
        if bucket == "hour":
            return d.cast("timestamp_ntz") + F.make_dt_interval(
                F.lit(0), F.hour(ts_col), F.lit(0), F.lit(0)
            )
        # week → most recent Monday (dayofweek: 1=Sun..7=Sat)
        return F.date_sub(d, (F.dayofweek(d) + F.lit(5)) % F.lit(7)).cast(
            "timestamp_ntz"
        )
    width = _BUCKET_US[bucket]
    shift = _WEEK_SHIFT_US if bucket == "week" else 0
    us = F.unix_micros(F.col(ts_col)) + F.lit(shift)
    floored_us = us - F.pmod(us, F.lit(width)) - F.lit(shift)
    naive_epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    # widths are whole seconds, so the µs→s division is exact
    secs = (floored_us / F.lit(1_000_000)).cast("decimal(18,6)")
    return naive_epoch + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs)


def bucket_day_expr(df: DataFrame, ts_col: str = "ts"):
    """TZ-free integer epoch-day (LONG) of a timestamp column — the
    hash-trivial bucket key. Same flooring as ``bucket_start_expr``'s
    day branch, but published as a plain BIGINT so result comparison
    involves no timestamp canonicalization at all."""
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "timestamp_ntz":
        return F.datediff(
            F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("long")
    us = F.unix_micros(F.col(ts_col))
    day = F.lit(86_400_000_000)
    return ((us - F.pmod(us, day)) / day).cast("long")


def _state_aggs():
    # magnitude is a sqrt (off any dyadic grid): double sums are
    # order-dependent under partial aggregation, and decimal ROUNDING of
    # raw sqrt doubles differs between engines' round() implementations
    # (BigDecimal half-up vs multiply/std::round). Hold the state in
    # exact integer nano-units (same technique as curation_report's
    # survivor_quality_e9) so sums/maxes are partition-order-proof and
    # every published double is integer/1e9 — bit-identical everywhere.
    is_delta = F.col("kind") == "delta"
    mag_e9 = F.round(F.col("magnitude") * F.lit(1000000000.0), 0).cast("long")
    return [
        F.count("*").alias("n_versions"),
        F.sum(F.when(~is_delta, 1).otherwise(0)).cast("long").alias("n_bases"),
        F.sum(F.when(is_delta, 1).otherwise(0)).cast("long").alias("n_deltas"),
        F.sum(F.when(is_delta, mag_e9)).cast("long").alias("mag_sum_e9"),
        F.max(F.when(is_delta, mag_e9)).alias("mag_max_e9"),
        F.sum(F.when(is_delta, F.col("n_changed"))).cast("long").alias("changed_sum"),
    ]


def _partials(versions: DataFrame, bucket: str) -> DataFrame:
    return versions.groupBy(
        "content_id", bucket_start_expr(bucket, versions).alias("bucket_start")
    ).agg(*_state_aggs())


def version_rollup_days(versions: DataFrame) -> DataFrame:
    """Daily rollup STATE with every published column hash-trivial:
    ``bucket_day`` is epoch-day BIGINT and the six state columns are
    exact integers. This is the honest stored-state contract (the
    mergeable partials themselves); ``rollup_report`` derives the
    timestamp + double projection at read time."""
    return versions.groupBy(
        "content_id", bucket_day_expr(versions).alias("bucket_day")
    ).agg(*_state_aggs())


def version_rollup(versions: DataFrame, bucket: str = "day") -> DataFrame:
    """Full rollup build: one pass over ``versions``. ``bucket`` is a
    ``date_trunc`` unit (``day``/``hour``/``week``...)."""
    return _partials(versions, bucket)


def rollup_merge(rollup: DataFrame, new_versions: DataFrame, bucket: str = "day") -> DataFrame:
    """Incremental refresh: fold a batch of newly appended versions into
    an existing rollup. Every state column is mergeable (counts/sums:
    sum; max: max), so the merge is a union + re-aggregate over rollup
    ROWS — the history is never rescanned. Exactness vs a full rebuild
    is pinned in tests."""
    merged = rollup.unionByName(_partials(new_versions, bucket))
    return merged.groupBy("content_id", "bucket_start").agg(
        F.sum("n_versions").cast("long").alias("n_versions"),
        F.sum("n_bases").cast("long").alias("n_bases"),
        F.sum("n_deltas").cast("long").alias("n_deltas"),
        F.sum("mag_sum_e9").cast("long").alias("mag_sum_e9"),
        F.max("mag_max_e9").cast("long").alias("mag_max_e9"),
        F.sum("changed_sum").cast("long").alias("changed_sum"),
    )


def rollup_report(rollup: DataFrame, key_col: str = "bucket_start") -> DataFrame:
    """Read-side projection: derived averages over the mergeable state
    (avg = sum/count at read time — storing averages would make the
    state unmergeable). ``key_col`` names the bucket key column of the
    input state (``bucket_start`` timestamp from ``version_rollup`` or
    ``bucket_day`` BIGINT from ``version_rollup_days``)."""
    # published doubles are (rounded-to-integer nano-units) / 1e9: the
    # integer round happens on an integer/integer quotient, and the final
    # division is one IEEE op — no decimal round() of an irrational
    # double anywhere, so any engine reproduces the exact bits.
    avg_mag_e9 = F.round(
        F.col("mag_sum_e9").cast("double") / F.col("n_deltas").cast("double"), 0
    ).cast("long")
    return rollup.select(
        "content_id",
        key_col,
        *(_c for _c in ("n_versions", "n_bases", "n_deltas")),
        (avg_mag_e9.cast("double") / F.lit(1000000000.0)).alias("avg_magnitude"),
        (F.col("mag_max_e9").cast("double") / F.lit(1000000000.0)).alias("max_magnitude"),
        (
            F.round(
                F.col("changed_sum").cast("double")
                * F.lit(1000000000.0)
                / F.col("n_deltas").cast("double"),
                0,
            ).cast("long")
            .cast("double")
            / F.lit(1000000000.0)
        ).alias("avg_dims_changed"),
    )
