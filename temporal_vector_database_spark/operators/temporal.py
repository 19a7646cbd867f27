"""Generic temporal joins (beyond-reference generalization).

The reference's only as-of machinery is version resolution inside one
timeline (``core/data_structures.py:213-227``). This module generalizes it
to the classic timeseries AS-OF JOIN between two arbitrary keyed streams —
the operator a temporal engine is expected to have (kdb's ``aj``, DuckDB's
``ASOF JOIN``, Flink's temporal table join).

Spark-first strategy: union-tag + ordered window ``last(..., ignorenulls)``
— one shuffle on the key, linear in |left| + |right|, no per-row range
probe and no skew-prone inequality join. The same plan shape the engine
already uses for nearest-base selection (O4), applied to two tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | tuple[str, ...],
    value_cols: list[str] | tuple[str, ...],
    suffix: str = "_asof",
    tolerance: float | int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the ``value_cols`` of the nearest right
    row with the same ``by`` keys — ``direction="backward"`` (default)
    takes the LATEST right row with ``right.on <= left.on`` (inclusive,
    like the reference's as-of resolve); ``direction="forward"`` takes
    the EARLIEST right row with ``right.on >= left.on``. Left rows with
    no qualifying right row get NULLs.

    ``tolerance`` (pandas ``merge_asof`` semantics): a match farther than
    ``tolerance`` from the left time is discarded (NULLs instead).
    Interpreted in the units of ``on`` for numeric columns and in
    SECONDS for timestamp columns.

    ``right`` should be deterministic per (by, on) — dedupe first if the
    event time is not unique (ties are otherwise order-dependent).

    Plan shape: union-tag + one ordered window per direction — a single
    shuffle on ``by``, linear in |left| + |right|, no inequality join.
    """
    from pyspark.sql.types import TimestampType

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    backward = direction == "backward"
    by = list(by)
    lcols = left.columns
    # sort position of right vs left at EQUAL time decides inclusivity:
    # backward looks over (.., current] so right must sort first;
    # forward looks over [current, ..) so right must sort last.
    r_side = 0 if backward else 2
    tagged_r = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(r_side).alias("_side"),
        F.col(on).alias("_mt"),  # matched-time carrier (for tolerance)
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by and c != on],
    )
    tagged_l = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[on].dataType).alias("_mt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        *[F.col(c) for c in lcols if c not in by and c != on],
    )
    unioned = tagged_r.unionByName(tagged_l)
    if backward:
        w = (
            Window.partitionBy(*by)
            .orderBy("_t", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy("_t", "_side")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    filled = unioned.select(
        "*",
        pick("_mt").alias("_f__mt"),
        *[pick(f"{c}{suffix}").alias(f"_f_{c}") for c in value_cols],
    )
    out_vals = [F.col(f"_f_{c}") for c in value_cols]
    if tolerance is not None:
        if isinstance(left.schema[on].dataType, TimestampType):
            delta_units = F.unix_micros(F.col("_t")) - F.unix_micros(F.col("_f__mt"))
            tol = int(tolerance * 1_000_000)
        else:
            delta_units = F.col("_t") - F.col("_f__mt")
            tol = tolerance
        delta = delta_units if backward else -delta_units
        ok = delta <= F.lit(tol)
        out_vals = [F.when(ok, v).otherwise(F.lit(None)) for v in out_vals]
    return filled.where(F.col("_side") == 1).select(
        *by,
        F.col("_t").alias(on),
        *[c for c in lcols if c not in by and c != on],
        *[v.alias(f"{c}{suffix}") for c, v in zip(value_cols, out_vals)],
    )


def scd2_intervals(
    updates: DataFrame,
    key_cols: tuple[str, ...] | list[str],
    time_col: str,
    attr_cols: tuple[str, ...] | list[str],
    tiebreak_cols: tuple[str, ...] | list[str] = (),
    change_only: bool = True,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 table from an update log
    (beyond-reference: the RELATIONAL analogue of the engine's per-
    content version timeline, ``core/data_structures.py:24`` — same
    "state valid over a half-open interval" model, over arbitrary keys
    and attribute columns instead of vectors).

    One row per state per key with ``[valid_from, valid_to)`` half-open
    validity (``valid_to`` NULL = current). ``change_only`` (default)
    compresses consecutive updates whose ``attr_cols`` are all unchanged
    — their validity folds into the earlier row, the classic SCD2 merge.

    Plan shape: ONE shuffle on ``key_cols`` shared by the lag-compare
    and the lead-close windows (same partitioning, Spark reuses the
    sort). No joins; linear in |updates|; skew-bound is rows-per-key,
    the same bound any per-key history store carries.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    order = [F.asc(time_col)] + [F.asc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    df = updates
    if change_only:
        # first row per key is ALWAYS a state birth — lag() yields NULL
        # there, which would null-safe-equal a genuinely-NULL first attr
        # and wrongly fold the birth row away
        changed = F.row_number().over(w) == 1
        for c in attrs:
            prev = F.lag(c).over(w)
            changed = changed | ~F.col(c).eqNullSafe(prev)
        df = df.withColumn("_chg", changed).where(F.col("_chg")).drop("_chg")
    # close each surviving state with the next survivor's start — same
    # (time, tiebreak) ordering as the change-compare window, so two
    # surviving updates sharing a timestamp close deterministically
    tb = list(tiebreak_cols)
    close_order = [F.asc("valid_from")] + [F.asc(c) for c in tb]
    return (
        df.select(
            *keys,
            F.col(time_col).alias("valid_from"),
            *[c for c in tb if c not in attrs],
            *attrs,
        )
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(Window.partitionBy(*keys).orderBy(*close_order)),
        )
        .select(*keys, "valid_from", "valid_to", *attrs)
    )


def scd2_snapshot(intervals: DataFrame, at) -> DataFrame:
    """Point-in-time snapshot of an SCD2 table: every key's state where
    ``valid_from <= at < valid_to`` (open current rows qualify via NULL
    ``valid_to``) — the relational twin of the engine's as-of resolve
    (O6). Pure filter: partition/zone-map prunable, no shuffle."""
    t = F.lit(at)
    return intervals.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def coalesce_intervals(
    df: DataFrame,
    key_cols: tuple[str, ...] | list[str],
    start_col: str,
    end_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Merge overlapping-or-touching intervals per key (SQL:2011
    temporal normalization / PostgreSQL ``range_agg``; beyond-reference
    interval algebra alongside :func:`scd2_intervals`).

    A new merged span begins where an interval's start exceeds the
    running maximum end of all earlier intervals (earlier in (start,
    end) order); ``start == prev_end`` touches and therefore merges
    (half-open convention). Output: one row per merged span with
    ``n_merged`` source intervals. ``weight_col`` makes ``n_merged`` a
    weight SUM instead of a row count — pass an already-coalesced span
    set's ``n_merged`` through it and incremental re-coalescing
    preserves exact source counts (coalescing is associative on span
    geometry; the weight keeps the count associative too — the property
    streaming coverage maintenance relies on).

    Plan shape: ONE key shuffle shared by the running-max window, the
    span-id running sum, and the final (key, span) aggregate — all three
    ride the same partitioning; cost is linear in |intervals|.
    """
    keys = list(key_cols)
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(F.asc(start_col), F.asc(end_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*keys)
        .orderBy(F.asc(start_col), F.asc(end_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_max_end = F.max(end_col).over(w_prev)
    is_new = (
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end)
    ).cast("int")
    n_agg = (
        F.count("*") if weight_col is None else F.sum(weight_col)
    ).cast("long").alias("n_merged")
    cols = [*keys, start_col, end_col] + ([weight_col] if weight_col else [])
    return (
        df.select(*cols)
        .withColumn("_span", F.sum(is_new).over(w_run))
        .groupBy(*keys, "_span")
        .agg(
            F.min(start_col).alias("span_start"),
            F.max(end_col).alias("span_end"),
            n_agg,
        )
        .drop("_span")
    )


def bitemporal_snapshot(
    updates: DataFrame,
    key_cols: tuple[str, ...] | list[str],
    valid_col: str,
    tx_col: str,
    attr_cols: tuple[str, ...] | list[str],
    at_tx,
    at_valid,
    tiebreak_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Bitemporal point query (SQL:2011 system+application time): the
    state EFFECTIVE at valid time ``at_valid``, as KNOWN at transaction
    time ``at_tx`` — i.e. late-arriving corrections with ``tx >
    at_tx`` are invisible, exactly reproducing what the system would
    have answered then.

    Composition: transaction-time visibility is a pure filter
    (``tx <= at_tx``), then the valid-time dimension is the ordinary
    SCD2 build + snapshot — so the bitemporal query inherits
    :func:`scd2_intervals`'s one-key-shuffle plan with a prunable
    filter in front. No interval×interval machinery is needed for
    point-in-both-dimensions lookups.
    """
    known = updates.where(F.col(tx_col) <= F.lit(at_tx))
    iv = scd2_intervals(
        known, key_cols=key_cols, time_col=valid_col, attr_cols=attr_cols,
        tiebreak_cols=tiebreak_cols,
    )
    return scd2_snapshot(iv, at_valid)


def scd2_intervals_cdc(
    updates: DataFrame,
    key_cols: tuple[str, ...] | list[str],
    time_col: str,
    attr_cols: tuple[str, ...] | list[str],
    op_col: str = "op",
    tiebreak_cols: tuple[str, ...] | list[str] = (),
    change_only: bool = True,
) -> DataFrame:
    """SCD2 from a CDC log WITH DELETES: rows whose ``op_col`` is
    ``'delete'`` close the key's current state — the key then has NO
    state until its next upsert, so snapshots inside the gap return
    nothing (classic CDC-mirror semantics; plain
    :func:`scd2_intervals` cannot express "known absent").

    Mechanics: deletes become tombstone states (attrs nulled, hidden
    ``_dead`` flag) so the ordinary change-compression closes and
    reopens intervals correctly (repeated deletes compress; an upsert
    after a delete is always a change); tombstone intervals are then
    dropped, leaving the gap. Same one-key-shuffle plan.
    """
    attrs = list(attr_cols)
    is_del = F.col(op_col) == "delete"
    tomb = updates.select(
        *key_cols,
        time_col,
        *tiebreak_cols,
        *[F.when(is_del, F.lit(None)).otherwise(F.col(c)).alias(c) for c in attrs],
        is_del.alias("_dead"),
    )
    iv = scd2_intervals(
        tomb,
        key_cols=key_cols,
        time_col=time_col,
        attr_cols=[*attrs, "_dead"],
        tiebreak_cols=tiebreak_cols,
        change_only=change_only,
    )
    return iv.where(~F.col("_dead")).drop("_dead")
