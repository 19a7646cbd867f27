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
) -> DataFrame:
    """For every left row, attach the ``value_cols`` of the LATEST right row
    with the same ``by`` keys and ``right.on <= left.on`` (inclusive, like
    the reference's as-of resolve). Left rows with no earlier right row get
    NULLs.

    ``right`` should be deterministic per (by, on) — dedupe first if the
    event time is not unique (ties are otherwise order-dependent).
    """
    by = list(by)
    lcols = left.columns
    tagged_r = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),  # right sorts BEFORE left at equal time → inclusive
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by and c != on],
    )
    tagged_l = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        *[F.col(c) for c in lcols if c not in by and c != on],
    )
    unioned = tagged_r.unionByName(tagged_l)
    w = (
        Window.partitionBy(*by)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("_side") == 1).select(
        *by,
        F.col("_t").alias(on),
        *[c for c in lcols if c not in by and c != on],
        *[F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
