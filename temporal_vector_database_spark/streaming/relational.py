"""Streaming relational operators (beyond-reference, SURVEY.md §7.5).

Stream-stream INTERVAL join and watermarked stream DEDUPLICATION — the
two remaining Structured Streaming surfaces a training-data pipeline
leans on (the as-of join lives in ``streaming/asof.py``; windowed
aggregation in ``streaming/analytics.py``).

Both builders produce plans that run unchanged on batch DataFrames
(watermarks attach only when ``isStreaming``), which is what the batch
parity tests rely on.

Scale posture: an interval join keys its state by the equi-join key and
evicts rows older than (watermark − interval) — state is bounded by the
per-key arrival rate × the interval width, independent of stream length.
Dedup state is one row per distinct key within the watermark horizon
(``dropDuplicatesWithinWatermark``), not per distinct key ever seen —
the difference between bounded and unbounded state at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    upper: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with the same ``key`` whose event
    time falls in ``[left.ts, left.ts + upper]``.

    Unlike the as-of join (latest single match), the interval join emits
    EVERY in-window match — e.g. all conversions attributable to an
    impression. For streaming inputs both sides must carry watermarks and
    the join condition must bound event time on both sides; that bound is
    what lets the state store evict.

    Output: left columns prefixed ``l_``, right columns prefixed ``r_``
    (both sides often share a schema — prefixing keeps the result usable
    without positional disambiguation).
    """
    if left.isStreaming:
        left = left.withWatermark(ts_col, watermark)
    if right.isStreaming:
        right = right.withWatermark(ts_col, watermark)
    lt = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    rt = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{ts_col}") >= F.col(f"l_{ts_col}"))
        & (F.col(f"r_{ts_col}") <= F.col(f"l_{ts_col}") + F.expr(f"INTERVAL {upper}"))
    )
    return lt.join(rt, cond, how)


def stream_deduplicate(
    events: DataFrame,
    key_cols: list[str] | tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Keep the first-arriving row per key.

    Streaming: ``dropDuplicatesWithinWatermark`` — duplicates arriving
    within the watermark horizon of the first occurrence are dropped and
    the key's state is evicted once the watermark passes it, so state
    stays bounded. (Plain ``dropDuplicates`` on a stream never evicts —
    unbounded state, the classic production foot-gun.)

    Batch: exact ``dropDuplicates`` over the key columns. For inputs
    whose duplicates all fall within the horizon the two agree on WHICH
    keys survive (any-row-per-key in batch vs first-arrival streaming;
    exact row parity additionally needs duplicate rows to be identical,
    which is the exact-duplicate case this operator exists for).
    """
    keys = list(key_cols)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
