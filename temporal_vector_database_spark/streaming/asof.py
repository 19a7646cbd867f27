"""Stream-stream AS-OF join (beyond-reference extension).

The batch engine has a generic keyed as-of join (``operators/temporal.py``
— union-tag + ordered window). Structured Streaming cannot run unbounded
window functions, and a stream-stream interval join cannot express "the
LATEST right row ≤ left time" without a post-aggregation that append mode
disallows. The streaming-native shape is therefore a stateful operator:

- tag each side, union into ONE keyed stream, watermark the event time;
- ``applyInPandasWithState`` keyed by the join key buffers both sides and
  resolves a left row exactly when the watermark guarantees no
  earlier-or-equal right row can still arrive (``left.t < watermark``);
- state is compacted per batch: of the right rows at-or-before the
  watermark only the latest survives (it is the floor candidate for every
  future left row — future rows are ≥ watermark by definition).

Emission contract (inherent to watermark semantics, same as any append-
mode streaming aggregation): a left row is emitted only after the
watermark passes its event time, i.e. after a later batch raises the
watermark. Rows at the stream's current frontier stay buffered until more
data (or a sentinel heartbeat) advances it.

Semantics parity: inclusive ``right.t <= left.t`` (the reference's as-of
resolve is inclusive — ``core/data_structures.py:213-227``), ties between
multiple right rows at the same time resolved by latest arrival order,
lefts with no earlier right get NULLs — cross-checked against the batch
``asof_join`` in tests.

Scale posture: state per key = the un-resolved frontier only (compacted
every batch), partitioned by key across executors; one shuffle on the key,
exactly like the batch plan.

Restriction: passthrough/value columns must be atomic JSON-serializable
types (numbers, strings, booleans) — they cross the state boundary as a
JSON blob. The event-time column is carried as epoch microseconds.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("lefts_json", T.StringType()),
        T.StructField("rights_json", T.StringType()),
    ]
)


def _native(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    return v


def _asof_state_fn(on: str, left_cols: list[str], right_cols: list[str]):
    """Stateful handler over the tagged union stream of one key group."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            lefts_json, rights_json = state.get
            lefts = json.loads(lefts_json)
            rights = json.loads(rights_json)
        else:
            lefts, rights = [], []

        for pdf in pdfs:
            # NOT itertuples: it mangles the underscore-prefixed _t/_side
            for d in pdf.sort_values("_t").to_dict("records"):
                t_us = int(pd.Timestamp(d["_t"]).value // 1000)
                if d["_side"] == 1:
                    lefts.append([t_us, [_native(d[c]) for c in left_cols]])
                else:
                    rights.append([t_us, [_native(d[c]) for c in right_cols]])

        wm_us = state.getCurrentWatermarkMs() * 1000
        rights.sort(key=lambda r: r[0])
        resolved, pending = [], []
        for t_us, vals in lefts:
            if t_us < wm_us:
                # latest right with right.t <= left.t (inclusive as-of)
                match = None
                for rt, rv in rights:
                    if rt <= t_us:
                        match = rv
                    else:
                        break
                resolved.append(
                    [t_us, vals, match if match is not None else [None] * len(right_cols)]
                )
            else:
                pending.append([t_us, vals])
        # compact: of rights at-or-before the watermark keep only the latest
        # (floor candidate for every future left); keep all newer rights.
        floor = None
        kept = []
        for rt, rv in rights:
            if rt <= wm_us:
                floor = [rt, rv]
            else:
                kept.append([rt, rv])
        rights = ([floor] if floor is not None else []) + kept

        state.update((json.dumps(pending), json.dumps(rights)))
        if pending:
            # A group with no new input is only re-invoked via timeout —
            # wake up when the watermark passes the earliest pending left.
            earliest_ms = min(t for t, _ in pending) // 1000
            state.setTimeoutTimestamp(max(earliest_ms, wm_us // 1000 + 1))

        key_vals = list(key)
        out: dict[str, list] = {}
        resolved.sort(key=lambda r: r[0])
        out["_t"] = pd.to_datetime([r[0] for r in resolved], unit="us")
        for i, c in enumerate(left_cols):
            out[c] = [r[1][i] for r in resolved]
        for i, c in enumerate(right_cols):
            out[c] = [r[2][i] for r in resolved]
        for i, kc in enumerate(["_k%d" % n for n in range(len(key_vals))]):
            out[kc] = [key_vals[i]] * len(resolved)
        yield pd.DataFrame(out)

    return fn


def stream_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | tuple[str, ...],
    value_cols: list[str] | tuple[str, ...],
    suffix: str = "_asof",
    delay: str = "0 seconds",
) -> DataFrame:
    """Streaming counterpart of ``operators.temporal.asof_join``.

    ``left``/``right`` are STREAMING DataFrames sharing the ``by`` key
    columns and the ``on`` event-time column. For every left row, attaches
    the ``value_cols`` of the latest right row with ``right.on <= left.on``
    once the watermark (event-time minus ``delay``) passes the left row's
    time. Output columns: ``by + [on] + left passthrough + value_cols
    suffixed`` — the same surface as the batch join.
    """
    by = list(by)
    value_cols = list(value_cols)
    left_pass = [c for c in left.columns if c not in by and c != on]
    right_out = [f"{c}{suffix}" for c in value_cols]

    tagged_l = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_pass],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
    )
    tagged_r = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_pass],
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    unioned = tagged_l.unionByName(tagged_r).withWatermark("_t", delay)

    out_schema = T.StructType(
        [T.StructField("_t", T.TimestampType())]
        + [T.StructField(c, left.schema[c].dataType) for c in left_pass]
        + [
            T.StructField(f"{c}{suffix}", right.schema[c].dataType)
            for c in value_cols
        ]
        + [
            T.StructField("_k%d" % i, left.schema[c].dataType)
            for i, c in enumerate(by)
        ]
    )
    handled = unioned.groupBy(*by).applyInPandasWithState(
        _asof_state_fn(on, left_pass, right_out),
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return handled.select(
        *[F.col("_k%d" % i).alias(c) for i, c in enumerate(by)],
        F.col("_t").alias(on),
        *left_pass,
        *right_out,
    )
