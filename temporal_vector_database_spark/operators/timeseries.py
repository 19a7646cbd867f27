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


def _bucket_expr(time_col: str, bucket_ms: int):
    """FLOOR-semantics bucket start: ``ts - pmod(ts, w)``. SQL ``div``
    truncates toward zero, so a negative (pre-1970) epoch-ms would get a
    bucket start GREATER than the event time; pmod is always
    non-negative, matching the floor bucketing used everywhere else
    (rollup, Python-side ``//``)."""
    w = F.lit(int(bucket_ms))
    t = F.col(time_col)
    return (t - F.pmod(t, w)).cast("long").alias("bucket_start_ms")


def _state_keys(
    state: DataFrame, key_cols: tuple[str, ...] | None, state_cols: tuple[str, ...]
) -> list[str]:
    """Resolve the key columns of a mergeable state table.

    Explicit ``key_cols`` are validated: they must exist in the frame
    and be DISJOINT from the reserved state column names (a user key
    column named ``high``/``n_events``/``_f``/… would otherwise be
    silently folded into the merge and corrupt it — raises instead).
    With ``key_cols=None`` the keys are inferred by excluding the state
    names, which is only safe when no key collides with them — pass
    them explicitly whenever the key schema is user-controlled."""
    if key_cols is not None:
        keys = list(key_cols)
        clash = sorted(set(keys) & set(state_cols))
        if clash:
            raise ValueError(
                f"key columns {clash} collide with reserved state column "
                f"names {sorted(state_cols)}; rename the key columns"
            )
        missing = [k for k in keys if k not in state.columns]
        if missing:
            raise ValueError(f"key columns {missing} not in state {state.columns}")
        return keys
    return [c for c in state.columns if c not in state_cols]


_OHLC_STATE_COLS = ("bucket_start_ms", "o", "c", "high", "low", "n_events")
_M4_STATE_COLS = ("bucket_start_ms", "_f", "_l", "_lo", "_hi", "n_events")


def ohlc_state(
    df: DataFrame,
    time_col: str,
    key_cols: tuple[str, ...],
    value_col: str,
    bucket_ms: int,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """MERGEABLE OHLC partial state per (keys, bucket): the open/close
    endpoints are ``min/max(struct(time, tiebreaks…, value))`` — the
    lexicographic struct extremum carries its value with it, which makes
    every state column an associative aggregate (min/max/sum). That buys
    two things windows cannot: map-side partial aggregation (no sort, no
    per-bucket row ranking), and incremental maintenance — a batch's
    state folds into an existing table by re-aggregating STATE rows only
    (:func:`ohlc_merge`), the continuous-aggregate discipline of
    ``operators/rollup.py``.

    Deterministic because (time, tiebreaks) is unique per event; the
    value field never decides the extremum."""
    keys = list(key_cols)
    bucket = _bucket_expr(time_col, bucket_ms)
    base = df.select(*keys, bucket, F.col(time_col).alias("_t"),
                     *[F.col(c) for c in tiebreak_cols],
                     F.col(value_col).alias("_v"))
    s = F.struct(
        F.col("_t").alias("t"),
        *[F.col(c).alias(f"tb{i}") for i, c in enumerate(tiebreak_cols)],
        F.col("_v").alias("v"),
    )
    return base.groupBy(*keys, "bucket_start_ms").agg(
        F.min(s).alias("o"),
        F.max(s).alias("c"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        F.count("*").cast("long").alias("n_events"),
    )


def ohlc_merge(
    state: DataFrame,
    new_state: DataFrame,
    key_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Fold freshly-aggregated partial state into an existing OHLC
    table — union + re-aggregate over STATE rows; history is never
    rescanned. Exactness vs a full rebuild is pinned in tests. Pass
    ``key_cols`` explicitly when the key schema is user-controlled
    (see :func:`_state_keys` — a key named like a state column raises
    instead of silently corrupting the merge)."""
    keys = _state_keys(state, key_cols, _OHLC_STATE_COLS)
    return state.unionByName(new_state).groupBy(*keys, "bucket_start_ms").agg(
        F.min("o").alias("o"),
        F.max("c").alias("c"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.sum("n_events").cast("long").alias("n_events"),
    )


def ohlc_report(
    state: DataFrame, key_cols: tuple[str, ...] | None = None
) -> DataFrame:
    """Read-side projection of the mergeable state into bars."""
    keys = _state_keys(state, key_cols, _OHLC_STATE_COLS)
    return state.select(
        *keys,
        "bucket_start_ms",
        F.col("o").getField("v").alias("open"),
        "high",
        "low",
        F.col("c").getField("v").alias("close"),
        "n_events",
    )


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

    Implemented as :func:`ohlc_report` over :func:`ohlc_state` — a pure
    associative aggregation: ONE exchange, map-side combined, no window
    sort anywhere.
    """
    return ohlc_report(
        ohlc_state(df, time_col, key_cols, value_col, bucket_ms, tiebreak_cols)
    )


def resample_locf_from_state(
    state: DataFrame,
    bucket_ms: int,
    lo_ms: int,
    hi_ms: int,
    key_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Gap-filled LOCF serving from MAINTAINED OHLC state instead of the
    raw event table: the per-bucket closing observation is exactly the
    state's ``c`` (close) endpoint, so a continuously-maintained state
    table (``ohlc_merge`` / ``streaming/ohlc.py``) answers gap-fill
    queries without ever rescanning events — cost is |keys| x n_buckets,
    independent of history. Equals :func:`resample_locf` over the raw
    events the state was built from (pinned in tests)."""
    keys = _state_keys(state, key_cols, _OHLC_STATE_COLS)
    lo_b = (int(lo_ms) // int(bucket_ms)) * int(bucket_ms)
    hi_b = (int(hi_ms) // int(bucket_ms)) * int(bucket_ms)
    grid = (
        state.select(*keys)
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
    close = state.select(
        *keys, "bucket_start_ms", F.col("c").getField("v").alias("_close")
    )
    return _locf_fill(grid, close, keys, lo_b)


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
    at-or-before the bucket's end — including observations BEFORE the
    grid, which seed the leading buckets (NULL only when the key has no
    observation at all before the bucket). ``is_observed`` marks buckets
    with a real event. TimescaleDB's ``time_bucket_gapfill + locf``, as
    a composition of explode + two keyed windows.

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
    bucket = _bucket_expr(time_col, bucket_ms)
    rorder = [F.desc(time_col)] + [F.desc(c) for c in tiebreak_cols]
    w_c = Window.partitionBy(*keys, "bucket_start_ms").orderBy(*rorder)
    close = (
        df.select(*keys, bucket, F.col(time_col), *[F.col(c) for c in tiebreak_cols],
                  F.col(value_col).alias("_v"))
        .withColumn("_rnc", F.row_number().over(w_c))
        .where(F.col("_rnc") == 1)
        .select(*keys, "bucket_start_ms", F.col("_v").alias("_close"))
    )
    return _locf_fill(grid, close, keys, lo_b)


def _locf_fill(
    grid: DataFrame, close: DataFrame, keys: list, lo_b: int
) -> DataFrame:
    """Join per-bucket closes onto the grid and carry them forward.

    Closes from buckets BEFORE the grid (``< lo_b``) are not dropped:
    each key's latest pre-window close seeds the fill, so a leading grid
    bucket carries the key's last observation at-or-before its end even
    when that observation predates the window (the docstring contract;
    previously those buckets were NULL)."""
    w_fill = (
        Window.partitionBy(*keys)
        .orderBy("bucket_start_ms")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_seed = Window.partitionBy(*keys).orderBy(F.desc("bucket_start_ms"))
    seed = (
        close.where(F.col("bucket_start_ms") < F.lit(int(lo_b)))
        .withColumn("_rns", F.row_number().over(w_seed))
        .where(F.col("_rns") == 1)
        .select(*keys, F.col("_close").alias("_seed"))
    )
    inwin = close.where(F.col("bucket_start_ms") >= F.lit(int(lo_b)))
    return (
        grid.join(inwin, [*keys, "bucket_start_ms"], "left")
        .join(seed, keys, "left")
        .withColumn(
            "value",
            F.coalesce(
                F.last("_close", ignorenulls=True).over(w_fill), F.col("_seed")
            ),
        )
        .withColumn("is_observed", F.col("_close").isNotNull())
        .select(*keys, "bucket_start_ms", "value", "is_observed")
    )


def rolling_count_anomaly(
    df: DataFrame,
    time_col: str,
    key_cols: tuple,
    bucket_ms: int,
    window_buckets: int = 7,
    z_int: int = 3,
) -> DataFrame:
    """Trailing-window volume-anomaly detection over time buckets: per
    (key, bucket), flag buckets whose event count deviates from the
    trailing ``window_buckets``-bucket mean by more than ``z_int``
    population standard deviations.

    The baseline window is the key's PRIOR ``window_buckets`` observed
    buckets (ROWS frame, current bucket EXCLUDED — a spike must not
    inflate its own baseline mean/σ, or a 10× burst can mask itself);
    empty buckets do not contribute zeros; a bucket is only judged once
    its baseline is full (``win_n == window_buckets``), so series heads
    are never flagged.

    Exactness: counts, window sums, and sums of squares are integers;
    the test |x − μ| > z·σ is evaluated in cleared-denominator integer
    form, (x·w − s1)² > z²·(w·s2 − s1²), so there is no float anywhere
    — every published column is a BIGINT or BOOLEAN and the result is
    bit-identical across engines and partition orders. (``z_int`` is
    integer by contract for exactly this reason.)

    100 TB posture: one (key, bucket) hash aggregate (map-side
    combinable) shrinks the stream to bucket grain, then ONE bounded
    ROWS window over that tiny table, partitioned by key — the window
    never sees raw events. Hypertable-style continuous-aggregate
    semantics: the (key, bucket) counts are mergeable state, so the
    report can be served from maintained rollup state instead of raw
    events (the ohlc_state/rollup discipline).
    """
    keys = list(key_cols)
    counts = df.groupBy(
        *keys, _bucket_expr(time_col, bucket_ms)
    ).agg(F.count("*").cast("long").alias("n_events"))
    return anomaly_from_counts(counts, key_cols, window_buckets, z_int)


def anomaly_from_counts(
    counts: DataFrame,
    key_cols: tuple,
    window_buckets: int = 7,
    z_int: int = 3,
) -> DataFrame:
    """The report half of :func:`rolling_count_anomaly`, applied to an
    already-materialized (key, bucket, n_events) table — e.g. the
    MAINTAINED continuous-aggregate state of ``streaming/ohlc.py``
    (``ohlc_state``'s n_events column) — so anomaly serving never
    rescans raw events: refresh cost is the window over the bucket-grain
    state only (see :func:`rolling_count_anomaly_from_state`)."""
    keys = list(key_cols)
    w = int(window_buckets)
    z2 = int(z_int) * int(z_int)
    frame = (
        Window.partitionBy(*keys)
        .orderBy("bucket_start_ms")
        .rowsBetween(-w, -1)
    )
    x = F.col("n_events")
    s1 = F.coalesce(F.sum("n_events").over(frame), F.lit(0)).cast("long")
    s2 = F.coalesce(F.sum(x * x).over(frame), F.lit(0)).cast("long")
    wn = F.count("n_events").over(frame).cast("long")
    out = counts.select(
        *keys,
        "bucket_start_ms",
        x.alias("n_events"),
        wn.alias("win_n"),
        s1.alias("win_sum"),
        s2.alias("win_sumsq"),
    )
    dev = F.col("n_events") * F.col("win_n") - F.col("win_sum")
    var_num = (
        F.col("win_n") * F.col("win_sumsq")
        - F.col("win_sum") * F.col("win_sum")
    )
    return out.withColumn(
        "is_anomaly",
        (F.col("win_n") == w) & (dev * dev > F.lit(z2) * var_num),
    )


def rolling_count_anomaly_from_state(
    state: DataFrame,
    window_buckets: int = 7,
    z_int: int = 3,
) -> DataFrame:
    """Anomaly report served from maintained OHLC state
    (:func:`ohlc_state` / ``streaming/ohlc.py``): the state already
    carries exact per-(key, bucket) ``n_events``, so the detector is a
    pure read-side window over bucket-grain rows — identical output to
    :func:`rolling_count_anomaly` on the raw events (pinned in tests),
    at refresh cost proportional to the state, not the stream."""
    keys = [c for c in state.columns
            if c not in ("bucket_start_ms", "o", "c", "high", "low", "n_events")]
    return anomaly_from_counts(
        state.select(*keys, "bucket_start_ms", "n_events"),
        tuple(keys),
        window_buckets,
        z_int,
    )


def rolling_distinct_counts(
    df: DataFrame,
    time_col: str,
    key_cols: tuple,
    entity_col: str,
    bucket_ms: int,
    window_buckets: int = 7,
) -> DataFrame:
    """EXACT trailing-window distinct-entity counts per (key, bucket) —
    "rolling 7-day active users": for every OBSERVED (key, bucket),
    the number of distinct entities seen in the trailing
    ``window_buckets`` buckets (current inclusive).

    SQL windows cannot express this (``count(DISTINCT) OVER frame`` is
    unsupported in both Spark and ANSI), and summing per-bucket distinct
    counts overcounts repeat entities. The distributed-exact shape:

    1. dedup to (key, bucket, entity) grain — ONE aggregate that
       collapses the raw stream (the only pass over events);
    2. each grain row CONTRIBUTES to the ``window_buckets`` target
       buckets it is visible from — a bounded ``explode`` (×W fan-out
       of the already-deduped grain, not of raw events);
    3. semi-join to observed (key, bucket) targets, then an exact
       ``count(DISTINCT)`` keyed by (key, target bucket).

    All shuffles are keyed by (key, bucket[, entity]) — uniform at any
    scale; fan-out is W× the GRAIN table (entities per bucket), never
    W× the event count. Published columns are all BIGINT.
    """
    keys = list(key_cols)
    w = int(window_buckets)
    grain = (
        df.select(*keys, _bucket_expr(time_col, bucket_ms),
                  F.col(entity_col).alias("_ent"))
        .distinct()
    )
    observed = grain.select(*keys, "bucket_start_ms").distinct()
    contrib = grain.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("bucket_start_ms"),
                F.col("bucket_start_ms") + F.lit((w - 1) * int(bucket_ms)),
                F.lit(int(bucket_ms)),
            )
        ).alias("bucket_start_ms"),
        "_ent",
    )
    return (
        contrib.join(observed, [*keys, "bucket_start_ms"], "left_semi")
        .groupBy(*keys, "bucket_start_ms")
        .agg(F.countDistinct("_ent").cast("long").alias("n_distinct"))
    )


def time_weighted_average(
    df: DataFrame,
    time_col: str,
    key_cols: tuple,
    value_col: str,
    bucket_ms: int,
    tiebreak_cols: tuple = (),
    value_scale: int = 1000,
) -> DataFrame:
    """Per-(key, bucket) time-weighted average under LOCF semantics —
    TimescaleDB's ``time_weight('locf', ...)`` hyperfunction for
    irregularly sampled series, where a plain ``avg`` over-weights
    burst periods: each observation holds until the next one in the
    bucket (the last holds to bucket end), and the average weights
    values by held duration over the OBSERVED span
    ``[first_ts, bucket_end)``. Buckets are independent (weighting
    resets at the boundary), which is what makes the aggregate
    bucket-local and incremental-friendly.

    Exactness: values quantize to integer ``1/value_scale`` units
    (the ``events_outliers`` discipline) and durations are integer ms,
    so the numerator Σ v·d and denominator are exact BIGINTs —
    published alongside the single final division, the only float.
    Bound: |num| ≤ max|v|·scale · bucket_ms per key-bucket
    (~8.6e13 at milli-units × day buckets per held segment; the bigint
    path holds to ~10^5 segments per bucket at this range — beyond
    that, widen to decimal).

    Plan: ONE exchange keyed by (key, bucket) shared by the ordering
    window and the aggregate; ties on the timestamp break by
    ``tiebreak_cols`` (duplicate timestamps hold for 0 ms except the
    last, matching the OHLC close tiebreak).
    """
    keys = list(key_cols)
    scale = int(value_scale)
    base = df.select(
        *keys,
        _bucket_expr(time_col, bucket_ms),
        F.col(time_col).cast("long").alias("_t"),
        *[F.col(c) for c in tiebreak_cols],
        F.round(F.col(value_col) * float(scale), 0).cast("long").alias("_v"),
    )
    order = [F.asc("_t")] + [F.asc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*keys, "bucket_start_ms").orderBy(*order)
    bucket_end = F.col("bucket_start_ms") + F.lit(int(bucket_ms))
    seg = base.withColumn(
        "_d", F.coalesce(F.lead("_t").over(w), bucket_end) - F.col("_t")
    )
    out = seg.groupBy(*keys, "bucket_start_ms").agg(
        F.sum(F.col("_v") * F.col("_d")).cast("long").alias("twa_num"),
        (F.lit(int(bucket_ms)) + F.col("bucket_start_ms") - F.min("_t"))
        .cast("long")
        .alias("twa_den"),
        F.count("*").cast("long").alias("n_events"),
    )
    return out.withColumn(
        "twa",
        F.col("twa_num").cast("double")
        / (F.col("twa_den").cast("double") * float(scale)),
    )


def rolling_distinct_estimate(
    df: DataFrame,
    time_col: str,
    key_cols: tuple,
    entity_col: str,
    bucket_ms: int,
    window_buckets: int = 7,
    lg_k: int = 14,
) -> DataFrame:
    """Sketch-path twin of :func:`rolling_distinct_counts` for LONG
    windows: per-(key, bucket) HLL sketches (Datasketches
    ``hll_sketch_agg``) are built ONCE from raw events, then the
    trailing window unions W SKETCHES per target bucket
    (``hll_union_agg``) — fan-out is W × (key, bucket) rows of
    ~2^lg_k-byte state, independent of entity cardinality, where the
    exact path explodes W × |grain| entity rows. The crossover is why
    hypertables keep distinct-count sketches as bucket state: a 90-day
    window over billions of entities unions 90 sketches per key.

    The estimate is within the standard HLL error (~1.04/sqrt(2^lg_k)
    per sketch; unions do not compound it beyond the sketch bound), and
    the sketches are mergeable state — maintainable incrementally by
    the streaming OHLC/rollup discipline.
    """
    keys = list(key_cols)
    w = int(window_buckets)
    per_bucket = df.groupBy(
        *keys, _bucket_expr(time_col, bucket_ms)
    ).agg(F.hll_sketch_agg(F.col(entity_col), F.lit(int(lg_k))).alias("_sk"))
    observed = per_bucket.select(*keys, "bucket_start_ms")
    contrib = per_bucket.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("bucket_start_ms"),
                F.col("bucket_start_ms") + F.lit((w - 1) * int(bucket_ms)),
                F.lit(int(bucket_ms)),
            )
        ).alias("bucket_start_ms"),
        "_sk",
    )
    return (
        contrib.join(observed, [*keys, "bucket_start_ms"], "left_semi")
        .groupBy(*keys, "bucket_start_ms")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col("_sk"), F.lit(True))
            ).alias("n_distinct_est")
        )
    )


def m4_downsample(
    df: DataFrame,
    time_col: str,
    key_cols: tuple,
    value_col: str,
    bucket_ms: int,
    tiebreak_cols: tuple = (),
) -> DataFrame:
    """M4 visualization-preserving downsample (Jugel et al., VLDB 2014):
    per (key, pixel-bucket), the four extremum points — first, last,
    value-min, value-max — which are exactly the points a line renderer
    needs for a pixel-perfect plot of the full series at that width.

    Unlike LTTB (whose anchor depends on the previously selected point,
    an inherently sequential recurrence), M4 is a pure associative
    aggregate: every output column is a min/max of a struct, so the
    state is mergeable (map-side combine, incremental maintenance by
    the :func:`ohlc_merge` discipline) and the plan is ONE exchange.

    Determinism: first/last tie-break on ``tiebreak_cols`` after the
    timestamp (the OHLC open/close rule); argmin/argmax of the value
    tie-break toward the EARLIEST/LATEST (t, tiebreaks) respectively via
    lexicographic struct ordering. No arithmetic on values anywhere —
    every published number is a raw input value, exact in any engine.

    Beyond-reference breadth: the reference has no time-series surface;
    its closest analogue is per-version timeline listing
    (``core/data_structures.py``).
    """
    return m4_report(
        m4_state(df, time_col, key_cols, value_col, bucket_ms, tiebreak_cols)
    )


def m4_state(
    df: DataFrame,
    time_col: str,
    key_cols: tuple,
    value_col: str,
    bucket_ms: int,
    tiebreak_cols: tuple = (),
) -> DataFrame:
    """MERGEABLE M4 partial state — the four extremum structs plus the
    count, every column an associative min/max/sum (the ``ohlc_state``
    discipline): fold fresh batches with :func:`m4_merge`, project with
    :func:`m4_report`."""
    keys = list(key_cols)
    base = df.select(
        *keys,
        _bucket_expr(time_col, bucket_ms),
        F.col(time_col).cast("long").alias("_t"),
        *[F.col(c) for c in tiebreak_cols],
        F.col(value_col).alias("_v"),
    )
    tbs = [F.col(c).alias(f"tb{i}") for i, c in enumerate(tiebreak_cols)]
    by_time = F.struct(F.col("_t").alias("t"), *tbs, F.col("_v").alias("v"))
    by_value = F.struct(F.col("_v").alias("v"), F.col("_t").alias("t"), *tbs)
    return base.groupBy(*keys, "bucket_start_ms").agg(
        F.min(by_time).alias("_f"),
        F.max(by_time).alias("_l"),
        F.min(by_value).alias("_lo"),
        F.max(by_value).alias("_hi"),
        F.count("*").cast("long").alias("n_events"),
    )


def m4_merge(
    state: DataFrame,
    new_state: DataFrame,
    key_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Fold fresh partial state into an existing M4 table — union +
    re-aggregate over STATE rows only; exactness vs full rebuild is
    pinned in tests (late points re-open their pixel). Pass ``key_cols``
    explicitly for user-controlled key schemas (see :func:`_state_keys`)."""
    keys = _state_keys(state, key_cols, _M4_STATE_COLS)
    return state.unionByName(new_state).groupBy(*keys, "bucket_start_ms").agg(
        F.min("_f").alias("_f"),
        F.max("_l").alias("_l"),
        F.min("_lo").alias("_lo"),
        F.max("_hi").alias("_hi"),
        F.sum("n_events").cast("long").alias("n_events"),
    )


def m4_report(state: DataFrame, key_cols: tuple[str, ...] | None = None) -> DataFrame:
    """Read-side projection of M4 state into the four plot points."""
    keys = _state_keys(state, key_cols, _M4_STATE_COLS)
    return state.select(
        *keys,
        "bucket_start_ms",
        F.col("_f").getField("t").alias("t_first"),
        F.col("_f").getField("v").alias("v_first"),
        F.col("_l").getField("t").alias("t_last"),
        F.col("_l").getField("v").alias("v_last"),
        F.col("_lo").getField("t").alias("t_min"),
        F.col("_lo").getField("v").alias("v_min"),
        F.col("_hi").getField("t").alias("t_max"),
        F.col("_hi").getField("v").alias("v_max"),
        "n_events",
    )


def counter_agg(
    df: DataFrame,
    time_col: str,
    key_cols: tuple,
    value_col: str,
    bucket_ms: int,
    tiebreak_cols: tuple = (),
    value_scale: int = 1000,
    carry: DataFrame | None = None,
) -> DataFrame:
    """Monotone-counter aggregation with reset detection — the
    Prometheus ``increase``/``rate`` and TimescaleDB ``counter_agg``
    semantics for cumulative metrics that restart from zero on process
    restarts: per key, consecutive-sample deltas are summed when
    non-negative; a negative delta is a RESET, and the counter is
    assumed to have restarted at 0 and climbed to the current sample,
    so the full current value is the contribution.

    Each delta is attributed to the bucket of its CURRENT sample; the
    first sample of a key contributes nothing (there is no prior
    observation to diff against — Prometheus behaves identically).
    Resets are detected across bucket boundaries, not just within
    buckets, so per-bucket increases sum to the whole-series increase.

    Exactness: values quantize to integer ``1/value_scale`` units so
    the per-bucket increase is an exact BIGINT sum; the published
    ``rate_per_sec`` is one division of that exact integer by the
    constant bucket duration (a single correctly-rounded IEEE op).

    Plan: ONE exchange — the lag window shuffles by key, and the
    (key, bucket) aggregation is satisfied by the same partitioning
    (subset-cluster co-partitioning).

    ``carry`` (the streaming seam): an optional per-key LAST-SAMPLE
    table in the quantized state schema (keys…, ``_t``, tiebreaks…,
    ``_v``) from which the first in-batch delta of each key is seeded —
    carried rows act only as lag sources and are excluded from every
    aggregate (``streaming/counter.py``). Requires per-key event-time
    monotonicity across batches, the module's streaming-arrival
    contract.
    """
    keys = list(key_cols)
    scale = int(value_scale)
    base = df.select(
        *keys,
        _bucket_expr(time_col, bucket_ms),
        F.col(time_col).cast("long").alias("_t"),
        *[F.col(c) for c in tiebreak_cols],
        F.round(F.col(value_col) * float(scale), 0).cast("long").alias("_v"),
    ).withColumn("_carried", F.lit(False))
    if carry is not None:
        seed = carry.select(
            *keys,
            (F.col("_t") - F.pmod(F.col("_t"), F.lit(int(bucket_ms))))
            .cast("long")
            .alias("bucket_start_ms"),
            "_t",
            *[F.col(c) for c in tiebreak_cols],
            "_v",
        ).withColumn("_carried", F.lit(True))
        base = base.unionByName(seed)
    order = [F.asc("_t")] + [F.asc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    d = base.withColumn("_prev", F.lag("_v").over(w))
    d = d.where(~F.col("_carried"))
    d = d.withColumn(
        "_contrib",
        F.when(F.col("_prev").isNull(), F.lit(None).cast("long"))
        .when(F.col("_v") >= F.col("_prev"), F.col("_v") - F.col("_prev"))
        .otherwise(F.col("_v")),
    ).withColumn(
        "_reset",
        (F.col("_prev").isNotNull() & (F.col("_v") < F.col("_prev"))).cast("long"),
    )
    out = d.groupBy(*keys, "bucket_start_ms").agg(
        F.coalesce(F.sum("_contrib"), F.lit(0)).cast("long").alias("increase_units"),
        F.sum("_reset").cast("long").alias("n_resets"),
        F.count("*").cast("long").alias("n_samples"),
    )
    return out.withColumn(
        "rate_per_sec",
        F.col("increase_units").cast("double")
        / (float(scale) * (int(bucket_ms) / 1000.0)),
    )


def series_correlation(
    df: DataFrame,
    time_col: str,
    series_col: str,
    value_col: str,
    bucket_ms: int,
    value_scale: int = 1,
) -> DataFrame:
    """Pairwise Pearson correlation BETWEEN series ("do logins and
    purchases move together day to day?"): each series is reduced to
    its per-bucket value sum, pairs align on their COMMON buckets, and
    the correlation comes from exact integer moments.

    Exactness discipline: per-bucket sums are BIGINTs in
    ``1/value_scale`` units, the five pair moments (Σx, Σy, Σxy, Σx²,
    Σy²) are exact BIGINT sums, and the published ``corr`` is composed
    ONLY of IEEE-correctly-rounded ops (int→double conversions below
    2^53, two sqrts, multiply, divide) in a fixed expression shape — so
    it is bit-identical in any engine, unlike a libm-based formula
    (``corr()`` built-ins differ across engines in summation order).
    Zero-variance series publish NULL. Overflow headroom: |Σxy| must
    stay under 2^53 for the exactness argument; with whole-unit
    quantization (scale=1) that holds to per-bucket sums of ~3e7 across
    ~1e4 common buckets — rescale ``value_scale`` down for hotter
    series.

    Plan: one (series, bucket) aggregation over raw events; the pair
    join runs over the REDUCED per-bucket table (|series|·|buckets|
    rows, broadcast-joined on bucket), so the quadratic term is in the
    number of SERIES, never events — the standard correlation-matrix
    shape. For very large series counts, block the pair space.
    """
    scale = int(value_scale)
    per = df.groupBy(
        F.col(series_col).alias("s"), _bucket_expr(time_col, bucket_ms)
    ).agg(
        F.sum(F.round(F.col(value_col) * float(scale), 0).cast("long"))
        .cast("long")
        .alias("x")
    )
    a = per.select(
        F.col("s").alias("series_a"), "bucket_start_ms", F.col("x").alias("xa")
    )
    b = per.select(
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
    num = (F.col("n_buckets") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    va = (F.col("n_buckets") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vb = (F.col("n_buckets") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.withColumn(
        "corr",
        F.when(
            (va > 0) & (vb > 0), num / (F.sqrt(va) * F.sqrt(vb))
        ).otherwise(F.lit(None).cast("double")),
    )


def series_acf(
    df: DataFrame,
    time_col: str,
    series_col: str,
    value_col: str,
    bucket_ms: int,
    max_lag: int = 3,
    value_scale: int = 1,
) -> DataFrame:
    """Per-series AUTOCORRELATION at bucket lags 1..max_lag ("does
    today's volume predict tomorrow's?" — the seasonality/memory
    diagnostic that :func:`series_correlation` answers across series
    and this answers within one): each series reduces to per-bucket
    value sums, and for each lag the Pearson correlation of
    ``(x_t, x_{t+lag})`` is computed over exact integer moments.

    Gap semantics: pairs require BOTH buckets observed (sample ACF over
    observed pairs, each lag scored on its own pair set) — no implicit
    zero-fill, which would manufacture correlation out of sparsity;
    gap-fill first with :func:`resample_locf` if the zero-filled
    contract is wanted. Same exactness discipline as
    :func:`series_correlation`: BIGINT moments, one fixed IEEE
    expression for the published double, NULL on zero variance.

    Plan: one (series, bucket) aggregate over raw events; lag pairs
    come from ONE equi-join of the reduced per-bucket table against
    itself on ``(series, bucket_index + lag)`` with the small lag list
    exploded on the probe side — cost ∝ |series|·|buckets|·max_lag,
    never events. Output: ``(series, lag, n_pairs, sx, sy, sxy, sxx,
    syy, acf)``.
    """
    if not (1 <= int(max_lag) <= 64):
        raise ValueError(f"max_lag must be in 1..64, got {max_lag}")
    scale = int(value_scale)
    per = df.groupBy(
        F.col(series_col).alias("s"), _bucket_expr(time_col, bucket_ms)
    ).agg(
        F.sum(F.round(F.col(value_col) * float(scale), 0).cast("long"))
        .cast("long")
        .alias("x")
    )
    return acf_from_per_bucket(per, bucket_ms, max_lag)


def acf_from_per_bucket(
    per: DataFrame, bucket_ms: int, max_lag: int = 3
) -> DataFrame:
    """ACF core over an already-reduced ``(s, bucket_start_ms, x)``
    table — shared by :func:`series_acf` (one-shot) and the streaming
    twin (``streaming/correlation.acf_from_state``), which serves it
    from the additively-maintained per-bucket state: same input table
    ⟹ bit-identical output."""
    per = per.select("s", "bucket_start_ms", "x").withColumn(
        # bucket_start_ms is an exact multiple of bucket_ms, so integer
        # div is exact (incl. negative buckets)
        "tb",
        F.expr(f"bucket_start_ms div {int(bucket_ms)}"),
    )
    probe = per.select(
        "s",
        "tb",
        F.col("x").alias("xa"),
        F.explode(
            F.array(*[F.lit(k) for k in range(1, int(max_lag) + 1)])
        ).alias("lag"),
    ).withColumn("tb2", F.col("tb") + F.col("lag"))
    lagged = per.select("s", F.col("tb").alias("tb2"), F.col("x").alias("xb"))
    pairs = probe.join(lagged, ["s", "tb2"])
    m = pairs.groupBy(F.col("s").alias("series"), "lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("xa").cast("long").alias("sx"),
        F.sum("xb").cast("long").alias("sy"),
        F.sum(F.col("xa") * F.col("xb")).cast("long").alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).cast("long").alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).cast("long").alias("syy"),
    )
    num = (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    va = (F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vb = (F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.withColumn(
        "acf",
        F.when(
            (va > 0) & (vb > 0), num / (F.sqrt(va) * F.sqrt(vb))
        ).otherwise(F.lit(None).cast("double")),
    )


def seasonal_profile(
    df: DataFrame,
    time_col: str,
    key_cols: tuple,
    value_col: str,
    period_buckets: int = 7,
    bucket_ms: int = 86_400_000,
    value_scale: int = 1000,
) -> DataFrame:
    """Seasonal index per (key, phase): how each phase of a cycle (day
    of week by default) compares to the key's overall mean — the
    multiplicative seasonal profile behind dashboard "vs typical
    Monday" baselines and seasonality-adjusted anomaly gates.

    ``phase = pmod(epoch_bucket, period_buckets)`` — pure integer
    TZ-free math (with day buckets and period 7, phase 4 = Thursday,
    since epoch day 0 was a Thursday; no calendar function anywhere).

    index = phase_mean / overall_mean, published as the exact integer
    cross-products ``idx_num = phase_sum·n_total`` and
    ``idx_den = n_phase·total_sum`` plus their single IEEE division —
    deterministic cross-engine (operands stay below 2^53 for per-key
    sums up to ~3e9 milli-units × 1e6 events; rescale for more).

    Plan: one (key, phase) aggregation + a key-level rollup broadcast
    back — two bounded exchanges, no windows.
    """
    keys = list(key_cols)
    scale = int(value_scale)
    base = df.select(
        *keys,
        F.pmod(
            (F.col(time_col) - F.pmod(F.col(time_col), F.lit(int(bucket_ms))))
            / F.lit(int(bucket_ms)),
            F.lit(int(period_buckets)),
        )
        .cast("int")
        .alias("phase"),
        F.round(F.col(value_col) * float(scale), 0).cast("long").alias("_v"),
    )
    per_phase = base.groupBy(*keys, "phase").agg(
        F.sum("_v").cast("long").alias("phase_sum"),
        F.count("*").cast("long").alias("n_phase"),
    )
    totals = per_phase.groupBy(*keys).agg(
        F.sum("phase_sum").cast("long").alias("total_sum"),
        F.sum("n_phase").cast("long").alias("n_total"),
    )
    # per-key totals are unbounded-cardinality — no broadcast hint (AQE
    # decides; the co-partitioned equi-join is safe at any key count)
    out = per_phase.join(totals, keys).select(
        *keys,
        "phase",
        "phase_sum",
        "n_phase",
        (F.col("phase_sum") * F.col("n_total")).cast("long").alias("idx_num"),
        (F.col("n_phase") * F.col("total_sum")).cast("long").alias("idx_den"),
    )
    return out.withColumn(
        "seasonal_index",
        F.when(
            F.col("idx_den") != 0,
            F.col("idx_num").cast("double") / F.col("idx_den").cast("double"),
        ).otherwise(F.lit(None).cast("double")),
    )


def series_trend(
    df: DataFrame,
    time_col: str,
    key_cols: tuple,
    value_col: str,
    bucket_ms: int = 86_400_000,
    value_scale: int = 1000,
) -> DataFrame:
    """Per-key least-squares trend (slope/intercept) of the bucketed
    value series — "is this metric drifting up?" without a timeseries
    library: slope = (nΣtv − ΣtΣv) / (nΣt² − (Σt)²) over per-bucket
    value sums, with t re-based to bucket INDEX (0, 1, 2, …, via the
    key's min bucket) so the integer moments stay far below 2^53.

    Moments are exact BIGINTs; slope and intercept are each one
    IEEE-correctly-rounded division of exact integer cross-terms —
    deterministic cross-engine (the `series_correlation` discipline).
    Keys with < 2 buckets (or zero time variance) publish NULLs.

    Plan: one (key, bucket) aggregation; a key-level min-bucket rollup
    equi-joined back (AQE broadcasts it when small — no hint, since the
    rollup is one row per key and key cardinality is unbounded); one
    final key aggregation. No windows.
    """
    keys = list(key_cols)
    scale = int(value_scale)
    per = df.groupBy(*keys, _bucket_expr(time_col, bucket_ms)).agg(
        F.sum(F.round(F.col(value_col) * float(scale), 0).cast("long"))
        .cast("long")
        .alias("v")
    )
    base = per.groupBy(*keys).agg(F.min("bucket_start_ms").alias("b0"))
    # one row per key — unbounded cardinality, so no broadcast hint
    idx = per.join(base, keys).select(
        *keys,
        ((F.col("bucket_start_ms") - F.col("b0")) / F.lit(int(bucket_ms)))
        .cast("long")
        .alias("t"),
        "v",
    )
    m = idx.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("t") * F.col("v")).cast("long").alias("stv"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
    )
    den = (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast("double")
    slope = F.when(
        den > 0,
        (F.col("n") * F.col("stv") - F.col("st") * F.col("sv")).cast("double") / den,
    ).otherwise(F.lit(None).cast("double"))
    return m.withColumn("slope_units_per_bucket", slope).withColumn(
        "intercept_units",
        F.when(
            den > 0,
            (F.col("stt") * F.col("sv") - F.col("st") * F.col("stv")).cast("double")
            / den,
        ).otherwise(F.lit(None).cast("double")),
    )



def robust_stats(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    trim_frac_denom: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """EXACT order statistics per key — median, MAD (median absolute
    deviation), and the trimmed mean — the outlier-ROBUST telemetry
    family beside the moment-based z-scores (``rolling_count_anomaly``)
    and the sketch path (``events_approx_quantiles``): one corrupted
    feed value moves a mean arbitrarily far but moves the median by at
    most one rank.

    Float policy (SCALE.md): values quantize ONCE to exact integer
    ``scale`` units; every order statistic is then pure integer math
    over the total ranking ``(v_int, id)`` until one terminal IEEE
    division — even-count medians publish the exact half-sum
    ``(lo+hi) / (2·scale)``, and MAD works in 2× units
    (``|2·v − median2x|``) so it needs no fractional intermediate.
    Engine-bit-stable by construction.

    Scale posture: per-key rank windows hash-partition by key — the
    honest formulation for exact per-key order statistics (a key's
    values must be ordered SOMEWHERE). A pathologically hot key
    funnels through one task; that is exactly when the approx-quantile
    sketch path is the right tool — the pair is the documented
    exact/approx tradeoff. The mid-rank/trim probes fold inside the
    same grouped aggregate (conditional sums), so beyond the two rank
    windows there is one hash aggregate per statistic family and a
    broadcast of the per-key count table.

    Output per key: ``(key_col, n_events, median, trimmed_mean, mad)``.
    """
    from pyspark.sql import Window

    s = int(scale)
    td = int(trim_frac_denom)
    if td < 3:
        raise ValueError(f"trim_frac_denom must be >= 3, got {td}")
    base = events.select(
        F.col(key_col).alias("k"),
        F.round(F.col(value_col) * s).cast("long").alias("v"),
        F.col(id_col).alias("_id"),
    )
    counts = base.groupBy("k").agg(F.count("*").cast("long").alias("_n"))
    ranked = base.join(F.broadcast(counts), "k").withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("v", "_id"))
    )
    lo_mid = F.expr("(_n + 1) div 2")
    hi_mid = F.expr("(_n + 2) div 2")
    k_t = F.expr(f"_n div {td}")
    agg1 = ranked.groupBy("k", "_n").agg(
        (
            F.sum(F.when(F.col("rn") == lo_mid, F.col("v")).otherwise(F.lit(0)))
            + F.sum(F.when(F.col("rn") == hi_mid, F.col("v")).otherwise(F.lit(0)))
        ).alias("med2x"),
        F.sum(
            F.when(
                (F.col("rn") > k_t) & (F.col("rn") <= F.col("_n") - k_t), F.col("v")
            ).otherwise(F.lit(0))
        ).alias("trim_sum"),
    )
    dev = (
        ranked.join(F.broadcast(agg1.select("k", "med2x")), "k")
        .withColumn("d2", F.abs(F.col("v") * 2 - F.col("med2x")))
        .withColumn(
            "drn", F.row_number().over(Window.partitionBy("k").orderBy("d2", "_id"))
        )
    )
    agg2 = dev.groupBy("k", "_n").agg(
        (
            F.sum(F.when(F.col("drn") == lo_mid, F.col("d2")).otherwise(F.lit(0)))
            + F.sum(F.when(F.col("drn") == hi_mid, F.col("d2")).otherwise(F.lit(0)))
        ).alias("mad4x")
    )
    out = agg1.join(agg2, ["k", "_n"])
    trim_cnt = F.col("_n") - 2 * F.expr(f"_n div {td}")
    return out.select(
        F.col("k").alias(key_col),
        F.col("_n").alias("n_events"),
        (F.col("med2x").cast("double") / F.lit(float(2 * s))).alias("median"),
        (
            F.col("trim_sum").cast("double") / (trim_cnt * s).cast("double")
        ).alias("trimmed_mean"),
        (F.col("mad4x").cast("double") / F.lit(float(4 * s))).alias("mad"),
    )


def changepoint_scan(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
    scale: int = 1_000,
) -> DataFrame:
    """CUSUM-style changepoint scan per key: the cumulative-deviation
    statistic ``C_t = n·P_t − t·S`` (P_t = prefix sum, S = total, both
    in exact integer ``scale`` units) peaks exactly where the series'
    mean shifts — the classic level-change detector (Page 1954 /
    Taylor's cumulative-sum charts) beside the trend fit
    (``series_trend``) and seasonal profile. Published per key: the
    peak's normalized magnitude ``|C|/(n·scale)`` (= the max cumulative
    deviation from the global mean, in natural value units), WHERE it
    happens (ts + position fraction), and n.

    Determinism: C_t is integer arithmetic over the total (ts, id)
    ordering — partition-order-proof; the peak argmax tie-breaks
    (|C| desc, ts asc, id asc) via one lexicographic max_by struct.
    The single driver touch is a #keys-row guard read: |C_t| <=
    2·n²·max|v|·scale must stay inside BIGINT (Spark wraps silently
    under non-ANSI; the guard raises instead — the zipf_fit
    discipline). At 100 TB key grain that bound is the reason the
    statistic is computed in milli-units, and past it the right tool
    is windowed sub-series scans, not a wider integer.

    Output: ``(key_col, n_events, cusum_peak, peak_ts_ms, peak_frac)``.
    """
    from pyspark.sql import Window

    s = int(scale)
    base = events.select(
        F.col(key_col).alias("k"),
        F.round(F.col(value_col) * s).cast("long").alias("v"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
    )
    stats = base.groupBy("k").agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("v").cast("long").alias("_s"),
        F.max(F.abs(F.col("v"))).cast("long").alias("_vmax"),
    )
    for r in stats.select("k", "_n", "_vmax").collect():  # #keys rows
        if 2 * r._n * r._n * max(r._vmax or 0, 1) >= 2**62:
            raise ValueError(
                f"changepoint_scan: key {r.k!r} with n={r._n}, "
                f"max|v_int|={r._vmax} can overflow the exact BIGINT "
                "cusum — reduce scale or scan windowed sub-series"
            )
    w = (
        Window.partitionBy("k")
        .orderBy("_ts", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        base.join(F.broadcast(stats), "k")
        .withColumn("_p", F.sum("v").over(w))
        .withColumn("_t", F.row_number().over(Window.partitionBy("k").orderBy("_ts", "_id")).cast("long"))
        .withColumn("_c", F.col("_n") * F.col("_p") - F.col("_t") * F.col("_s"))
    )
    peak = cum.groupBy("k", "_n").agg(
        F.max(
            F.struct(
                F.abs(F.col("_c")).alias("absc"),
                (-F.col("_ts")).alias("nts"),
                (-F.col("_t")).alias("nt"),
            )
        ).alias("pk")
    )
    return peak.select(
        F.col("k").alias(key_col),
        F.col("_n").alias("n_events"),
        (
            F.col("pk.absc").cast("double")
            / (F.col("_n") * s).cast("double")
        ).alias("cusum_peak"),
        (-F.col("pk.nts")).cast("long").alias("peak_ts_ms"),
        ((-F.col("pk.nt")).cast("double") / F.col("_n").cast("double")).alias(
            "peak_frac"
        ),
    )


def series_spearman(
    df: DataFrame,
    time_col: str,
    series_col: str,
    value_col: str,
    bucket_ms: int,
    value_scale: int = 1,
) -> DataFrame:
    """Pairwise SPEARMAN rank correlation between series (r07) — the
    outlier-robust, monotonicity-sensing twin of
    :func:`series_correlation`: one spiked bucket saturates Pearson
    but moves a rank by at most one slot, and any monotone (not just
    linear) co-movement scores ±1.

    Exactness: ranks use the tie-AVERAGING convention in 2× integer
    units — for a value with ``c_lt`` smaller and ``c_eq`` equal
    values in the pair's aligned sample, ``2·avg_rank = 2·c_lt + c_eq
    + 1`` (always an integer; ``c_lt = rank() − 1`` and ``c_eq`` is a
    per-(pair, value) count — two window functions, no self-join).
    Spearman is then Pearson over the integer 2×-rank pairs: exact
    BIGINT moments, the same fixed guarded terminal expression as the
    Pearson operator — engine-bit-stable. Zero-variance (all-tied)
    sides publish NULL.

    Plan: identical shape to ``series_correlation`` — one (series,
    bucket) reduction, a broadcast bucket-aligned pair join over the
    REDUCED table, per-pair rank windows (quadratic in #series, never
    events), one moment aggregate.
    """
    from pyspark.sql import Window

    scale = int(value_scale)
    per = df.groupBy(
        F.col(series_col).alias("s"), _bucket_expr(time_col, bucket_ms)
    ).agg(
        F.sum(F.round(F.col(value_col) * float(scale), 0).cast("long"))
        .cast("long")
        .alias("x")
    )
    a = per.select(
        F.col("s").alias("series_a"), "bucket_start_ms", F.col("x").alias("xa")
    )
    b = per.select(
        F.col("s").alias("series_b"), "bucket_start_ms", F.col("x").alias("xb")
    )
    pairs = a.join(F.broadcast(b), "bucket_start_ms").where(
        F.col("series_a") < F.col("series_b")
    )
    pk = ["series_a", "series_b"]

    def r2(col):
        wr = Window.partitionBy(*pk).orderBy(col)
        we = Window.partitionBy(*pk, col)
        return (
            2 * (F.rank().over(wr) - 1) + F.count("*").over(we) + 1
        ).cast("long")

    ranked = pairs.withColumn("ra", r2("xa")).withColumn("rb", r2("xb"))
    m = ranked.groupBy(*pk).agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum("ra").cast("long").alias("sx"),
        F.sum("rb").cast("long").alias("sy"),
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("sxy"),
        F.sum(F.col("ra") * F.col("ra")).cast("long").alias("sxx"),
        F.sum(F.col("rb") * F.col("rb")).cast("long").alias("syy"),
    )
    num = (F.col("n_buckets") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    va = (F.col("n_buckets") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vb = (F.col("n_buckets") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.withColumn(
        "spearman",
        F.when(
            (va > 0) & (vb > 0), num / (F.sqrt(va) * F.sqrt(vb))
        ).otherwise(F.lit(None).cast("double")),
    )
