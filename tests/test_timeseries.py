"""OHLC bars and gap-filled LOCF resampling — edge semantics the oracle
comparison can't isolate: tie-breaks inside a bucket, single-event bars,
leading-NULL fill, carry-across-gap."""

from pyspark.sql import functions as F  # noqa: F401


def test_ohlc_bars_and_ties(spark):
    from temporal_vector_database_spark.operators.timeseries import ohlc

    rows = [
        # key "a", bucket 0 (width 100): events at t=10, 50, 50 (tie), 90
        ("a", 1, 10, 5.0), ("a", 2, 50, 9.0), ("a", 3, 50, 1.0), ("a", 4, 90, 7.0),
        # key "a", bucket 100: single event -> open==close==high==low
        ("a", 5, 150, 3.0),
        # key "b", bucket 0: ties at the OPEN edge too
        ("b", 6, 0, 2.0), ("b", 7, 0, 8.0),
    ]
    df = spark.createDataFrame(rows, "k string, eid long, t long, v double")
    got = {
        (r.k, r.bucket_start_ms): (r.open, r.high, r.low, r.close, r.n_events)
        for r in ohlc(df, "t", ("k",), "v", 100, tiebreak_cols=("eid",)).collect()
    }
    assert got[("a", 0)] == (5.0, 9.0, 1.0, 7.0, 4)
    assert got[("a", 100)] == (3.0, 3.0, 3.0, 3.0, 1)
    # same-ts ties break by eid: open = eid 6, close = eid 7
    assert got[("b", 0)] == (2.0, 8.0, 2.0, 8.0, 2)
    assert len(got) == 3


def test_resample_locf_fill_semantics(spark):
    from temporal_vector_database_spark.operators.timeseries import resample_locf

    rows = [
        # key 1: first obs in bucket 100, then a gap, then bucket 300
        (1, 1, 150, 5.0), (1, 2, 160, 6.0),  # bucket 100 close = 6.0
        (1, 3, 310, 9.0),
        # key 2: only one obs, in bucket 0
        (2, 4, 0, 1.0),
    ]
    df = spark.createDataFrame(rows, "k long, eid long, t long, v double")
    out = resample_locf(
        df, "t", ("k",), "v", 100, 0, 399, tiebreak_cols=("eid",)
    ).collect()
    got = {(r.k, r.bucket_start_ms): (r.value, r.is_observed) for r in out}
    # full grid: 2 keys x 4 buckets
    assert len(got) == 8
    assert got[(1, 0)] == (None, False)      # before first observation
    assert got[(1, 100)] == (6.0, True)      # close of the bucket, tie-broken
    assert got[(1, 200)] == (6.0, False)     # carried across the gap
    assert got[(1, 300)] == (9.0, True)
    assert got[(2, 0)] == (1.0, True)
    assert got[(2, 300)] == (1.0, False)     # carried to the end of the grid


def test_resample_locf_seeds_from_pre_window_observations(spark):
    """Observations BEFORE the grid seed the leading buckets: value is
    the last observation at-or-before the bucket's end even when that
    observation predates lo_ms (r03 advice); an in-window observation in
    the first bucket still wins over the seed."""
    from temporal_vector_database_spark.operators.timeseries import resample_locf

    rows = [
        # key 1: only a pre-window obs at t=-150 -> every bucket carries it
        (1, 1, -150, 7.0),
        # key 2: pre-window obs AND an in-window obs in the first bucket
        (2, 2, -10, 3.0), (2, 3, 50, 4.0),
        # key 3: no pre-window obs -> leading bucket stays NULL
        (3, 4, 150, 9.0),
    ]
    df = spark.createDataFrame(rows, "k long, eid long, t long, v double")
    out = resample_locf(
        df, "t", ("k",), "v", 100, 0, 199, tiebreak_cols=("eid",)
    ).collect()
    got = {(r.k, r.bucket_start_ms): (r.value, r.is_observed) for r in out}
    assert got[(1, 0)] == (7.0, False)
    assert got[(1, 100)] == (7.0, False)
    assert got[(2, 0)] == (4.0, True)   # in-window close beats the seed
    assert got[(2, 100)] == (4.0, False)
    assert got[(3, 0)] == (None, False)
    assert got[(3, 100)] == (9.0, True)


def test_locf_from_state_seeds_from_pre_window_state(spark):
    from temporal_vector_database_spark.operators.timeseries import (
        ohlc_state,
        resample_locf_from_state,
    )

    rows = [(1, 1, -150, 7.0), (1, 2, 120, 2.0)]
    df = spark.createDataFrame(rows, "k long, eid long, t long, v double")
    state = ohlc_state(df, "t", ("k",), "v", 100, tiebreak_cols=("eid",))
    got = {
        r.bucket_start_ms: (r.value, r.is_observed)
        for r in resample_locf_from_state(state, 100, 0, 199).collect()
    }
    assert got[0] == (7.0, False)
    assert got[100] == (2.0, True)


def test_bucket_floor_semantics_for_negative_ts(spark):
    """Bucketing floors (ts - pmod), it does not truncate toward zero:
    a pre-1970 event lands in the bucket STARTING at-or-before it."""
    from temporal_vector_database_spark.operators.timeseries import ohlc

    rows = [(1, 1, -50, 5.0), (1, 2, 50, 6.0), (1, 3, -100, 4.0)]
    df = spark.createDataFrame(rows, "k long, eid long, t long, v double")
    got = {r.bucket_start_ms for r in ohlc(df, "t", ("k",), "v", 100).collect()}
    assert got == {-100, 0}


def test_resample_locf_same_ts_tie_uses_tiebreak(spark):
    from temporal_vector_database_spark.operators.timeseries import resample_locf

    rows = [(1, 1, 50, 3.0), (1, 2, 50, 4.0)]
    df = spark.createDataFrame(rows, "k long, eid long, t long, v double")
    out = resample_locf(df, "t", ("k",), "v", 100, 0, 100, tiebreak_cols=("eid",))
    got = {(r.bucket_start_ms): r.value for r in out.collect()}
    assert got[0] == 4.0 and got[100] == 4.0


def test_ohlc_incremental_merge_equals_full_rebuild(spark):
    """Continuous-aggregate discipline: folding per-batch partial state
    with ohlc_merge equals the one-shot aggregate over all events —
    including batches that split a bucket (late data re-opening a bar)."""
    from temporal_vector_database_spark.operators.timeseries import (
        ohlc,
        ohlc_merge,
        ohlc_report,
        ohlc_state,
    )

    rows = [
        ("a", 1, 10, 5.0), ("a", 2, 50, 9.0), ("a", 3, 90, 7.0),
        ("a", 4, 150, 3.0), ("b", 5, 0, 2.0), ("b", 6, 80, 8.0),
    ]
    df = spark.createDataFrame(rows, "k string, eid long, t long, v double")
    args = ("t", ("k",), "v", 100, ("eid",))
    # batch 2 delivers a LATE event (eid 1, the true open of bucket 0)
    b1 = df.where(F.col("eid").isin(2, 5, 4))
    b2 = df.where(F.col("eid").isin(1, 3, 6))
    state = ohlc_state(b1, *args)
    state = ohlc_merge(state, ohlc_state(b2, *args))

    def canon(d):
        return sorted(
            (r.k, r.bucket_start_ms, r.open, r.high, r.low, r.close, r.n_events)
            for r in d.collect()
        )

    assert canon(ohlc_report(state)) == canon(ohlc(df, *args))
    got = {(r.k, r.bucket_start_ms): (r.open, r.close)
           for r in ohlc_report(state).collect()}
    assert got[("a", 0)] == (5.0, 7.0)  # late eid 1 re-opened the bar


def test_streaming_ohlc_state_equals_batch_and_replay_noop(spark, tmp_path):
    """foreachBatch OHLC maintenance over 3 micro-batches (with late
    events) ends with state == one-shot ohlc; replaying a committed
    batch changes nothing."""
    from temporal_vector_database_spark.operators.timeseries import ohlc
    from temporal_vector_database_spark.streaming.ohlc import (
        process_ohlc_batch,
        read_ohlc_state,
    )
    from temporal_vector_database_spark.operators.timeseries import ohlc_report

    rows = [
        ("a", 1, 10, 5.0), ("a", 2, 50, 9.0), ("a", 3, 90, 7.0),
        ("a", 4, 150, 3.0), ("b", 5, 0, 2.0), ("b", 6, 80, 8.0),
    ]
    df = spark.createDataFrame(rows, "k string, event_id long, ts_ms long, v double")
    state = str(tmp_path / "ohlc_state")
    kw = dict(time_col="ts_ms", key_cols=("k",), value_col="v",
              bucket_ms=100, tiebreak_cols=("event_id",))
    batches = [
        df.where(F.col("event_id").isin(2, 5)),
        df.where(F.col("event_id").isin(1, 4)),   # event 1 is LATE
        df.where(F.col("event_id").isin(3, 6)),
    ]
    for bid, b in enumerate(batches):
        process_ohlc_batch(b, bid, state, **kw)

    def canon(d):
        return sorted(
            (r.k, r.bucket_start_ms, r.open, r.high, r.low, r.close, r.n_events)
            for r in d.collect()
        )

    want = canon(ohlc(df, "ts_ms", ("k",), "v", 100, ("event_id",)))
    assert canon(ohlc_report(read_ohlc_state(spark, state))) == want
    # redeliver the HEAD batch (the only replay Structured Streaming
    # performs) -> no-op; older ids now raise (see _state.replay_guard)
    process_ohlc_batch(batches[2], 2, state, **kw)
    assert canon(ohlc_report(read_ohlc_state(spark, state))) == want


def test_locf_from_state_equals_raw_resample(spark):
    """Serving gap-fill from incrementally-merged OHLC state equals the
    raw-event resample — the state's close endpoint IS the per-bucket
    closing observation, even when a late batch re-closed a bucket."""
    from temporal_vector_database_spark.operators.timeseries import (
        ohlc_merge,
        ohlc_state,
        resample_locf,
        resample_locf_from_state,
    )

    rows = [
        (1, 1, 150, 5.0), (1, 2, 160, 6.0), (1, 3, 310, 9.0),
        (2, 4, 0, 1.0), (1, 5, 170, 2.5),  # eid 5 arrives late in batch 2
    ]
    df = spark.createDataFrame(rows, "k long, eid long, t long, v double")
    args = ("t", ("k",), "v", 100, ("eid",))
    state = ohlc_state(df.where(F.col("eid") <= 4), *args)
    state = ohlc_merge(state, ohlc_state(df.where(F.col("eid") == 5), *args))

    def canon(d):
        return sorted(
            (r.k, r.bucket_start_ms, r.value, r.is_observed) for r in d.collect()
        )

    want = resample_locf(df, "t", ("k",), "v", 100, 0, 399, tiebreak_cols=("eid",))
    got = resample_locf_from_state(state, 100, 0, 399)
    assert canon(got) == canon(want)
    vals = {(r.k, r.bucket_start_ms): r.value for r in got.collect()}
    assert vals[(1, 100)] == 2.5 and vals[(1, 200)] == 2.5  # late close served


def test_rolling_count_anomaly_brute_force_parity(spark):
    """Integer z-test matches a float brute force on a series with one
    engineered spike; heads (win_n < 7) are never flagged."""
    import math

    from temporal_vector_database_spark.operators.timeseries import (
        rolling_count_anomaly,
    )

    # one key, 12 daily buckets: steady 5 events/day with day 9 at 50
    day = 86_400_000
    counts = {d: (50 if d == 9 else 5 + (d % 3)) for d in range(12)}
    rows = [
        (1, d * day + i, 7)
        for d, c in counts.items()
        for i in range(c)
    ]
    df = spark.createDataFrame(rows, "k long, t long, v long")
    out = {
        r.bucket_start_ms // day: r
        for r in rolling_count_anomaly(
            df, "t", ("k",), day, window_buckets=7, z_int=3
        ).collect()
    }
    assert len(out) == 12
    series = [counts[d] for d in range(12)]
    for d in range(12):
        r = out[d]
        # baseline = the PRIOR 7 observed buckets, current excluded
        win = series[max(0, d - 7) : d]
        assert r.n_events == series[d]
        assert r.win_n == len(win)
        assert r.win_sum == sum(win)
        assert r.win_sumsq == sum(x * x for x in win)
        if len(win) < 7:
            assert not r.is_anomaly
        else:
            mu = sum(win) / 7
            var = sum(x * x for x in win) / 7 - mu * mu
            expect = abs(series[d] - mu) > 3 * math.sqrt(max(var, 0.0))
            assert r.is_anomaly == expect, d
    assert out[9].is_anomaly  # the spike vs its pre-spike baseline
    assert not out[8].is_anomaly


def test_rolling_anomaly_constant_series_never_flags(spark):
    from temporal_vector_database_spark.operators.timeseries import (
        rolling_count_anomaly,
    )

    day = 86_400_000
    rows = [(1, d * day, 1.0) for d in range(10)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = rolling_count_anomaly(df, "t", ("k",), day).collect()
    assert len(out) == 10 and not any(r.is_anomaly for r in out)


def test_anomaly_from_state_equals_direct(spark):
    """Serving the detector from maintained OHLC state is bit-identical
    to running it over raw events (and survives an incremental merge)."""
    from temporal_vector_database_spark.operators.timeseries import (
        ohlc_merge,
        ohlc_state,
        rolling_count_anomaly,
        rolling_count_anomaly_from_state,
    )

    day = 86_400_000
    rows = [
        (k, d * day + i * 1000 + k, float(i))
        for k in (1, 2)
        for d in range(10)
        for i in range((d * 7 + k) % 9 + 1)
    ]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    direct = sorted(map(tuple, rolling_count_anomaly(df, "t", ("k",), day).collect()))
    state = ohlc_state(df, "t", ("k",), "v", day)
    served = sorted(
        map(tuple, rolling_count_anomaly_from_state(state).collect())
    )
    assert direct == served
    # incremental: state maintained as two merged halves serves identically
    h1 = df.where("t < %d" % (5 * day))
    h2 = df.where("t >= %d" % (5 * day))
    merged = ohlc_merge(
        ohlc_state(h1, "t", ("k",), "v", day),
        ohlc_state(h2, "t", ("k",), "v", day),
    )
    served2 = sorted(
        map(tuple, rolling_count_anomaly_from_state(merged).collect())
    )
    assert direct == served2


def test_rolling_distinct_counts_brute_force(spark):
    """Exact sliding-window distinct equals a Python brute force; repeat
    entities across the window are counted once (the overcount a
    sum-of-daily-distincts would make)."""
    from temporal_vector_database_spark.operators.timeseries import (
        rolling_distinct_counts,
    )

    day = 100
    # key "a": user 1 every day 0-9, user 2 on days {0, 5}, user 3 day 9
    rows = [("a", d * day + 5, 1) for d in range(10)]
    rows += [("a", 5, 2), ("a", 5 * day + 7, 2), ("a", 9 * day, 3)]
    # key "b": a single sparse day
    rows += [("b", 3 * day, 9)]
    df = spark.createDataFrame(rows, "k string, t long, u long")
    got = {
        (r.k, r.bucket_start_ms // day): r.n_distinct
        for r in rolling_distinct_counts(
            df, "t", ("k",), "u", day, window_buckets=3
        ).collect()
    }
    by_day = {}
    for k, t, u in rows:
        by_day.setdefault((k, t // day), set()).add(u)
    expect = {}
    for (k, d), _ in by_day.items():
        win = set()
        for s in range(d - 2, d + 1):
            win |= by_day.get((k, s), set())
        expect[(k, d)] = len(win)
    assert got == expect
    assert got[("a", 1)] == 2   # user 2 from day 0 still in the window
    assert got[("a", 5)] == 2   # user 2 re-appears
    assert got[("a", 8)] == 1   # window has shed user 2
    assert got[("b", 3)] == 1


def test_time_weighted_average_brute_force(spark):
    """TWA equals the hand-computed LOCF integral; a burst of samples
    does not over-weight its value the way a plain avg does; duplicate
    timestamps hold for 0 ms except the tiebreak winner."""
    from temporal_vector_database_spark.operators.timeseries import (
        time_weighted_average,
    )

    # bucket [0, 1000): v=1.0 held [100, 900), then a 10-sample burst of
    # v=5.0 in [900, 910), last holds to bucket end
    rows = [(1, 1, 100, 1.0)] + [
        (1, i + 2, 900 + i, 5.0) for i in range(10)
    ]
    # duplicate-ts tie: key 2 has two values at t=0; eid 21 wins the hold
    rows += [(2, 20, 0, 3.0), (2, 21, 0, 7.0)]
    df = spark.createDataFrame(rows, "k long, eid long, t long, v double")
    out = {
        r.k: r
        for r in time_weighted_average(
            df, "t", ("k",), "v", 1000, tiebreak_cols=("eid",)
        ).collect()
    }
    r1 = out[1]
    # num = 1000*800 (v=1 held [100,900)) + 5000*9 (nine 1-ms holds,
    # t=900..908) + 5000*91 (t=909 holds to bucket end); den = 1000-100
    assert r1.twa_num == 1000 * 800 + 5000 * 9 + 5000 * 91
    assert r1.twa_den == 900
    assert r1.n_events == 11
    assert r1.twa == r1.twa_num / (r1.twa_den * 1000.0)
    assert abs(r1.twa - 13 / 9) < 1e-12  # plain avg would be ~4.6
    r2 = out[2]
    assert r2.twa_num == 7000 * 1000 and r2.twa_den == 1000 and r2.twa == 7.0


def test_rolling_distinct_estimate_within_sketch_error(spark):
    """HLL sketch-union estimate tracks the exact rolling distinct
    within the configured sketch error on every observed bucket."""
    from temporal_vector_database_spark.operators.timeseries import (
        rolling_distinct_counts,
        rolling_distinct_estimate,
    )

    day = 100
    # 3 overlapping cohorts of 400 users sliding across 6 days
    rows = [
        (1, d * day + 3, 1000 * (d % 3) + u)
        for d in range(6)
        for u in range(400)
    ]
    df = spark.createDataFrame(rows, "k long, t long, u long")
    args = (df, "t", ("k",), "u", day, 3)
    exact = {
        (r.k, r.bucket_start_ms): r.n_distinct
        for r in rolling_distinct_counts(*args).collect()
    }
    est = {
        (r.k, r.bucket_start_ms): r.n_distinct_est
        for r in rolling_distinct_estimate(*args).collect()
    }
    assert set(exact) == set(est) and len(exact) == 6
    # days 2+ union three disjoint cohorts -> exact 1200
    assert exact[(1, 2 * day)] == 1200
    for key, ex in exact.items():
        assert abs(est[key] - ex) <= 0.05 * ex, (key, ex, est[key])


def test_m4_downsample_extremum_points_and_ties(spark):
    from temporal_vector_database_spark.operators.timeseries import m4_downsample

    rows = [
        # key "a", bucket 0 (width 100): min at t=30, max at t=60;
        # value ties at the max (7.0 at t=60 and t=80) -> latest wins
        ("a", 1, 10, 5.0), ("a", 2, 30, 1.0), ("a", 3, 60, 7.0),
        ("a", 4, 80, 7.0), ("a", 5, 90, 4.0),
        # key "a", bucket 100: single event -> all four points coincide
        ("a", 6, 150, 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, eid long, t long, v double")
    got = {
        (r.k, r.bucket_start_ms): r
        for r in m4_downsample(df, "t", ("k",), "v", 100,
                               tiebreak_cols=("eid",)).collect()
    }
    a0 = got[("a", 0)]
    assert (a0.t_first, a0.v_first) == (10, 5.0)
    assert (a0.t_last, a0.v_last) == (90, 4.0)
    assert (a0.t_min, a0.v_min) == (30, 1.0)
    # max value tie (7.0) -> argmax tie-breaks toward the LATEST point
    assert (a0.t_max, a0.v_max) == (80, 7.0)
    assert a0.n_events == 5
    a1 = got[("a", 100)]
    assert (a1.t_first, a1.v_first) == (150, 3.0)
    assert (a1.t_last, a1.v_last) == (150, 3.0)
    assert (a1.t_min, a1.t_max) == (150, 150)
    assert a1.n_events == 1


def test_m4_points_are_sufficient_for_min_max_rendering(spark):
    """The defining M4 property: per bucket, the emitted points are the
    bucket's exact value extrema and time extrema (brute-force check)."""
    import random

    from temporal_vector_database_spark.operators.timeseries import m4_downsample

    rng = random.Random(7)
    rows = [(1, i, rng.randrange(0, 1000), round(rng.uniform(-5, 5), 6))
            for i in range(200)]
    df = spark.createDataFrame(rows, "k long, eid long, t long, v double")
    out = {r.bucket_start_ms: r
           for r in m4_downsample(df, "t", ("k",), "v", 100,
                                  tiebreak_cols=("eid",)).collect()}
    by_bucket = {}
    for _, _, t, v in rows:
        by_bucket.setdefault(t - t % 100, []).append((t, v))
    assert set(out) == set(by_bucket)
    for b, pts in by_bucket.items():
        r = out[b]
        assert r.v_min == min(v for _, v in pts)
        assert r.v_max == max(v for _, v in pts)
        assert r.t_first == min(t for t, _ in pts)
        assert r.t_last == max(t for t, _ in pts)
        assert r.n_events == len(pts)


def test_counter_agg_reset_semantics(spark):
    from temporal_vector_database_spark.operators.timeseries import counter_agg

    rows = [
        # key 1: 10 -> 25 (+15), 25 -> 5 RESET (contributes 5),
        #        5 -> 30 (+25) but lands in the next bucket
        (1, 1, 10, 10.0), (1, 2, 40, 25.0), (1, 3, 70, 5.0),
        (1, 4, 150, 30.0),
        # key 2: single sample -> no deltas, increase 0
        (2, 5, 20, 99.0),
    ]
    df = spark.createDataFrame(rows, "k long, eid long, t long, v double")
    out = counter_agg(df, "t", ("k",), "v", 100,
                      tiebreak_cols=("eid",), value_scale=1)
    got = {(r.k, r.bucket_start_ms):
           (r.increase_units, r.n_resets, r.n_samples) for r in out.collect()}
    assert got[(1, 0)] == (15 + 5, 1, 3)     # first sample contributes nothing
    assert got[(1, 100)] == (25, 0, 1)       # delta across the bucket boundary
    assert got[(2, 0)] == (0, 0, 1)


def test_counter_agg_bucket_increases_sum_to_series_increase(spark):
    """Per-bucket increases partition the whole-series increase: summing
    them equals counter_agg at one giant bucket."""
    import random

    rng = random.Random(11)
    rows, v = [], 0.0
    for i in range(300):
        v = v + rng.uniform(0, 3) if rng.random() > 0.1 else rng.uniform(0, 2)
        rows.append((i % 3, i, i * 7, round(v, 3)))
    df = spark.createDataFrame(rows, "k long, eid long, t long, v double")
    from temporal_vector_database_spark.operators.timeseries import counter_agg

    fine = counter_agg(df, "t", ("k",), "v", 100, tiebreak_cols=("eid",))
    coarse = counter_agg(df, "t", ("k",), "v", 1 << 40, tiebreak_cols=("eid",))
    fine_tot = {r.k: r.total for r in
                fine.groupBy("k").agg(F.sum("increase_units").alias("total"),
                                      F.sum("n_resets").alias("resets"))
                .collect()}
    coarse_tot = {r.k: r.increase_units for r in coarse.collect()}
    assert fine_tot == coarse_tot


def test_streaming_counter_state_equals_batch_and_replay_noop(spark, tmp_path):
    """Counter maintenance over 3 TIME-ORDERED micro-batches (the
    arrival contract) ends with buckets == one-shot counter_agg —
    including a reset that falls exactly ON a batch boundary; replaying
    a committed batch changes nothing."""
    from temporal_vector_database_spark.operators.timeseries import counter_agg
    from temporal_vector_database_spark.streaming.counter import (
        counter_report,
        process_counter_batch,
        read_counter_state,
    )

    rows = [
        # key 1: climbs, RESETS at t=110 (first row of batch 2), climbs
        (1, 1, 10, 10.0), (1, 2, 60, 25.0),
        (1, 3, 110, 4.0), (1, 4, 160, 9.0),
        (1, 5, 210, 12.0),
        # key 2: monotone across all three batches
        (2, 6, 20, 1.0), (2, 7, 120, 2.5), (2, 8, 220, 7.0),
    ]
    df = spark.createDataFrame(rows, "k long, event_id long, ts_ms long, v double")
    state = str(tmp_path / "counter_state")
    kw = dict(time_col="ts_ms", key_cols=("k",), value_col="v",
              bucket_ms=100, tiebreak_cols=("event_id",), value_scale=1000)
    batches = [
        df.where(F.col("ts_ms") < 100),
        df.where((F.col("ts_ms") >= 100) & (F.col("ts_ms") < 200)),
        df.where(F.col("ts_ms") >= 200),
    ]
    for bid, b in enumerate(batches):
        process_counter_batch(b, bid, state, **kw)

    def canon(d):
        return sorted(
            (r.k, r.bucket_start_ms, r.increase_units, r.n_resets,
             r.n_samples, r.rate_per_sec)
            for r in d.collect()
        )

    want = canon(counter_agg(df, "ts_ms", ("k",), "v", 100,
                             ("event_id",), 1000))
    buckets, last = read_counter_state(spark, state)
    assert canon(counter_report(buckets, 100, 1000)) == want
    # the boundary reset was detected across batches
    by = {(r.k, r.bucket_start_ms): r.n_resets for r in buckets.collect()}
    assert by[(1, 100)] == 1
    # last-sample state is each key's final sample
    got_last = {r.k: (r._t, r._v) for r in last.collect()}
    assert got_last == {1: (210, 12000), 2: (220, 7000)}
    # redeliver the HEAD batch -> no-op
    process_counter_batch(batches[2], 2, state, **kw)
    buckets2, _ = read_counter_state(spark, state)
    assert canon(counter_report(buckets2, 100, 1000)) == want


def test_run_counter_stream_real_source_smoke(spark, tmp_path):
    """run_counter_stream over a parquet file source (AvailableNow)
    equals the one-shot batch aggregate."""
    import os

    from temporal_vector_database_spark.operators.timeseries import counter_agg
    from temporal_vector_database_spark.streaming.counter import (
        counter_report,
        read_counter_state,
        run_counter_stream,
    )

    rows = [(1, i, i * 40, float(v)) for i, v in
            enumerate([5, 9, 2, 6, 11, 3], start=1)]
    df = spark.createDataFrame(rows, "k long, event_id long, ts_ms long, v double")
    in_dir = str(tmp_path / "in")
    df.coalesce(1).write.mode("append").parquet(in_dir)
    state = str(tmp_path / "state")
    stream = spark.readStream.schema(df.schema).parquet(in_dir)
    run_counter_stream(
        stream, state, str(tmp_path / "ckpt"),
        time_col="ts_ms", key_cols=("k",), value_col="v",
        bucket_ms=100, tiebreak_cols=("event_id",), value_scale=1,
    )
    buckets, _ = read_counter_state(spark, state)

    def canon(d):
        return sorted((r.k, r.bucket_start_ms, r.increase_units,
                       r.n_resets, r.n_samples) for r in d.collect())

    assert canon(counter_report(buckets, 100, 1)) == canon(
        counter_agg(df, "ts_ms", ("k",), "v", 100, ("event_id",), 1)
    )


def test_series_correlation_brute_force_and_edges(spark):
    """Pairwise Pearson vs numpy on the per-bucket sums; perfect linear
    pairs hit +/-1 exactly at the moment level; zero variance -> NULL."""
    import numpy as np

    from temporal_vector_database_spark.operators.timeseries import (
        series_correlation,
    )

    rows = []
    # series A and B perfectly anti-correlated; C constant; D noisy
    for day in range(6):
        t = day * 100
        rows += [("A", t, float(day + 1)), ("B", t, float(10 - day)),
                 ("C", t, 5.0), ("D", t, float((day * 7) % 5))]
    df = spark.createDataFrame(rows, "s string, ts long, v double")
    out = {(r.series_a, r.series_b): r
           for r in series_correlation(df, "ts", "s", "v", 100).collect()}
    # deterministic but unclamped: sqrt(va)*sqrt(vb) can land one ulp
    # past the mathematical bound
    assert abs(out[("A", "B")].corr - (-1.0)) < 1e-15
    assert out[("A", "C")].corr is None          # zero variance side
    # numpy parity on the noisy pair
    a = np.array([day + 1 for day in range(6)], dtype=float)
    d = np.array([(day * 7) % 5 for day in range(6)], dtype=float)
    want = float(np.corrcoef(a, d)[0, 1])
    assert abs(out[("A", "D")].corr - want) < 1e-12
    # moments are exact integers
    r = out[("A", "B")]
    assert (r.n_buckets, r.sx, r.sy) == (6, 21, 45)


def test_streaming_correlation_state_equals_one_shot(spark, tmp_path):
    """Folding event batches (with a LATE row) into per-bucket sums and
    deriving corr from state is bit-identical to the one-shot operator;
    replaying a committed batch changes nothing."""
    import random

    from temporal_vector_database_spark.operators.timeseries import (
        series_correlation,
    )
    from temporal_vector_database_spark.streaming.correlation import (
        correlation_from_state,
        process_series_sum_batch,
        read_series_state,
    )

    rng = random.Random(9)
    rows = [(f"s{i % 3}", (i % 10) * 100 + rng.randrange(100),
             float(rng.randrange(1, 50))) for i in range(200)]
    df = spark.createDataFrame(rows, "s string, ts long, v double")
    state = str(tmp_path / "corr_state")
    kw = dict(time_col="ts", series_col="s", value_col="v",
              bucket_ms=100, value_scale=1)
    # batch split by hash — late arrivals relative to event time
    batches = [df.where(F.crc32(F.concat_ws(",", "s", "ts", "v")) % 3 == i)
               for i in range(3)]
    for bid, b in enumerate(batches):
        process_series_sum_batch(b, bid, state, **kw)

    def canon(d):
        return sorted(
            (r.series_a, r.series_b, r.n_buckets, r.sx, r.sy, r.sxy,
             r.sxx, r.syy, r.corr)
            for r in d.collect()
        )

    want = canon(series_correlation(df, "ts", "s", "v", 100, value_scale=1))
    got = canon(correlation_from_state(read_series_state(spark, state)))
    assert got == want
    process_series_sum_batch(batches[2], 2, state, **kw)  # head redelivery
    assert canon(correlation_from_state(read_series_state(spark, state))) == want

    # r08: ACF served from the SAME maintained state is bit-identical
    # to the one-shot operator over everything streamed
    from temporal_vector_database_spark.operators.timeseries import series_acf
    from temporal_vector_database_spark.streaming.correlation import (
        acf_from_state,
    )

    def canon_acf(d):
        return sorted(
            (r.series, r.lag, r.n_pairs, r.sx, r.sy, r.sxy, r.sxx, r.syy, r.acf)
            for r in d.collect()
        )

    want_acf = canon_acf(series_acf(df, "ts", "s", "v", 100, max_lag=2))
    got_acf = canon_acf(acf_from_state(spark, state, bucket_ms=100, max_lag=2))
    assert got_acf == want_acf and len(got_acf) > 0


def test_seasonal_profile_phase_math_and_index(spark):
    """Phase is TZ-free integer math (epoch-day mod 7); indices weight
    phases against the key's overall mean exactly."""
    from temporal_vector_database_spark.operators.timeseries import (
        seasonal_profile,
    )

    day = 86_400_000
    rows = []
    # key "a": value 10 on phase 0 days, 20 on phase 1 days (2 each)
    for d, v in [(0, 10.0), (7, 10.0), (1, 20.0), (8, 20.0)]:
        rows.append(("a", d * day + 5, v))
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    got = {r.phase: r for r in
           seasonal_profile(df, "ts", ("k",), "v").collect()}
    assert set(got) == {0, 1}
    # overall mean 15: phase 0 index = 10/15, phase 1 = 20/15
    assert abs(got[0].seasonal_index - 10 / 15) < 1e-15
    assert abs(got[1].seasonal_index - 20 / 15) < 1e-15
    assert got[0].idx_num == 10_000 * 2 * 4  # phase_sum * n_total
    assert got[0].idx_den == 2 * 60_000      # n_phase * total_sum
    # epoch day 0 is phase 0 here; day 1 phase 1; day 7 wraps to 0


def test_m4_incremental_merge_equals_full_rebuild(spark):
    """Continuous-aggregate discipline for M4: folding batch partials
    with m4_merge equals the one-shot downsample — including a late
    point that IS the bucket's true minimum."""
    from temporal_vector_database_spark.operators.timeseries import (
        m4_downsample,
        m4_merge,
        m4_report,
        m4_state,
    )

    rows = [
        ("a", 1, 10, 5.0), ("a", 2, 30, 1.0), ("a", 3, 60, 7.0),
        ("a", 4, 90, 4.0), ("a", 5, 150, 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, eid long, t long, v double")
    args = ("t", ("k",), "v", 100, ("eid",))
    b1 = df.where(F.col("eid").isin(1, 3, 5))
    b2 = df.where(F.col("eid").isin(2, 4))   # eid 2 = late true minimum
    state = m4_merge(m4_state(b1, *args), m4_state(b2, *args))

    def canon(d):
        return sorted(tuple(r) for r in d.collect())

    assert canon(m4_report(state)) == canon(m4_downsample(df, *args))
    got = {(r.k, r.bucket_start_ms): (r.t_min, r.v_min)
           for r in m4_report(state).collect()}
    assert got[("a", 0)] == (30, 1.0)  # late point re-opened the minimum


def test_series_trend_exact_line_and_degenerate_key(spark):
    """A perfectly linear series recovers its slope/intercept exactly;
    a single-bucket key publishes NULLs."""
    from temporal_vector_database_spark.operators.timeseries import series_trend

    rows = []
    for d in range(5):           # key a: v = 3*d + 7 (in value units)
        rows.append(("a", d * 100 + 1, float(3 * d + 7)))
    rows.append(("b", 42, 5.0))  # single bucket
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    got = {r.k: r for r in
           series_trend(df, "ts", ("k",), "v", bucket_ms=100,
                        value_scale=1).collect()}
    assert got["a"].slope_units_per_bucket == 3.0
    assert got["a"].intercept_units == 7.0
    assert got["a"].n == 5 and got["a"].stt == 30
    assert got["b"].slope_units_per_bucket is None
    assert got["b"].intercept_units is None


def test_streaming_m4_state_equals_batch_and_replay_noop(spark, tmp_path):
    """3 micro-batches with a late extremum end with state == one-shot
    m4_downsample; replaying a committed batch changes nothing."""
    from temporal_vector_database_spark.operators.timeseries import (
        m4_downsample,
        m4_report,
    )
    from temporal_vector_database_spark.streaming.m4 import (
        process_m4_batch,
        read_m4_state,
    )

    rows = [
        ("a", 1, 10, 5.0), ("a", 2, 30, 1.0), ("a", 3, 60, 7.0),
        ("a", 4, 90, 4.0), ("a", 5, 150, 3.0), ("b", 6, 20, 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, event_id long, ts_ms long, v double")
    state = str(tmp_path / "m4_state")
    kw = dict(time_col="ts_ms", key_cols=("k",), value_col="v",
              bucket_ms=100, tiebreak_cols=("event_id",))
    batches = [
        df.where(F.col("event_id").isin(1, 5)),
        df.where(F.col("event_id").isin(3, 6)),
        df.where(F.col("event_id").isin(2, 4)),  # late true min of (a, 0)
    ]
    for bid, b in enumerate(batches):
        process_m4_batch(b, bid, state, **kw)

    def canon(d):
        return sorted(tuple(r) for r in d.collect())

    want = canon(m4_downsample(df, "ts_ms", ("k",), "v", 100, ("event_id",)))
    assert canon(m4_report(read_m4_state(spark, state))) == want
    process_m4_batch(batches[2], 2, state, **kw)  # head redelivery -> no-op
    assert canon(m4_report(read_m4_state(spark, state))) == want


def test_state_merge_key_collision_raises(spark):
    """ADVICE r05: a user key column named like a reserved state column
    ('high', 'n_events', '_f', ...) must raise when passed explicitly,
    not be silently folded into the merge; valid explicit keys work and
    match inference."""
    import pytest as _pytest

    from temporal_vector_database_spark.operators.timeseries import (
        m4_merge,
        m4_state,
        ohlc_merge,
        ohlc_state,
    )

    df = spark.createDataFrame(
        [(1, 100, 1.0), (1, 150, 2.0), (1, 250, 3.0)],
        "k int, ts_ms long, v double",
    )
    st = ohlc_state(df, "ts_ms", ("k",), "v", 100)
    with _pytest.raises(ValueError, match="collide"):
        ohlc_merge(st, st, key_cols=("high",))
    with _pytest.raises(ValueError, match="not in state"):
        ohlc_merge(st, st, key_cols=("nope",))
    got = {tuple(r) for r in ohlc_merge(st, st, key_cols=("k",)).collect()}
    want = {tuple(r) for r in ohlc_merge(st, st).collect()}
    assert got == want and len(got) > 0

    m4 = m4_state(df, "ts_ms", ("k",), "v", 100)
    with _pytest.raises(ValueError, match="collide"):
        m4_merge(m4, m4, key_cols=("_f",))
    got4 = {tuple(r) for r in m4_merge(m4, m4, key_cols=("k",)).collect()}
    assert got4 == {tuple(r) for r in m4_merge(m4, m4).collect()}


def test_robust_stats_hand_computed(spark):
    """Median/MAD/trimmed-mean on hand-checkable sets: odd and even
    counts, an outlier the median/MAD shrug off, and the exact
    half-sum for even medians."""
    from temporal_vector_database_spark.operators.timeseries import robust_stats

    rows = (
        # type 'a': values 1..5 plus outlier 1000 -> n=6
        [(i, "a", float(v)) for i, v in enumerate([3.0, 1.0, 1000.0, 2.0, 5.0, 4.0])]
        # type 'b': odd count, negative values
        + [(10 + i, "b", float(v)) for i, v in enumerate([-1.0, 0.5, 2.0])]
    )
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {r.event_type: r for r in robust_stats(ev, trim_frac_denom=3).collect()}

    a = got["a"]
    # sorted: 1 2 3 4 5 1000; median = (3+4)/2 = 3.5 (exact half-sum)
    assert a.n_events == 6 and a.median == 3.5
    # trim n//3=2 from each end: keep 3,4 -> mean 3.5 (outlier gone)
    assert a.trimmed_mean == 3.5
    # |2v - 7|: 5 3 1 1 3 1993 -> sorted 1 1 3 3 5 1993; mad4x = 3+3 -> 1.5
    assert a.mad == 1.5

    b = got["b"]
    # sorted: -1 0.5 2; median 0.5; trim 1 each end -> mean 0.5
    assert b.n_events == 3 and b.median == 0.5 and b.trimmed_mean == 0.5
    # |2v - 1|: 3 0 3 -> sorted 0 3 3 -> mad = (3+3)/4 = 1.5
    assert b.mad == 1.5


def test_changepoint_scan_finds_level_shift(spark):
    """A series that jumps from level 0 to level 10 at the midpoint
    peaks its cumulative deviation exactly AT the shift; a flat series
    peaks at 0 magnitude; the guard raises on overflow-risk inputs."""
    import pytest as _pytest

    from temporal_vector_database_spark.operators.timeseries import (
        changepoint_scan,
    )

    rows = (
        [(i, "shift", 1000 * i, 0.0) for i in range(50)]
        + [(50 + i, "shift", 1000 * (50 + i), 10.0) for i in range(50)]
        + [(200 + i, "flat", 1000 * i, 3.0) for i in range(40)]
    )
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_ms long, value double"
    )
    got = {r.event_type: r for r in changepoint_scan(ev).collect()}
    s = got["shift"]
    # mean is 5; C_t peaks at t=50 (end of the low segment): |C| = n*250*scale
    assert s.n_events == 100 and s.peak_frac == 0.5
    assert s.peak_ts_ms == 1000 * 49
    assert s.cusum_peak == 250.0
    f = got["flat"]
    assert f.cusum_peak == 0.0 and f.peak_frac == 1.0 / 40  # all-zero C, earliest wins

    big = spark.createDataFrame(
        [(i, "x", i, 9e8) for i in range(3)],
        "event_id long, event_type string, ts_ms long, value double",
    )
    with _pytest.raises(ValueError, match="overflow"):
        changepoint_scan(big, scale=10**9)


def test_series_spearman_monotone_and_outlier_robust(spark):
    """Spearman vs Pearson on hand-built series: a perfectly monotone
    nonlinear pair scores spearman 1.0 (Pearson < 1); one outlier
    bucket barely moves Spearman; tied buckets use averaged ranks."""
    from temporal_vector_database_spark.operators.timeseries import (
        series_correlation,
        series_spearman,
    )

    day = 86_400_000
    rows = []
    # a & b: monotone nonlinear (b = a^3-ish), 8 buckets
    for t in range(8):
        rows.append((f"e{t}", t * day, "a", float(t)))
        rows.append((f"f{t}", t * day, "b", float(t**3)))
        # c tracks a linearly except one wild outlier bucket
        rows.append((f"g{t}", t * day, "c", float(t if t != 4 else 10_000)))
    ev = spark.createDataFrame(rows, "event_id string, ts_ms long, event_type string, value double")

    sp = {(r.series_a, r.series_b): r.spearman
          for r in series_spearman(ev, "ts_ms", "event_type", "value", day).collect()}
    pe = {(r.series_a, r.series_b): r.corr
          for r in series_correlation(ev, "ts_ms", "event_type", "value", day).collect()}
    assert sp[("a", "b")] == 1.0 and pe[("a", "b")] < 1.0
    assert sp[("a", "c")] > 0.8  # one outlier moves one rank slot only
    assert abs(pe[("a", "c")]) < 0.5  # ...but saturates Pearson


def test_series_acf_hand_case_and_gap_semantics(spark):
    """r08: lag-1 ACF of a strictly alternating daily series is exactly
    -1.0 (perfect anti-correlation) and lag-2 is +1.0; a missing day
    contributes NO pair at any lag that touches it (observed-pairs
    contract, no zero-fill); zero-variance series publish NULL."""
    from temporal_vector_database_spark.operators.timeseries import series_acf

    D = 86_400_000
    rows = []
    # series 'alt': days 0..7 alternating 1, 3 (8 points, no gaps)
    for d in range(8):
        rows.append(("alt", d * D, 1.0 if d % 2 == 0 else 3.0))
    # series 'gap': days 0,1,3,4 value = day (day 2 missing)
    for d in (0, 1, 3, 4):
        rows.append(("gap", d * D, float(d)))
    # series 'flat': constant
    for d in range(4):
        rows.append(("flat", d * D, 5.0))
    df = spark.createDataFrame(rows, "event_type string, ts_ms long, value double")
    got = {
        (r.series, r.lag): r
        for r in series_acf(
            df, "ts_ms", "event_type", "value", D, max_lag=2
        ).collect()
    }
    import math

    def ieee_acf(n, sx, sy, sxy, sxx, syy):
        # the exact published expression (bit-stable, not simplified)
        return float(n * sxy - sx * sy) / (
            math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy))
        )

    a1 = got[("alt", 1)]
    assert a1.n_pairs == 7
    assert a1.acf == ieee_acf(7, a1.sx, a1.sy, a1.sxy, a1.sxx, a1.syy)
    assert abs(a1.acf + 1.0) < 1e-12  # perfect anti-correlation
    a2 = got[("alt", 2)]
    assert a2.n_pairs == 6 and abs(a2.acf - 1.0) < 1e-12
    # gap: lag-1 pairs are (0,1),(3,4) -> 2 pairs; lag-2 pairs are (1,3)
    # wait: lag-2 needs t and t+2 both observed: (1,3) yes, (2,4) no (2
    # missing), (0,2) no -> exactly 1 pair (zero variance -> NULL acf)
    assert got[("gap", 1)].n_pairs == 2
    assert got[("gap", 2)].n_pairs == 1 and got[("gap", 2)].acf is None
    assert got[("flat", 1)].acf is None
