"""Generic as-of join: inclusive matching, per-key isolation, null when no
earlier right row exists."""

from temporal_vector_database_spark.operators.temporal import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (1, 5, "l0"), (2, 15, "l3")],
        "k long, t long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 18, "r18"), (2, 99, "r99")],
        "k long, t long, rv string",
    )
    res = {
        (r.k, r.t): r.rv_asof
        for r in asof_join(left, right, on="t", by=("k",), value_cols=("rv",)).collect()
    }
    assert res[(1, 10)] == "r10"  # inclusive: right row AT left time matches
    assert res[(1, 20)] == "r18"  # latest at-or-before
    assert res[(1, 5)] is None  # nothing earlier
    assert res[(2, 15)] is None  # other key's rows invisible; r99 is later


def test_asof_tolerance_and_forward(spark):
    from temporal_vector_database_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u", 100, "l1"), ("u", 205, "l2"), ("u", 400, "l3")],
        ["user_id", "t", "lid"],
    )
    right = spark.createDataFrame(
        [("u", 90, "r90"), ("u", 200, "r200"), ("u", 300, "r300")],
        ["user_id", "t", "rid"],
    )
    back = {r.lid: r.rid_asof for r in asof_join(
        left, right, on="t", by=("user_id",), value_cols=("rid",)).collect()}
    assert back == {"l1": "r90", "l2": "r200", "l3": "r300"}
    # tolerance 10: l1 (100-90=10) keeps, l2 (205-200=5) keeps, l3 (400-300=100) nulls
    tol = {r.lid: r.rid_asof for r in asof_join(
        left, right, on="t", by=("user_id",), value_cols=("rid",), tolerance=10).collect()}
    assert tol == {"l1": "r90", "l2": "r200", "l3": None}
    # forward: earliest right at-or-after; l3 has none
    fwd = {r.lid: r.rid_asof for r in asof_join(
        left, right, on="t", by=("user_id",), value_cols=("rid",), direction="forward").collect()}
    assert fwd == {"l1": "r200", "l2": "r300", "l3": None}
    # forward inclusive at equal time
    right2 = right.union(spark.createDataFrame([("u", 205, "r205")], right.columns))
    fwd2 = {r.lid: r.rid_asof for r in asof_join(
        left, right2, on="t", by=("user_id",), value_cols=("rid",), direction="forward").collect()}
    assert fwd2["l2"] == "r205"


def test_scd2_intervals_compress_and_close(spark):
    """Consecutive same-state updates fold into one row; intervals are
    half-open, adjacent, and ordered; the last state per key stays open
    (valid_to NULL); attr NULLs compare null-safely."""
    from temporal_vector_database_spark.operators.temporal import (
        scd2_intervals,
        scd2_snapshot,
    )

    rows = [
        # key 1: a@10, a@20 (dup -> folded), b@30, b@40 (dup), a@50
        (1, 1, 10, "a"), (1, 2, 20, "a"), (1, 3, 30, "b"),
        (1, 4, 40, "b"), (1, 5, 50, "a"),
        # key 2: NULL@10, NULL@20 (null-safe dup), c@30
        (2, 6, 10, None), (2, 7, 20, None), (2, 8, 30, "c"),
    ]
    df = spark.createDataFrame(rows, "k long, eid long, t long, state string")
    iv = scd2_intervals(
        df, key_cols=("k",), time_col="t", attr_cols=("state",),
        tiebreak_cols=("eid",),
    ).collect()
    got = sorted((r.k, r.valid_from, r.valid_to, r.state) for r in iv)
    assert got == [
        (1, 10, 30, "a"), (1, 30, 50, "b"), (1, 50, None, "a"),
        (2, 10, 30, None), (2, 30, None, "c"),
    ]

    iv_df = scd2_intervals(
        df, key_cols=("k",), time_col="t", attr_cols=("state",),
        tiebreak_cols=("eid",),
    )
    # snapshot semantics: boundary belongs to the NEW state (half-open)
    snap30 = sorted(
        (r.k, r.state) for r in scd2_snapshot(iv_df, 30).collect()
    )
    assert snap30 == [(1, "b"), (2, "c")]
    # before any update for a key -> key absent
    snap5 = scd2_snapshot(iv_df, 5).collect()
    assert snap5 == []
    # current snapshot = open rows
    snap99 = sorted((r.k, r.state) for r in scd2_snapshot(iv_df, 99).collect())
    assert snap99 == [(1, "a"), (2, "c")]


def test_scd2_no_compression_keeps_every_update(spark):
    from temporal_vector_database_spark.operators.temporal import scd2_intervals

    rows = [(1, 1, 10, "a"), (1, 2, 20, "a"), (1, 3, 30, "b")]
    df = spark.createDataFrame(rows, "k long, eid long, t long, state string")
    iv = scd2_intervals(
        df, key_cols=("k",), time_col="t", attr_cols=("state",),
        tiebreak_cols=("eid",), change_only=False,
    ).collect()
    assert sorted((r.valid_from, r.valid_to) for r in iv) == [
        (10, 20), (20, 30), (30, None)
    ]


def test_scd2_same_timestamp_ties_break_by_tiebreak(spark):
    """Two surviving changes at the same instant: the lower tiebreak id
    closes first (zero-length interval), the higher one carries forward —
    deterministically."""
    from temporal_vector_database_spark.operators.temporal import (
        scd2_intervals,
        scd2_snapshot,
    )

    rows = [(1, 1, 10, "a"), (1, 2, 10, "b")]
    df = spark.createDataFrame(rows, "k long, eid long, t long, state string")
    iv_df = scd2_intervals(
        df, key_cols=("k",), time_col="t", attr_cols=("state",),
        tiebreak_cols=("eid",),
    )
    got = sorted(
        ((r.valid_from, r.valid_to, r.state) for r in iv_df.collect()),
        key=lambda x: (x[0], x[1] is None, x[1] or 0),
    )
    assert got == [(10, 10, "a"), (10, None, "b")]
    assert [(r.state) for r in scd2_snapshot(iv_df, 10).collect()] == ["b"]


def test_coalesce_intervals_semantics(spark):
    """Overlap merges, touching (half-open) merges, disjoint splits;
    containment collapses; per-key independence; n_merged counts
    sources."""
    from temporal_vector_database_spark.operators.temporal import (
        coalesce_intervals,
    )

    rows = [
        (1, 0, 10), (1, 5, 20),    # overlap -> [0, 20)
        (1, 20, 30),               # touching -> extends to [0, 30)
        (1, 40, 50),               # disjoint -> new span
        (1, 41, 45),               # contained -> absorbed
        (2, 0, 100), (2, 200, 300),
    ]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = sorted(
        (r.k, r.span_start, r.span_end, r.n_merged)
        for r in coalesce_intervals(df, ("k",), "s", "e").collect()
    )
    assert got == [
        (1, 0, 30, 3), (1, 40, 50, 2),
        (2, 0, 100, 1), (2, 200, 300, 1),
    ]


def test_bitemporal_snapshot_hides_late_knowledge(spark):
    """As-known-at semantics: a correction that ARRIVED after the
    transaction-time cutoff is invisible even though its valid time
    qualifies; moving the cutoff forward reveals it."""
    from temporal_vector_database_spark.operators.temporal import (
        bitemporal_snapshot,
    )

    #            key eid valid  tx   state
    rows = [
        (1, 1, 10, 10, "a"),
        (1, 2, 20, 100, "b"),   # late-arriving correction (valid 20, known at 100)
        (1, 3, 30, 30, "c"),
    ]
    df = spark.createDataFrame(rows, "k long, eid long, v long, tx long, state string")
    kw = dict(key_cols=("k",), valid_col="v", tx_col="tx",
              attr_cols=("state",), tiebreak_cols=("eid",))
    # as known at tx=50, effective at v=25: the b@20 update hasn't arrived
    early = bitemporal_snapshot(df, at_tx=50, at_valid=25, **kw).collect()
    assert [(r.state) for r in early] == ["a"]
    # as known at tx=100, same valid time: b is now visible
    late = bitemporal_snapshot(df, at_tx=100, at_valid=25, **kw).collect()
    assert [(r.state) for r in late] == ["b"]
    # and the c@30 state is unaffected either way at its own valid time
    at30 = bitemporal_snapshot(df, at_tx=100, at_valid=30, **kw).collect()
    assert [(r.state) for r in at30] == ["c"]


def test_streaming_coverage_equals_batch_and_replay_noop(spark, tmp_path):
    """Streaming coverage maintenance over 3 micro-batches (late
    intervals bridging existing spans included) == one-shot
    coalesce_intervals over all intervals, INCLUDING exact n_merged via
    the weight thread; committed replays are no-ops."""
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.temporal import (
        coalesce_intervals,
    )
    from temporal_vector_database_spark.streaming.coverage import (
        process_coverage_batch,
        read_coverage_state,
    )

    rows = [
        (1, 1, 0, 10), (1, 2, 30, 40),   # two disjoint spans...
        (1, 3, 8, 32),                    # ...bridged by a LATE interval
        (1, 4, 100, 110),
        (2, 5, 0, 5), (2, 6, 5, 9),       # touching
    ]
    df = spark.createDataFrame(rows, "k long, iid long, s long, e long")
    state = str(tmp_path / "cov")
    kw = dict(key_cols=("k",), start_col="s", end_col="e")
    batches = [
        df.where(F.col("iid").isin(1, 5)),
        df.where(F.col("iid").isin(2, 6, 4)),
        df.where(F.col("iid") == 3),     # the late bridge
    ]
    for bid, b in enumerate(batches):
        process_coverage_batch(b, bid, state, **kw)

    def canon(d):
        return sorted(
            (r.k, r.span_start, r.span_end, r.n_merged) for r in d.collect()
        )

    want = canon(coalesce_intervals(df, ("k",), "s", "e"))
    got = canon(read_coverage_state(spark, state))
    assert got == want
    assert (1, 0, 40, 3) in got          # bridge merged two spans, count exact
    process_coverage_batch(batches[2], 2, state, **kw)   # head redelivery -> no-op
    assert canon(read_coverage_state(spark, state)) == want


def test_run_coverage_stream_end_to_end(spark, tmp_path):
    """Real Structured Streaming wiring (parquet source, 1 file per
    micro-batch, availableNow drain + checkpoint): the maintained state
    equals the one-shot coalesce over all streamed intervals."""
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.temporal import (
        coalesce_intervals,
    )
    from temporal_vector_database_spark.streaming.coverage import (
        read_coverage_state,
        run_coverage_stream,
    )

    rows = [
        (1, 0, 10), (1, 30, 40), (1, 8, 32), (1, 100, 110),
        (2, 0, 5), (2, 5, 9),
    ]
    df = spark.createDataFrame(rows, "user_id long, iv_start long, iv_end long")
    src = str(tmp_path / "src")
    for i in range(3):
        df.where(F.col("iv_start") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "cov_state")
    run_coverage_stream(stream, state, str(tmp_path / "ckpt"))

    def canon(d):
        return sorted(
            (r.user_id, r.span_start, r.span_end, r.n_merged) for r in d.collect()
        )

    want = canon(
        coalesce_intervals(df, ("user_id",), "iv_start", "iv_end")
    )
    assert canon(read_coverage_state(spark, state)) == want


def test_scd2_cdc_deletes_leave_gaps(spark):
    """CDC semantics: a delete closes the current interval; snapshots in
    the gap see NOTHING for the key; re-upsert reopens; repeated deletes
    compress; a delete as the final op leaves no open row."""
    from temporal_vector_database_spark.operators.temporal import (
        scd2_intervals_cdc,
        scd2_snapshot,
    )

    rows = [
        (1, 1, 10, "a", "upsert"),
        (1, 2, 20, None, "delete"),
        (1, 3, 25, None, "delete"),   # repeated delete -> compressed
        (1, 4, 30, "b", "upsert"),
        (2, 5, 10, "x", "upsert"),
        (2, 6, 40, None, "delete"),   # final delete: key 2 ends closed
    ]
    df = spark.createDataFrame(
        rows, "k long, eid long, t long, state string, op string"
    )
    iv_df = scd2_intervals_cdc(
        df, key_cols=("k",), time_col="t", attr_cols=("state",),
        tiebreak_cols=("eid",),
    )
    got = sorted(
        ((r.k, r.valid_from, r.valid_to, r.state) for r in iv_df.collect()),
        key=lambda x: (x[0], x[1], x[2] is None, x[2] or 0),
    )
    assert got == [
        (1, 10, 20, "a"), (1, 30, None, "b"),
        (2, 10, 40, "x"),
    ]
    # in the gap: key 1 absent; key 2 still alive at 25
    snap25 = sorted((r.k, r.state) for r in scd2_snapshot(iv_df, 25).collect())
    assert snap25 == [(2, "x")]
    # after key 2's final delete: only key 1's reopened state remains
    snap99 = sorted((r.k, r.state) for r in scd2_snapshot(iv_df, 99).collect())
    assert snap99 == [(1, "b")]
