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
