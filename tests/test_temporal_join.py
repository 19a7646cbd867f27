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
