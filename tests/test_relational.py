"""Skew-resistant relational helpers: exactness of the two-phase salted
top-k against the single-window plan it replaces."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.relational import two_phase_topk
from temporal_vector_database_spark.sources.tables import load_events


def _plain_topk(e, k=3):
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("user_id", "event_id", "rank")
    )


def test_two_phase_topk_matches_single_window(spark, sf_dir):
    e = load_events(spark, sf_dir).select("event_id", "user_id", "value")
    expected = {(r.user_id, r.event_id, r.rank) for r in _plain_topk(e).collect()}
    for n_salt in (1, 4, 16):  # result must be salt-count invariant
        got = two_phase_topk(
            e,
            ["user_id"],
            [F.desc("value"), F.asc("event_id")],
            k=3,
            salt_col="event_id",
            n_salt=n_salt,
        ).select("user_id", "event_id", "rank")
        assert {(r.user_id, r.event_id, r.rank) for r in got.collect()} == expected


def test_two_phase_topk_hot_key(spark):
    """A single dominant key (the skew case the operator exists for):
    partial pass keeps ≤ k rows per salt bucket, final ranks are exact."""
    rows = [("hot", i, float(i % 97)) for i in range(2000)] + [
        ("cold", 9001, 5.0),
        ("cold", 9002, 3.0),
    ]
    df = spark.createDataFrame(rows, "key string, row_id long, score double")
    got = two_phase_topk(
        df,
        ["key"],
        [F.desc("score"), F.asc("row_id")],
        k=2,
        salt_col="row_id",
        n_salt=8,
    ).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r.key, []).append((r.rank, r.row_id, r.score))
    assert sorted(by_key["cold"]) == [(1, 9001, 5.0), (2, 9002, 3.0)]
    # hot: max score 96.0 at the two smallest row_ids with score 96
    hot = sorted(by_key["hot"])
    assert [h[2] for h in hot] == [96.0, 96.0]
    assert hot[0][1] == 96 and hot[1][1] == 193
