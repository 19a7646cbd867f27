"""Approximate aggregates (SURVEY.md §2.2: ABSENT in the reference, noted
as available): sketch outputs are engine-specific, so they cannot be
DuckDB-hash-gated — instead the error vs the exact answer is pinned.

At 100 TB these are the difference between a shuffle of every distinct
key and a constant-size sketch merge per partition: approx_count_distinct
is one HLL register set per partition, percentile_approx one KLL-style
sketch — both partial+final with no key shuffle at all.
"""

import os

from pyspark.sql import functions as F

from temporal_vector_database_spark.sources.tables import load_events

SF_DIR = os.environ.get("TVDB_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_approx_count_distinct_within_rsd(spark):
    ev = load_events(spark, SF_DIR)
    row = ev.agg(
        F.approx_count_distinct("user_id").alias("approx"),
        F.count_distinct("user_id").alias("exact"),
    ).first()
    # default rsd is 5%; allow 3 sigma
    assert abs(row.approx - row.exact) <= max(1, 0.15 * row.exact), row


def test_percentile_approx_within_accuracy(spark):
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    row = li.agg(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.9], 1000).alias("approx"),
        F.expr("percentile(l_extendedprice, array(0.25d, 0.5d, 0.9d))").alias("exact"),
    ).first()
    n = li.count()
    assert len(row.exact) == 3
    # percentile_approx guarantees rank error <= n/accuracy; verify via the
    # value's true rank rather than value distance
    vals = sorted(r.l_extendedprice for r in li.select("l_extendedprice").collect())
    for q, a in zip([0.25, 0.5, 0.9], row.approx):
        rank = sum(1 for v in vals if v <= a)
        assert abs(rank - q * n) <= n / 1000 + 1, (q, a, rank, q * n)


def test_quantile_normalize_ranks_and_ties(spark):
    """Per-dim quantile normalization: extremes map to 0 and 1, ties
    share the min rank (equal inputs -> equal quantiles), and q_mean is
    the exact integer-rank mean."""
    import pytest as _pytest

    from temporal_vector_database_spark.operators.linalg import quantile_normalize

    rows = [
        (1, [0.0, 5.0]),
        (2, [1.0, 5.0]),   # dim-1 tie with vec 1
        (3, [2.0, 7.0]),
        (4, [3.0, 9.0]),
        (5, [4.0, 9.0]),   # dim-1 tie with vec 4
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in quantile_normalize(df).collect()}
    # dim0 ranks: 1..5 -> rank-1 = 0..4; dim1 min-ranks: [1,1,3,4,4]
    want_rank_sum = {1: 0 + 0, 2: 1 + 0, 3: 2 + 2, 4: 3 + 3, 5: 4 + 3}
    assert {k: v.rank_sum for k, v in got.items()} == want_rank_sum
    # q_mean = rank_sum / (2 dims * (5-1))
    assert got[1].q_mean == 0.0
    assert got[5].q_mean == 7 / 8
    assert all(0.0 <= r.q_mean <= 1.0 for r in got.values())

    tiny = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError):
        quantile_normalize(tiny)
