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
