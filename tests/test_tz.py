"""Session-timezone regression net.

The only driver-red bug class in rounds 1–2 was session-TZ-sensitive
expressions: Spark's ``date_trunc``/``to_date``/``window``/... compute in
``spark.sql.session.timeZone``, so a query that matches its DuckDB oracle
under a UTC session silently diverges under the driver's (non-UTC)
session — same row count, shifted timestamp values, ``hash_match: false``.

Two nets here:

1. A static sweep over EVERY gated query's analyzed plan asserting no
   session-TZ-sensitive expression appears (timestamps must flow through
   integer epoch math or naive-field math only).
2. A live oracle comparison of ``version_rollup`` — the one gated query
   that computes a bucketed timestamp — under shifted session TZs and
   under BOTH parquet timestamp read modes (``inferTimestampNTZ``
   on/off), since the driver environment's read mode is not ours.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

import __spark_entry__ as entrymod
from temporal_vector_database_spark.plans.registry import oracle_map

# Expression names whose semantics depend on spark.sql.session.timeZone
# when applied to timestamps. hour/minute/... are omitted: they appear
# only on the NTZ branch of rollup where they are naive-field extraction.
_TZ_SENSITIVE = re.compile(
    r"\b(date_trunc|to_date|from_unixtime|unix_timestamp|date_format|"
    r"window|session_window|from_utc_timestamp|to_utc_timestamp|"
    r"current_timestamp|current_date|localtimestamp|now)\s*\("
)

# Queries allowed to carry a TZ-sensitive expression (none today; add a
# name here ONLY with a comment proving the expression is applied to a
# non-timestamp input or inside a pinned NTZ-only path).
_ALLOWED: set[str] = set()


def _analyzed(sdf) -> str:
    return sdf._jdf.queryExecution().analyzed().toString()


def test_no_tz_sensitive_exprs_in_any_gated_plan(spark, sf_dir):
    qs = entrymod.queries()
    offenders = {}
    for name, fn in qs.items():
        if name in _ALLOWED:
            continue
        try:
            plan = _analyzed(fn(spark, sf_dir))
        except Exception as e:  # plan construction must not fail either
            offenders[name] = f"plan build error: {e}"
            continue
        m = _TZ_SENSITIVE.search(plan)
        if m:
            offenders[name] = f"uses session-TZ-sensitive expr {m.group(1)!r}"
    assert not offenders, (
        "session-TZ-sensitive expressions in gated plans (these diverge "
        f"from the oracle under a non-UTC driver session): {offenders}"
    )


def _canon(rows, cols):
    order = [cols.index(c) for c in sorted(cols)]
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize(
    "qname", ["version_rollup", "version_rollup_report"]
)
@pytest.mark.parametrize("tz", ["America/Los_Angeles", "Asia/Kathmandu"])
@pytest.mark.parametrize("infer_ntz", ["true", "false"])
def test_version_rollup_matches_oracle_under_shifted_tz(
    spark, sf_dir, qname, tz, infer_ntz
):
    """Both halves of the r04 bisect pair: the integer-only state gate
    (``bucket_day`` BIGINT) and the timestamp+doubles report twin."""
    qs = entrymod.queries()
    sql = oracle_map(sf_dir)[qname]
    con = duckdb.connect()
    res = con.sql(sql)
    oracle = _canon(res.fetchall(), list(res.columns))

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    old_infer = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", infer_ntz)
        sdf = qs[qname](spark, sf_dir)
        if qname == "version_rollup":
            assert dict(sdf.dtypes)["bucket_day"] == "bigint"
            assert all(
                t in ("bigint",) for c, t in sdf.dtypes if c != "content_id"
            ), sdf.dtypes
        else:
            assert dict(sdf.dtypes)["bucket_start"] == "timestamp_ntz"
        got = _canon([tuple(r) for r in sdf.collect()], list(sdf.columns))
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", old_infer)
    assert got == oracle


def test_bucket_week_and_hour_are_tz_free(spark, fix_dir):
    """Hour/week buckets agree between the NTZ and LTZ input branches
    under a shifted session TZ (day is covered by the oracle test).

    The two read modes come from ``inferTimestampNTZ``: the fixture's
    NTZ-marked column reads as naive fields when on, and as LTZ carrying
    the identical raw micros when off — the same value seen two ways, so
    a TZ-free bucketing must produce identical naive buckets from both.
    """
    from temporal_vector_database_spark.operators.rollup import bucket_start_expr

    path = os.path.join(fix_dir, "versions.parquet")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    old_infer = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        for bucket in ("hour", "day", "week"):
            got = {}
            for infer in ("true", "false"):
                spark.conf.set(
                    "spark.sql.parquet.inferTimestampNTZ.enabled", infer
                )
                df = spark.read.parquet(path).select("ts")
                out = df.select(bucket_start_expr(bucket, df).alias("b"))
                assert dict(out.dtypes)["b"] == "timestamp_ntz"
                got[infer] = sorted(str(r[0]) for r in out.collect())
            assert got["true"] == got["false"], (
                f"bucket={bucket}: NTZ and LTZ branches disagree"
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", old_infer)
