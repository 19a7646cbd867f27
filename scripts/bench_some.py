"""Isolated min-of-N timing for a subset of headline queries — the
quiet-host diagnosis harness (r06 verdict #2: separate plan regressions
from bench-neighborhood cache pressure).

Usage: python scripts/bench_some.py query [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_REPS (3).

Runs the same fixture ensures + warmup as bench.py, then ONLY the named
queries, printing per-rep raw timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from temporal_vector_database_spark.plans.registry import (  # noqa: E402
    events_ts_range,
    query_map,
)
from temporal_vector_database_spark.session import get_spark  # noqa: E402
from temporal_vector_database_spark.sources.fixtures import (  # noqa: E402
    ensure_events_zordered,
    ensure_fixtures,
    ensure_ivf_store_upserted,
    ensure_ivfpq_index,
    ensure_ivfpq_residual_index,
    ensure_lsh_band_store,
    ensure_minhash_store,
    ensure_mrl_index,
)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ensure_fixtures(sf_dir)
    spark = get_spark("tvdb-bench-some")
    qs = query_map()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    from temporal_vector_database_spark.sources.fixtures import (
        ensure_snapshot_export,
    )

    ensure_snapshot_export(spark, sf_dir)
    ensure_minhash_store(spark, sf_dir)
    ensure_lsh_band_store(spark, sf_dir)
    ensure_ivf_store_upserted(spark, sf_dir)
    ensure_events_zordered(spark, sf_dir)
    ensure_mrl_index(spark, sf_dir)
    ensure_ivfpq_index(spark, sf_dir)
    ensure_ivfpq_residual_index(spark, sf_dir)
    events_ts_range(spark, sf_dir)

    spark.range(1000).selectExpr("sum(id)").collect()
    ncores = spark.sparkContext.defaultParallelism
    spark.range(0, ncores, 1, ncores).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    warm = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k int, v double")
    warm.groupBy("k").applyInPandas(lambda p: p, schema="k int, v double").collect()
    spark.sql(
        "SELECT aggregate(transform(sequence(1, 8), x -> cast(x as double)),"
        " 0D, (a, x) -> a + x), md5('w')"
    ).collect()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    out = {}
    for name in names:
        fn = qs[name]
        rawn = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            rawn.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(rawn), "reps": rawn}
        print(f"{name}: min={min(rawn)} reps={rawn}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
