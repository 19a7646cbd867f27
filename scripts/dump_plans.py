"""Dump `.explain("formatted")` for named queries to plans/<outdir>/.

Usage: python scripts/dump_plans.py <outdir_suffix> query [query ...]
e.g.  python scripts/dump_plans.py before compaction_advisor_loop
writes plans/r12/compaction_advisor_loop_before.txt

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

NOTE: queries that localCheckpoint during plan construction EXECUTE
their upstream stages here — this is the same behaviour the bench
times, so the dumped plan is the served plan (post-checkpoint scans
show as LogicalRDD/InMemoryRelation exactly as the timed run sees
them).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from temporal_vector_database_spark.plans.registry import query_map  # noqa: E402
from temporal_vector_database_spark.session import get_spark  # noqa: E402
from temporal_vector_database_spark.sources.fixtures import ensure_fixtures  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ensure_fixtures(sf_dir)
    spark = get_spark("tvdb-plan-dump")
    qs = query_map()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    outdir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13")
    )
    os.makedirs(outdir, exist_ok=True)
    for n in names:
        df = qs[n](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
