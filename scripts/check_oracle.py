"""Driver-mimic correctness harness: run every ``queries()`` entry on Spark
AND its ``oracle_sql()`` on DuckDB, compare row count + column names +
order-insensitive values (exact repr equality — stricter than the driver's
value hash).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from temporal_vector_database_spark.plans.registry import oracle_map  # noqa: E402
from temporal_vector_database_spark.session import get_spark  # noqa: E402
from temporal_vector_database_spark.sources.tables import DRIVER_TABLES  # noqa: E402


def _canon_cell(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return "b:" + str(v)
    return repr(v)


def _canon_rows(rows, col_order):
    out = [tuple(_canon_cell(r[i]) for i in col_order) for r in rows]
    out.sort()
    return out


def main() -> int:
    # positional args ONLY — an unknown --flag used to silently filter to
    # nothing and pass vacuously (VERDICT r11 #2); reject it up front
    bad = [a for a in sys.argv[1:] if a.startswith("-")]
    if bad:
        print(
            f"unknown flag(s) {bad}: usage: python scripts/check_oracle.py"
            " [sf_dir] [query ...]  (positional only)",
            file=sys.stderr,
        )
        return 2
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    qs_all = entrymod.queries()
    unknown = sorted(q for q in only if q not in qs_all)
    if unknown:
        print(
            f"unknown query name(s) {unknown}: not in the declared registry",
            file=sys.stderr,
        )
        return 2

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = oracle_map(sf_dir)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows={len(srows)})")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = list(res.columns)
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error: {str(e)[:200]}")
            continue

        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema: spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
        if not problems:
            s_order = [scols.index(c) for c in sorted(scols)]
            o_order = [ocols.index(c) for c in sorted(ocols)]
            sc = _canon_rows(srows, s_order)
            oc = _canon_rows(orows, o_order)
            if sc != oc:
                ndiff = sum(1 for a, b in zip(sc, oc) if a != b)
                ex = next((a, b) for a, b in zip(sc, oc) if a != b)
                problems.append(
                    f"values: {ndiff}/{len(sc)} rows differ; cols={sorted(scols)}; first: spark={ex[0]} oracle={ex[1]}"
                )
        dt = time.time() - t0
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name} ({dt:.1f}s): " + " | ".join(problems)[:500])
        else:
            print(f"OK    {name} ({dt:.1f}s, rows={len(srows)})")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: " + ", ".join(n for n, _ in failures))
        return 1
    print("ALL QUERIES MATCH ORACLE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
