"""sf0.01 → sf0.1 wall-time scaling ratios for the heaviest headline
queries — the cheap super-linear-plan detector (VERDICT r08 #6): a
query whose wall-time ratio far exceeds the ~10× data ratio is hiding
an accidentally quadratic (or shuffle-explosive) plan that local[32]
at a single SF can't expose. Ratios around or below the data ratio are
healthy (fixed per-query overhead — job launch, Python worker warmup —
makes small-SF times floors, so ratios are usually WELL below 10×).

Usage: python scripts/scaling_check.py [N]   (default: top 15 by the
latest BENCH_r*.json per-query time; or pass query names).
Writes SCALING.json at the repo root.
"""

from __future__ import annotations

import glob
import json
import os
import re
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
    ensure_snapshot_export,
)

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"
# documents/events/lineitem row ratio between the two SFs
DATA_RATIO = 10.0
# wall ratio above this flags a query for diagnosis (superlinear smell);
# generous because a few plans have genuinely superlinear CANDIDATE
# terms (pair joins) that are still the intended scale shape
FLAG_RATIO = 25.0


def _latest_bench() -> dict:
    """Per-query times from BENCH_LOCAL.json (bench.py's full record;
    the driver's BENCH_r*.json stores only the compact line)."""
    path = os.path.join(REPO, "BENCH_LOCAL.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f).get("queries", {})


def _prepare(spark, sf_dir: str) -> None:
    ensure_fixtures(sf_dir)
    ensure_snapshot_export(spark, sf_dir)
    ensure_minhash_store(spark, sf_dir)
    ensure_lsh_band_store(spark, sf_dir)
    ensure_ivf_store_upserted(spark, sf_dir)
    ensure_events_zordered(spark, sf_dir)
    ensure_mrl_index(spark, sf_dir)
    ensure_ivfpq_index(spark, sf_dir)
    ensure_ivfpq_residual_index(spark, sf_dir)
    events_ts_range(spark, sf_dir)


def main() -> None:
    args = sys.argv[1:]
    qs = query_map()
    if args and not re.fullmatch(r"\d+", args[0]):
        names = args
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
    else:
        top_n = int(args[0]) if args else 15
        bench = _latest_bench()
        ranked = sorted(bench.items(), key=lambda kv: -kv[1])
        names = [n for n, _ in ranked if n in qs][:top_n]
        if not names:
            raise SystemExit("no BENCH_LOCAL.json to rank by; pass query names")

    spark = get_spark("tvdb-scaling-check")
    for sf in (SF_SMALL, SF_BIG):
        _prepare(spark, sf)
    # same warmup as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    ncores = spark.sparkContext.defaultParallelism
    spark.range(0, ncores, 1, ncores).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    warm = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k int, v double")
    warm.groupBy("k").applyInPandas(lambda p: p, schema="k int, v double").collect()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    # r11 (VERDICT r10 #3): probe host speed beside each SF's
    # measurement so the wall ratio can be NORMALIZED for host drift
    # that lands between the sf0.01 and sf0.1 timings — the same
    # mechanical adjudication bench_compare.py applies across rounds.
    from temporal_vector_database_spark.bench_util import cpu_probe_sec

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        times = {}
        probes = {}
        for label, sf in (("sf0.01", SF_SMALL), ("sf0.1", SF_BIG)):
            probes[label] = cpu_probe_sec(reps=3)
            raw = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf).write.mode("overwrite").format("noop").save()
                raw.append(round(time.perf_counter() - t0, 3))
            times[label] = min(raw)
        ratio = round(times["sf0.1"] / max(times["sf0.01"], 1e-9), 2)
        probe_ratio = round(probes["sf0.1"] / max(probes["sf0.01"], 1e-9), 4)
        norm_ratio = round(ratio / max(probe_ratio, 1e-9), 2)
        out[name] = {
            "sf0.01_sec": times["sf0.01"],
            "sf0.1_sec": times["sf0.1"],
            "wall_ratio": ratio,
            "probe_ratio": probe_ratio,
            "norm_ratio": norm_ratio,
            "flagged": norm_ratio > FLAG_RATIO,
        }
        print(
            f"{name}: sf0.01={times['sf0.01']}s sf0.1={times['sf0.1']}s "
            f"ratio={ratio} norm={norm_ratio}"
            f"{'  << FLAG' if norm_ratio > FLAG_RATIO else ''}",
            flush=True,
        )

    # merge into the existing artifact: a named-query run must not
    # clobber the standing top-N record
    path = os.path.join(REPO, "SCALING.json")
    merged = out
    if os.path.exists(path):
        with open(path) as f:
            merged = {**json.load(f).get("queries", {}), **out}
    # recompute every entry's flag from its ratio at merge time so
    # stale entries written under an older FLAG_RATIO can't contradict
    # the single top-level flag_ratio field (ADVICE r09). Entries
    # predating the r11 probe fields fall back to the raw wall ratio.
    for v in merged.values():
        v["flagged"] = v.get("norm_ratio", v["wall_ratio"]) > FLAG_RATIO
    artifact = {
        "data_ratio": DATA_RATIO,
        "flag_ratio": FLAG_RATIO,
        "reps_min_of": reps,
        "queries": merged,
        "flagged": sorted(n for n, v in merged.items() if v["flagged"]),
    }
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps({"flagged": artifact["flagged"]}))


if __name__ == "__main__":
    main()
