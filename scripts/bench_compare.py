"""Probe-normalized bench comparison (r11, VERDICT r10 #3): adjudicate
per-query regressions between two BENCH_LOCAL-style records WITHOUT a
re-measure cycle — divide each query's raw ratio by the cpu-probe
ratio so uniform host drift cancels and only plan-level changes flag.

Usage:
  python scripts/bench_compare.py PREV.json [CUR.json] [--flag 1.5]

PREV/CUR are BENCH_LOCAL.json-shaped records ({"queries": {...},
"cpu_probe_sec": s}); CUR defaults to the repo's BENCH_LOCAL.json. A
prev record can be recovered from git:
  git show <rev>:BENCH_LOCAL.json > /tmp/prev.json

Prints one line per common query (flagged rows marked) and a final
JSON summary line {"probe_ratio": r, "flagged": [...]}. Records
predating cpu_probe_sec (r09 and earlier) compare with probe_ratio 1.0
(raw ratios).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from temporal_vector_database_spark.bench_util import (  # noqa: E402
    probe_normalized_ratios,
)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    flag = 1.5
    if "--flag" in args:
        i = args.index("--flag")
        flag = float(args[i + 1])
        del args[i : i + 2]
    if not args:
        raise SystemExit(__doc__)
    prev_path = args[0]
    cur_path = args[1] if len(args) > 1 else os.path.join(REPO, "BENCH_LOCAL.json")
    with open(prev_path) as f:
        prev = json.load(f)
    with open(cur_path) as f:
        cur = json.load(f)
    rep = probe_normalized_ratios(cur, prev, flag_ratio=flag)
    print(
        f"cpu_probe: prev={prev.get('cpu_probe_sec')} "
        f"cur={cur.get('cpu_probe_sec')} ratio={rep['probe_ratio']}"
    )
    if prev.get("cpu_probe_par_sec") or cur.get("cpu_probe_par_sec"):
        print(
            f"cpu_probe_par: prev={prev.get('cpu_probe_par_sec')} "
            f"cur={cur.get('cpu_probe_par_sec')}  (throughput drift "
            "instrument — see bench_util.cpu_probe_parallel_sec)"
        )
    # the single-thread probe misses PARALLEL-throughput contention
    # (r11 lesson: a record taken at loadavg 5+ right after a test
    # suite showed 1.4-1.9x on dozens of untouched queries while the
    # probe read FASTER) — surface each record's loadavg so a reader
    # checks the cheap explanation first
    for tag, d in (("prev", prev), ("cur", cur)):
        la = d.get("loadavg")
        if la:
            print(f"loadavg[{tag}]: start={la['start']} end={la['end']}")
    for name, v in sorted(
        rep["queries"].items(), key=lambda kv: -kv[1]["norm_ratio"]
    ):
        mark = "  << FLAG" if v["flagged"] else ""
        print(
            f"{name}: {v['prev_sec']}s -> {v['cur_sec']}s "
            f"raw={v['raw_ratio']} norm={v['norm_ratio']}{mark}"
        )
    print(
        json.dumps(
            {"probe_ratio": rep["probe_ratio"], "flagged": rep["flagged"]}
        )
    )


if __name__ == "__main__":
    main()
