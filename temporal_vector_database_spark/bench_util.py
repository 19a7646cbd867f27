"""Shared bench instrumentation (r11, VERDICT r10 #3).

``cpu_probe_sec`` is an ABSOLUTE single-thread workload (fixed numpy
matmul + a pure-Python loop, min-of-5) whose wall time depends only on
host state (CPU frequency, steal, contention) — never on this repo's
code. Two bench records can therefore be compared mechanically:

    norm_ratio(q) = (t_cur(q) / t_prev(q)) / (probe_cur / probe_prev)

Equal probes + slower query  -> plan change (investigate).
Proportionally elevated probe -> host drift (ignore; the r10 round
spent a judge/builder re-measure cycle proving exactly this for
`minhash_signature` 5.8x and `dedup_near_pairs_banded` 4.1x on
untouched code).

``bench.py`` publishes the probe in every BENCH_LOCAL.json;
``scripts/bench_compare.py`` computes the normalized flag list;
``scripts/scaling_check.py`` records the probe alongside its ratios.
"""

from __future__ import annotations

import time


def cpu_probe_sec(reps: int = 5) -> float:
    """Min-of-``reps`` wall time of the fixed probe workload."""
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.random((512, 512))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = a @ a
        for _i in range(2_000_000):
            pass
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def cpu_probe_parallel_sec(threads: int = 8, reps: int = 3) -> float:
    """Min-of-``reps`` wall time of the fixed probe matmul run on
    ``threads`` concurrent threads (numpy releases the GIL, so these
    genuinely occupy cores). The r11 lesson: host drift can move
    PARALLEL throughput while single-thread speed is unchanged or even
    improves (the r11 stamp measured 15 untouched queries uniformly
    1.3-1.6x the r10 record while the single-thread probe read 15%
    FASTER; isolated min-of-3 confirmed the elevation was host-state).
    Records publishing both probes let the next comparison separate
    frequency/steal drift (both move) from throughput/neighbor drift
    (only this one moves)."""
    import threading

    import numpy as np

    rng = np.random.default_rng(11)
    mats = [rng.random((512, 512)) for _ in range(threads)]

    def work(i: int) -> None:
        m = mats[i]
        for _ in range(4):
            m = m @ mats[i]

    best = float("inf")
    for _ in range(reps):
        ts = [threading.Thread(target=work, args=(i,)) for i in range(threads)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def probe_normalized_ratios(
    cur: dict, prev: dict, flag_ratio: float = 1.5
) -> dict:
    """Mechanical bench-drift adjudication between two BENCH_LOCAL-style
    records (each: ``{"queries": {name: sec}, "cpu_probe_sec": s}``).

    Returns ``{"probe_ratio": r, "queries": {name: {prev_sec, cur_sec,
    raw_ratio, norm_ratio, flagged}}, "flagged": [names]}`` where
    ``norm_ratio`` divides the raw per-query ratio by the probe ratio
    and ``flagged`` lists queries whose NORMALIZED ratio exceeds
    ``flag_ratio`` — host drift moves every raw ratio and the probe
    together, so it cancels; plan regressions survive."""
    pq, cq = prev.get("queries", {}), cur.get("queries", {})
    p_probe = float(prev.get("cpu_probe_sec") or 0.0)
    c_probe = float(cur.get("cpu_probe_sec") or 0.0)
    # records predating the probe (r09 and earlier) fall back to raw
    # ratios (probe_ratio 1.0) rather than failing
    probe_ratio = round(c_probe / p_probe, 4) if p_probe > 0 and c_probe > 0 else 1.0
    out: dict[str, dict] = {}
    for name in sorted(set(pq) & set(cq)):
        prev_s, cur_s = float(pq[name]), float(cq[name])
        raw = cur_s / max(prev_s, 1e-9)
        norm = raw / probe_ratio
        out[name] = {
            "prev_sec": round(prev_s, 3),
            "cur_sec": round(cur_s, 3),
            "raw_ratio": round(raw, 3),
            "norm_ratio": round(norm, 3),
            "flagged": norm > flag_ratio,
        }
    return {
        "probe_ratio": probe_ratio,
        "flag_ratio": flag_ratio,
        "queries": out,
        "flagged": sorted(n for n, v in out.items() if v["flagged"]),
    }
