"""Probe-normalized bench adjudication (r11, VERDICT r10 #3) — pure
arithmetic, no Spark."""

from __future__ import annotations

from temporal_vector_database_spark.bench_util import probe_normalized_ratios


def test_uniform_host_drift_cancels():
    """The r10 scenario: every query 2x slower AND the probe 2x slower
    -> host drift, nothing flags."""
    prev = {"queries": {"a": 1.0, "b": 4.0}, "cpu_probe_sec": 0.04}
    cur = {"queries": {"a": 2.0, "b": 8.0}, "cpu_probe_sec": 0.08}
    rep = probe_normalized_ratios(cur, prev)
    assert rep["probe_ratio"] == 2.0
    assert rep["flagged"] == []
    assert rep["queries"]["a"]["raw_ratio"] == 2.0
    assert rep["queries"]["a"]["norm_ratio"] == 1.0


def test_plan_regression_survives_normalization():
    """Equal probes + one slower query -> plan change, flags."""
    prev = {"queries": {"a": 1.0, "b": 1.0}, "cpu_probe_sec": 0.04}
    cur = {"queries": {"a": 1.05, "b": 3.0}, "cpu_probe_sec": 0.04}
    rep = probe_normalized_ratios(cur, prev)
    assert rep["flagged"] == ["b"]
    assert not rep["queries"]["a"]["flagged"]


def test_missing_probe_falls_back_to_raw():
    """Records predating cpu_probe_sec (r09 and earlier) compare at
    probe_ratio 1.0 instead of failing."""
    prev = {"queries": {"a": 1.0}}
    cur = {"queries": {"a": 1.8}, "cpu_probe_sec": 0.05}
    rep = probe_normalized_ratios(cur, prev)
    assert rep["probe_ratio"] == 1.0
    assert rep["flagged"] == ["a"]


def test_disjoint_queries_ignored():
    prev = {"queries": {"a": 1.0, "only_prev": 9.0}, "cpu_probe_sec": 0.05}
    cur = {"queries": {"a": 1.0, "only_cur": 9.0}, "cpu_probe_sec": 0.05}
    rep = probe_normalized_ratios(cur, prev)
    assert set(rep["queries"]) == {"a"}


def test_check_oracle_rejects_flag_args():
    """r12 (VERDICT r11 #2): a `--only x` invocation must exit non-zero
    with a usage message instead of filtering to nothing and passing
    vacuously."""
    import subprocess
    import sys

    p = subprocess.run(
        [sys.executable, "scripts/check_oracle.py", "--only", "dedup_exact"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert p.returncode == 2, (p.returncode, p.stdout[-500:], p.stderr[-500:])
    assert "usage" in p.stderr


def test_check_oracle_rejects_unknown_query_names():
    import subprocess
    import sys

    p = subprocess.run(
        [sys.executable, "scripts/check_oracle.py", "/root/testdata/sf0.001",
         "no_such_query"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert p.returncode == 2, (p.returncode, p.stdout[-500:], p.stderr[-500:])
    assert "unknown query" in p.stderr
