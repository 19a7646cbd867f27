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
