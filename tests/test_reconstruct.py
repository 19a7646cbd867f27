"""Reconstruction (O4-O9) correctness.

- exact parity with a numpy re-implementation of the reference fold
  (nearest base + ordered sparse application, core/delta_computer.py:90-135);
- golden: with bases {1,6,11}, seq 7 and 10 reconstruct from base 6, never
  11 (tests/test_week2.py:443-463); v7 cost < 5 (:828-836);
- round-trip quality vs ground truth: cosine > 0.995
  (tests/test_week1.py:233-235);
- as-of probe semantics (inclusive <=, empty before first version).
"""

import numpy as np
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.reconstruct import (
    asof_resolve,
    parse_version_id,
    reconstruct_all,
    reconstruct_at,
    reconstruct_latest,
    reconstruct_range,
    with_quality_columns,
)
from temporal_vector_database_spark.operators.integrity import validate_reconstruction


def _numpy_reconstruct(rows, target):
    """Reference-style fold: nearest base at-or-before target, then apply
    deltas in order."""
    by_seq = {r["seq"]: r for r in rows}
    base_seq = max(s for s, r in by_seq.items() if r["kind"] == "base" and s <= target)
    emb = np.array(by_seq[base_seq]["embedding"], dtype=np.float64)
    for s in range(base_seq + 1, target + 1):
        d = by_seq[s]
        emb[np.array(d["sparse_idx"], dtype=int)] += np.array(d["sparse_val"])
    return base_seq, emb


def test_exact_vs_numpy_fold(versions):
    sample = versions.where(F.col("content_id").isin("c00000", "c00001", "sparsejump", "longchain"))
    rows = [r.asDict() for r in sample.collect()]
    by_content = {}
    for r in rows:
        by_content.setdefault(r["content_id"], []).append(r)
    out = {
        (r["content_id"], r["target_seq"]): r
        for r in reconstruct_all(sample).collect()
        for r in [r.asDict()]
    }
    for cid, crows in by_content.items():
        for target in sorted(r["seq"] for r in crows):
            base_seq, expected = _numpy_reconstruct(crows, target)
            got = out[(cid, target)]
            assert got["base_seq"] == base_seq, (cid, target)
            assert np.array_equal(np.array(got["embedding"]), expected), (cid, target)


def test_nearest_base_golden(spark, versions):
    targets = spark.createDataFrame([("c00000", 7), ("c00000", 10)], ["content_id", "target_seq"])
    res = {r.target_seq: r for r in reconstruct_at(versions, targets).collect()}
    assert res[7].base_seq == 6 and res[7].cost == 1
    assert res[10].base_seq == 6 and res[10].cost == 4
    assert res[7].cost < 5  # test_week2.py:828-836


def test_roundtrip_quality(versions, versions_raw):
    rec = reconstruct_all(versions.where(~F.col("content_id").startswith("corrupt")))
    truth = versions_raw.select(
        "content_id",
        F.col("seq").alias("target_seq"),
        F.col("embedding").alias("truth_embedding"),
    )
    checked = validate_reconstruction(rec.join(truth, ["content_id", "target_seq"]))
    bad_cos = checked.where(F.col("cosine_sim") <= 0.995).count()
    assert bad_cos == 0
    # base rows reconstruct exactly
    exact = checked.where((F.col("cost") == 0) & (F.col("l2_error") != 0.0)).count()
    assert exact == 0


def test_range_and_latest(versions):
    r = reconstruct_range(versions.where(F.col("content_id") == "c00002"), 2, 4)
    seqs = sorted(row.target_seq for row in r.collect())
    assert seqs == [2, 3, 4]  # exactly 3, ascending (test_week2.py:607-611)
    latest = reconstruct_latest(versions.where(F.col("content_id") == "c00002")).collect()
    assert len(latest) == 1 and latest[0].target_seq == 12


def test_asof_semantics(versions, asof_probes):
    resolved = asof_resolve(versions, asof_probes)
    rows = resolved.collect()
    by_case = {}
    for r in rows:
        by_case.setdefault(r["case"], []).append(r.target_seq)
    assert all(v is None for v in by_case["before_first"])
    assert all(v == 3 for v in by_case["exact_seq3"])  # inclusive <=
    assert all(v == 5 for v in by_case["between_5_and_6"])
    assert all(v == 12 for v in by_case["after_last"])


def test_parse_version_id(spark):
    df = spark.createDataFrame([("c00001_v7",), ("weird_v2_v13",)], ["version_id"])
    rows = {r.version_id: r for r in parse_version_id(df).collect()}
    assert rows["c00001_v7"].content_id == "c00001" and rows["c00001_v7"].target_seq == 7
    # rsplit('_v', 1) semantics: last _v wins (storage/temporal_database.py:212-214)
    assert rows["weird_v2_v13"].content_id == "weird_v2" and rows["weird_v2_v13"].target_seq == 13


def test_quality_columns(versions):
    rec = with_quality_columns(reconstruct_all(versions.where(F.col("content_id") == "c00000")))
    rows = {r.target_seq: r for r in rec.collect()}
    assert rows[1].quality_score == 1.0 and rows[1].error_bound == 0.0
    assert 0.0 < rows[10].quality_score <= 1.0
    assert rows[10].error_bound > rows[7].error_bound


def test_reconstruct_all_folded_twin(versions):
    """The grouped-map fold must reproduce the declarative reconstruct_all:
    exact embeddings/cost/provenance, chain averages to float tolerance."""
    from temporal_vector_database_spark.operators.reconstruct import (
        reconstruct_all,
        reconstruct_all_folded,
    )

    key = lambda r: (r.content_id, r.target_seq)  # noqa: E731
    a = {key(r): r for r in reconstruct_all(versions).collect()}
    b = {key(r): r for r in reconstruct_all_folded(versions).collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for k, ra in a.items():
        rb = b[k]
        assert ra.base_seq == rb.base_seq and ra.cost == rb.cost, k
        assert ra.deltas_applied == rb.deltas_applied, k
        assert ra.embedding == rb.embedding, k  # exact: dyadic-grid sums
        for fa, fb in ((ra.avg_magnitude, rb.avg_magnitude), (ra.avg_sparsity, rb.avg_sparsity)):
            assert (fa is None) == (fb is None), k
            if fa is not None:
                assert abs(fa - fb) < 1e-12, k


def test_out_of_range_sparse_indices_silently_dropped(spark):
    """Reference quirk #9 (core/data_structures.py:117-119): a delta entry
    whose dimension index is >= the embedding dimension is silently
    ignored by apply_to_embedding. Both reconstruction paths must
    reproduce that — no error, in-range entries still applied."""
    from datetime import datetime

    from temporal_vector_database_spark.operators.reconstruct import (
        reconstruct_all,
        reconstruct_all_folded,
    )

    t0 = datetime(2025, 1, 1)
    rows = [
        ("oob", 1, t0, "base", [1.0, 2.0, 3.0, 4.0], None, None, None, None, None, 4, "oob_1", None),
        ("oob", 2, t0, "delta", None, [1, 10], [0.5, 9.9], 1, 1.0, 2, 4, "oob_v2", None),
    ]
    schema = (
        "content_id string, seq int, ts timestamp, kind string,"
        " embedding array<double>, sparse_idx array<int>, sparse_val array<double>,"
        " from_seq int, magnitude double, n_changed int, total_dims int,"
        " version_id string, metadata map<string,string>"
    )
    versions = spark.createDataFrame(rows, schema)
    for fn in (reconstruct_all, reconstruct_all_folded):
        got = {r.target_seq: r.embedding for r in fn(versions).collect()}
        assert got[1] == [1.0, 2.0, 3.0, 4.0]
        assert got[2] == [1.0, 2.5, 3.0, 4.0]  # idx 10 dropped, idx 1 applied


def test_negative_sparse_indices_dropped_in_both_paths(spark):
    """Deliberate deviation from the reference: its `if idx < len` check
    lets Python WRAP negative indices; both paths here DROP them (corrupt
    data should never silently wrap), so the twins stay bit-equal on any
    input (ADVICE r01)."""
    from datetime import datetime

    from temporal_vector_database_spark.operators.reconstruct import (
        reconstruct_all,
        reconstruct_all_folded,
    )

    t0 = datetime(2025, 1, 1)
    rows = [
        ("neg", 1, t0, "base", [1.0, 2.0, 3.0, 4.0], None, None, None, None, None, 4, "neg_1", None),
        ("neg", 2, t0, "delta", None, [-1, 2], [9.9, 0.5], 1, 1.0, 2, 4, "neg_v2", None),
    ]
    schema = (
        "content_id string, seq int, ts timestamp, kind string,"
        " embedding array<double>, sparse_idx array<int>, sparse_val array<double>,"
        " from_seq int, magnitude double, n_changed int, total_dims int,"
        " version_id string, metadata map<string,string>"
    )
    versions = spark.createDataFrame(rows, schema)
    for fn in (reconstruct_all, reconstruct_all_folded):
        got = {r.target_seq: r.embedding for r in fn(versions).collect()}
        # idx -1 dropped (NOT wrapped onto the last dim), idx 2 applied
        assert got[2] == [1.0, 2.0, 3.5, 4.0], fn.__name__


def test_folded_last_equals_declarative_latest(spark, versions):
    """`reconstruct_all_folded(emit='last')` (one shuffle + narrow pass)
    must emit exactly the declarative `reconstruct_latest` rows,
    bit-for-bit, including timelines with no base (no row) and
    mid-timeline base promotions."""
    from temporal_vector_database_spark.operators.reconstruct import (
        reconstruct_all_folded,
        reconstruct_latest,
    )

    def canon(df):
        return {
            r.content_id: (
                r.target_seq, r.base_seq, r.cost, r.avg_magnitude,
                r.avg_sparsity, tuple(r.deltas_applied), tuple(r.embedding),
            )
            for r in df.collect()
        }

    a = canon(reconstruct_latest(versions))
    b = canon(reconstruct_all_folded(versions, emit="last"))
    assert a == b and len(a) > 0


def test_duplicate_sparse_indices_accumulate_in_both_paths(spark):
    """Reference semantics: `arr[idx] += v` per ENTRY, so a duplicated
    index accumulates (core/data_structures.py:117-119). map_from_arrays
    would raise DUPLICATED_MAP_KEY — the declarative path must fall back
    to the entry-fold; found by the twins property test."""
    from datetime import datetime

    from temporal_vector_database_spark.operators.reconstruct import (
        reconstruct_all,
        reconstruct_all_folded,
    )

    t0 = datetime(2025, 1, 1)
    rows = [
        ("dup", 1, t0, "base", [1.0, 2.0, 3.0, 4.0], None, None, None, None, None, 4, "dup_1", None),
        ("dup", 2, t0, "delta", None, [0, 0, 2], [0.25, 0.25, 0.5], 1, 1.0, 2, 4, "dup_v2", None),
    ]
    schema = (
        "content_id string, seq int, ts timestamp, kind string,"
        " embedding array<double>, sparse_idx array<int>, sparse_val array<double>,"
        " from_seq int, magnitude double, n_changed int, total_dims int,"
        " version_id string, metadata map<string,string>"
    )
    versions = spark.createDataFrame(rows, schema)
    for fn in (reconstruct_all, reconstruct_all_folded):
        got = {r.target_seq: r.embedding for r in fn(versions).collect()}
        assert got[2] == [1.5, 2.0, 3.5, 4.0], fn.__name__  # 0.25 applied twice


def test_reconstruct_diff_hand_built(spark):
    """Time-travel diff on a hand-built timeline: bases at 1 and 4,
    deltas at 2, 3, 5. Diff between t(seq2) and t(seq5) crosses a base
    boundary; a content resolving to the SAME seq at both instants
    publishes an all-zeros diff; a content born after t_a publishes no
    row."""
    from datetime import datetime, timedelta

    from temporal_vector_database_spark.operators.reconstruct import (
        reconstruct_diff,
    )

    t0 = datetime(2025, 1, 1)
    d = timedelta(days=1)
    schema = (
        "content_id string, seq int, ts timestamp, kind string,"
        " embedding array<double>, sparse_idx array<int>, sparse_val array<double>,"
        " from_seq int, magnitude double, n_changed int, total_dims int,"
        " version_id string, metadata map<string,string>"
    )
    rows = [
        # content A: base1 [1,1,1,1]; +0.5@0; +0.25@2; base4 [2,2,2,2]; -1@3
        ("A", 1, t0, "base", [1.0, 1.0, 1.0, 1.0], None, None, None, None, None, 4, "A_1", None),
        ("A", 2, t0 + d, "delta", None, [0], [0.5], 1, 0.5, 1, 4, "A_v2", None),
        ("A", 3, t0 + 2 * d, "delta", None, [2], [0.25], 2, 0.25, 1, 4, "A_v3", None),
        ("A", 4, t0 + 3 * d, "base", [2.0, 2.0, 2.0, 2.0], None, None, None, None, None, 4, "A_4", None),
        ("A", 5, t0 + 4 * d, "delta", None, [3], [-1.0], 4, 1.0, 1, 4, "A_v5", None),
        # content B: only one version, before both instants -> same state twice
        ("B", 1, t0, "base", [7.0, 7.0, 7.0, 7.0], None, None, None, None, None, 4, "B_1", None),
        # content C: born after t_a -> no row
        ("C", 1, t0 + 10 * d, "base", [9.0], None, None, None, None, None, 1, "C_1", None),
    ]
    versions = spark.createDataFrame(rows, schema)
    t_a = t0 + d          # A resolves seq 2 (state [1.5,1,1,1]), B seq 1
    t_b = t0 + 4 * d      # A resolves seq 5 (state [2,2,2,1]),   B seq 1
    got = {r.content_id: r for r in reconstruct_diff(versions, t_a, t_b).collect()}
    assert set(got) == {"A", "B"}
    a = got["A"]
    # diff = [0.5, 1.0, 1.0, 0.0]
    assert (a.seq_a, a.seq_b, a.n_changed) == (2, 5, 3)
    assert a.diff_sum == 2.5
    assert a.magnitude == (0.25 + 1.0 + 1.0) ** 0.5
    b = got["B"]
    assert (b.seq_a, b.seq_b, b.n_changed, b.magnitude, b.diff_sum) == (1, 1, 0, 0.0, 0.0)


def test_entry_flagship_validation_contract(spark):
    """VERDICT r08 #2: pin the flagship `entry()` validation semantics
    so a drift in `is_valid` / `cosine_valid` is visible.

    On the sf0.001 fixture: cost==0 rows (base snapshots) are bit-exact
    and valid under the reference's l2<0.01 tolerance
    (core/delta_computer.py:194); every cost>0 row accumulates the
    lossy encode's sub-threshold mass (sparsity_threshold=0.01) to an
    l2_error ABOVE that dimension-insensitive tolerance — is_valid is
    false BY CONSTRUCTION, not by defect — while the reference's real
    quality bar (cosine > 0.995, tests/test_week1.py:233-235) holds for
    every row."""
    import __spark_entry__ as entrymod

    rows = entrymod.entry(spark).collect()
    assert len(rows) > 0
    exact = [r for r in rows if r.cost == 0]
    lossy = [r for r in rows if r.cost > 0]
    # latest-version lookups on the interval-5 fixture always land past
    # a base (bases {1,6,11}, latest 12) so the flagship is all-lossy;
    # the cost==0 exact path is pinned by test_roundtrip_quality above
    assert lossy
    for r in exact:
        assert r.l2_error == 0.0 and r.is_valid, r.content_id
    for r in lossy:
        assert not r.is_valid, (r.content_id, r.l2_error)
        assert 0.0 < r.l2_error < 0.05, (r.content_id, r.l2_error)
    for r in rows:
        assert r.cosine_valid and r.cosine_sim > 0.995, r.content_id
