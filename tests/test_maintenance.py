"""Maintenance operators must preserve reconstructions bit-for-bit."""

import datetime

from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.maintenance import (
    promote_bases,
    truncate_before,
)
from temporal_vector_database_spark.operators.reconstruct import reconstruct_all
from temporal_vector_database_spark.operators.stats import optimize_content_bases


def _recon_map(versions):
    return {
        (r.content_id, r.target_seq): (list(r.embedding), r.base_seq, r.cost)
        for r in reconstruct_all(versions).collect()
    }


def test_promote_bases_preserves_reconstructions(versions):
    v = versions.where(F.col("content_id") == "longchain")
    before = _recon_map(v)
    recs = optimize_content_bases(v)  # longchain: 1 base + 11 deltas → high cost
    assert recs.count() > 0
    promoted = promote_bases(v, recs.select("content_id", F.col("seq").alias("target_seq")))
    after = _recon_map(promoted)
    assert {k: e for k, (e, _, _) in after.items()} == {k: e for k, (e, _, _) in before.items()}
    # cost at the promoted seq drops to 0 and downstream chains shorten
    assert max(c for _, _, c in after.values()) < max(c for _, _, c in before.values())
    # advisor is satisfied after compaction
    assert optimize_content_bases(promoted).count() == 0


def test_promote_bases_precomputed_reconstructions_identical(versions):
    """r12: the shared-pass loop shape — feeding promote_bases the
    already-reconstructed target embeddings (``reconstructions=``) must
    yield a bit-identical compacted table to the default path that
    re-runs reconstruct_at internally."""
    v = versions.where(F.col("content_id").isin("longchain", "c00000"))
    recs = optimize_content_bases(v).select(
        "content_id", F.col("seq").alias("target_seq")
    )
    assert recs.count() > 0
    pre = reconstruct_all(v).join(
        recs, ["content_id", "target_seq"], "left_semi"
    ).select("content_id", "target_seq", "embedding")
    def table_map(df):
        return {
            (r.content_id, r.seq): (
                r.kind,
                list(r.embedding) if r.embedding is not None else None,
                r.version_id,
            )
            for r in df.collect()
        }
    default = table_map(promote_bases(v, recs))
    shared = table_map(promote_bases(v, recs, reconstructions=pre))
    assert shared == default


def test_promote_bases_uncovered_target_left_in_place(versions):
    """ADVICE r12: a target NOT covered by the supplied
    ``reconstructions`` frame must stay in the table as its original
    row — not vanish (the pre-r13 behavior anti-joined it out while no
    base row replaced it)."""
    v = versions.where(F.col("content_id").isin("longchain", "c00000"))
    # two delta rows as promotion targets, only one covered below
    recs = (
        v.where(F.col("kind") == "delta")
        .select("content_id", F.col("seq").alias("target_seq"))
        .orderBy("content_id", "target_seq")
        .limit(2)
        .localCheckpoint()
    )
    assert recs.count() == 2
    covered = recs.orderBy("content_id", "target_seq").limit(1)
    pre = reconstruct_all(v).join(
        covered, ["content_id", "target_seq"], "left_semi"
    ).select("content_id", "target_seq", "embedding")
    # ALL targets requested, only one covered: the rest stay unmodified
    promoted = promote_bases(v, recs, reconstructions=pre)
    want_rows = v.count()  # rewrite-in-place never changes the row count
    assert promoted.count() == want_rows
    uncovered = recs.join(covered, ["content_id", "target_seq"], "left_anti")
    still_there = promoted.join(
        uncovered.select(
            "content_id", F.col("target_seq").alias("seq")
        ),
        ["content_id", "seq"],
        "left_semi",
    )
    assert still_there.count() == uncovered.count()
    assert still_there.where(F.col("kind") == "delta").count() == uncovered.count()


def test_truncate_before_keeps_post_cutoff_reconstructions(versions):
    v = versions.where(F.col("content_id") == "c00000")
    # cutoff just after seq 8 (mid-epoch: its governing base is 6, so the
    # anchor promotion path is exercised)
    cutoff = v.where(F.col("seq") == 8).first().ts + datetime.timedelta(hours=1)
    before = {
        k: e for k, (e, _, _) in _recon_map(v).items()
    }
    truncated = truncate_before(v, cutoff)
    # dropped something, kept the anchor
    assert truncated.count() < v.count()
    after = _recon_map(truncated)
    kept_ts = {
        (r.content_id, r.seq)
        for r in truncated.select("content_id", "seq", "ts").collect()
    }
    for key, (emb, _, _) in after.items():
        assert emb == before[key]
    # every surviving row reconstructs (no dangling chains)
    assert set(after.keys()) == kept_ts


def test_retention_dryrun_matches_actual_truncation(versions):
    """r08: the dry-run report predicts exactly what truncate_before
    does — per-content survivor counts equal the actual post-truncation
    rows, a delta anchor is flagged (and really gets promoted), and
    dropped + survivors partition the store."""
    from temporal_vector_database_spark.operators.maintenance import (
        retention_dryrun,
    )

    v = versions.where(F.col("content_id").isin("c00000", "longchain"))
    cutoff = (
        v.where((F.col("content_id") == "c00000") & (F.col("seq") == 8))
        .first()
        .ts
        + datetime.timedelta(hours=1)
    )
    report = {r.content_id: r for r in retention_dryrun(v, cutoff).collect()}
    actual = truncate_before(v, cutoff)
    actual_counts = {
        r.content_id: r.n
        for r in actual.groupBy("content_id").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r.content_id: r.n
        for r in v.groupBy("content_id").agg(F.count("*").alias("n")).collect()
    }
    for cid, rep in report.items():
        assert actual_counts[cid] == rep.n_survivors, cid
        assert rep.n_dropped + rep.n_survivors == totals[cid], cid
    # c00000's governing version at the cutoff (seq 8, base at 6) is a
    # delta -> flagged, and the actual rewrite promoted it to a base
    rep = report["c00000"]
    assert rep.anchor_seq == 8 and rep.anchor_is_delta
    assert rep.promote_growth > 0
    kinds = {
        (r.content_id, r.seq): r.kind
        for r in actual.select("content_id", "seq", "kind").collect()
    }
    assert kinds[("c00000", 8)] == "base"


def test_is_local_path_classifier():
    """ADVICE r08: export_snapshot skips the (local-fs-only) manifest
    writer for object-store / HDFS paths instead of raising after the
    parquet write succeeded."""
    from temporal_vector_database_spark.operators.maintenance import (
        _is_local_path,
    )

    assert _is_local_path("/tmp/snap")
    assert _is_local_path("relative/snap")
    assert _is_local_path("file:///tmp/snap")
    assert not _is_local_path("s3a://bucket/snap")
    assert not _is_local_path("s3://bucket/snap")
    assert not _is_local_path("hdfs://nn:8020/snap")
    assert not _is_local_path("gs://bucket/snap")


def test_compaction_advisor_loop_gate_invariants(spark, sf_dir):
    """r11 (VERDICT r10 #5): the advisor -> promote -> re-advise gate
    publishes a provably clean post-compaction report — residual
    recommendations are zero for every content, the post-compaction max
    chain cost never exceeds the advisor bar, and contents with
    promotions saw their max cost drop to at most the bar."""
    from temporal_vector_database_spark.config import DEFAULT_CONFIG
    from temporal_vector_database_spark.plans.registry import (
        q_compaction_advisor_loop,
    )

    bar = DEFAULT_CONFIG.advisor_max_cost
    rows = q_compaction_advisor_loop(spark, sf_dir).collect()
    assert len(rows) > 0
    assert any(r.n_promoted > 0 for r in rows)  # the loop actually acted
    for r in rows:
        assert r.n_resid == 0, (r.content_id, r.n_resid)
        assert r.max_cost_after <= bar, (r.content_id, r.max_cost_after)
        assert r.n_versions > 0


def test_compaction_advisor_loop_value_invariance(spark, sf_dir, versions):
    """The gate's per-content value checksums equal the UNCOMPACTED
    reconstruction's (promote_bases is reconstruction-preserving) —
    the same cross-check the DuckDB oracle applies."""
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.plans.registry import (
        _emb_sums,
        q_compaction_advisor_loop,
    )

    v = versions.where(~F.col("content_id").startswith("corrupt"))
    want = {
        r.content_id: (r.s, r.w)
        for r in _emb_sums(reconstruct_all(v))
        .groupBy("content_id")
        .agg(F.sum("emb_sum").alias("s"), F.sum("emb_wsum").alias("w"))
        .collect()
    }
    got = {
        r.content_id: (r.emb_sum_total, r.emb_wsum_total)
        for r in q_compaction_advisor_loop(spark, sf_dir).collect()
    }
    assert got == want
