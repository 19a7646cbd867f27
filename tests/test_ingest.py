"""Ingest pipeline (O1-O3) against the reference's golden expectations.

Goldens from the reference test suite (tests/test_week2.py):
- interval 5 over 12 versions → bases {1, 6, 11} (:409-434)
- >70% dims changed → sparsity-promoted base (:86-101)
- the Spark ingest must reproduce the independently generated fixture
  encoding bit-for-bit (delta values live on an exact dyadic grid).
"""

from pyspark.sql import functions as F

from temporal_vector_database_spark.config import FIXTURE_CONFIG
from temporal_vector_database_spark.operators.ingest import assign_sequence, encode_versions


def test_assign_sequence_matches_fixture_seq(versions_raw):
    reseq = assign_sequence(versions_raw.drop("seq"))
    mismatches = (
        reseq.join(
            versions_raw.select("content_id", "ts", F.col("seq").alias("expected_seq")),
            ["content_id", "ts"],
        )
        .where(F.col("seq") != F.col("expected_seq"))
        .count()
    )
    assert mismatches == 0


def test_base_placement_golden(versions_raw):
    enc = encode_versions(versions_raw, FIXTURE_CONFIG)
    rows = (
        enc.where((F.col("content_id") == "c00000") & (F.col("kind") == "base"))
        .select("seq")
        .orderBy("seq")
        .collect()
    )
    assert [r.seq for r in rows] == [1, 6, 11]


def test_sparsity_promotion(versions_raw):
    enc = encode_versions(versions_raw, FIXTURE_CONFIG)
    rows = (
        enc.where((F.col("content_id") == "sparsejump") & (F.col("kind") == "base"))
        .select("seq")
        .orderBy("seq")
        .collect()
    )
    assert 4 in [r.seq for r in rows]  # promoted by changed-dim ratio > 0.7


def test_longchain_single_base(versions_raw):
    enc = encode_versions(versions_raw, FIXTURE_CONFIG)
    rows = enc.where(F.col("content_id") == "longchain").collect()
    bases = [r.seq for r in rows if r.kind == "base"]
    assert bases == [1]
    assert sum(1 for r in rows if r.kind == "delta") == 11


def test_encode_matches_fixture_exactly(versions_raw, versions):
    """Full re-encode must match the independently generated storage table:
    same kinds, from_seq, sparse contents and raw-diff magnitudes."""
    enc = encode_versions(versions_raw, FIXTURE_CONFIG).alias("e")
    # corrupt contents have rows dropped from storage, not re-derivable
    expected = versions.where(~F.col("content_id").startswith("corrupt")).alias("v")
    e = enc.where(~F.col("content_id").startswith("corrupt"))
    assert e.count() == expected.count()
    joined = e.join(expected, ["content_id", "seq"], "inner")
    diff = joined.where(
        (F.col("e.kind") != F.col("v.kind"))
        | (F.coalesce(F.col("e.from_seq"), F.lit(-1)) != F.coalesce(F.col("v.from_seq"), F.lit(-1)))
        | (F.coalesce(F.col("e.magnitude"), F.lit(-1.0)) != F.coalesce(F.col("v.magnitude"), F.lit(-1.0)))
        | (
            F.coalesce(F.to_json(F.col("e.sparse_val")), F.lit(""))
            != F.coalesce(F.to_json(F.col("v.sparse_val")), F.lit(""))
        )
        | (
            F.coalesce(F.to_json(F.col("e.embedding")), F.lit(""))
            != F.coalesce(F.to_json(F.col("v.embedding")), F.lit(""))
        )
    ).count()
    assert joined.count() == expected.count()
    assert diff == 0


def test_streamed_encoder_bit_equal(versions_raw):
    """`encode_versions_streamed` (one Python call per Arrow batch) must be
    bit-identical to the per-group `encode_versions` twin — kinds, chains,
    sparse contents, magnitudes, version ids and metadata all compared via
    canonical JSON."""
    from temporal_vector_database_spark.operators.ingest import encode_versions_streamed

    def canon(df):
        return {
            (r["content_id"], r["seq"]): (
                r["kind"], r["from_seq"], r["magnitude"], r["n_changed"],
                r["total_dims"], r["version_id"],
                tuple(r["sparse_idx"] or []), tuple(r["sparse_val"] or []),
                tuple(r["embedding"] or []),
                tuple(sorted((r["metadata"] or {}).items())),
            )
            for r in df.collect()
        }

    a = canon(encode_versions(versions_raw, FIXTURE_CONFIG))
    b = canon(encode_versions_streamed(versions_raw, FIXTURE_CONFIG))
    assert a == b


def test_streamed_encoder_survives_batch_boundaries(spark, versions_raw):
    """Force tiny Arrow batches so content timelines straddle batch
    boundaries — encoder state must carry across them."""
    from temporal_vector_database_spark.operators.ingest import encode_versions_streamed

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        enc = encode_versions_streamed(versions_raw, FIXTURE_CONFIG)
        rows = (
            enc.where((F.col("content_id") == "c00000") & (F.col("kind") == "base"))
            .select("seq")
            .orderBy("seq")
            .collect()
        )
        assert [r.seq for r in rows] == [1, 6, 11]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_bucketed_layout_removes_window_exchange(spark, versions):
    from temporal_vector_database_spark.operators.reconstruct import with_governing_base
    from temporal_vector_database_spark.sources.tables import write_versions_bucketed

    spark.sql("DROP TABLE IF EXISTS _vb_test")
    write_versions_bucketed(versions, "_vb_test", buckets=4)
    try:
        plan_plain = (
            with_governing_base(versions)._jdf.queryExecution().executedPlan().toString()
        )
        plan_bucketed = (
            with_governing_base(spark.table("_vb_test"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan_plain.count("Exchange") >= 1
        assert plan_bucketed.count("Exchange") == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS _vb_test")


def test_force_base_mid_stream(spark):
    from datetime import datetime, timedelta

    from temporal_vector_database_spark.config import FIXTURE_CONFIG
    from temporal_vector_database_spark.operators.ingest import ingest

    t0 = datetime(2025, 1, 1)
    rows = []
    vec = [0.5] * 8
    for k in range(1, 6):
        vec = [v + (2 / 128 if k > 1 else 0) * (1 if i == k else 0) for i, v in enumerate(vec)]
        rows.append(("f", t0 + timedelta(days=k), vec, k == 3))
    raw = spark.createDataFrame(
        rows, "content_id string, ts timestamp, embedding array<double>, force_base boolean"
    )
    enc = {r.seq: r.kind for r in ingest(raw, FIXTURE_CONFIG).collect()}
    # forced base at 3 (reference force_base_snapshot param); 1 is always base
    assert enc == {1: "base", 2: "delta", 3: "base", 4: "delta", 5: "delta"}


def test_first_epoch_deltas_sql_twin(versions_raw, versions):
    """The pure-HOF encoder must reproduce the UDF encoder exactly on every
    delta whose predecessor is a base (there the chained reconstruction is
    the stored base itself, so the encode is a pure column expression)."""
    from temporal_vector_database_spark.operators.ingest import first_epoch_deltas_sql

    v = versions.where(~F.col("content_id").startswith("corrupt"))
    raw = versions_raw.where(~F.col("content_id").startswith("corrupt"))
    sql_side = first_epoch_deltas_sql(raw, v, FIXTURE_CONFIG).alias("s")
    stored = v.where(F.col("kind") == "delta").alias("d")
    joined = sql_side.join(stored, ["content_id", "seq"], "inner")
    assert joined.count() == sql_side.count() > 0
    bad = joined.where(
        (F.to_json(F.col("s.sparse_idx")) != F.to_json(F.col("d.sparse_idx")))
        | (F.to_json(F.col("s.sparse_val")) != F.to_json(F.col("d.sparse_val")))
        | (F.col("s.n_changed") != F.col("d.n_changed"))
        | (F.abs(F.col("s.magnitude") - F.col("d.magnitude")) > 1e-12)
    ).count()
    assert bad == 0


def test_versions_orc_json_roundtrip(spark, versions, tmp_path):
    from temporal_vector_database_spark.sources.tables import (
        read_versions_as,
        write_versions_as,
    )

    def canon(df):
        rows = [r.asDict(recursive=True) for r in df.collect()]
        return sorted((repr(sorted(d.items(), key=lambda kv: kv[0]))) for d in rows)

    want = canon(versions)
    for fmt in ("orc", "json"):
        p = str(tmp_path / fmt)
        write_versions_as(versions, p, format=fmt)
        got = read_versions_as(spark, p, format=fmt, schema=versions.schema)
        assert canon(got.select(*versions.columns)) == want, fmt

    import pytest

    with pytest.raises(ValueError):
        write_versions_as(versions, str(tmp_path / "bad"), format="csv")
    with pytest.raises(ValueError):
        read_versions_as(spark, str(tmp_path / "orc"), format="json")


def _late_raw(spark, n_contents=2, n_versions=9, dim=8):
    """Timelines whose every changed dim moves by >= 1/64 (supra the 0.01
    sparsity threshold) — encode is lossless on them by construction."""
    from datetime import datetime, timedelta

    t0 = datetime(2025, 6, 1)
    rows = []
    for c in range(n_contents):
        vec = [((c * 7 + d) % 9 - 4) / 64.0 for d in range(dim)]
        for k in range(1, n_versions + 1):
            if k > 1:
                for d in range(dim):
                    if (k + d + c) % 3 == 0:
                        vec[d] += (1 + (k + d) % 2) / 64.0
            rows.append((f"lc{c}", t0 + timedelta(days=k), list(vec)))
    return spark.createDataFrame(rows, "content_id string, ts timestamp, embedding array<double>")


def test_ingest_late_bit_exact_on_supra_threshold_timeline(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.config import FIXTURE_CONFIG
    from temporal_vector_database_spark.operators.ingest import ingest, ingest_late

    raw = _late_raw(spark)
    w = Window.partitionBy("content_id").orderBy("ts")
    ranked = raw.withColumn("rk", F.row_number().over(w))
    early = ranked.where(~F.col("rk").isin(3, 6)).drop("rk")
    late = ranked.where(F.col("rk").isin(3, 6)).drop("rk")

    full = ingest(raw, FIXTURE_CONFIG)
    stored = ingest(early, FIXTURE_CONFIG)
    out = ingest_late(stored, late, FIXTURE_CONFIG)

    def canon(df):
        return sorted(
            (
                r.content_id, r.seq, r.kind, r.from_seq, r.n_changed, r.magnitude,
                tuple(r.embedding or []), tuple(r.sparse_idx or []),
                tuple(r.sparse_val or []), r.version_id,
            )
            for r in df.collect()
        )

    assert canon(out) == canon(full) and out.count() == 18


def test_ingest_late_error_bound_on_lossy_fixture(spark, fix_dir):
    """On the REAL (lossy) fixture: every re-encoded version must
    reconstruct within the per-dim sparsity-threshold error bound of its
    merged-timeline input (recon-of-early for kept rows, raw for late
    rows) — the encoder's self-correcting clip contract."""
    import numpy as np
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.config import FIXTURE_CONFIG
    from temporal_vector_database_spark.operators.ingest import ingest, ingest_late
    from temporal_vector_database_spark.operators.reconstruct import reconstruct_all

    raw = (
        spark.read.parquet(fix_dir + "/versions_raw.parquet")
        .where(F.col("content_id").isin("c00001", "c00003"))
    )
    is_late = F.col("seq").isin(4, 7)
    early = raw.where(~is_late).drop("seq")
    late = raw.where(is_late).select("content_id", "ts", "embedding")
    stored = ingest(early, FIXTURE_CONFIG)
    out = ingest_late(
        stored, late, FIXTURE_CONFIG,
        policy=raw.select("content_id", "base_interval").distinct(),
    )

    # merged input: recon of the early chains at their ts + the late raws
    early_recon = (
        reconstruct_all(stored)
        .select("content_id", F.col("target_seq").alias("seq"), "embedding")
        .join(stored.select("content_id", "seq", "ts"), ["content_id", "seq"])
        .select("content_id", "ts", "embedding")
    )
    merged = {(r.content_id, r.ts): np.array(r.embedding) for r in early_recon.collect()}
    merged.update({(r.content_id, r.ts): np.array(r.embedding) for r in late.collect()})

    new_recon = (
        reconstruct_all(out)
        .select("content_id", F.col("target_seq").alias("seq"), "embedding")
        .join(out.select("content_id", "seq", "ts"), ["content_id", "seq"])
        .collect()
    )
    assert len(new_recon) == len(merged) > 0
    thr = FIXTURE_CONFIG.sparsity_threshold
    for r in new_recon:
        err = np.abs(np.array(r.embedding) - merged[(r.content_id, r.ts)]).max()
        assert err < thr, (r.content_id, r.seq, err)
