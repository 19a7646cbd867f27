"""DSIR importance resampling — the fixed-point-log2 surrogate's exact
properties and the selection's target-enrichment behavior."""

import math

from pyspark.sql import functions as F


def _score_py(x: int) -> int:
    """Python mirror of the fixed-point log2: L*2^16 + floor((x-2^L)*2^16/2^L)."""
    L = x.bit_length() - 1
    return L * 65536 + ((x - (1 << L)) * 65536) // (1 << L)


def test_fixed_log2_matches_python_mirror_and_log2(spark):
    from temporal_vector_database_spark.operators.dsir import _fixed_log2_sql

    xs = [1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 100, 1023, 1024, 1025,
          65535, 65536, 10**6, 10**9, 2**40 - 1, 2**40]
    df = spark.createDataFrame([(x,) for x in xs], "x long").select(
        "x", F.expr(_fixed_log2_sql("x")).alias("s")
    )
    got = {r.x: r.s for r in df.collect()}
    prev = None
    for x in xs:
        assert got[x] == _score_py(x)
        # exact at powers of two
        if x & (x - 1) == 0:
            assert got[x] == (x.bit_length() - 1) * 65536
        # within the linear-interp error of true log2 (max ~0.0861)
        assert abs(got[x] / 65536 - math.log2(x)) < 0.087
        # strictly monotone over the sample
        if prev is not None:
            assert got[x] > prev
        prev = got[x]


def test_fixed_log2_spark_duckdb_bit_equality(spark):
    import duckdb

    from temporal_vector_database_spark.operators.dsir import (
        _fixed_log2_sql,
        fixed_log2_duckdb_sql,
    )

    xs = list(range(1, 300)) + [2**k + d for k in range(9, 41, 3) for d in (-1, 0, 1)]
    spark_vals = {
        r.x: r.s
        for r in spark.createDataFrame([(x,) for x in xs], "x long")
        .select("x", F.expr(_fixed_log2_sql("x")).alias("s"))
        .collect()
    }
    duck = duckdb.sql(
        "SELECT x, " + fixed_log2_duckdb_sql("x") + " AS s FROM (SELECT unnest(?) AS x)",
        params=[xs],
    ).fetchall()
    assert {x: s for x, s in duck} == spark_vals


def test_dsir_select_enriches_target_language(spark, sf_dir):
    import os

    from temporal_vector_database_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    target = docs.where(F.col("lang") == "en")
    n = 50
    sel = dsir_select(docs, target, k=n)
    picked = docs.join(sel.select("doc_id"), "doc_id")
    frac_sel = picked.where(F.col("lang") == "en").count() / n
    frac_all = docs.where(F.col("lang") == "en").count() / docs.count()
    assert frac_sel > frac_all + 0.2  # strongly enriched toward the target


def test_dsir_weights_cover_all_docs_and_empty_docs_weight_zero(spark):
    from temporal_vector_database_spark.operators.dsir import dsir_weights

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, ""), (3, "cc"), (4, "aa bb")],
        "doc_id long, text string",
    )
    target = docs.where(F.col("doc_id") == 1)
    got = {r.doc_id: (r.weight_units, r.n_grams) for r in
           dsir_weights(docs, target, n_buckets=64).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == (0, 0)                      # no grams at all
    assert got[1][1] == 5                        # 3 unigrams + 2 bigrams
    assert got[4][1] == 3
    # doc 1 IS the target: its grams must be more target-like ON AVERAGE
    # than the unrelated doc 3's (total weights are length-dependent —
    # the doc weight is the whole-bag log-likelihood ratio, as in the
    # paper — so the comparison normalizes per gram)
    assert got[1][0] / got[1][1] > got[3][0] / got[3][1]


def test_streaming_dsir_counts_equal_one_shot_and_replay_noop(spark, tmp_path):
    """Folding doc batches into the counts state commits bit-identical
    model counts to the one-shot aggregation (additivity), so the
    derived lambda table — and therefore every document weight — is
    bit-identical too; replaying a committed batch changes nothing."""
    from temporal_vector_database_spark.operators.dsir import (
        bucket_counts,
        dsir_lambda_table,
        lambda_from_counts,
    )
    from temporal_vector_database_spark.streaming.dsir import (
        process_dsir_counts_batch,
        read_counts_state,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common word") for i in range(40)],
        "doc_id long, text string",
    )
    target = docs.where(F.col("doc_id") % 5 == 0)
    nb = 128
    tdir, rdir = str(tmp_path / "target"), str(tmp_path / "raw")
    for bid, lo in enumerate(range(0, 40, 10)):
        b = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 10))
        process_dsir_counts_batch(b, bid, rdir, n_buckets=nb)
        tb = b.where(F.col("doc_id") % 5 == 0)
        process_dsir_counts_batch(tb, bid, tdir, n_buckets=nb)

    tc, rc = read_counts_state(spark, tdir), read_counts_state(spark, rdir)
    want_rc = {r.bucket: r.c for r in bucket_counts(docs, nb).collect()}
    assert {r.bucket: r.c for r in rc.collect()} == want_rc

    lam_stream = {r.bucket: r.lambda_units
                  for r in lambda_from_counts(spark, tc, rc, nb).collect()}
    lam_batch = {r.bucket: r.lambda_units
                 for r in dsir_lambda_table(docs, target, nb).collect()}
    assert lam_stream == lam_batch

    # redeliver the HEAD batch -> state unchanged
    process_dsir_counts_batch(
        docs.where(F.col("doc_id") >= 30), 3, rdir, n_buckets=nb
    )
    rc2 = read_counts_state(spark, rdir)
    assert {r.bucket: r.c for r in rc2.collect()} == want_rc
