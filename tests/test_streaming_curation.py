"""Streaming curation funnel: stream == batch for exact-signature
clustering, exactly-once survivor emission, and replay idempotency."""

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id bigint, text string, source string, n_chars bigint"


def _corpus(spark):
    base = [f"w{i}" for i in range(30)]
    stops = ["the", "and", "of", "to", "is"] * 2
    good_a = " ".join(base + stops)
    good_b = " ".join([f"y{i}" for i in range(30)] + stops)
    good_c = " ".join([f"z{i}" for i in range(30)] + stops)
    contaminated = " ".join(
        [f"x{i}" for i in range(30)] + stops + ["q1", "q2", "q3", "q4", "q5", "q6"]
    )
    rep_fail = " ".join(["the"] * 50)
    rows = [
        # batch 0
        (1, good_a, "src1", len(good_a)),
        (2, "tiny text", "src1", 9),
        (4, contaminated, "src2", len(contaminated)),
        (7, good_b, "src2", len(good_b)),
        # batch 1
        (5, good_a, "src1", len(good_a)),   # dup of 1, arrives later
        (3, rep_fail, "src2", len(rep_fail)),
        (8, good_c, "src1", len(good_c)),
        (9, good_b, "src2", len(good_b)),   # dup of 7, arrives later
        (11, good_c, "src1", len(good_c)),  # dup of 8, SAME batch -> lower id wins
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    ev = spark.createDataFrame([(100, "q1 q2 q3 q4 q5 q6", "eval", 17)], DOC_SCHEMA)
    return docs, ev


def test_stream_equals_batch_funnel(spark, tmp_path):
    from temporal_vector_database_spark.operators.pipeline import full_curation_report
    from temporal_vector_database_spark.streaming.curation import (
        read_stream_reports,
        read_stream_survivors,
        run_curation_stream,
    )

    docs, ev = _corpus(spark)
    src = str(tmp_path / "src")
    docs.where(F.col("doc_id").isin(1, 2, 4, 7)).coalesce(1).write.mode("append").parquet(src)
    docs.where(F.col("doc_id").isin(5, 3, 8, 9, 11)).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    out, state = str(tmp_path / "out"), str(tmp_path / "sigs")
    run_curation_stream(stream, ev, state, out, str(tmp_path / "ckpt"))

    surv = read_stream_survivors(spark, out)
    got_ids = sorted(r["doc_id"] for r in surv.collect())
    assert got_ids == [1, 7, 8]  # dups 5/9 dropped, 2/3/4 filtered

    # per-group survivor counts equal the one-shot batch funnel
    want = {
        (r["predicted_lang"], r["source"]): r["n_survivors"]
        for r in full_curation_report(docs, ev).collect()
    }
    got = {
        (r["predicted_lang"], r["source"]): r["cnt"]
        for r in surv.groupBy("predicted_lang", "source")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert {k: v for k, v in want.items() if v > 0} == got

    # per-stage attrition sums across batch reports match the batch funnel
    rep = read_stream_reports(spark, out)
    sums = (
        rep.groupBy("predicted_lang", "source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_quality").alias("n_quality"),
            F.sum("n_clean").alias("n_clean"),
        )
        .collect()
    )
    batch = {
        (r["predicted_lang"], r["source"]): (r["n_docs"], r["n_quality"], r["n_clean"])
        for r in full_curation_report(docs, ev).collect()
    }
    for r in sums:
        assert batch[(r["predicted_lang"], r["source"])] == (
            r["n_docs"], r["n_quality"], r["n_clean"],
        )


def test_curation_batch_replay_is_idempotent(spark, tmp_path):
    from temporal_vector_database_spark.streaming.curation import (
        process_curation_batch,
        read_stream_survivors,
    )
    from temporal_vector_database_spark.streaming.dedup import read_signature_store

    docs, ev = _corpus(spark)
    out, state = str(tmp_path / "out"), str(tmp_path / "sigs")
    b0 = docs.where(F.col("doc_id").isin(1, 2, 4, 7))
    b1 = docs.where(F.col("doc_id").isin(5, 3, 8, 9, 11))
    process_curation_batch(b0, 0, state, out, ev)
    process_curation_batch(b1, 1, state, out, ev)
    process_curation_batch(b1, 1, state, out, ev)  # replay
    surv = sorted(r["doc_id"] for r in read_stream_survivors(spark, out).collect())
    assert surv == [1, 7, 8]
    # store holds one signature row per ELIGIBLE doc, never doubled
    sigs = read_signature_store(spark, state)
    assert sigs.count() == 6  # eligible: 1, 7 (b0) and 5, 8, 9, 11 (b1)


def test_streaming_segment_dedup_equals_batch(spark, sf_dir, tmp_path):
    from temporal_vector_database_spark.operators.curation import segment_dedup
    from temporal_vector_database_spark.streaming.curation import (
        read_stream_segment_docs,
        run_segment_dedup_stream,
    )

    docs = spark.read.parquet(sf_dir + "/documents.parquet").select("doc_id", "text")
    med = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    src = str(tmp_path / "src")
    docs.where(F.col("doc_id") < med).coalesce(1).write.mode("append").parquet(src)
    docs.where(F.col("doc_id") >= med).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    out, state = str(tmp_path / "out"), str(tmp_path / "segs")
    run_segment_dedup_stream(stream, state, out, str(tmp_path / "ckpt"), width=4)

    got = {
        r["doc_id"]: (r["n_segments"], r["n_kept"], r["clean_hash"])
        for r in read_stream_segment_docs(spark, out).collect()
    }
    want = {
        r["doc_id"]: (r["n_segments"], r["n_kept"], r["clean_hash"])
        for r in segment_dedup(docs, width=4).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_segment_dedup_replay_idempotent(spark, tmp_path):
    from temporal_vector_database_spark.operators.curation import segment_dedup
    from temporal_vector_database_spark.streaming.curation import (
        process_segment_dedup_batch,
        read_stream_segment_docs,
    )

    rows = [(1, "p q r s"), (2, "p q x y"), (3, "r s"), (4, "x y p q")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out, state = str(tmp_path / "out"), str(tmp_path / "segs")
    b0 = docs.where(F.col("doc_id") <= 2)
    b1 = docs.where(F.col("doc_id") > 2)
    process_segment_dedup_batch(b0, 0, state, out, width=2)
    process_segment_dedup_batch(b1, 1, state, out, width=2)
    process_segment_dedup_batch(b1, 1, state, out, width=2)  # replay
    got = {
        r["doc_id"]: (r["n_kept"], r["clean_hash"])
        for r in read_stream_segment_docs(spark, out).collect()
    }
    want = {
        r["doc_id"]: (r["n_kept"], r["clean_hash"])
        for r in segment_dedup(docs, width=2).collect()
    }
    assert got == want


def test_textindex_stream_equals_batch_bm25(spark, sf_dir, tmp_path):
    """Drain the corpus through the incremental index in 3 file-batches
    (with one replay): merged (term, df) stats and the BM25 serving path
    equal a one-shot batch computation over the full corpus."""
    import os

    from temporal_vector_database_spark.operators.textindex import bm25_scores
    from temporal_vector_database_spark.streaming.textindex import (
        bm25_from_index,
        process_textindex_batch,
        read_index_stats,
        run_textindex_stream,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    src = str(tmp_path / "src")
    for m in range(3):
        docs.where(F.col("doc_id") % 3 == m).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    state = str(tmp_path / "ix")
    run_textindex_stream(stream, state, str(tmp_path / "ckpt"))
    # replay a batch (at-least-once foreachBatch): state must not double
    process_textindex_batch(docs.where(F.col("doc_id") % 3 == 1), 1, state)

    dfreq, stats = read_index_stats(spark, state)
    # df parity against a direct batch computation
    from temporal_vector_database_spark.operators.textindex import _words

    want_df = {
        (r.term, r.df)
        for r in docs.select(
            "doc_id", F.explode(F.array_distinct(_words("text"))).alias("term")
        )
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        .collect()
    }
    got_df = {(r.term, r.df) for r in dfreq.collect()}
    assert got_df == want_df
    srow = stats.first()
    assert srow.n_docs == docs.count()
    # serving parity: BM25 from the store == one-shot batch BM25
    got = [
        (r.doc_id, r.rn, r.bm25)
        for r in bm25_from_index(docs, ["vector", "join", "scan"], dfreq, stats).collect()
    ]
    want = [
        (r.doc_id, r.rn, r.bm25)
        for r in bm25_scores(docs, ["vector", "join", "scan"]).collect()
    ]
    assert sorted(got) == sorted(want) and len(got) == 20
