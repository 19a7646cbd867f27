"""Streaming curation funnel (beyond-reference): the continuous-ingest
twin of ``operators/pipeline.py::full_curation_report``.

Documents stream in; each micro-batch runs the doc-local stages exactly
as the batch funnel does (quality/language, Gopher repetition,
benchmark decontamination against a static broadcast eval set — all
deterministic per document, so batch == stream by construction), then
deduplicates its ELIGIBLE documents against the signature store of all
previously accepted documents (``incremental_near_duplicate_pairs`` —
only the batch is shingled). A batch document is dropped when it
near-dups anything older: any store partner, or a lower-id partner in
its own batch — i.e. ARRIVAL order decides, a survivor is never
retracted. With exact-signature clustering (``min_jaccard_est = 1.0``)
and doc_ids assigned monotonically with arrival (the normal crawl/ingest
discipline — new documents get new, larger ids), this equals the batch
funnel's min-id-canonical rule applied incrementally (identity is
transitive), pinned in tests. If an OLDER id can arrive in a LATER
batch, the stream keeps the earlier-arriving member where the batch
funnel would keep the lower id — inherent to any no-retraction stream.

Idempotent under foreachBatch at-least-once replay, same discipline as
``streaming/dedup.py``: survivors / per-batch report / signatures all go
to per-batch OVERWRITE partitions, and store reads exclude the current
batch id, so a replayed batch recomputes against exactly the pre-batch
state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_vector_database_spark.functions.text import with_text_stats
from temporal_vector_database_spark.operators.dedup import (
    incremental_near_duplicate_pairs,
    minhash_signatures,
)
from temporal_vector_database_spark.operators.pipeline import (
    DEDUP_BANDS,
    DEDUP_NUM_HASHES,
    DEDUP_WIDTH,
)
from temporal_vector_database_spark.streaming.dedup import (
    _has_batches,
    read_signature_store,
)


def process_curation_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    output_dir: str,
    eval_docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.3,
    max_top_word_frac: float = 0.2,
    max_top_bigram_frac: float = 0.18,
    decontam_n: int = 5,
    decontam_min_hits: int = 2,
    num_hashes: int = DEDUP_NUM_HASHES,
    bands: int = DEDUP_BANDS,
    width: int = DEDUP_WIDTH,
    min_jaccard_est: float = 1.0,
) -> None:
    """One micro-batch of the funnel. Safe to replay with the same
    ``batch_id``. LSH defaults are SHARED with the batch funnel
    (``operators/pipeline.py``) — at the exact-signature default
    (``min_jaccard_est=1.0``) band width cannot change the pair set,
    but for any lower threshold a differing width would silently break
    the documented stream==batch parity."""
    if batch_df.isEmpty():
        return
    from temporal_vector_database_spark.operators.curation import (
        decontaminate,
        repetition_stats,
    )

    spark = batch_df.sparkSession
    slim = batch_df.select("doc_id", text_col)
    stats = with_text_stats(slim, text_col).select(
        "doc_id", "n_tokens", "quality_r", "predicted_lang"
    )
    rep = repetition_stats(
        slim, text_col, max_top_word_frac, max_top_bigram_frac
    ).select("doc_id", "passes_repetition")
    dec = decontaminate(
        slim, eval_docs.select("doc_id", text_col), text_col,
        n=decontam_n, min_hits=decontam_min_hits,
    ).select("doc_id", "is_contaminated")
    flags = (
        batch_df.select("doc_id", text_col, "source")
        .join(stats, "doc_id")
        .join(rep, "doc_id", "left")
        .join(dec, "doc_id", "left")
        .withColumn(
            "q_ok",
            (F.col("quality_r") >= min_quality) & (F.col("predicted_lang") != "und"),
        )
        .withColumn("rep_ok", F.coalesce("passes_repetition", F.lit(False)))
        .withColumn("clean_ok", ~F.coalesce("is_contaminated", F.lit(True)))
        .withColumn("eligible", F.col("q_ok") & F.col("rep_ok") & F.col("clean_ok"))
        .persist()
    )
    eligible = flags.where("eligible").select("doc_id", text_col)

    store = read_signature_store(spark, state_dir)
    if store is not None:
        existing = store.where(F.col("batch") != batch_id).drop("batch")
    else:
        existing = minhash_signatures(eligible.limit(0), text_col, num_hashes, width)
    pairs, new_sigs = incremental_near_duplicate_pairs(
        existing, eligible, text_col, num_hashes, bands, width, min_jaccard_est
    )
    # a batch doc is dropped when any near-dup partner precedes it:
    # every store doc does; an in-batch partner only if its id is lower
    batch_ids = eligible.select(F.col("doc_id").alias("member"))
    sym = pairs.select(
        F.col("a_id").alias("member"), F.col("b_id").alias("partner")
    ).unionByName(
        pairs.select(F.col("b_id").alias("member"), F.col("a_id").alias("partner"))
    )
    in_batch = batch_ids.withColumnRenamed("member", "partner").withColumn(
        "partner_in_batch", F.lit(True)
    )
    dropped = (
        sym.join(batch_ids, "member")
        .join(in_batch, "partner", "left")
        .where(
            ~F.coalesce("partner_in_batch", F.lit(False))
            | (F.col("partner") < F.col("member"))
        )
        .select(F.col("member").alias("doc_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(True))
    )
    enriched = flags.join(dropped, "doc_id", "left").withColumn(
        "is_surv", F.col("eligible") & ~F.coalesce("is_dropped", F.lit(False))
    )
    survivors = enriched.where("is_surv").select(
        "doc_id", "source", "predicted_lang", "n_tokens", "quality_r"
    )
    report = enriched.groupBy("predicted_lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("q_ok"), 1).otherwise(0)).cast("long").alias("n_quality"),
        F.sum(F.when(F.col("q_ok") & F.col("rep_ok"), 1).otherwise(0))
        .cast("long")
        .alias("n_repetition_ok"),
        F.sum(F.when(F.col("eligible"), 1).otherwise(0)).cast("long").alias("n_clean"),
        F.sum(F.when(F.col("is_surv"), 1).otherwise(0)).cast("long").alias("n_survivors"),
    )
    survivors.write.mode("overwrite").parquet(
        os.path.join(output_dir, "survivors", f"batch={batch_id}")
    )
    report.write.mode("overwrite").parquet(
        os.path.join(output_dir, "report", f"batch={batch_id}")
    )
    new_sigs.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch={batch_id}")
    )
    flags.unpersist()


def read_stream_survivors(spark: SparkSession, output_dir: str) -> DataFrame | None:
    path = os.path.join(output_dir, "survivors")
    if not _has_batches(path):
        return None
    return (
        spark.read.option("basePath", path).parquet(os.path.join(path, "batch=*")).drop("batch")
    )


def read_stream_reports(spark: SparkSession, output_dir: str) -> DataFrame | None:
    """Per-batch attrition reports (``batch`` column = micro-batch id)."""
    path = os.path.join(output_dir, "report")
    if not _has_batches(path):
        return None
    return spark.read.option("basePath", path).parquet(os.path.join(path, "batch=*"))


def run_curation_stream(
    doc_stream: DataFrame,
    eval_docs: DataFrame,
    state_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> None:
    """Drain available document batches (Trigger.AvailableNow) through
    the curation funnel. After the drain, the union of surviving doc_ids
    equals the one-shot ``full_curation_report`` survivors over every
    document streamed, for exact-signature clustering WITH
    arrival-monotone doc_ids (see module docstring; pinned in tests)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_curation_batch(
            batch_df, batch_id, state_dir, output_dir, eval_docs, **kwargs
        )

    q = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _read_segment_store(spark: SparkSession, state_dir: str) -> DataFrame | None:
    if not _has_batches(state_dir):
        return None
    return spark.read.option("basePath", state_dir).parquet(
        os.path.join(state_dir, "batch=*")
    )


def process_segment_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    output_dir: str,
    text_col: str = "text",
    width: int = 4,
) -> None:
    """Streaming C4-style segment dedup: one micro-batch against the
    store of every segment already seen. A batch segment survives when
    it is absent from the store AND is the first occurrence (min
    (doc_id, seg_idx)) within its own batch; surviving segments' md5
    keys append to the store. Documents are rebuilt from their surviving
    segments exactly as the batch operator does.

    State is segment-HASH rows only (16 bytes each), never text — the
    store for a 100 TB corpus is ~1% of corpus bytes and joins as a
    build-side semi-join. Outputs and state go to per-batch OVERWRITE
    partitions with current-batch exclusion on read: replay-idempotent.
    """
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession

    w = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n_seg = F.ceil(F.size(w) / F.lit(width)).cast("int")
    segs = batch_df.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(w) > 0,
                F.transform(
                    F.sequence(F.lit(0), n_seg - 1),
                    lambda s: F.struct(
                        s.cast("int").alias("seg_idx"),
                        F.array_join(F.slice(w, s * width + 1, width), " ").alias("seg"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<seg_idx:int,seg:string>>"))
        ).alias("s"),
    ).select(
        "doc_id",
        F.col("s.seg_idx").alias("seg_idx"),
        F.col("s.seg").alias("seg"),
        F.md5(F.col("s.seg")).alias("seg_hash"),
    )
    store = _read_segment_store(spark, state_dir)
    if store is not None:
        seen = store.where(F.col("batch") != batch_id).select("seg_hash").distinct()
        fresh = segs.join(seen, "seg_hash", "left_anti")
    else:
        fresh = segs
    first = fresh.groupBy("seg_hash").agg(
        F.min(F.struct("doc_id", "seg_idx")).alias("first_at")
    )
    kept = fresh.join(first, "seg_hash").where(
        (F.col("doc_id") == F.col("first_at.doc_id"))
        & (F.col("seg_idx") == F.col("first_at.seg_idx"))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = batch_df.select("doc_id", n_seg.cast("bigint").alias("n_segments"))
    out = totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_segments",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.length(F.coalesce("clean_text", F.lit(""))).cast("bigint").alias("clean_len"),
        F.md5(F.coalesce("clean_text", F.lit(""))).alias("clean_hash"),
    )
    out.write.mode("overwrite").parquet(
        os.path.join(output_dir, "docs", f"batch={batch_id}")
    )
    kept.select("seg_hash").distinct().write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch={batch_id}")
    )


def read_stream_segment_docs(spark: SparkSession, output_dir: str) -> DataFrame | None:
    path = os.path.join(output_dir, "docs")
    if not _has_batches(path):
        return None
    return (
        spark.read.option("basePath", path)
        .parquet(os.path.join(path, "batch=*"))
        .drop("batch")
    )


def run_segment_dedup_stream(
    doc_stream: DataFrame,
    state_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    width: int = 4,
) -> None:
    """Drain available batches through streaming segment dedup. With
    arrival-monotone doc_ids the union of rebuilt docs equals the
    one-shot ``segment_dedup`` over everything streamed (pinned in
    tests)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_segment_dedup_batch(
            batch_df, batch_id, state_dir, output_dir, text_col, width
        )

    q = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
