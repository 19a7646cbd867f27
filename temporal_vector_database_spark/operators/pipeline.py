"""End-to-end training-data curation pipeline (beyond-reference; the
LLM-data-pipeline north star of BASELINE.json).

Composes the individually oracle-verified stages into the funnel a
training-data engineer actually runs over a raw corpus:

    enrich (quality + language, one narrow pass)
      → threshold filter (quality >= t, predicted_lang != 'und')
      → MinHash-LSH near-duplicate clustering over the SURVIVING set
      → per-(language, source) yield report

Scale posture: the enrichment and filter are narrow column expressions on
the corpus scan (no shuffle, fully pushed down); dedup only ever sees the
post-filter subset (on a real crawl that's the big win — low-quality boiler
plate never reaches the LSH joins); the report is a low-cardinality
hash-aggregate. Quality mass is summed in integer nano-units so the
aggregate is exact and merge-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporal_vector_database_spark.functions.text import with_text_stats
from temporal_vector_database_spark.operators.dedup import dedup_survivors


def curate_documents(
    docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.15,
    drop_unknown_lang: bool = True,
    num_hashes: int = 8,
    bands: int = 4,
    width: int = 3,
    min_jaccard_est: float = 0.75,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """The curation funnel up to (and including) near-dup clustering.

    Returns every document that passed the threshold filter, enriched with
    ``n_tokens``/``quality_r``/``predicted_lang`` and the dedup verdict
    (``canonical_id``, ``is_survivor``). Downstream keeps
    ``is_survivor`` rows.

    ``sigs``: the persisted MinHash signature store (one row per doc in
    ``docs``, same num_hashes/width) that ingest maintains incrementally.
    When given, the funnel never re-shingles text: the store is
    semi-joined down to the post-filter survivors (signatures are
    doc-local, so filtering the signature table is exactly equivalent to
    signing the filtered corpus) and dedup runs on those rows only.
    """
    # The text-stat expressions + threshold filter feed several branches
    # (signature semi-join, dedup input, final enrichment join). Persist
    # ONLY the tiny stats projection — caching the full enriched frame
    # would freeze every corpus column into the cache and defeat column
    # pruning on the documents scan (the final join re-reads the corpus
    # with exactly the columns downstream consumes; pinned in
    # tests/test_plans.py).
    stats = (
        with_text_stats(docs.select("doc_id", text_col), text_col)
        .where(F.col("quality_r") >= min_quality)
        .select("doc_id", "n_tokens", "quality_r", "predicted_lang")
    )
    if drop_unknown_lang:
        stats = stats.where(F.col("predicted_lang") != "und")
    stats = stats.persist()
    kept_ids = stats.select("doc_id")
    kept_sigs = sigs.join(kept_ids, "doc_id") if sigs is not None else None
    dedup_input = docs.select("doc_id", text_col).join(kept_ids, "doc_id")
    surv = dedup_survivors(
        dedup_input,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        width=width,
        min_jaccard_est=min_jaccard_est,
        sigs=kept_sigs,
    )
    return docs.join(stats, "doc_id").join(surv, "doc_id")


def curation_report(
    docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.15,
    **dedup_kwargs,
) -> DataFrame:
    """Per-(predicted_lang, source) yield of the curation funnel: documents
    that passed the filter, dedup survivors among them, and the surviving
    token/char/quality mass. Quality is aggregated as exact integer
    nano-units (``survivor_quality_e9``) — order-independent — and the
    published average is derived from that exact sum."""
    c = curate_documents(docs, text_col, min_quality=min_quality, **dedup_kwargs)
    # (pass sigs=<signature store> through dedup_kwargs to skip shingling)
    is_surv = F.col("is_survivor")
    rep = c.groupBy("predicted_lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(is_surv, 1).otherwise(0)).cast("long").alias("n_survivors"),
        F.sum(F.when(is_surv, F.col("n_tokens")).otherwise(0)).cast("long").alias("survivor_tokens"),
        F.sum(F.when(is_surv, F.col("n_chars")).otherwise(0)).cast("long").alias("survivor_chars"),
        F.sum(
            F.when(is_surv, F.round(F.col("quality_r") * F.lit(1000000000.0), 0).cast("long")).otherwise(0)
        )
        .cast("long")
        .alias("survivor_quality_e9"),
    )
    return rep.withColumn(
        "avg_survivor_quality_r",
        F.when(
            F.col("n_survivors") > 0,
            F.round(
                (F.col("survivor_quality_e9").cast("double") / F.lit(1000000000.0))
                / F.col("n_survivors").cast("double"),
                9,
            ),
        ),
    )
