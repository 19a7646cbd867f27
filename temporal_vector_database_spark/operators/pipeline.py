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

# shared LSH defaults: the streaming funnel (streaming/curation.py)
# imports these so stream and batch diverge only where documented —
# a differing band width silently changes candidate recall for any
# min_jaccard_est < 1.0 (r02 advisor finding)
DEDUP_NUM_HASHES = 8
DEDUP_BANDS = 4
DEDUP_WIDTH = 3


def curate_documents(
    docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.15,
    drop_unknown_lang: bool = True,
    num_hashes: int = DEDUP_NUM_HASHES,
    bands: int = DEDUP_BANDS,
    width: int = DEDUP_WIDTH,
    min_jaccard_est: float = 0.75,
    sigs: DataFrame | None = None,
    pairs: DataFrame | None = None,
    stats_docs: DataFrame | None = None,
) -> DataFrame:
    """The curation funnel up to (and including) near-dup clustering.

    ``stats_docs``: optional alternate frame (same rows/values as
    ``docs``) used ONLY as the input of the text-stats enrichment — the
    funnel's one generate-heavy narrow pass. A caller on a small
    single-file corpus passes a scan-spread twin here so the quality
    expressions parallelize, while the join/dedup sides keep the plain
    scan (r12 measured split: spreading the join sides costs more in
    extra payload exchanges than it saves).

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
        with_text_stats(
            (docs if stats_docs is None else stats_docs).select(
                "doc_id", text_col
            ),
            text_col,
        )
        .where(F.col("quality_r") >= min_quality)
        .select("doc_id", "n_tokens", "quality_r", "predicted_lang")
    )
    if drop_unknown_lang:
        stats = stats.where(F.col("predicted_lang") != "und")
    stats = stats.persist()
    kept_ids = stats.select("doc_id")
    kept_sigs = sigs.join(kept_ids, "doc_id") if sigs is not None else None
    dedup_input = docs.select("doc_id", text_col).join(kept_ids, "doc_id")
    # pairs: all-corpus near-dup pairs (e.g. the zero-shuffle band-store
    # read); dedup_survivors restricts them to the eligible subset, which
    # is exactly the pair set the subset would produce (pairwise scores
    # are doc-local)
    surv = dedup_survivors(
        dedup_input,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        width=width,
        min_jaccard_est=min_jaccard_est,
        sigs=kept_sigs,
        pairs=pairs,
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
    # published UNROUNDED: both engines compute this identical two-division
    # expression from identical exact integers, so the double is bit-equal
    # everywhere — while round(·, 9) sits on the half boundary whenever the
    # exact quotient terminates at 9 dp (the engines' float-round paths
    # disagree there; same hazard class the sf0.001 sweep caught in
    # label_centroids).
    return rep.withColumn(
        "avg_survivor_quality_r",
        F.when(
            F.col("n_survivors") > 0,
            (F.col("survivor_quality_e9").cast("double") / F.lit(1000000000.0))
            / F.col("n_survivors").cast("double"),
        ),
    )


def full_curation_report(
    docs: DataFrame,
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
    sigs: DataFrame | None = None,
) -> DataFrame:
    """The COMPLETE curation funnel with per-stage attrition accounting:

        quality/language filter → repetition filter (Gopher-style)
          → benchmark decontamination → near-dup survivor selection
          → per-(language, source) attrition + yield report

    Stage verdicts are computed as independent boolean flags and ANDed
    progressively in the aggregate, so the report shows how many
    documents each stage removes per group (``n_docs → n_quality →
    n_repetition_ok → n_clean → n_survivors``) from ONE pass over the
    flag table. Only documents passing every filter reach the LSH
    clustering — on a real crawl the expensive stage never sees
    boilerplate, contaminated, or degenerate-repetition documents.

    Scale posture: quality/language are narrow expressions; repetition
    is one (doc_id, gram)-keyed aggregate; decontamination broadcasts
    the eval set; dedup sees only the eligible subset (and skips
    shingling entirely when ``sigs`` — the persisted signature store —
    is supplied). Quality mass aggregates as exact integer nano-units.
    """
    from temporal_vector_database_spark.operators.curation import (
        decontaminate,
        repetition_stats,
    )

    slim = docs.select("doc_id", text_col)
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
        stats.join(rep, "doc_id", "left")
        .join(dec, "doc_id", "left")
        .withColumn("q_ok", (F.col("quality_r") >= min_quality) & (F.col("predicted_lang") != "und"))
        .withColumn("rep_ok", F.coalesce("passes_repetition", F.lit(False)))
        .withColumn("clean_ok", ~F.coalesce("is_contaminated", F.lit(True)))
        .withColumn("eligible", F.col("q_ok") & F.col("rep_ok") & F.col("clean_ok"))
        # the flag table feeds three branches (signature semi-join, dedup
        # input, final report) of ONE query — localCheckpoint(eager)
        # materializes it now and ties the blocks' lifetime to THIS
        # DataFrame's GC, unlike persist(), which a caller of a
        # report-returning function has no handle to unpersist (r02
        # advisor: repeated calls accumulated cached partitions)
        .localCheckpoint(eager=True)
    )
    eligible_ids = flags.where("eligible").select("doc_id")
    kept_sigs = sigs.join(eligible_ids, "doc_id") if sigs is not None else None
    surv = dedup_survivors(
        slim.join(eligible_ids, "doc_id"),
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        width=width,
        min_jaccard_est=min_jaccard_est,
        sigs=kept_sigs,
    ).select("doc_id", "is_survivor")
    full = (
        docs.select("doc_id", "source", "n_chars")
        .join(flags, "doc_id")
        .join(surv, "doc_id", "left")
        .withColumn("is_surv", F.coalesce("is_survivor", F.lit(False)))
    )
    rep_out = full.groupBy("predicted_lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("q_ok"), 1).otherwise(0)).cast("long").alias("n_quality"),
        F.sum(F.when(F.col("q_ok") & F.col("rep_ok"), 1).otherwise(0))
        .cast("long")
        .alias("n_repetition_ok"),
        F.sum(F.when(F.col("eligible"), 1).otherwise(0)).cast("long").alias("n_clean"),
        F.sum(F.when(F.col("is_surv"), 1).otherwise(0)).cast("long").alias("n_survivors"),
        F.sum(F.when(F.col("is_surv"), F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("survivor_tokens"),
        F.sum(F.when(F.col("is_surv"), F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("survivor_chars"),
        F.sum(
            F.when(
                F.col("is_surv"),
                F.round(F.col("quality_r") * F.lit(1000000000.0), 0).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("survivor_quality_e9"),
    )
    return rep_out


def write_curated_dataset(
    curated: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("split", "predicted_lang"),
) -> None:
    """Funnel sink: materialize the curated corpus partitioned by the
    columns training readers filter on (split, language). A reader
    asking for ``split=train AND predicted_lang=en`` then opens ONLY
    those directories — partition pruning before any file I/O, the same
    layout discipline as the persisted IVF index (pruning pinned in
    tests/test_plans.py's style in tests/test_curation.py)."""
    curated.write.partitionBy(*list(partition_cols)).mode("overwrite").parquet(path)


def read_curated_split(
    spark, path: str, split: str, predicted_lang: str | None = None
) -> DataFrame:
    """Read one training split (optionally one language) from the
    partitioned curated dataset — the filters land on partition columns,
    so the scan prunes to the matching directories."""
    df = spark.read.parquet(path).where(F.col("split") == split)
    if predicted_lang is not None:
        df = df.where(F.col("predicted_lang") == predicted_lang)
    return df

