"""Streaming corpus term-count maintenance → vocabulary coverage
served from state (streaming twin of ``operators/textindex.py
vocab_coverage``; r09).

Term occurrence counts are pure SUMS over per-document contributions,
so the stream maintains additive per-batch partials: each micro-batch
writes its own ``batch=N`` parquet partition (a replayed batch
overwrites its own partition — idempotent, the
``streaming/textindex.py`` pattern), and serving merges ≤ batches ×
vocabulary partial rows, never documents. The coverage curve (share of
token occurrences covered by the top-V words) then ranks the MERGED
vocabulary — identical math to the batch operator, so stream==batch is
pinned bit-for-bit in tests.

At 100 TB this is the vocab-sizing dashboard that stays current as the
crawl lands: per-batch cost is one token pass over the batch + a
vocabulary-bounded write; no corpus rescan ever.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.textindex import _words
from temporal_vector_database_spark.streaming._state import committed_batch_dirs


def process_wordcount_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    text_col: str = "text",
) -> None:
    """Fold one micro-batch's term occurrence counts into the state
    (partition overwrite — same-``batch_id`` replay is a no-op by
    value)."""
    if batch_df.isEmpty():
        return
    part = (
        batch_df.select(F.explode(_words(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt_part"))
    )
    part.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch={batch_id}")
    )


def process_lm_batch(
    batch_df: DataFrame,
    batch_id: int,
    term_state_dir: str | None = None,
    bigram_state_dir: str | None = None,
    trigram_state_dir: str | None = None,
    text_col: str = "text",
) -> None:
    """Fold one micro-batch into SEVERAL LM count states from ONE
    tokenize pass (r13, VERDICT r12 #5): the per-order writers
    (``process_wordcount_batch`` / ``process_bigram_batch`` /
    ``process_trigram_batch``) each re-tokenize the same batch slice —
    terms + bigrams [+ trigrams] paid the token split 2-3×, plus one
    ``isEmpty`` probe each. Here the token ARRAYS are computed once and
    pinned (``localCheckpoint``), the emptiness probe runs once over
    the pinned rows, and every requested state's partial is a cheap
    aggregate over the same arrays (``_bigram_structs`` /
    ``_trigram_structs`` are the exact expressions the per-order
    writers apply to their own ``_words`` call, so each state's parquet
    contents are bit-identical to the single-state writers — pinned in
    tests). Per-task state is one micro-batch's token arrays — bounded
    by the batch size, the streaming contract."""
    from temporal_vector_database_spark.operators.textindex import (
        _bigram_structs,
        _trigram_structs,
    )

    wanted = [
        d
        for d in (term_state_dir, bigram_state_dir, trigram_state_dir)
        if d is not None
    ]
    if not wanted:
        return
    if len(wanted) == 1:  # single state: no reuse to pay a pin for
        if term_state_dir is not None:
            process_wordcount_batch(batch_df, batch_id, term_state_dir, text_col)
        elif bigram_state_dir is not None:
            process_bigram_batch(batch_df, batch_id, bigram_state_dir, text_col)
        else:
            process_trigram_batch(batch_df, batch_id, trigram_state_dir, text_col)
        return
    toks = batch_df.select(_words(text_col).alias("ws")).localCheckpoint()
    if toks.isEmpty():
        return
    if term_state_dir is not None:
        part = (
            toks.select(F.explode("ws").alias("term"))
            .groupBy("term")
            .agg(F.count("*").cast("long").alias("cnt_part"))
        )
        part.write.mode("overwrite").parquet(
            os.path.join(term_state_dir, f"batch={batch_id}")
        )
    if bigram_state_dir is not None:
        part = (
            toks.select(F.explode(_bigram_structs(F.col("ws"))).alias("bg"))
            .select("bg.w1", "bg.w2")
            .groupBy("w1", "w2")
            .agg(F.count("*").cast("long").alias("cnt_part"))
        )
        part.write.mode("overwrite").parquet(
            os.path.join(bigram_state_dir, f"batch={batch_id}")
        )
    if trigram_state_dir is not None:
        part = (
            toks.select(F.explode(_trigram_structs(F.col("ws"))).alias("t"))
            .select("t.w1", "t.w2", "t.w3")
            .groupBy("w1", "w2", "w3")
            .agg(F.count("*").cast("long").alias("cnt_part"))
        )
        part.write.mode("overwrite").parquet(
            os.path.join(trigram_state_dir, f"batch={batch_id}")
        )


def read_term_counts(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Merged ``(term, cnt)`` table from the partial state, or None
    before the first commit. Only ``_SUCCESS``-committed batch dirs are
    read (ADVICE r09): a torn write from a crashed batch is invisible
    until its replay lands."""
    dirs = committed_batch_dirs(state_dir)
    if not dirs:
        return None
    raw = spark.read.option("basePath", state_dir).parquet(*dirs)
    return raw.groupBy("term").agg(
        F.sum("cnt_part").cast("long").alias("cnt")
    )


def coverage_from_state(
    spark: SparkSession,
    state_dir: str,
    sizes: tuple[int, ...] = (100, 1000, 10000),
) -> DataFrame | None:
    """Vocabulary coverage curve from the maintained counts — the
    serving path; identical ranking + conditional-sum math as the batch
    ``vocab_coverage`` (two-phase distributed rank, one aggregate), so
    the served curve is bit-equal to a one-shot batch run over
    everything streamed (pinned in tests)."""
    from temporal_vector_database_spark.operators.textindex import (
        coverage_from_counts,
    )

    counts = read_term_counts(spark, state_dir)
    if counts is None:
        return None
    return coverage_from_counts(counts, tuple(int(v) for v in sizes))


def unigram_nll_from_state(
    spark: SparkSession,
    state_dir: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame | None:
    """Score CANDIDATE documents against the incrementally maintained
    corpus unigram model (r09) — the LM-quality filter as a serving
    path: a new crawl batch is scored against the standing corpus
    distribution without rescanning the corpus (same math as the batch
    ``unigram_logprob_scores`` via the shared
    ``unigram_scores_from_counts`` core, so scoring the streamed corpus
    against itself is bit-equal to the batch op — pinned in tests).
    Candidate terms unseen by the model contribute nothing (they drop
    at the model join)."""
    from temporal_vector_database_spark.operators.textindex import (
        unigram_scores_from_counts,
    )

    counts = read_term_counts(spark, state_dir)
    if counts is None:
        return None
    # pin: the core consumes the model table twice (join + total)
    return unigram_scores_from_counts(
        docs, counts.localCheckpoint(), text_col, id_col
    )


def process_bigram_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    text_col: str = "text",
) -> None:
    """Fold one micro-batch's BIGRAM occurrence counts into the state
    (r10, VERDICT r09 #5) — same additive-partial scheme as the term
    counts: each batch writes its own ``batch=N`` partition of
    ``(w1, w2, cnt_part)``; replay overwrites by partition.
    Corpus-level counting needs no document id, so ``_bigram_pairs``
    runs id-less (ADVICE r10 — no injected constant column that could
    clobber a caller's own)."""
    from temporal_vector_database_spark.operators.textindex import _bigram_pairs

    if batch_df.isEmpty():
        return
    part = (
        _bigram_pairs(batch_df, text_col, None)
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("cnt_part"))
    )
    part.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch={batch_id}")
    )


def read_bigram_counts(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Merged ``(w1, w2, b_cnt)`` table from the bigram partial state
    (``_SUCCESS``-committed batches only), or None before the first
    commit."""
    dirs = committed_batch_dirs(state_dir)
    if not dirs:
        return None
    raw = spark.read.option("basePath", state_dir).parquet(*dirs)
    return raw.groupBy("w1", "w2").agg(
        F.sum("cnt_part").cast("long").alias("b_cnt")
    )


def bigram_nll_from_state(
    spark: SparkSession,
    term_state_dir: str,
    bigram_state_dir: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame | None:
    """Score CANDIDATE documents against the incrementally maintained
    corpus BIGRAM model (r10) — the JM-interpolated rung served from
    streaming state: the bigram table, its per-``w1`` context mass,
    the unigram fallback, and the token total all derive from the two
    maintained count states, so scoring the streamed corpus against
    itself is bit-equal to the batch ``bigram_logprob_scores`` (shared
    ``bigram_scores_from_counts`` core; stream==batch pinned in
    tests). Candidate bigrams unseen by the model drop at the model
    join. Both merged count tables are pinned (ADVICE r10): the core
    consumes each at least twice (model join + derived mass/total),
    and unpinned every consumer re-reads the state parquet and
    re-aggregates — the KN/MKN serves' posture."""
    from temporal_vector_database_spark.operators.textindex import (
        bigram_scores_from_counts,
    )

    terms = read_term_counts(spark, term_state_dir)
    bigs = read_bigram_counts(spark, bigram_state_dir)
    if terms is None or bigs is None:
        return None
    return bigram_scores_from_counts(
        docs, bigs.localCheckpoint(), terms.localCheckpoint(),
        text_col, id_col, lam,
    )


def process_trigram_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    text_col: str = "text",
) -> None:
    """Fold one micro-batch's TRIGRAM occurrence counts into the state
    (r10) — additive ``(w1, w2, w3, cnt_part)`` partials, same
    partition-overwrite replay idempotence as the term/bigram states."""
    from temporal_vector_database_spark.operators.textindex import (
        _trigram_triples,
    )

    if batch_df.isEmpty():
        return
    part = (
        _trigram_triples(batch_df, text_col, None)
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").cast("long").alias("cnt_part"))
    )
    part.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch={batch_id}")
    )


def read_trigram_counts(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Merged ``(w1, w2, w3, t_cnt)`` table from the trigram partial
    state (``_SUCCESS``-committed batches only), or None before the
    first commit."""
    dirs = committed_batch_dirs(state_dir)
    if not dirs:
        return None
    raw = spark.read.option("basePath", state_dir).parquet(*dirs)
    return raw.groupBy("w1", "w2", "w3").agg(
        F.sum("cnt_part").cast("long").alias("t_cnt")
    )


def trigram_nll_from_state(
    spark: SparkSession,
    term_state_dir: str,
    bigram_state_dir: str,
    trigram_state_dir: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lams: tuple[float, float, float] = (0.5, 0.3125, 0.1875),
) -> DataFrame | None:
    """Score CANDIDATE documents against the incrementally maintained
    corpus JM-TRIGRAM model (r10) — the top LM rung served from
    streaming state: trigram, bigram, and unigram tables all come from
    the three maintained count states (shared
    ``trigram_scores_from_counts`` core, so self-scoring the streamed
    corpus is bit-equal to the batch ``trigram_logprob_scores`` —
    pinned in tests). Candidate trigrams unseen by the model drop at
    the model join. All three merged count tables are pinned (ADVICE
    r10): the core consumes each at least twice (model join + derived
    context mass), and unpinned every consumer re-reads the state
    parquet and re-aggregates."""
    from temporal_vector_database_spark.operators.textindex import (
        trigram_scores_from_counts,
    )

    terms = read_term_counts(spark, term_state_dir)
    bigs = read_bigram_counts(spark, bigram_state_dir)
    tris = read_trigram_counts(spark, trigram_state_dir)
    if terms is None or bigs is None or tris is None:
        return None
    return trigram_scores_from_counts(
        docs, tris.localCheckpoint(), bigs.localCheckpoint(),
        terms.localCheckpoint(), text_col, id_col, lams,
    )


def kneser_ney_nll_from_state(
    spark: SparkSession,
    bigram_state_dir: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount_num: int = 3,
    discount_den: int = 4,
) -> DataFrame | None:
    """Kneser-Ney bigram scoring served from the maintained BIGRAM
    count state (r10): every KN quantity (context mass,
    forward/backward continuation counts, type total) derives from the
    bigram table alone, so this needs only the one state. Shared
    ``kneser_ney_scores_from_counts`` core ⇒ self-scoring the streamed
    corpus is bit-equal to the batch op (pinned in tests)."""
    from temporal_vector_database_spark.operators.textindex import (
        kneser_ney_scores_from_counts,
    )

    bigs = read_bigram_counts(spark, bigram_state_dir)
    if bigs is None:
        return None
    return kneser_ney_scores_from_counts(
        docs, bigs.localCheckpoint(), text_col, id_col,
        discount_num, discount_den,
    )


def modified_kn_nll_from_state(
    spark: SparkSession,
    trigram_state_dir: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame | None:
    """Modified Kneser-Ney TRIGRAM scoring served from the maintained
    TRIGRAM count state (r10) — the production LM rung stays current
    as the crawl lands: both orders' discounts, context masses, and
    continuation tables all derive from the trigram table alone.
    Shared ``modified_kn_scores_from_counts`` core ⇒ stream==batch
    bit-parity (pinned in tests)."""
    from temporal_vector_database_spark.operators.textindex import (
        modified_kn_scores_from_counts,
    )

    tris = read_trigram_counts(spark, trigram_state_dir)
    if tris is None:
        return None
    return modified_kn_scores_from_counts(
        docs, tris.localCheckpoint(), text_col, id_col
    )


def perplexity_band_from_state(
    spark: SparkSession,
    term_state_dir: str,
    docs: DataFrame,
    lo_pct: int = 25,
    hi_pct: int = 75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame | None:
    """Middle-perplexity band selection SERVED from the maintained
    term-count state (r10) — curate a new crawl batch against the
    standing corpus LM without rescanning the corpus: score the
    candidates with ``unigram_scores_from_counts``, then keep the
    [lo, hi) percent-rank band AMONG THE CANDIDATES (shared
    ``band_from_scores`` core — self-selecting the streamed corpus is
    bit-equal to the batch ``perplexity_band_select``, pinned in
    tests)."""
    from temporal_vector_database_spark.operators.textindex import (
        band_from_scores,
        unigram_scores_from_counts,
    )

    counts = read_term_counts(spark, term_state_dir)
    if counts is None:
        return None
    scored = unigram_scores_from_counts(
        docs, counts.localCheckpoint(), text_col, id_col
    )
    return band_from_scores(scored, lo_pct, hi_pct, id_col)


def run_wordcount_stream(
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    bigram_state_dir: str | None = None,
) -> None:
    """Drain available document batches into the count state
    (Trigger.AvailableNow); pass ``bigram_state_dir`` to maintain the
    bigram partials from the same pass (r10)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # combined writer: one tokenize pass feeds every state (r13)
        process_lm_batch(
            batch_df,
            batch_id,
            term_state_dir=state_dir,
            bigram_state_dir=bigram_state_dir,
            text_col=text_col,
        )

    q = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
