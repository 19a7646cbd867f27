"""Corpus-level text indexing / scoring operators (beyond-reference).

The large-scale-training-data companions to ``operators/dedup.py``:
local document fingerprinting (winnowing), cross-document duplicated
n-gram spans (the shuffle-friendly approximation of suffix-array exact
substring dedup, Lee et al. 2022 "Deduplicating Training Data Makes
Language Models Better"), and classic lexical relevance scoring (TF-IDF,
BM25) used for quality filtering and retrieval-based curation.

Everything is pure ``pyspark.sql.functions`` column algebra — no Python
UDFs anywhere. Hashes are the engine-portable md5-prefix u32 (same as
``operators/sampling.py``) so the DuckDB oracles check exact values.

Scale posture:
- winnowing: one posexplode + a window PARTITIONED BY doc (per-doc
  state, never global) — embarrassingly parallel per document.
- duplicated n-grams: ONE shuffle keyed by the gram; hot boilerplate
  grams are handled by partial (map-side) aggregation, and the output is
  only grams that repeat — at 100 TB this is the exact-substring-dedup
  candidate list without ever building a suffix array.
- TF-IDF / BM25: term-keyed doc-frequency aggregate (broadcast back),
  doc-keyed score aggregate — two bounded shuffles, no all-pairs.

Reference: no counterpart (the reference has no text surface at all;
its closest analogue is vector search ``storage/storage_engine.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _u32(col: Column) -> Column:
    """Engine-portable uniform 32-bit hash (md5-hex-prefix)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def _words(text_col: str) -> Column:
    """Whitespace tokens with empties dropped (mirrors the oracle's
    ``list_filter(string_split(text, ' '), x -> x <> '')``)."""
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken — SIGMOD'03)
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct winnowing fingerprints per document: hash every
    character ``k``-gram, then keep the MINIMUM hash of every window of
    ``w`` consecutive k-gram hashes. Guarantees any shared substring of
    length >= ``k + w - 1`` yields a shared fingerprint, while storing
    ~``2/(w+1)`` of the gram hashes — the standard local fingerprinting
    scheme for plagiarism/near-dup span detection.

    Output: ``(doc_id, fp)`` distinct rows. The whole computation is
    ROW-LOCAL (higher-order array functions over the document's own
    gram-hash array: full windows only, plus the single truncated
    window of a doc with < ``w`` grams — textbook winnowing), and the
    per-doc ``array_distinct`` happens before the explode, so the plan
    carries ZERO exchanges — no doc-keyed window shuffle of the
    exploded grams (the pre-r03 formulation shuffled every gram hash;
    same output, pinned by the unchanged oracle)."""
    gs = (
        f"filter(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substring({text_col}, i, {k})), g -> length(g) = {k})"
    )
    hs = (
        f"transform({gs}, g -> cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint))"
    )
    # bind the hash array once — inlining it into each reference would
    # re-hash the document per reference
    fps = (
        f"CASE WHEN size(_hs) = 0 THEN array()"
        f" ELSE array_distinct(transform("
        f"   sequence(1, CASE WHEN size(_hs) < {w} THEN 1"
        f"                    ELSE size(_hs) - {w - 1} END),"
        f"   j -> array_min(slice(_hs, j, {w})))) END"
    )
    return (
        docs.select(id_col, F.expr(hs).alias("_hs"))
        .select(id_col, F.explode(F.expr(fps)).alias("fp"))
    )


# ---------------------------------------------------------------------------
# Duplicated n-gram spans (suffix-array exact-substring dedup, n-gram grain)
# ---------------------------------------------------------------------------


def duplicated_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Word ``n``-grams that appear in at least ``min_docs`` DISTINCT
    documents — the candidate spans of exact-substring deduplication.
    A true suffix array finds arbitrary-length repeats; at cluster scale
    the standard move is fixed-``n`` gram grain (any repeat of length
    >= n words contains a repeated n-gram), which turns the problem into
    one gram-keyed aggregate.

    Output: ``(gram_hash, n_docs, n_occ)`` with ``gram_hash =
    md5(gram)`` (the gram text itself can be long; downstream span
    removal joins back on the hash).
    """
    toks = docs.select(id_col, _words(text_col).alias("ws"))
    grams = toks.where(F.size("ws") >= n).select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, size(ws) - {n - 1}),"
                f" i -> concat_ws(' ', slice(ws, i, {n})))"
            )
        ).alias("gram"),
    )
    agg = grams.groupBy("gram").agg(
        F.countDistinct(id_col).cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_occ"),
    )
    return agg.where(F.col("n_docs") >= min_docs).select(
        F.md5(F.col("gram")).alias("gram_hash"), "n_docs", "n_occ"
    )


# ---------------------------------------------------------------------------
# TF-IDF and BM25 (Robertson/Spärck Jones)
# ---------------------------------------------------------------------------


def _term_freqs(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, term, tf, dl): term frequency and document length."""
    toks = docs.select(
        id_col,
        F.explode(_words(text_col)).alias("term"),
        F.size(_words(text_col)).cast("bigint").alias("dl"),
    )
    return toks.groupBy(id_col, "term", "dl").agg(
        F.count("*").cast("bigint").alias("tf")
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top ``top_n`` terms per document by ``tf * ln(N / df)``, ties
    broken by term. Document frequencies are a term-keyed aggregate
    broadcast back onto the (doc, term) rows; the per-doc top-n is a
    window PARTITIONED BY doc — no global ordering anywhere."""
    tf = _term_freqs(docs, text_col, id_col)
    df_ = tf.groupBy("term").agg(F.countDistinct(id_col).cast("bigint").alias("df"))
    n_docs = docs.agg(F.countDistinct(id_col).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs") / F.col("df").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= top_n)
        .select(id_col, "rn", "term", "tfidf")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 relevance of every document against a fixed bag of query
    terms; returns the ``top_n`` docs by (score desc, doc_id asc).

    ``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the non-negative
    Robertson-Spärck Jones form); ``score = Σ idf · tf·(k1+1) /
    (tf + k1·(1 - b + b·dl/avgdl))``. The query side is a literal array
    (broadcast by construction); corpus stats (N, avgdl, per-term df)
    are tiny aggregates broadcast onto the doc-term rows, so the whole
    plan is two bounded shuffles regardless of corpus size.
    """
    terms = sorted(set(query_terms))
    tf = _term_freqs(docs, text_col, id_col).where(F.col("term").isin(terms))
    stats = docs.select(
        F.countDistinct(id_col).cast("double").alias("n_docs")
    ).crossJoin(
        docs.select(F.size(_words(text_col)).cast("bigint").alias("dl0")).agg(
            F.avg("dl0").alias("avgdl")
        )
    )
    df_ = tf.groupBy("term").agg(F.countDistinct(id_col).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
    )
    contrib = idf * tf_d * F.lit(k1 + 1.0) / denom
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )
    # top-n via sort+limit (Catalyst's TakeOrderedAndProject: per-partition
    # partial top-n, no global sort); the rank window then runs over only
    # `top_n` rows, so the partition-less frame is harmless
    top = scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(top_n)
    w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    return top.withColumn("rn", F.row_number().over(w).cast("int")).select(
        id_col, "rn", "bm25"
    )


def remove_duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """The ACTION of exact-substring dedup (Lee et al. 2022): delete
    from every document the words covered by any cross-document
    duplicated ``n``-gram (as found by :func:`duplicated_ngrams`),
    keeping the rest of the text intact.

    Output: ``(doc_id, clean_text, n_words, n_removed)``.

    Plan shape: gram occurrences keep their word positions; the
    duplicated-gram list (an aggregate) joins back on ``md5(gram)``;
    covered word indices are exploded from the matched spans and
    collected per doc; the rebuild is a single indexed higher-order
    ``filter`` + ``concat_ws`` — no Python UDFs, no window, shuffles
    keyed by gram (bounded) and doc_id only.
    """
    toks = docs.select(id_col, _words(text_col).alias("ws"))
    occ = toks.where(F.size("ws") >= n).select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(ws) - {n - 1}),"
                f" i -> md5(concat_ws(' ', slice(ws, i, {n}))))"
            )
        ).alias("pos0", "gram_hash"),
    )
    dup = (
        occ.groupBy("gram_hash")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("gram_hash")
    )
    covered = (
        occ.join(dup, "gram_hash")
        .select(
            id_col,
            F.explode(
                F.expr(f"sequence(pos0 + 1, pos0 + {n})")
            ).alias("widx"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("widx").alias("cov"))
    )
    joined = toks.join(covered, id_col, "left").withColumn(
        "cov", F.coalesce("cov", F.expr("array()"))
    )
    kept = F.expr("filter(ws, (w, i) -> NOT array_contains(cov, i + 1))")
    return joined.select(
        id_col,
        F.concat_ws(" ", kept).alias("clean_text"),
        F.size("ws").cast("bigint").alias("n_words"),
        (F.size("ws") - F.size(kept)).cast("bigint").alias("n_removed"),
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_n: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.) of two ranked lists — the
    standard score-free way to combine lexical (BM25) and vector (ANN)
    retrieval into one hybrid ranking: ``rrf = Σ 1/(k + rank_i)`` over
    the lists containing the id, ties broken by id.

    Pure expression math on two already-small ranked lists (full outer
    join on the id + one TakeOrdered top-n) — at scale both inputs are
    top-k outputs, so this never touches corpus-sized data. The 1/(k+r)
    terms are exact IEEE divisions of integers evaluated in a fixed
    two-term expression (not an aggregate), so the fused score is
    bit-identical in any engine.
    """
    fa = ranked_a.select(F.col(id_col), F.col(rank_col).alias("rank_a"))
    fb = ranked_b.select(F.col(id_col), F.col(rank_col).alias("rank_b"))
    j = fa.join(fb, id_col, "full")
    score = F.coalesce(
        F.lit(1.0) / (F.lit(k) + F.col("rank_a")).cast("double"), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(k) + F.col("rank_b")).cast("double"), F.lit(0.0)
    )
    top = (
        j.withColumn("rrf", score)
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("rrf"), F.asc(id_col))
    return top.withColumn("rn", F.row_number().over(w).cast("int")).select(
        id_col, "rn", "rank_a", "rank_b", "rrf"
    )


def unigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-unigram language-model score per document — the
    self-contained stand-in for CCNet's LM-perplexity quality signal
    when no external LM is available: estimate ``p(w) = count(w) /
    total_tokens`` from the corpus itself, then score each document by
    its mean negative log-probability (lower = closer to the corpus
    distribution; spam/garble scores high).

    Output: ``(doc_id, n_tokens, unigram_nll)``.

    Plan: one term-keyed count aggregate (broadcast back as the "model"),
    one doc-keyed sum — the same two bounded shuffles as TF-IDF. The
    per-doc sum is ``Σ tf·ln(p)`` over ≤ vocabulary-size addends,
    rounded to 6 dp like every float aggregate in this family.
    """
    toks = docs.select(id_col, F.explode(_words(text_col)).alias("term"))
    # pin the vocabulary-bounded model: the core reads it twice (model
    # join + total); unpinned, each consumer re-executes the corpus
    # token pass (r10 plan audit — the whole LM family had this)
    counts = (
        toks.groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint()
    )
    return unigram_scores_from_counts(docs, counts, text_col, id_col)


def unigram_scores_from_counts(
    docs: DataFrame,
    counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against an EXPLICIT ``(term, cnt)`` unigram
    model — the shared core of :func:`unigram_logprob_scores` (model =
    the docs themselves) and the streaming serve
    (``streaming/wordcount.py unigram_nll_from_state``: model = the
    incrementally maintained corpus counts — new candidate docs score
    against the standing corpus without rescanning it). Terms absent
    from the model contribute nothing (their rows drop at the model
    join), exactly as in the self-scored form where absence cannot
    occur."""
    toks = docs.select(id_col, F.explode(_words(text_col)).alias("term"))
    total = counts.agg(F.sum("cnt").cast("double").alias("total"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").cast("long").alias("tf"))
    return (
        tf.join(F.broadcast(counts), "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                -F.sum(
                    F.col("tf").cast("double")
                    * F.log(F.col("cnt").cast("double") / F.col("total"))
                )
                / F.sum("tf").cast("double"),
                6,
            ).alias("unigram_nll"),
        )
    )


def bigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
    broadcast_model: bool = True,
) -> DataFrame:
    """Interpolated bigram language-model score per document — the
    next rung above :func:`unigram_logprob_scores` on the CCNet-style
    quality ladder, still self-contained (the corpus is its own model):

        p(w2 | w1) = lam · c(w1 w2) / c(w1 ·)  +  (1 − lam) · c(w2) / N

    where ``c(w1 w2)`` is the corpus bigram count, ``c(w1 ·)`` the count
    of bigrams starting with ``w1`` (the context mass), and ``c(w2)/N``
    the unigram fallback. Score = mean −ln p over the document's
    bigrams, rounded to 6 dp like the rest of this family. Documents
    with fewer than two tokens have no bigrams and are omitted.

    Output: ``(doc_id, n_bigrams, bigram_nll)``.

    Plan: bigrams come straight off the token array (``zip_with`` of two
    slices — no self-join, no positions), then the same bounded shape as
    TF-IDF: a (w1, w2)-keyed count aggregate broadcast back as the
    model, one doc-keyed sum. Natural-language bigram tables are heavy-
    tailed but the model join is broadcast, so no hot-key shuffle
    touches the corpus side. At corpus scales where the bigram model
    itself outgrows a broadcast (billions of distinct bigrams), pass
    ``broadcast_model=False``: the model joins become (w1, w2)-keyed
    shuffle joins — tf is per-(doc, bigram) grain so hot bigrams spread
    over many rows, and AQE skew-join splits the rest.
    """
    w = _words(text_col)
    toks = docs.select(F.explode(w).alias("term"))
    # pin both vocabulary-bounded model tables: each has 2 consumers in
    # the core (join + derived mass); unpinned, every consumer is a
    # fresh corpus pass (r10 plan audit)
    uni = (
        toks.groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint()
    )
    big = (
        _bigram_pairs(docs, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("b_cnt"))
        .localCheckpoint()
    )
    return bigram_scores_from_counts(
        docs, big, uni, text_col, id_col, lam, broadcast_model
    )


def _bigram_pairs(
    docs: DataFrame, text_col: str, id_col: str | None
) -> DataFrame:
    """Per-document bigram occurrences ``(id, w1, w2)`` off the token
    array (``zip_with`` of two clamped slices — no self-join, no
    positions). The slice length is clamped to 0 so a zero-word
    document (empty or whitespace-only text) yields an empty bigram
    array and is omitted by the explode rather than raising.
    ``id_col=None`` yields corpus-level ``(w1, w2)`` occurrences with
    no id column (the streaming count-state path, ADVICE r10 — no
    injected constant column to collide with caller columns)."""
    bg = _bigram_structs(_words(text_col))
    head = [] if id_col is None else [id_col]
    return docs.select(*head, F.explode(bg).alias("bg")).select(
        *head, "bg.w1", "bg.w2"
    )


def _bigram_structs(w: Column) -> Column:
    """``array<struct<w1,w2>>`` of adjacent-token bigrams off a token
    ARRAY column (``zip_with`` of two clamped slices) — shared by
    :func:`_bigram_pairs` (tokenizes itself) and the streaming combined
    count-state writer, which tokenizes the batch ONCE and derives all
    n-gram orders from the same array (r13)."""
    n = F.size(w)
    bg_len = F.greatest(n - F.lit(1), F.lit(0))
    return F.zip_with(
        F.slice(w, F.lit(1), bg_len),
        F.slice(w, F.lit(2), bg_len),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )


def bigram_scores_from_counts(
    docs: DataFrame,
    big_counts: DataFrame,
    term_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score documents against EXPLICIT ``(w1, w2, b_cnt)`` bigram and
    ``(term, cnt)`` unigram model tables — the shared core of
    :func:`bigram_logprob_scores` (model = the docs themselves) and the
    streaming serve (``streaming/wordcount.py bigram_nll_from_state``:
    both tables are the incrementally maintained corpus counts, r10).
    The context mass ``c(w1 ·)`` and the unigram total derive from the
    model tables exactly as the batch op derives them from its own
    corpus pass, so self-scoring is equality by construction. Candidate
    bigrams absent from the model drop at the model join (as in the
    unigram core)."""
    uni = term_counts.select("term", F.col("cnt").alias("u_cnt"))
    total = term_counts.agg(F.sum("cnt").cast("double").alias("n_total"))
    ctx = big_counts.groupBy("w1").agg(
        F.sum("b_cnt").cast("long").alias("c_cnt")
    )
    tf = _bigram_pairs(docs, text_col, id_col).groupBy(id_col, "w1", "w2").agg(
        F.count("*").cast("long").alias("tf")
    )
    p = (
        F.lit(float(lam))
        * (F.col("b_cnt").cast("double") / F.col("c_cnt").cast("double"))
        + F.lit(1.0 - float(lam))
        * (F.col("u_cnt").cast("double") / F.col("n_total"))
    )
    hint = F.broadcast if broadcast_model else (lambda d: d)
    return (
        tf.join(hint(big_counts), ["w1", "w2"])
        .join(hint(ctx), "w1")
        .join(hint(uni), F.col("w2") == F.col("term"))
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("tf").cast("double") * F.log(p))
                / F.sum("tf").cast("double"),
                6,
            ).alias("bigram_nll"),
        )
    )


def trigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lams: tuple[float, float, float] = (0.5, 0.3125, 0.1875),
    broadcast_model: bool = True,
) -> DataFrame:
    """Jelinek-Mercer interpolated TRIGRAM language-model score per
    document (r09) — the rung above :func:`bigram_logprob_scores` on
    the self-estimated quality ladder:

        p(w3 | w1 w2) = λ3 · c(w1 w2 w3) / c(w1 w2 ·)
                      + λ2 · c(w2 w3)    / c(w2 ·)
                      + λ1 · c(w3)       / N

    Context masses are the TRUE continuation denominators (c(w1 w2 ·)
    sums trigram counts, NOT the corpus bigram count — a (w1,w2) at a
    document tail has no continuation and must not dilute the
    conditional), mirroring how the bigram rung derives c(w1 ·) from
    its own bigram table. Default λ = (8/16, 5/16, 3/16) — DYADIC so
    both engines multiply bit-identical doubles (the fixture-grid
    float policy); score = mean −ln p over the doc's trigrams, 6 dp.
    Documents with fewer than three tokens are omitted.

    Output: ``(doc_id, n_trigrams, trigram_nll)``.

    Plan: trigrams come off the token array (nested ``zip_with`` of
    three clamped slices — no self-join, no positions); the trigram /
    bigram / unigram model tables are vocabulary-bounded aggregates
    broadcast back over the per-(doc, trigram) tf grain (pass
    ``broadcast_model=False`` at corpus scales where the trigram model
    outgrows a broadcast — the joins become key-shuffles; tf grain
    spreads hot n-grams and AQE splits the rest, the
    ``bigram_logprob_scores`` posture)."""
    # pin the three vocabulary-bounded model tables — the core reads
    # each ≥2 times (join + derived context mass); unpinned this was 7
    # corpus passes (r10 plan audit)
    tri = (
        _trigram_triples(docs, text_col, id_col)
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").cast("long").alias("t_cnt"))
        .localCheckpoint()
    )
    big = (
        _bigram_pairs(docs, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("b_cnt"))
        .localCheckpoint()
    )
    toks = docs.select(F.explode(_words(text_col)).alias("term"))
    uni = (
        toks.groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint()
    )
    return trigram_scores_from_counts(
        docs, tri, big, uni, text_col, id_col, lams, broadcast_model
    )


def _trigram_triples(
    docs: DataFrame, text_col: str, id_col: str | None
) -> DataFrame:
    """Per-document trigram occurrences ``(id, w1, w2, w3)`` off the
    token array (nested ``zip_with`` of three clamped slices — no
    self-join, no positions). ``id_col=None`` yields corpus-level
    occurrences with no id column (the streaming count-state path,
    ADVICE r10)."""
    tg = _trigram_structs(_words(text_col))
    head = [] if id_col is None else [id_col]
    return docs.select(*head, F.explode(tg).alias("t")).select(
        *head, "t.w1", "t.w2", "t.w3"
    )


def _trigram_structs(w: Column) -> Column:
    """``array<struct<w1,w2,w3>>`` of adjacent-token trigrams off a
    token ARRAY column — see :func:`_bigram_structs`."""
    n = F.size(w)
    tri_len = F.greatest(n - F.lit(2), F.lit(0))
    s1 = F.slice(w, F.lit(1), tri_len)
    s2 = F.slice(w, F.lit(2), tri_len)
    s3 = F.slice(w, F.lit(3), tri_len)
    return F.zip_with(
        F.zip_with(s1, s2, lambda x, y: F.struct(x.alias("w1"), y.alias("w2"))),
        s3,
        lambda p, z: F.struct(
            p["w1"].alias("w1"), p["w2"].alias("w2"), z.alias("w3")
        ),
    )


def trigram_scores_from_counts(
    docs: DataFrame,
    tri_counts: DataFrame,
    big_counts: DataFrame,
    term_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lams: tuple[float, float, float] = (0.5, 0.3125, 0.1875),
    broadcast_model: bool = True,
) -> DataFrame:
    """Score documents against EXPLICIT ``(w1, w2, w3, t_cnt)`` /
    ``(w1, w2, b_cnt)`` / ``(term, cnt)`` model tables — the shared
    core of :func:`trigram_logprob_scores` (model = the docs
    themselves) and the streaming serve (``streaming/wordcount.py
    trigram_nll_from_state``, r10). Context masses derive from the
    model tables exactly as the batch op derives them from its own
    corpus pass (c(w1 w2 ·) from the trigram table, c(w2 ·) from the
    bigram table, N from the term table), so self-scoring is equality
    by construction. Candidate trigrams absent from the model drop at
    the model join."""
    l3, l2, l1 = (float(x) for x in lams)
    if abs(l1 + l2 + l3 - 1.0) > 1e-12:
        raise ValueError(f"lams must sum to 1, got {lams}")
    trip = _trigram_triples(docs, text_col, id_col)
    uni = term_counts.select("term", F.col("cnt").alias("u_cnt"))
    total = term_counts.agg(F.sum("cnt").cast("double").alias("n_total"))
    tri = tri_counts
    ctx3 = tri.groupBy("w1", "w2").agg(F.sum("t_cnt").cast("long").alias("c3_cnt"))
    big2 = big_counts.select(
        F.col("w1").alias("bw2"), F.col("w2").alias("bw3"), "b_cnt"
    )
    ctx2 = (
        big2.groupBy("bw2")
        .agg(F.sum("b_cnt").cast("long").alias("c2_cnt"))
        .select(F.col("bw2").alias("cw2"), "c2_cnt")
    )
    tf = trip.groupBy(id_col, "w1", "w2", "w3").agg(
        F.count("*").cast("long").alias("tf")
    )
    p = (
        F.lit(l3) * (F.col("t_cnt").cast("double") / F.col("c3_cnt").cast("double"))
        + F.lit(l2) * (F.col("b_cnt").cast("double") / F.col("c2_cnt").cast("double"))
        + F.lit(l1) * (F.col("u_cnt").cast("double") / F.col("n_total"))
    )
    hint = F.broadcast if broadcast_model else (lambda d: d)
    return (
        tf.join(hint(tri), ["w1", "w2", "w3"])
        .join(hint(ctx3), ["w1", "w2"])
        .join(
            hint(big2),
            (F.col("w2") == F.col("bw2")) & (F.col("w3") == F.col("bw3")),
        )
        .join(hint(ctx2), F.col("w2") == F.col("cw2"))
        .join(hint(uni), F.col("w3") == F.col("term"))
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_trigrams"),
            F.round(
                -F.sum(F.col("tf").cast("double") * F.log(p))
                / F.sum("tf").cast("double"),
                6,
            ).alias("trigram_nll"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    sizes: tuple[int, ...] = (100, 1000, 10000),
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary coverage curve (r09): for each candidate vocabulary
    size V, the share of corpus token OCCURRENCES covered by the top-V
    words (count desc, word asc — fully deterministic) — the
    tokenizer/vocab sizing report every training pipeline runs before
    committing a word-level vocab (the Zipf-mass view: how much of the
    stream the head covers, what OOV rate the tail leaves).

    Output: one row per V — ``(vocab_size, n_types, covered_tokens,
    total_tokens, coverage)``; ``n_types`` is the corpus's total
    distinct-word count (the V axis ceiling), ``coverage`` =
    covered/total at 6 dp.

    Plan: one corpus token pass → vocabulary-bounded count table →
    ``_global_ranks`` two-phase distributed rank (count desc via
    negated-count sort key — never a single-task global window) → ONE
    conditional-sum aggregate producing all V thresholds, unpivoted
    with ``stack``. No corpus-side join; the only driver traffic is
    the P-row partition-offset table inside the rank."""
    sizes = tuple(int(v) for v in sizes)
    if not sizes or any(v <= 0 for v in sizes):
        raise ValueError(f"sizes must be positive, got {sizes}")
    counts = (
        docs.select(F.explode(_words(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return coverage_from_counts(counts, sizes)


def coverage_from_counts(
    counts: DataFrame, sizes: tuple[int, ...]
) -> DataFrame:
    """Coverage curve from a ``(term, cnt)`` table — shared by the
    batch operator and the streaming serve
    (``streaming/wordcount.py``), so stream==batch is equality by
    construction. Duplicate sizes are collapsed first (ADVICE r09:
    each V mints a ``_cov_{V}`` alias, so a repeated V would raise an
    AnalysisException); order is preserved."""
    from temporal_vector_database_spark.operators.dedup import _global_ranks

    sizes = tuple(dict.fromkeys(sizes))

    ranked = _global_ranks(
        counts.withColumn("_negc", -F.col("cnt")), "_negc", "term"
    )
    aggs = [
        F.count("*").cast("long").alias("n_types"),
        F.sum("cnt").cast("long").alias("total_tokens"),
    ] + [
        F.sum(F.when(F.col("rank") <= v, F.col("cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias(f"_cov_{v}")
        for v in sizes
    ]
    one = ranked.agg(*aggs)
    stack_expr = "stack({n}, {args}) as (vocab_size, covered_tokens)".format(
        n=len(sizes),
        args=", ".join(f"{v}, _cov_{v}" for v in sizes),
    )
    return one.select(
        F.expr(stack_expr), "n_types", "total_tokens"
    ).select(
        F.col("vocab_size").cast("int").alias("vocab_size"),
        "n_types",
        "covered_tokens",
        "total_tokens",
        F.round(
            F.col("covered_tokens").cast("double")
            / F.col("total_tokens").cast("double"),
            6,
        ).alias("coverage"),
    )


def bleu_score_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairwise BLEU-2 scoring (r09) — the MT-style n-gram overlap
    metric over CANDIDATE pairs (``(a_id, b_id)``: ``b`` is scored as
    the candidate against reference ``a``): modified (clipped) 1- and
    2-gram precisions plus the brevity penalty, published in LOG
    domain so no ``exp`` ever runs — ``log_bp = min(0, 1 − r/c)`` and
    ``log_bleu = log_bp + (ln p1 + ln p2)/2`` are compositions of
    exact ratios and ``ln`` only (the repo's nll-family determinism
    class; an ``exp``-domain BLEU would hang cross-engine bit equality
    on libm exp). ``log_bleu`` is NULL when either precision is 0
    (−∞) or the candidate is empty.

    Candidate generation is deliberately NOT built in: feed pairs from
    any dedup tier (LSH, SNM, PPJoin — see SCALE.md's tier guide);
    self-BLEU diversity audits feed sampled pairs.

    Output: ``(a_id, b_id, n_ref_tokens, n_cand_tokens, p1, p2,
    log_bp, log_bleu)``; precisions 6 dp.

    Plan: per-doc n-gram count tables (one token pass), then per pair
    one (pair, gram)-keyed clip join per order — cost bounded by the
    candidate set, never all-pairs."""
    w = _words(text_col)
    t = docs.select(F.col(id_col).alias("id"), w.alias("toks"))
    lens = t.select("id", F.size("toks").cast("long").alias("n"))
    g1 = (
        t.select("id", F.explode("toks").alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    bg_len = F.greatest(F.size("toks") - F.lit(1), F.lit(0))
    bg = F.zip_with(
        F.slice(F.col("toks"), F.lit(1), bg_len),
        F.slice(F.col("toks"), F.lit(2), bg_len),
        lambda x, y: F.concat_ws("\x1f", x, y),
    )
    g2 = (
        t.select("id", F.explode(bg).alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    p = pairs.select("a_id", "b_id")

    def clip(gm: DataFrame, tag: str) -> DataFrame:
        b = gm.select(
            F.col("id").alias("b_id"), "gram", F.col("cnt").alias("_bc")
        )
        a = gm.select(
            F.col("id").alias("a_id"), "gram", F.col("cnt").alias("_ac")
        )
        return (
            p.join(b, "b_id")
            .join(a, ["a_id", "gram"], "left")
            .groupBy("a_id", "b_id")
            .agg(
                F.sum(F.least(F.col("_bc"), F.coalesce(F.col("_ac"), F.lit(0))))
                .cast("long")
                .alias(f"num{tag}"),
                F.sum("_bc").cast("long").alias(f"den{tag}"),
            )
        )
    out = (
        p.join(lens.select(F.col("id").alias("a_id"), F.col("n").alias("n_ref_tokens")), "a_id")
        .join(lens.select(F.col("id").alias("b_id"), F.col("n").alias("n_cand_tokens")), "b_id")
        .join(clip(g1, "1"), ["a_id", "b_id"], "left")
        .join(clip(g2, "2"), ["a_id", "b_id"], "left")
    )
    r = F.col("n_ref_tokens").cast("double")
    c = F.col("n_cand_tokens").cast("double")
    p1 = F.col("num1").cast("double") / F.col("den1").cast("double")
    p2 = F.col("num2").cast("double") / F.col("den2").cast("double")
    log_bp = F.least(F.lit(0.0), F.lit(1.0) - r / c)
    return out.select(
        "a_id",
        "b_id",
        "n_ref_tokens",
        "n_cand_tokens",
        F.when(F.col("den1") > 0, F.round(p1, 6)).alias("p1"),
        F.when(F.col("den2") > 0, F.round(p2, 6)).alias("p2"),
        F.when(F.col("n_cand_tokens") > 0, F.round(log_bp, 6)).alias("log_bp"),
        F.when(
            (F.col("num1") > 0) & (F.col("num2") > 0),
            F.round(log_bp + (F.log(p1) + F.log(p2)) / F.lit(2.0), 6),
        ).alias("log_bleu"),
    )


def kneser_ney_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount_num: int = 3,
    discount_den: int = 4,
    broadcast_model: bool = True,
) -> DataFrame:
    """Interpolated KNESER-NEY bigram language-model score per document
    (r09) — the smoothing that actually ships in n-gram LMs (Kneser &
    Ney 1995; Chen & Goodman 1999), beside the Jelinek-Mercer rungs:

        p_KN(w2 | w1) = max(c(w1 w2) − d, 0) / c(w1 ·)
                      + d · N1+(w1 ·) / c(w1 ·) · p_cont(w2)
        p_cont(w2)    = N1+(· w2) / N1+(· ·)

    where N1+(w1 ·) is the number of DISTINCT continuations of w1,
    N1+(· w2) the number of distinct contexts preceding w2, and
    N1+(· ·) the number of distinct bigram types — the continuation
    counts that make KN model "how promiscuously a word appears in new
    contexts" instead of raw frequency. Discount d = 3/4 (dyadic, the
    fixture-grid float policy). Score = mean −ln p over the doc's
    bigrams, 6 dp; docs with < 2 tokens are omitted. A first-position
    context unseen in training cannot occur (the corpus is its own
    model), so p is always > 0 without unk-mass bookkeeping.

    Output: ``(doc_id, n_bigrams, kn_nll)``.

    Plan: identical bounded shape to :func:`bigram_logprob_scores` —
    the bigram/context/continuation tables are all vocabulary-bounded
    aggregates of ONE bigram pass, broadcast back over the per-(doc,
    bigram) tf grain (``broadcast_model=False`` shuffles them at
    billion-type scales, AQE handling the skew)."""
    d_num, d_den = int(discount_num), int(discount_den)
    if not (0 < d_num < d_den):
        raise ValueError(
            f"need 0 < discount_num < discount_den, got {discount_num}/{discount_den}"
        )
    # pin the bigram model: ctx/cont/types/the tf join all consume it
    # (r10 plan audit — 5 corpus passes unpinned)
    big = _bigram_pairs(docs, text_col, id_col).groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("b_cnt")
    ).localCheckpoint()
    return kneser_ney_scores_from_counts(
        docs, big, text_col, id_col, discount_num, discount_den,
        broadcast_model,
    )


def kneser_ney_scores_from_counts(
    docs: DataFrame,
    big_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount_num: int = 3,
    discount_den: int = 4,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score documents against an EXPLICIT ``(w1, w2, b_cnt)`` bigram
    model — the shared core of :func:`kneser_ney_logprob_scores`
    (model = the docs themselves) and the streaming serve
    (``streaming/wordcount.py kneser_ney_nll_from_state``, r10): EVERY
    KN quantity (context mass, forward/backward continuation counts,
    the type total) derives from the bigram table alone, so the serve
    needs only the one maintained count state. Self-scoring is
    equality by construction; candidate bigrams absent from the model
    drop at the model join."""
    d_num, d_den = int(discount_num), int(discount_den)
    if not (0 < d_num < d_den):
        raise ValueError(
            f"need 0 < discount_num < discount_den, got {discount_num}/{discount_den}"
        )
    pairs = _bigram_pairs(docs, text_col, id_col)
    big = big_counts
    ctx = big.groupBy("w1").agg(
        F.sum("b_cnt").cast("long").alias("c_cnt"),
        F.count("*").cast("long").alias("n1p_fwd"),
    )
    cont = (
        big.groupBy("w2")
        .agg(F.count("*").cast("long").alias("n1p_bwd"))
        .select(F.col("w2").alias("cw2"), "n1p_bwd")
    )
    types = big.agg(F.count("*").cast("double").alias("n_types"))
    tf = pairs.groupBy(id_col, "w1", "w2").agg(
        F.count("*").cast("long").alias("tf")
    )
    d = F.lit(d_num).cast("double") / F.lit(d_den).cast("double")
    p = (
        F.greatest(
            F.col("b_cnt").cast("double") - d, F.lit(0.0)
        ) / F.col("c_cnt").cast("double")
        + d * F.col("n1p_fwd").cast("double") / F.col("c_cnt").cast("double")
        * (F.col("n1p_bwd").cast("double") / F.col("n_types"))
    )
    hint = F.broadcast if broadcast_model else (lambda x: x)
    return (
        tf.join(hint(big), ["w1", "w2"])
        .join(hint(ctx), "w1")
        .join(hint(cont), F.col("w2") == F.col("cw2"))
        .crossJoin(F.broadcast(types))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("tf").cast("double") * F.log(p))
                / F.sum("tf").cast("double"),
                6,
            ).alias("kn_nll"),
        )
    )


def modified_kn_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Interpolated MODIFIED Kneser-Ney TRIGRAM language-model score
    per document (r10, VERDICT r09 #4) — the smoothing that ships in
    production n-gram LMs (Chen & Goodman 1999 §3; the KenLM default),
    the rung above the plain-KN bigram (:func:`kneser_ney_logprob_scores`)
    and the JM trigram (:func:`trigram_logprob_scores`):

        p(w3|w1 w2) = max(c(w1w2w3) − D(c), 0) / c(w1w2·)
                    + γ(w1w2) · p(w3|w2)
        γ(w1w2)     = (D1·N1(w1w2·) + D2·N2(w1w2·) + D3·N3+(w1w2·))
                      / c(w1w2·)

    with THREE count-dependent discounts per order, estimated from the
    order's count-of-counts (Y = n1/(n1 + 2·n2); D1 = 1 − 2Y·n2/n1;
    D2 = 2 − 3Y·n3/n2; D3 = 3 − 4Y·n4/n3, clamped at 0, dyadic
    fallbacks when a count-of-count is empty). The bigram level uses
    CONTINUATION counts c'(w2 w3) = N1+(· w2 w3) (distinct preceding
    w1 over the trigram table) with its own data-estimated discounts
    and back-off weight, bottoming out at the continuation unigram
    p_cont(w3) = N1+(· w3)/N1+(· ·). Every seen trigram gets p > 0
    (the corpus is its own model), no unk-mass bookkeeping. Score =
    mean −ln p over the doc's trigrams, 6 dp; docs with < 3 tokens are
    omitted.

    Output: ``(doc_id, n_trigrams, mkn_nll)``.

    Plan: ONE trigram pass feeds every model table — the trigram
    counts, per-context masses + discount buckets (N1/N2/N3+ as one
    conditional aggregate), the continuation-bigram table (a distinct
    aggregate of the same pass), its context buckets, the continuation
    unigram, and the two 1-row count-of-count tables whose discounts
    broadcast as scalars. All vocabulary-bounded aggregates broadcast
    back over the per-(doc, trigram) tf grain
    (``broadcast_model=False`` shuffles them at billion-type scale,
    the family posture). The oracle mirrors the exact expression tree
    (association order pinned) so both engines multiply bit-identical
    doubles."""
    # SEVEN model tables (tri/ctx3/d3/cbig/ctx2/e2/cont/types) all
    # derive from the trigram count table; without this pin Catalyst
    # re-executes the corpus explode+aggregate subtree once per
    # consumer — 8 corpus passes instead of 1 (measured in the r10
    # plan audit: 9 parquet scans of documents). The checkpoint
    # materializes the VOCABULARY-BOUNDED table once; only the per-doc
    # tf grain still reads the corpus.
    tri = (
        _trigram_triples(docs, text_col, id_col)
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").cast("long").alias("t_cnt"))
        .localCheckpoint()
    )
    return modified_kn_scores_from_counts(
        docs, tri, text_col, id_col, broadcast_model
    )


def modified_kn_scores_from_counts(
    docs: DataFrame,
    tri_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Score documents against an EXPLICIT ``(w1, w2, w3, t_cnt)``
    trigram model — the shared core of
    :func:`modified_kn_logprob_scores` (model = the docs themselves)
    and the streaming serve (``streaming/wordcount.py
    modified_kn_nll_from_state``, r10): EVERY modified-KN quantity —
    both orders' count-of-count discounts, context masses and their
    N1/N2/N3+ buckets, the continuation bigram/unigram tables — derives
    from the trigram table alone, so the serve needs only the one
    maintained count state. Self-scoring is equality by construction;
    candidate trigrams absent from the model drop at the model join."""
    trip = _trigram_triples(docs, text_col, id_col)
    tri = tri_counts

    def _buckets(cnt_col: str):
        return [
            F.sum(F.when(F.col(cnt_col) == 1, 1).otherwise(0))
            .cast("long")
            .alias("b1"),
            F.sum(F.when(F.col(cnt_col) == 2, 1).otherwise(0))
            .cast("long")
            .alias("b2"),
            F.sum(F.when(F.col(cnt_col) >= 3, 1).otherwise(0))
            .cast("long")
            .alias("b3"),
        ]

    def _discounts(counts: DataFrame, cnt_col: str, pre: str) -> DataFrame:
        """1-row (D1, D2, D3) from the order's count-of-counts —
        clamped at 0, dyadic fallbacks for empty n_k (both engines
        compute the identical expression tree)."""
        coc = counts.agg(
            *[
                F.sum(F.when(F.col(cnt_col) == k, 1).otherwise(0))
                .cast("double")
                .alias(f"n{k}")
                for k in (1, 2, 3, 4)
            ]
        )
        y = F.when(
            F.col("n1") + F.lit(2.0) * F.col("n2") > 0,
            F.col("n1") / (F.col("n1") + F.lit(2.0) * F.col("n2")),
        ).otherwise(F.lit(0.5))
        return coc.select(
            F.when(
                F.col("n1") > 0,
                F.greatest(
                    F.lit(1.0) - F.lit(2.0) * y * F.col("n2") / F.col("n1"),
                    F.lit(0.0),
                ),
            )
            .otherwise(F.lit(0.5))
            .alias(f"{pre}1"),
            F.when(
                F.col("n2") > 0,
                F.greatest(
                    F.lit(2.0) - F.lit(3.0) * y * F.col("n3") / F.col("n2"),
                    F.lit(0.0),
                ),
            )
            .otherwise(F.lit(1.0))
            .alias(f"{pre}2"),
            F.when(
                F.col("n3") > 0,
                F.greatest(
                    F.lit(3.0) - F.lit(4.0) * y * F.col("n4") / F.col("n3"),
                    F.lit(0.0),
                ),
            )
            .otherwise(F.lit(1.5))
            .alias(f"{pre}3"),
        )

    ctx3 = tri.groupBy("w1", "w2").agg(
        F.sum("t_cnt").cast("long").alias("c3_cnt"), *_buckets("t_cnt")
    ).withColumnsRenamed({"b1": "nt1", "b2": "nt2", "b3": "nt3"})
    d3 = _discounts(tri, "t_cnt", "d")
    cbig = tri.groupBy("w2", "w3").agg(
        F.count("*").cast("long").alias("cp_cnt")
    )
    ctx2 = cbig.groupBy("w2").agg(
        F.sum("cp_cnt").cast("long").alias("c2_cnt"), *_buckets("cp_cnt")
    ).withColumnsRenamed({"b1": "nb1", "b2": "nb2", "b3": "nb3"})
    e2 = _discounts(cbig, "cp_cnt", "e")
    cont = cbig.groupBy("w3").agg(
        F.count("*").cast("long").alias("n1p_bwd")
    )
    types = cbig.agg(F.count("*").cast("double").alias("n_types"))
    tf = trip.groupBy(id_col, "w1", "w2", "w3").agg(
        F.count("*").cast("long").alias("tf")
    )

    def _disc_of(cnt: str, pre: str):
        return (
            F.when(F.col(cnt) == 1, F.col(f"{pre}1"))
            .when(F.col(cnt) == 2, F.col(f"{pre}2"))
            .otherwise(F.col(f"{pre}3"))
        )

    pcont = F.col("n1p_bwd").cast("double") / F.col("n_types")
    g2 = (
        F.col("e1") * F.col("nb1").cast("double")
        + F.col("e2") * F.col("nb2").cast("double")
        + F.col("e3") * F.col("nb3").cast("double")
    ) / F.col("c2_cnt").cast("double")
    p2 = (
        F.greatest(
            F.col("cp_cnt").cast("double") - _disc_of("cp_cnt", "e"),
            F.lit(0.0),
        )
        / F.col("c2_cnt").cast("double")
        + g2 * pcont
    )
    g3 = (
        F.col("d1") * F.col("nt1").cast("double")
        + F.col("d2") * F.col("nt2").cast("double")
        + F.col("d3") * F.col("nt3").cast("double")
    ) / F.col("c3_cnt").cast("double")
    p3 = (
        F.greatest(
            F.col("t_cnt").cast("double") - _disc_of("t_cnt", "d"),
            F.lit(0.0),
        )
        / F.col("c3_cnt").cast("double")
        + g3 * p2
    )
    hint = F.broadcast if broadcast_model else (lambda d: d)
    return (
        tf.join(hint(tri), ["w1", "w2", "w3"])
        .join(hint(ctx3), ["w1", "w2"])
        .join(hint(cbig), ["w2", "w3"])
        .join(hint(ctx2), "w2")
        .join(hint(cont), "w3")
        .crossJoin(F.broadcast(types))
        .crossJoin(F.broadcast(d3))
        .crossJoin(F.broadcast(e2))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_trigrams"),
            F.round(
                -F.sum(F.col("tf").cast("double") * F.log(p3))
                / F.sum("tf").cast("double"),
                6,
            ).alias("mkn_nll"),
        )
    )


def perplexity_band_select(
    docs: DataFrame,
    lo_pct: int = 25,
    hi_pct: int = 75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Middle-perplexity data selection (r09) — the curation heuristic
    that drops BOTH tails of the LM-score distribution: the too-easy
    tail (boilerplate, templates, repeats — suspiciously close to the
    corpus distribution) and the too-hard tail (garble, wrong-language,
    binary junk), keeping the [lo_pct, hi_pct) percent-rank band of
    :func:`unigram_logprob_scores`.

    Band membership is EXACT integer arithmetic — a doc with 0-based
    rank r among N scored docs (order: nll asc, doc_id asc — total) is
    kept iff ``lo_pct·(N−1) ≤ r·100 < hi_pct·(N−1)`` (percent_rank in
    [lo/100, hi/100) by cross-multiplication, no float thresholds).
    Docs with no tokens have no score and are never selected.

    Output: kept docs — ``(doc_id, n_tokens, unigram_nll, rank)``
    with ``rank`` the 1-based global score rank.

    Plan: the unigram score pass + the two-phase distributed rank
    (``_global_ranks`` — no single-task global window) + one broadcast
    scalar N; the band filter is row-local."""
    scored = unigram_logprob_scores(docs, text_col, id_col)
    return band_from_scores(scored, lo_pct, hi_pct, id_col)


def band_from_scores(
    scored: DataFrame, lo_pct: int, hi_pct: int, id_col: str = "doc_id"
) -> DataFrame:
    """Percent-rank band selection over an EXPLICIT ``(id, n_tokens,
    unigram_nll)`` score table — the shared core of
    :func:`perplexity_band_select` (scores = the corpus self-scored)
    and the streaming serve (``streaming/wordcount.py
    perplexity_band_from_state``, r10: scores come from the maintained
    count state). Same integer cross-multiplication band math, same
    two-phase distributed rank."""
    from temporal_vector_database_spark.operators.dedup import _global_ranks

    lo, hi = int(lo_pct), int(hi_pct)
    if not (0 <= lo < hi <= 100):
        raise ValueError(f"need 0 <= lo < hi <= 100, got {lo_pct}, {hi_pct}")
    ranked = _global_ranks(scored, "unigram_nll", id_col)
    n1 = ranked.agg((F.count("*") - F.lit(1)).cast("long").alias("_n1"))
    return (
        ranked.crossJoin(F.broadcast(n1))
        .where(
            (F.lit(lo) * F.col("_n1") <= (F.col("rank") - 1) * 100)
            & ((F.col("rank") - 1) * 100 < F.lit(hi) * F.col("_n1"))
        )
        .select(id_col, "n_tokens", "unigram_nll", "rank")
    )


def rouge_score_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairwise ROUGE-1/2 (r09) — recall-oriented n-gram overlap over
    candidate pairs, the summarization-eval twin of
    :func:`bleu_score_pairs` and the second axis of a self-similarity
    audit (BLEU asks "how much of the candidate is in the reference",
    ROUGE asks "how much of the reference does the candidate cover").
    For each ``(a_id, b_id)`` pair (``a`` = reference, ``b`` =
    candidate) and n ∈ {1, 2}:

        recall_n = Σ_g min(cnt_a(g), cnt_b(g)) / Σ_g cnt_a(g)
        prec_n   = Σ_g min(cnt_a(g), cnt_b(g)) / Σ_g cnt_b(g)
        f1_n     = 2·p·r / (p + r)

    — pure ratios and IEEE ×/÷/+ (no transcendental at all, stricter
    than the ln class). NULL where a denominator is 0 or f1's p+r = 0;
    an EMPTY REFERENCE publishes all-NULL for that order (metric
    undefined — not precision 0), matching the oracle bit-for-bit.

    Output: ``(a_id, b_id, r1, p1_, f1, r2, p2_, f2)``, 6 dp.

    Plan: same bounded shape as BLEU — per-doc n-gram counts, one
    (pair, gram)-keyed clip join per order, candidate-set bounded."""
    w = _words(text_col)
    t = docs.select(F.col(id_col).alias("id"), w.alias("toks"))
    g1 = (
        t.select("id", F.explode("toks").alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    bg_len = F.greatest(F.size("toks") - F.lit(1), F.lit(0))
    bg = F.zip_with(
        F.slice(F.col("toks"), F.lit(1), bg_len),
        F.slice(F.col("toks"), F.lit(2), bg_len),
        lambda x, y: F.concat_ws("\x1f", x, y),
    )
    g2 = (
        t.select("id", F.explode(bg).alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    p = pairs.select("a_id", "b_id")

    def clip(gm: DataFrame, tag: str) -> DataFrame:
        # FULL outer on the gram axis via union trick is unnecessary:
        # min(cnt_a, cnt_b) is 0 wherever either side lacks the gram,
        # so joining from the reference side covers the numerator and
        # the reference denominator; the candidate denominator comes
        # from its own per-doc total.
        a = gm.select(F.col("id").alias("a_id"), "gram", F.col("cnt").alias("_ac"))
        b = gm.select(F.col("id").alias("b_id"), "gram", F.col("cnt").alias("_bc"))
        return (
            p.join(a, "a_id")
            .join(b, ["b_id", "gram"], "left")
            .groupBy("a_id", "b_id")
            .agg(
                F.sum(F.least(F.col("_ac"), F.coalesce(F.col("_bc"), F.lit(0))))
                .cast("long")
                .alias(f"num{tag}"),
                F.sum("_ac").cast("long").alias(f"dena{tag}"),
            )
        )

    totb1 = g1.groupBy("id").agg(F.sum("cnt").cast("long").alias("denb1"))
    totb2 = g2.groupBy("id").agg(F.sum("cnt").cast("long").alias("denb2"))
    out = (
        p.join(clip(g1, "1"), ["a_id", "b_id"], "left")
        .join(clip(g2, "2"), ["a_id", "b_id"], "left")
        .join(totb1.select(F.col("id").alias("b_id"), "denb1"), "b_id", "left")
        .join(totb2.select(F.col("id").alias("b_id"), "denb2"), "b_id", "left")
    )

    def prf(num, dena, denb):
        r = num.cast("double") / dena.cast("double")
        pp = num.cast("double") / denb.cast("double")
        f1 = F.lit(2.0) * pp * r / (pp + r)
        return (
            F.when(dena > 0, F.round(r, 6)),
            F.when(denb > 0, F.round(pp, 6)),
            F.when((dena > 0) & (denb > 0) & (num > 0), F.round(f1, 6)),
        )

    r1, p1_, f1 = prf(F.col("num1"), F.col("dena1"), F.coalesce(F.col("denb1"), F.lit(0)))
    r2, p2_, f2 = prf(F.col("num2"), F.col("dena2"), F.coalesce(F.col("denb2"), F.lit(0)))
    return out.select(
        "a_id", "b_id",
        r1.alias("r1"), p1_.alias("p1_"), f1.alias("f1"),
        r2.alias("r2"), p2_.alias("p2_"), f2.alias("f2"),
    )


def corpus_top_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 100,
    min_count: int = 2,
) -> DataFrame:
    """Corpus-global heavy hitters: the ``k`` most frequent word
    ``n``-grams with total occurrence and document-frequency counts —
    the boilerplate census a curation pipeline runs before writing
    removal rules (cookie banners, licence headers, navigation chrome).

    Exact, not sketched, in two map-side-combinable aggregates: first
    at (gram, doc) grain — doc_id in the key keeps that exchange as
    uniform as the corpus — then a gram-keyed rollup whose input is
    already one row per (gram, doc), so a gram appearing 10^9 times
    arrives as doc-count rows, not occurrence rows (hot keys are the
    combiner's best case; contrast a window over the gram key). The
    global top-k is Spark's TakeOrderedAndProject over the aggregate
    output: no total sort materializes. Ties break by gram text, so
    the cut is deterministic in any engine.
    """
    from temporal_vector_database_spark.operators.curation import _word_ngrams

    w = _words(text_col)
    per_doc = (
        docs.select(F.col("doc_id"), F.explode(_word_ngrams(w, n)).alias("ng"))
        .groupBy("ng", "doc_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    totals = per_doc.groupBy("ng").agg(
        F.sum("c").cast("long").alias("n_occurrences"),
        F.count("*").cast("long").alias("doc_freq"),
    )
    return (
        totals.where(F.col("n_occurrences") >= int(min_count))
        .orderBy(F.desc("n_occurrences"), F.asc("ng"))
        .limit(int(k))
    )


def collocations_pmi(
    docs: DataFrame,
    k: int = 100,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining by pointwise mutual information: the word
    pairs that co-occur far more than their unigram frequencies predict
    ("new york"-style units worth single tokens; the classic
    Church & Hanks 1990 association measure). Top-``k`` adjacent-word
    bigrams with corpus count ≥ ``min_count`` ranked by PMI.

    Determinism discipline: PMI = log2(c_ab·N / (c_a·c_b)) is published
    in the EXACT fixed-point-log2 units of ``operators/dsir.py`` —
    ``pmi_units = [score(c_ab) + score(N)] − [score(c_a) + score(c_b)]``
    — a BIGINT identical in any engine (the metric is DEFINED as the
    fixed-point formula; within 4·0.086 of true log2·2^16). ``N`` is
    the unigram total.

    Plan: one bigram count + one unigram count aggregation (map-side
    combined heavy-hitter shape); unigram counts join back onto the
    ≥min_count bigram survivors; 1-row totals broadcast; global top-k
    via TakeOrdered — no full sort.
    """
    from temporal_vector_database_spark.operators.dsir import _fixed_log2_sql

    ws = _words(text_col)
    toks = docs.select(F.col(id_col).alias("_id"), ws.alias("ws"))
    uni = toks.select(F.explode("ws").alias("w")).groupBy("w").agg(
        F.count("*").cast("long").alias("cw")
    )
    bi = (
        toks.where(F.size("ws") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    lambda w, i: F.struct(
                        w.alias("a"),
                        F.element_at(F.col("ws"), i + F.lit(2)).alias("b"),
                    ),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= int(min_count))
    )
    total = uni.agg(F.sum("cw").cast("long").alias("n_total"))
    scored = (
        bi.join(uni.select(F.col("w").alias("a"), F.col("cw").alias("c_a")), "a")
        .join(uni.select(F.col("w").alias("b"), F.col("cw").alias("c_b")), "b")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "pmi_units",
            F.expr(
                f"({_fixed_log2_sql('c_ab')} + {_fixed_log2_sql('n_total')})"
                f" - ({_fixed_log2_sql('c_a')} + {_fixed_log2_sql('c_b')})"
            ).cast("long"),
        )
    )
    return (
        scored.select("a", "b", "c_ab", "c_a", "c_b", "pmi_units")
        .orderBy(F.desc("pmi_units"), F.asc("a"), F.asc("b"))
        .limit(int(k))
    )


def winnow_shared_pairs(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document pairs sharing winnowing fingerprints (r08) — the
    MATCHING half of MOSS (Schleimer et al., SIGMOD'03) on top of
    :func:`winnow_fingerprints`: any shared substring of length >=
    ``k + w − 1`` guarantees a shared fingerprint, so pairs with
    ``n_shared >= min_shared`` localize plagiarism/boilerplate overlap
    at SPAN grain — evidence the set-similarity tiers (Jaccard,
    containment) deliberately discard.

    ``max_fp_df`` is MOSS's noise rule made explicit: fingerprints in
    more than that many documents are corpus boilerplate and are
    dropped BEFORE pairing — which is also the skew defense (a print
    shared by m docs yields m² candidate pairs; the cap bounds the
    hottest join group). Prints with df 1 can't pair and are dropped
    too. Candidate generation is one fingerprint equi-join; counts are
    exact integers (per-doc prints are already distinct).

    Output: ``(a_id, b_id, n_shared)``, a_id < b_id.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    fps = winnow_fingerprints(docs, text_col, k, w, id_col).localCheckpoint()
    dfc = (
        fps.groupBy("fp")
        .agg(F.count("*").cast("long").alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= int(max_fp_df)))
    )
    # plain semi-join (AQE decides): the pairable-print table is
    # corpus-shaped in adversarial inputs — never force a broadcast
    rare = fps.join(dfc.select("fp"), "fp", "left_semi")
    a = rare.select(F.col(id_col).alias("a_id"), "fp")
    b = rare.select(F.col(id_col).alias("b_id"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= F.lit(int(min_shared)))
    )


def frequent_token_pairs(
    docs: DataFrame,
    min_support_num: int = 5,
    min_support_den: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_items: int = 10_000,
) -> DataFrame:
    """Frequent CO-OCCURRING token pairs (r08) — document-grain
    market-basket mining with the classic APRIORI prune (Agrawal &
    Srikant, VLDB'94): an unordered token pair is frequent iff it
    co-occurs in ``>= ceil(num/den · N)`` documents, and a pair can
    only be frequent if BOTH tokens are individually frequent — so the
    per-document pair generation runs over each doc's FREQUENT-token
    subset only, never its full vocabulary. Complements
    :func:`collocations_pmi` (adjacency-grain) with bag-grain
    association: "docs mentioning X also mention Y".

    Pipeline: (1) row-local distinct-token sets, (2) one token-df
    aggregate → frequent singletons, (3) per-doc pairs generated
    ROW-LOCALLY (nested ``transform`` over the sorted frequent subset —
    no per-doc self-join, no explode-then-join), (4) one pair-count
    aggregate with the exact integer support gate. The quadratic term
    is per-doc frequent-token count m (``m·(m−1)/2`` pairs);
    ``max_doc_items`` RAISES past a documented bound rather than
    silently truncating (the no-silent-caps rule). Support threshold is
    an exact rational of the corpus doc count (1-row collect, a model
    parameter).

    Output: ``(tok_a, tok_b, n_docs, lift)`` with ``tok_a < tok_b``;
    ``lift = n_docs·N / (df_a·df_b)`` published as one exact IEEE
    division of sub-2^53 integers (engine-bit-stable).
    """
    if not (0 < int(min_support_num) <= int(min_support_den)):
        raise ValueError("min_support must satisfy 0 < num <= den")
    num, den = int(min_support_num), int(min_support_den)
    n_docs_total = docs.count()  # 1-row model parameter
    minsup = (num * n_docs_total + den - 1) // den
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(_words(text_col)).alias("tset"),
    )
    df_counts = (
        toks.select(F.explode("tset").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("df"))
        .localCheckpoint()
    )
    freq1 = df_counts.where(F.col("df") >= F.lit(int(minsup)))
    # keep each doc's frequent tokens, sorted (canonical pair order)
    ftoks = (
        toks.select("_id", F.explode("tset").alias("tok"))
        .join(F.broadcast(freq1.select("tok")), "tok", "left_semi")
        .groupBy("_id")
        .agg(F.array_sort(F.collect_list("tok")).alias("fts"))
        .withColumn("m", F.size("fts"))
    )
    too_big = ftoks.where(F.col("m") > int(max_doc_items)).limit(1).collect()
    if too_big:
        raise ValueError(
            f"a document has {too_big[0].m} frequent tokens "
            f"(> max_doc_items={max_doc_items}); raise the support "
            "threshold or the bound explicitly"
        )
    pair_arr = F.flatten(
        F.transform(
            F.col("fts"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("fts"), i + F.lit(2), F.greatest(F.size("fts") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        ftoks.where(F.col("m") >= 2)
        .select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("tok_a"), F.col("p.b").alias("tok_b"))
        .agg(F.count("*").cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= F.lit(int(minsup)))
    )
    da = freq1.select(F.col("tok").alias("tok_a"), F.col("df").alias("df_a"))
    db = freq1.select(F.col("tok").alias("tok_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(da), "tok_a")
        .join(F.broadcast(db), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "n_docs",
            (
                (F.col("n_docs") * F.lit(int(n_docs_total))).cast("double")
                / (F.col("df_a") * F.col("df_b")).cast("double")
            ).alias("lift"),
        )
    )


def _mg_partition_fn(kt: int):
    """Per-partition weighted Misra-Gries summary (<= ``kt`` counters):
    per Arrow batch, fold the batch's value_counts (C-speed) into the
    summary; on overflow subtract the (len-kt)-th smallest counter from
    everything and drop <= 0 — at most kt survivors, and the removed
    mass covers >= (kt+1)·m, so total decrements <= N_p/(kt+1) and an
    item with true partition count above that deficit is never evicted.
    Shared by the batch operator and ``streaming/heavyhitters.py``
    (partition summaries are themselves mergeable MG summaries)."""
    import numpy as np
    import pandas as pd

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for g, c in pdf["gram"].value_counts().items():
                counters[g] = counters.get(g, 0) + int(c)
            if len(counters) > kt:
                vals = np.fromiter(counters.values(), dtype=np.int64)
                m = int(np.partition(vals, len(vals) - kt - 1)[len(vals) - kt - 1])
                counters = {g: c - m for g, c in counters.items() if c > m}
        if counters:
            yield pd.DataFrame(
                {"gram": list(counters), "mg_count": list(counters.values())}
            )

    return mg


def heavy_hitters_sketch(
    docs: DataFrame,
    k_track: int = 64,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Misra–Gries / SpaceSaving heavy-hitter CANDIDATES from mergeable
    per-partition summaries — the sketch path beside the exact
    ``corpus_top_ngrams``: each partition keeps a ``k_track``-counter
    MG summary over its n-gram stream; summaries merge by counter
    addition + decrement-by-(k+1)-th (the standard mergeable-summaries
    result, Agarwal et al. PODS'12), so the reduce tree is associative
    and the final summary's deficit is bounded by N/(k_track+1).

    CONTRACT (the HLL/quantile-sketch discipline): the published values
    are NOT the sketch's raw counts — candidate SETS depend on stream
    partition order, so raw MG output can never be oracle-gated.
    Instead the operator joins candidates back to their EXACT corpus
    counts and publishes every candidate whose exact count clears
    ``N/(k_track+1)`` — a set that provably CONTAINS every true heavy
    hitter above the threshold (MG never evicts an item with count
    above the deficit bound), making the output deterministic and the
    guarantee checkable: the oracle computes the same
    exact-count-over-threshold set directly.

    Plan: the MG pass is one ``mapInPandas`` over the gram stream (no
    shuffle); candidates are ≤ k_track·partitions rows; the exact-count
    join is a semi-join-sized aggregation over grams. At 100 TB the MG
    pass bounds the candidate set without the full gram shuffle the
    exact census pays.
    """
    grams = _gram_stream(docs, n, id_col, text_col)

    kt = int(k_track)
    summaries = grams.mapInPandas(
        _mg_partition_fn(kt), schema="gram string, mg_count long"
    )
    cands = summaries.select("gram").distinct()
    exact = grams.join(F.broadcast(cands), "gram", "left_semi").groupBy("gram").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )
    total = grams.agg(F.count("*").cast("long").alias("n_grams"))
    out = exact.crossJoin(F.broadcast(total))
    return out.where(
        F.col("n_occurrences") * (kt + 1) > F.col("n_grams")
    ).select("gram", "n_occurrences", "n_grams")


def _gram_stream(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Word ``n``-gram occurrence stream (one row per occurrence) —
    shared by the MG and CMS sketch paths."""
    ws = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    toks = docs.select(F.col(id_col).alias("_id"), ws.alias("ws"))
    return toks.where(F.size("ws") >= n).select(
        F.explode(
            F.transform(
                F.slice(F.col("ws"), 1, F.size("ws") - F.lit(n - 1)),
                lambda w, i: F.concat_ws(
                    " ",
                    w,
                    *[F.element_at(F.col("ws"), i + F.lit(j + 1)) for j in range(1, n)],
                ),
            )
        ).alias("gram")
    )


def _cms_bucket(r_col: str, gram_col: str, width: int):
    """Engine-portable CMS bucket: md5-prefix u32 of ``r|gram`` mod width."""
    return (
        _u32(F.concat_ws("|", F.col(r_col).cast("string"), F.col(gram_col)))
        % F.lit(int(width))
    ).alias("b")


def cms_counters(
    docs: DataFrame,
    n: int = 2,
    depth: int = 4,
    width: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Count-Min counter table ``(r, b, c)`` over the word n-gram stream
    — ``depth x width`` rows regardless of corpus size, PURELY ADDITIVE
    (bucket sums of per-gram counts equal the stream's increments in any
    order), so counter tables from any batching of the corpus fold by
    integer sum (the streaming twin's contract)."""
    d = int(depth)
    exact = (
        _gram_stream(docs, n, id_col, text_col)
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return (
        exact.select(
            "gram", "c", F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r")
        )
        .select("r", _cms_bucket("r", "gram", width), "c")
        .groupBy("r", "b")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def cms_estimate_check(
    docs: DataFrame,
    k_track: int = 64,
    n: int = 2,
    depth: int = 4,
    width: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan '05) point estimates
    beside the Misra-Gries candidate path (:func:`heavy_hitters_sketch`)
    — CMS answers "how often does THIS gram occur?" from
    ``depth x width`` counters instead of a full census.

    Unlike most sketches, CMS is VALUE-LEVEL deterministic: counters
    are pure integer sums per (row, bucket) with engine-portable
    md5-prefix bucket hashes, and the estimate is the min over ``depth``
    counters — no partition-order dependence anywhere, so the DuckDB
    oracle replays the exact estimates (contrast MG, whose raw counts
    are stream-order-dependent and deliberately unpublished).

    Published rows: every gram whose EXACT count clears
    ``N/(k_track+1)`` (the deterministic hot set shared with the MG
    gate), with its exact count and its CMS estimate — the one-sided
    guarantee ``cms_est >= n_occurrences`` (overcount only, bounded by
    N·e/width per row in expectation) is visible in the data; the
    default ``width=256`` is deliberately smaller than realistic gram
    vocabularies so collisions actually occur and the gate checks
    bucket-sum math, not a no-collision identity.

    Plan: counters build from the per-gram partial counts (a map-side-
    combined gram-keyed aggregate, then a depth×width-bounded bucket
    rollup — bucket sums of per-gram counts are EXACTLY the stream's
    counter increments, summed in any order); estimates are a
    broadcast-sized join of the hot set against the counter table. At
    100 TB the counter table is ``depth*width`` rows regardless of
    corpus size — the mergeable-summaries shape.
    """
    grams = _gram_stream(docs, n, id_col, text_col)
    kt, d, wdt = int(k_track), int(depth), int(width)
    exact = grams.groupBy("gram").agg(F.count("*").cast("long").alias("n_occurrences"))
    total = grams.agg(F.count("*").cast("long").alias("n_grams"))
    counters = cms_counters(docs, n=n, depth=d, width=wdt, id_col=id_col,
                            text_col=text_col)
    hot = (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("n_occurrences") * (kt + 1) > F.col("n_grams"))
        .select("gram", "n_occurrences", "n_grams")
    )
    probes = hot.select(
        "gram",
        "n_occurrences",
        "n_grams",
        F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r"),
    ).select("gram", "n_occurrences", "n_grams", "r", _cms_bucket("r", "gram", wdt))
    return (
        probes.join(counters, ["r", "b"])
        .groupBy("gram", "n_occurrences", "n_grams")
        .agg(F.min("c").cast("long").alias("cms_est"))
        .select("gram", "n_occurrences", "cms_est", "n_grams")
    )


def zipf_fit(
    docs: DataFrame,
    top_k: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Zipf power-law fit over the corpus unigram distribution — the
    corpus-health diagnostic (natural language sits near slope −1 on
    log freq vs log rank; template/boilerplate corpora flatten, spam
    steepens): least-squares slope/intercept of ``log2(freq)`` vs
    ``log2(rank)`` over the top ``top_k`` word types (the head is where
    the law holds; the tail deviates by construction).

    Float policy (SCALE.md): both logs are the exact fixed-point log2
    of ``operators/dsir.py`` (BIGINT, 2^16 units, libm-free), moments
    are exact BIGINT sums, and slope/intercept are single IEEE
    divisions of exact integer cross-terms — engine-bit-stable, so the
    DuckDB oracle hash-matches the doubles (the `series_trend`
    discipline).

    Plan: one map-side-combined word count; the rank window runs over
    the ``top_k``-row head (TakeOrdered cut, never a global sort of the
    vocabulary); moments are one tiny aggregate.

    Output (one row): ``n_types``, ``n_tokens`` (full vocabulary),
    ``k_fit``, ``zipf_slope``, ``zipf_intercept_bits`` (intercept in
    log2 units at rank 1).
    """
    from temporal_vector_database_spark.operators.dsir import (
        LOG2_SCALE,
        _fixed_log2_sql,
    )

    # ADVICE r06: the cross-moments n·sxy and n·sxx are exact BIGINT
    # only while top_k² · (log2(top_k)·S) · (63·S) < 2^63 (S =
    # LOG2_SCALE; 63 = max log2 of a BIGINT count) — under non-ANSI
    # Spark an overflow would WRAP silently. Default top_k=1000 is well
    # inside the bound; the guard turns the wraparound into an error.
    import math

    S = int(LOG2_SCALE)
    tk = int(top_k)
    x_max = max(1, math.ceil(math.log2(max(tk, 2)))) * S
    if tk * tk * x_max * (63 * S) >= 2**63:
        raise ValueError(
            f"top_k={tk} can overflow zipf_fit's exact integer moments"
            f" (worst-case-safe bound is ~1500 at LOG2_SCALE={S});"
            " reduce top_k — the Zipf head is where the law holds anyway"
        )

    cnt = (
        docs.select(F.explode(_words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot = cnt.agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    top = cnt.orderBy(F.desc("c"), F.asc("word")).limit(int(top_k))
    ranked = top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("word")))
        .cast("long"),
    )
    xy = ranked.select(
        F.expr(_fixed_log2_sql("rank")).alias("x"),
        F.expr(_fixed_log2_sql("c")).alias("y"),
    )
    m = xy.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    out = tot.crossJoin(F.broadcast(m))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("long")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("long")
    slope = F.when(
        den != F.lit(0), num.cast("double") / den.cast("double")
    ).otherwise(F.lit(None).cast("double"))
    return out.select(
        "n_types",
        "n_tokens",
        F.col("n").alias("k_fit"),
        slope.alias("zipf_slope"),
        (
            (
                F.col("sy").cast("double")
                - slope * F.col("sx").cast("double")
            )
            / (F.col("n") * F.lit(int(LOG2_SCALE))).cast("double")
        ).alias("zipf_intercept_bits"),
    )


def vocab_gini(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary CONCENTRATION per source — the Gini coefficient of
    the word-frequency distribution (r07): the inequality diagnostic
    beside Zipf's slope (``zipf_fit``) and entropy. A templated/spammy
    feed concentrates its tokens in few types (Gini → 1); diverse prose
    spreads them (lower Gini). Formula over counts sorted ascending:
    ``G = 2·Σ(i·c_i) / (n·Σc) − (n+1)/n``.

    Exactness: the rank ``i`` is a per-source ``row_number`` over the
    total (count, word) order (tie order provably cancels in Σ i·c_i —
    equal counts contribute c·(i1+i2) under either assignment), the
    moment Σ(i·c_i) is an exact BIGINT sum, and the published Gini is
    a fixed two-division expression — engine-bit-stable. A #sources-row
    driver guard raises before ``n²·c_max`` could leave BIGINT (the
    ``zipf_fit``/``changepoint_scan`` discipline — at web-scale vocab
    sizes, shard the vocabulary or fall back to the sampled head).

    Output per source: ``(source, n_types, n_tokens, gini)``.
    """
    from pyspark.sql import Window

    cnt = (
        docs.select(F.col(source_col).alias("src"), F.explode(_words(text_col)).alias("w"))
        .groupBy("src", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    stats = cnt.groupBy("src").agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.max("c").cast("long").alias("_cmax"),
    )
    for r in stats.select("src", "n_types", "_cmax").collect():  # #sources rows
        if r.n_types * r.n_types * max(r._cmax or 0, 1) >= 2**62:
            raise ValueError(
                f"vocab_gini: source {r.src!r} (n_types={r.n_types}, "
                f"max count={r._cmax}) can overflow the exact BIGINT "
                "moment — shard the vocabulary or rank a sampled head"
            )
    w = Window.partitionBy("src").orderBy(F.asc("c"), F.asc("w"))
    moment = (
        cnt.withColumn("i", F.row_number().over(w).cast("long"))
        .groupBy("src")
        .agg(F.sum(F.col("i") * F.col("c")).cast("long").alias("s_ic"))
    )
    return (
        stats.join(moment, "src")
        .select(
            F.col("src").alias(source_col),
            "n_types",
            "n_tokens",
            (
                (2 * F.col("s_ic")).cast("double")
                / (F.col("n_types") * F.col("n_tokens")).cast("double")
                - (F.col("n_types") + 1).cast("double")
                / F.col("n_types").cast("double")
            ).alias("gini"),
        )
    )
