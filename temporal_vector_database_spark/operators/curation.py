"""Corpus-curation operators for LLM training-data pipelines
(beyond-reference): benchmark decontamination, repetition/quality
signals (Gopher-style), corpus-level segment dedup (C4-style), and PII
scrubbing.

All four are single-scan column-expression or explode/aggregate plans —
no Python UDFs, no driver-side data movement — and every aggregation is
partial-aggregatable (map-side combine), so hot keys (a ubiquitous
n-gram or segment) never concentrate on one reducer the way a
``row_number`` window over the same key would.

Scale posture (100 TB):
- ``decontaminate``: the eval/benchmark side is small by definition
  (benchmarks are MBs, corpora are TBs) — its distinct n-grams are
  broadcast, so the train side never shuffles on n-gram.
- ``repetition_stats``: one explode + one hash aggregate keyed by
  (doc_id, gram); doc_id is in every key, so the shuffle is as uniform
  as the corpus itself.
- ``segment_dedup``: first-occurrence selection is ``min(struct)`` by
  segment (combiner-friendly; a segment appearing 10^9 times reduces
  map-side), NOT a window rank (which would funnel every copy of a hot
  segment through one task).
- ``pii_scrub``: pure regexp column expressions, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "decontaminate",
    "doc_chunks",
    "pii_scrub",
    "repetition_stats",
    "segment_dedup",
]

# Portable across Java regex (Spark) and RE2 (DuckDB): character
# classes, bounded repetition, and grouping only — no lookaround, no
# backreferences (RE2 has neither).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
PHONE_RE = "\\+[0-9]{7,12}"


def _words(text_col: str):
    """Whitespace tokens with empties dropped — identical to DuckDB's
    ``list_filter(string_split(text, ' '), x -> x <> '')``."""
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def _word_ngrams(words, n: int):
    """Space-joined word ``n``-grams (empty array when the doc has fewer
    than ``n`` words — guarded because Spark's ``sequence(1, 0)`` steps
    DOWN, unlike DuckDB's empty ``range``)."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 2,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing word
    ``n``-grams with an eval/benchmark set (the GPT-3/Llama recipe, word
    n-grams instead of the unaffordable exact-substring check).

    Per train doc: ``n_ngrams`` (distinct n-grams), ``n_contaminated``
    (of those, how many appear anywhere in the eval set), their exact
    ratio, and ``is_contaminated`` (``n_contaminated >= min_hits``).

    Plan: train n-grams are distinct-ed per doc (one doc_id-keyed
    aggregate), the eval set's distinct n-grams are **broadcast** —
    benchmarks are small by definition — so the 100 TB train side joins
    map-side and never shuffles on the n-gram key. Division of two
    exact integers is order-independent, hence hash-stable.
    """
    tw = _words(text_col)
    train_ng = train.select(
        "doc_id", F.explode(_word_ngrams(tw, n)).alias("ng")
    ).distinct()
    eval_ng = (
        eval_docs.select(F.explode(_word_ngrams(_words(text_col), n)).alias("ng"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    joined = train_ng.join(F.broadcast(eval_ng), "ng", "left")
    per_doc = joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_ngrams"),
        F.count("hit").cast("bigint").alias("n_contaminated"),
    )
    # docs with < n words produce zero n-grams and vanish from the
    # aggregate — restore them as clean (0 / 0 -> frac 0.0).
    base = train.select("doc_id")
    out = base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_ngrams", F.lit(0)).cast("bigint").alias("n_ngrams"),
        F.coalesce("n_contaminated", F.lit(0)).cast("bigint").alias("n_contaminated"),
    )
    return out.select(
        "doc_id",
        "n_ngrams",
        "n_contaminated",
        F.when(F.col("n_ngrams") > 0, F.col("n_contaminated") / F.col("n_ngrams"))
        .otherwise(F.lit(0.0))
        .alias("contamination_frac"),
        (F.col("n_contaminated") >= min_hits).alias("is_contaminated"),
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    max_top_word_frac: float = 0.2,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """Gopher-style repetition signals: distinct-word fraction, most-
    frequent-word fraction, most-frequent-bigram fraction, and a
    pass/fail against the (configurable) Gopher thresholds.

    One explode + ONE hash aggregate: unigrams and bigrams are tagged
    (``w:`` / ``b:``) into a single gram stream so both frequency
    tables come out of one shuffle keyed by (doc_id, gram) — doc_id in
    the key keeps the shuffle uniform regardless of token skew, and
    counts combine map-side.
    """
    w = _words(text_col)
    grams = F.concat(
        F.transform(w, lambda x: F.concat(F.lit("w:"), x)),
        F.transform(_word_ngrams(w, 2), lambda g: F.concat(F.lit("b:"), g)),
    )
    exploded = docs.select("doc_id", F.explode(grams).alias("g"))
    counts = exploded.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    is_w = F.col("g").startswith("w:")
    agg = counts.groupBy("doc_id").agg(
        F.sum(F.when(is_w, F.col("c"))).cast("bigint").alias("n_words"),
        F.count(F.when(is_w, F.lit(1))).cast("bigint").alias("n_distinct_words"),
        F.max(F.when(is_w, F.col("c"))).cast("bigint").alias("top_word_count"),
        F.coalesce(F.max(F.when(~is_w, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("top_bigram_count"),
        F.coalesce(F.sum(F.when(~is_w, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("n_bigrams"),
    )
    top_word_frac = F.col("top_word_count") / F.col("n_words")
    top_bigram_frac = F.when(
        F.col("n_bigrams") > 0, F.col("top_bigram_count") / F.col("n_bigrams")
    ).otherwise(F.lit(0.0))
    return agg.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        (F.col("n_distinct_words") / F.col("n_words")).alias("distinct_word_frac"),
        "top_word_count",
        top_word_frac.alias("top_word_frac"),
        "top_bigram_count",
        top_bigram_frac.alias("top_bigram_frac"),
        (
            (top_word_frac <= F.lit(max_top_word_frac))
            & (top_bigram_frac <= F.lit(max_top_bigram_frac))
        ).alias("passes_repetition"),
    )


def segment_dedup(docs: DataFrame, text_col: str = "text", width: int = 4) -> DataFrame:
    """Corpus-level segment dedup (C4's "discard duplicate lines across
    the corpus", with fixed ``width``-word segments standing in for
    lines on line-less corpora): every segment is kept only at its
    FIRST occurrence — ordered by (doc_id, position) — and documents
    are reassembled from their surviving segments.

    First-occurrence selection is ``min(struct(doc_id, seg_idx))``
    grouped by segment text: partial-aggregatable, so a segment
    repeated a billion times collapses map-side instead of flooding one
    reducer (a ``row_number() OVER (PARTITION BY segment)`` would not).
    Reassembly is one doc_id-keyed aggregate over surviving segments.
    Two shuffles total — segment key, then doc key — both uniform.

    Output keeps the rebuilt text as an md5 digest + length (the gate
    compares content without hauling full text through the comparator).
    """
    w = _words(text_col)
    n_seg = F.ceil(F.size(w) / F.lit(width)).cast("int")
    segs = docs.select(
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
    ).select("doc_id", F.col("s.seg_idx").alias("seg_idx"), F.col("s.seg").alias("seg"))
    first = segs.groupBy("seg").agg(
        F.min(F.struct("doc_id", "seg_idx")).alias("first_at")
    )
    kept = segs.join(first, "seg").where(
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
    totals = docs.select("doc_id", n_seg.cast("bigint").alias("n_segments"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_segments",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.length(F.coalesce("clean_text", F.lit(""))).cast("bigint").alias("clean_len"),
        F.md5(F.coalesce("clean_text", F.lit(""))).alias("clean_hash"),
    )


def doc_chunks(
    docs: DataFrame, text_col: str = "text", width: int = 64, stride: int = 32
) -> DataFrame:
    """Sliding-window document chunking (RAG / training-window prep):
    word windows of ``width`` starting every ``stride`` words; every
    start position below the word count emits a chunk, so trailing
    chunks may be short (the simple deterministic convention — no
    look-back snapping, identical in any engine).

    One explode, no shuffle at all: chunk identity is (doc_id,
    chunk_idx) and content ships as md5 + word count, so the output is
    narrow even when chunks overlap 2× (the text bytes are never
    duplicated into the exchange).
    """
    w = _words(text_col)
    starts = F.when(
        F.size(w) > 0,
        F.transform(
            F.sequence(F.lit(0), F.ceil(F.size(w) / F.lit(stride)).cast("int") - 1),
            lambda i: i * stride,
        ),
    ).otherwise(F.array().cast("array<int>"))
    chunked = docs.select(
        "doc_id",
        F.size(w).cast("int").alias("n_doc_words"),
        F.explode(starts).alias("start_word"),
        w.alias("_w"),
    ).where(F.col("start_word") < F.col("n_doc_words"))
    chunk = F.slice(F.col("_w"), F.col("start_word") + 1, width)
    return chunked.select(
        "doc_id",
        (F.col("start_word") / stride).cast("int").alias("chunk_idx"),
        "start_word",
        F.size(chunk).cast("int").alias("n_words"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction: count and replace email / IPv4 / phone-number
    matches with typed placeholder tags. Pure regexp column expressions
    (patterns restricted to the Java-regex ∩ RE2 subset — no
    lookaround, no backreferences), zero shuffle; the scrubbed text is
    published as md5 + length so gates compare content cheaply.

    Redaction order is email → ipv4 → phone; the phone pattern
    (``+`` digits) cannot match inside either placeholder tag, so the
    chain is order-stable.

    Contract note: the per-pattern counts are each computed on the
    ORIGINAL text, while redaction is chained — when matches overlap
    (an IPv4-shaped domain inside an email, say), a later pattern's
    count can exceed its surviving placeholders. Counts answer "how many
    of each PII shape appeared", not "how many tags were emitted";
    deterministic and mirrored exactly by the oracle.
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).cast("int")
    n_ips = F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0))).cast("int")
    n_phones = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0))).cast("int")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
        F.md5(redacted).alias("redacted_hash"),
    )
