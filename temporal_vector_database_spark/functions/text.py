"""Text-analysis scalar functions (beyond-reference, BASELINE.json north
star: LLM-data-pipeline operators over the ``documents`` table).

All pure JVM column expressions (no Python UDFs): token counting
(whitespace + a BPE-ish regex), quality scoring (length / stopword ratio),
and rolling-shingle document fingerprinting. Ratios are exact rational
divisions so they hash identically against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny embedded stopword list — deterministic, mirrored in the oracle SQL
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + regex (BPE-ish) tokens."""
    return docs.select(
        "doc_id",
        F.length(text_col).cast("int").alias("n_chars"),
        F.size(F.split(F.col(text_col), " ")).cast("int").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), F.lit(0)))
        .cast("int")
        .alias("n_re_tokens"),
    )


def _quality_exprs(text_col: str) -> dict[str, "F.Column"]:
    """The quality-signal column expressions, shared by ``quality_score``
    and the single-scan ``with_text_stats`` so the pipeline filter is
    bit-identical to the oracle-verified standalone query."""
    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks).cast("int")
    n_stop = F.size(F.expr(f"filter(split({text_col}, ' '), x -> x in ({stoplist}))")).cast("int")
    stop_ratio = n_stop.cast("double") / n_tokens.cast("double")
    mean_tok_len = (
        (F.length(text_col).cast("double") - (n_tokens.cast("double") - F.lit(1.0)))
        / n_tokens.cast("double")
    )
    quality = F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(100.0)) * (
        F.lit(0.3) + F.lit(0.7) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    )
    return {
        "n_tokens": n_tokens,
        "n_stop": n_stop,
        "stop_ratio": stop_ratio,
        "mean_token_len": mean_tok_len,
        "quality_r": F.round(quality, 9),
    }


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length and stopword-ratio signals.

    quality = min(1, n_tokens/100) * (0.3 + 0.7 * min(stop_ratio*5, 1)) —
    exact rational arithmetic, bit-stable across engines.
    """
    e = _quality_exprs(text_col)
    return docs.select(
        "doc_id",
        e["n_tokens"].alias("n_tokens"),
        e["n_stop"].alias("n_stop"),
        e["stop_ratio"].alias("stop_ratio"),
        e["mean_token_len"].alias("mean_token_len"),
        e["quality_r"].alias("quality_r"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text", width: int = 8) -> DataFrame:
    """Document fingerprint: minimum md5 over all ``width``-char rolling
    shingles (winnowing-style content signature)."""
    return docs.select(
        "doc_id",
        F.expr(
            f"array_min(transform(sequence(1, greatest(length({text_col}) - {width - 1}, 1)),"
            f" i -> md5(substring({text_col}, i, {width}))))"
        ).alias("fingerprint"),
    )


# per-language marker-token profiles for the n-gram/token language-ID
# heuristic. Deterministic and mirrored verbatim in the oracle SQL; on
# real corpora you'd learn trigram profiles — the dataflow (explode →
# profile join → argmax) is the same.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "nicht", "ist"),
    "es": ("el", "la", "que", "los", "es"),
    "fr": ("le", "la", "les", "est", "une"),
    "zh": ("de5", "shi4", "bu4", "le5", "zai4"),
}


def _language_exprs(text_col: str) -> tuple[dict[str, "F.Column"], "F.Column"]:
    """(per-language score expressions, argmax prediction expression) —
    shared by ``language_id`` and ``with_text_stats``."""
    toks = F.split(F.col(text_col), " ")
    scores = {
        lang: F.size(
            F.filter(toks, lambda x: x.isin(*words))  # noqa: B023
        ).cast("int")
        for lang, words in LANG_PROFILES.items()
    }
    best = None
    for lang in sorted(LANG_PROFILES):
        s = scores[lang]
        if best is None:
            best = (s, F.lit(lang))
        else:
            best = (
                F.when(s > best[0], s).otherwise(best[0]),
                F.when(s > best[0], F.lit(lang)).otherwise(best[1]),
            )
    pred = F.when(best[0] > 0, best[1]).otherwise(F.lit("und"))
    return scores, pred


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: score = count of token occurrences matching
    each language's marker list; prediction = argmax score (ties → 'und'
    if all zero, else lexicographically-first language). Pure column
    expressions — one pass, no shuffle beyond the source scan."""
    scores, pred = _language_exprs(text_col)
    return docs.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(LANG_PROFILES)],
        pred.alias("predicted_lang"),
    )


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_tokens``, ``quality_r``, ``predicted_lang`` to every input
    column in ONE narrow pass — the enrichment stage of the curation
    pipeline. Same expressions as the standalone oracle-verified queries
    (``quality_score`` / ``language_id``), so downstream threshold filters
    agree bit-for-bit with the DuckDB side."""
    q = _quality_exprs(text_col)
    _, pred = _language_exprs(text_col)
    return docs.select(
        "*",
        q["n_tokens"].alias("n_tokens"),
        q["quality_r"].alias("quality_r"),
        pred.alias("predicted_lang"),
    )
