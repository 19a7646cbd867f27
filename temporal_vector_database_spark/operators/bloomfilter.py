"""Bloom-filter benchmark decontamination (beyond-reference; the
at-scale twin of ``curation.decontaminate``).

The lexical ``decontaminate`` distinct-aggregates the TRAIN side's
n-grams (a doc_id-keyed shuffle of the exploded gram stream) before a
broadcast join. At 100 TB that shuffle is the whole cost: ~10^12
exploded grams move once even though the eval set is MBs. The Bloom
path removes it entirely:

1. BUILD (eval side, small by definition): distinct eval word-n-grams
   → ``num_hashes`` bit positions each (portable md5-derived hashes)
   → a packed ``num_bits``-wide bitset. One tiny aggregation; the
   bitset is ≤ ``num_bits/8`` bytes (default 128 KiB) regardless of
   corpus size.
2. PROBE (train side, huge): ONE ``mapInPandas`` scan with the bitset
   in the task closure. Per doc: tokenize, form distinct n-grams,
   count grams whose ``num_hashes`` bits are all set. Zero shuffles,
   zero joins — the plan is scan → project, so it scales with raw
   read bandwidth and composes with any pushed-down filter.

Contract: a Bloom hit is a *possible* eval overlap (false-positive
rate ~(1-e^{-kn/m})^k; with defaults and a 100k-gram eval set,
~0.24%^4 ≈ 3e-11), a miss is a guaranteed non-overlap — so
``is_contaminated`` is a deterministic SUPERSET of the exact check,
the safe direction for decontamination. Determinism: the bitset is a
pure function of the eval set (md5, no RNG), the probe is a pure
function of (bitset, doc text), and every published number is an
exact integer or a single integer division — the identical bit math
is replayable in ANSI SQL (positions-set semi-join form), which is how
the oracle gates it.

Hash parity across engines (Spark build, Python probe, DuckDB
oracle): ``u32 = int(md5(gram + '#' + seed)[:8 hex], 16)``,
``pos = u32 % num_bits`` — the module-standard portable md5 idiom
(operators/sampling.py:12).

Reference scope note: the reference engine (harshitster/
Temporal-Vector-Database) has no corpus-curation surface; this module
is beyond-reference breadth for LLM training-data pipelines.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_bitset",
    "bloom_decontaminate",
    "bloom_params",
    "bloom_probe",
    "eval_bloom_positions",
    "positions_to_bitset",
]

NUM_BITS = 1 << 20
NUM_HASHES = 4


def bloom_params(n_items: int, target_fpr: float = 0.001) -> tuple[int, int]:
    """(num_bits, num_hashes) sized for ``n_items`` filter entries at
    ``target_fpr``: the textbook m = -n·ln(p)/ln(2)², k = (m/n)·ln(2),
    with m rounded UP to the next power of two (so the modulo stays a
    clean mask of the uniform hash) and k clamped to [1, 8]. Size the
    filter by the EVAL suite's gram count — corpus size is irrelevant
    to the build, which is the whole point of the probe-side design."""
    import math

    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not (0.0 < target_fpr < 1.0):
        raise ValueError("target_fpr must be in (0, 1)")
    m = -n_items * math.log(target_fpr) / (math.log(2) ** 2)
    num_bits = 1 << max(6, math.ceil(math.log2(m)))
    k = max(1, min(8, round(num_bits / n_items * math.log(2))))
    return num_bits, int(k)


def _words(text_col: str):
    # identical to curation._words / DuckDB list_filter(string_split)
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def _word_ngrams(words, n: int):
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def eval_bloom_positions(
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_bits: int = NUM_BITS,
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """Distinct set-bit positions (``pos`` BIGINT in [0, num_bits)) of
    the eval set's word-``n``-gram Bloom filter. Pure JVM column math
    (md5 + hex parse + mod); bounded by ``min(num_bits, k·|grams|)``
    rows. This DataFrame *is* the filter in relational form — the
    packed bitset is just its dense encoding."""
    ng = (
        eval_docs.select(
            F.explode(_word_ngrams(_words(text_col), n)).alias("ng")
        )
        .distinct()
    )
    pos_cols = F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("ng"), F.lit(f"#{j}"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % num_bits
            )
            for j in range(num_hashes)
        ]
    )
    return ng.select(F.explode(pos_cols).alias("pos")).distinct()


def positions_to_bitset(positions, num_bits: int = NUM_BITS) -> np.ndarray:
    """Pack an iterable of bit positions into the uint64 bitset. The
    relational positions table (``eval_bloom_positions`` or the
    streaming positions state) is the source of truth; this is its
    dense per-task encoding."""
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    bits = np.zeros(num_bits // 64, dtype=np.uint64)
    for p in positions:
        p = int(p)
        bits[p >> 6] |= np.uint64(1 << (p & 63))
    return bits


def bloom_bitset(
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_bits: int = NUM_BITS,
    num_hashes: int = NUM_HASHES,
) -> np.ndarray:
    """Materialize the packed bitset (uint64[num_bits/64]) on the
    driver. The collect is bounded by the filter SIZE (≤ num_bits
    positions, 128 KiB packed at the default), never by data volume —
    the same bounded-sketch discipline as centroid/vocab collects."""
    rows = eval_bloom_positions(
        eval_docs, text_col, n, num_bits, num_hashes
    ).collect()
    return positions_to_bitset((r.pos for r in rows), num_bits)


def bloom_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_bits: int = NUM_BITS,
    num_hashes: int = NUM_HASHES,
    min_hits: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-train-doc Bloom contamination report: ``n_ngrams`` (distinct
    word n-grams), ``n_bloom_hits`` (grams whose every hash bit is set
    in the eval filter), their exact ratio, and ``is_contaminated``
    (``n_bloom_hits >= min_hits``). Docs with < n words are clean by
    definition (0 grams, frac 0.0).

    Plan shape: eval build (tiny) + ONE shuffle-free Arrow scan of the
    train side; the bitset rides the task closure. 100 TB posture: cost
    is a single pass at scan bandwidth; no train-side gram ever enters
    an exchange (contrast curation.decontaminate's (doc_id, ng)
    distinct)."""
    bits = bloom_bitset(eval_docs, text_col, n, num_bits, num_hashes)
    return bloom_probe(
        train, bits, text_col, n, num_bits, num_hashes, min_hits, id_col
    )


def bloom_probe(
    train: DataFrame,
    bits: np.ndarray,
    text_col: str = "text",
    n: int = 3,
    num_bits: int = NUM_BITS,
    num_hashes: int = NUM_HASHES,
    min_hits: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """The probe half of :func:`bloom_decontaminate` against an
    already-materialized bitset — the streaming entry point
    (``streaming/bloom.py`` maintains the positions state across eval
    batches and probes document batches with the committed filter)."""
    k = int(num_hashes)
    nb = int(num_bits)
    nn = int(n)
    mh = int(min_hits)

    def _gram_in_bloom(g: str) -> bool:
        for j in range(k):
            u32 = int(
                hashlib.md5(f"{g}#{j}".encode("utf-8")).hexdigest()[:8], 16
            )
            p = u32 % nb
            if not (int(bits[p >> 6]) >> (p & 63)) & 1:
                return False
        return True

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col]
            n_ngrams = np.zeros(len(pdf), dtype=np.int64)
            n_hits = np.zeros(len(pdf), dtype=np.int64)
            # hash each distinct gram once per BATCH, not once per doc —
            # common grams (stopword runs, boilerplate) repeat heavily
            doc_grams: list[set | None] = [None] * len(pdf)
            batch_grams: set = set()
            for i, text in enumerate(pdf[text_col]):
                words = [w for w in (text or "").split(" ") if w != ""]
                if len(words) < nn:
                    continue
                grams = {
                    " ".join(words[j : j + nn])
                    for j in range(len(words) - nn + 1)
                }
                doc_grams[i] = grams
                batch_grams.update(grams)
            in_bloom = {g for g in batch_grams if _gram_in_bloom(g)}
            for i, grams in enumerate(doc_grams):
                if grams is None:
                    continue
                n_ngrams[i] = len(grams)
                n_hits[i] = len(grams & in_bloom)
            frac = np.where(
                n_ngrams > 0, n_hits / np.maximum(n_ngrams, 1), 0.0
            )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_ngrams": n_ngrams,
                    "n_bloom_hits": n_hits,
                    "bloom_frac": frac,
                    "is_contaminated": n_hits >= mh,
                }
            )

    id_type = dict(train.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, n_ngrams bigint, n_bloom_hits bigint,"
        " bloom_frac double, is_contaminated boolean"
    )
    return train.select(id_col, text_col).mapInPandas(probe, schema=schema)
