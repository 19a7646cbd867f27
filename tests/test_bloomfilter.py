"""Bloom-filter decontamination: superset-of-exact contract, bitset
bounds, and probe determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.bloomfilter import (
    bloom_bitset,
    bloom_decontaminate,
    eval_bloom_positions,
)
from temporal_vector_database_spark.operators.curation import decontaminate


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
        (2, "the quick brown fox sat on a mat today"),  # shares 3-grams w/ 0
        (3, "completely disjoint vocabulary here nothing shared at all"),
        (4, "xy"),  # < 3 words -> clean by definition
        (5, ""),  # empty -> clean
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_is_superset_of_exact(spark):
    """A Bloom miss guarantees non-overlap, so every exactly
    contaminated doc must be Bloom-contaminated (the safe direction);
    per-doc, n_bloom_hits >= n_contaminated."""
    docs = _docs(spark)
    train = docs.where(F.col("doc_id") != 0)
    ev = docs.where(F.col("doc_id") == 0)
    exact = {
        r.doc_id: r
        for r in decontaminate(train, ev, n=3, min_hits=1).collect()
    }
    bloom = {
        r.doc_id: r
        for r in bloom_decontaminate(train, ev, n=3, min_hits=1).collect()
    }
    assert set(exact) == set(bloom)
    for d, e in exact.items():
        b = bloom[d]
        assert b.n_ngrams == e.n_ngrams
        assert b.n_bloom_hits >= e.n_contaminated
        if e.is_contaminated:
            assert b.is_contaminated


def test_bloom_flags_known_overlap_and_clears_disjoint(spark):
    docs = _docs(spark)
    out = {
        r.doc_id: r
        for r in bloom_decontaminate(
            docs.where(F.col("doc_id") != 0),
            docs.where(F.col("doc_id") == 0),
            n=3,
            min_hits=2,
        ).collect()
    }
    # doc 2 shares "the quick brown" + "quick brown fox" with doc 0
    assert out[2].n_bloom_hits >= 2 and out[2].is_contaminated
    # at 2^20 bits / ~28 set, a false positive needs 4 independent
    # 1-in-37k events per gram — doc 3's 6 grams are deterministically
    # clean for this fixed eval set (no RNG anywhere; this is a pinned
    # computation, not a flaky probability)
    assert out[3].n_bloom_hits == 0 and not out[3].is_contaminated
    assert out[4].n_ngrams == 0 and out[4].bloom_frac == 0.0
    assert out[5].n_ngrams == 0 and not out[5].is_contaminated


def test_bitset_matches_positions(spark):
    docs = _docs(spark).where(F.col("doc_id") == 0)
    pos = sorted(
        r.pos for r in eval_bloom_positions(docs, num_bits=1 << 12).collect()
    )
    bits = bloom_bitset(docs, num_bits=1 << 12)
    assert bits.dtype == np.uint64 and len(bits) == (1 << 12) // 64
    set_bits = [
        w * 64 + b
        for w in range(len(bits))
        for b in range(64)
        if (int(bits[w]) >> b) & 1
    ]
    assert set_bits == pos
    # 7 grams x 4 seeds, minus any collisions
    assert 0 < len(pos) <= 28


def test_num_bits_must_be_word_aligned(spark):
    with pytest.raises(ValueError):
        bloom_bitset(_docs(spark), num_bits=100)


def test_bloom_params_sizing():
    import math

    import pytest

    from temporal_vector_database_spark.operators.bloomfilter import (
        bloom_params,
    )

    m, k = bloom_params(70_000, 0.001)
    assert m == 1 << 20 and 1 <= k <= 8  # the module defaults' regime
    # empirical FPR at the returned params stays near target:
    # (1 - e^{-kn/m})^k
    fpr = (1 - math.exp(-k * 70_000 / m)) ** k
    assert fpr < 0.002
    # power-of-two and monotonicity
    m2, _ = bloom_params(1_000_000, 0.001)
    assert m2 > m and (m2 & (m2 - 1)) == 0
    with pytest.raises(ValueError):
        bloom_params(0)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)
