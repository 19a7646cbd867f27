"""Unit tests for operators/textindex.py and the r03 additions to
dedup/sampling: winnowing's detection guarantee, duplicated-n-gram
counting, BM25/TF-IDF ranking sanity, the edit-distance short-doc
fallback (checked against in-test brute force), and the threshold-based
length-balanced sample."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.dedup import edit_distance_pairs
from temporal_vector_database_spark.operators.sampling import (
    length_balanced_quartiles_exact,
    length_balanced_sample,
)
from temporal_vector_database_spark.operators.textindex import (
    bm25_scores,
    duplicated_ngrams,
    tfidf_top_terms,
    winnow_fingerprints,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_winnow_shared_substring_guarantee(spark):
    """Any substring of length >= k + w - 1 shared between two docs must
    produce at least one shared fingerprint (the winnowing theorem)."""
    k, w = 5, 4
    shared = "XYZQWERTYUIOPAB"  # length 15 >= k + w - 1 = 8
    docs = _docs(
        spark,
        [
            "aaaa bbbb cccc " + shared + " dddd eeee",
            "ffff gggg " + shared + " hhhh iiii jjjj",
            "kkkk llll mmmm nnnn oooo pppp qqqq rrrr",
        ],
    )
    fps = winnow_fingerprints(docs, k=k, w=w).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[0] & by_doc[1], "shared substring produced no shared fingerprint"
    # density: far fewer fingerprints than grams
    n_grams0 = len(docs.collect()[0].text) - k + 1
    assert len(by_doc[0]) < n_grams0


def test_winnow_short_doc_single_window(spark):
    docs = _docs(spark, ["abcdefg"])  # 3 grams at k=5 < w → one window
    fps = winnow_fingerprints(docs, k=5, w=4).collect()
    assert len(fps) == 1


def test_duplicated_ngrams_counts(spark):
    span = "one two three four five six seven eight"
    docs = _docs(
        spark,
        [
            "alpha beta " + span + " gamma delta",
            "epsilon " + span + " zeta eta theta iota",
            # within-doc repeat only → n_docs = 1, must be excluded
            "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8",
        ],
    )
    out = duplicated_ngrams(docs, n=8, min_docs=2).collect()
    hashes = {r.gram_hash: r for r in out}
    import hashlib

    h = hashlib.md5(span.encode()).hexdigest()
    assert h in hashes
    assert hashes[h].n_docs == 2 and hashes[h].n_occ == 2
    # the within-doc repeat is n_docs=1 and filtered
    h_x = hashlib.md5("x1 x2 x3 x4 x5 x6 x7 x8".encode()).hexdigest()
    assert h_x not in hashes


def test_bm25_ranks_denser_match_higher(spark):
    docs = _docs(
        spark,
        [
            "vector vector vector pad",
            "vector pad pad pad",
            "pad pad pad pad",
        ],
    )
    out = bm25_scores(docs, ["vector"], top_n=3).collect()
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rn)] == [0, 1]
    assert all(r.bm25 > 0 for r in out)


def test_tfidf_universal_term_scores_zero(spark):
    docs = _docs(spark, ["common rare1 x", "common rare2 y", "common rare3 z"])
    out = tfidf_top_terms(docs, top_n=3).collect()
    scores = {(r.doc_id, r.term): r.tfidf for r in out}
    assert scores[(0, "common")] == 0.0  # ln(N/N) = 0
    top = {r.doc_id: r.term for r in out if r.rn == 1}
    assert top[0] in {"rare1", "x"}  # any df=1 term outranks 'common'


def _brute_pairs(rows, k):
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, ta), (ib, tb) = rows[i], rows[j]
            if abs(len(ta) - len(tb)) <= k:
                d = lev(ta, tb)
                if d <= k:
                    out.add((min(ia, ib), max(ia, ib), d))
    return out


def test_edit_distance_short_doc_fallback_matches_brute_force(spark):
    """Docs below the q-gram soundness bound (<= q·k distinct grams) were
    silently missing from the r02 operator; the fallback must restore
    the full contract. Ground truth computed in-test."""
    texts = [
        "ab",  # 0 grams at q=4
        "ac",  # ed('ab','ac') = 1 — the r02 miss
        "abc",
        "abcd",  # 1 gram
        "abce",
        "abcdefgh",  # 5 grams <= q*k → still fallback at k=2
        "abcdefgi",
        "qrstuvwxyzqrstuvwxyz",  # long: prefix path
        "qrstuvwxyzqrstuvwxyx",
    ]
    docs = _docs(spark, texts)
    got = {
        (r.a_id, r.b_id, r.dist)
        for r in edit_distance_pairs(docs, max_dist=2, q=4).collect()
    }
    want = _brute_pairs([(i, t) for i, t in enumerate(texts)], 2)
    assert got == want
    assert (0, 1, 1) in got  # the documented r02 false negative


def test_length_balanced_sample_threshold_semantics(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 100 + 1) for i in range(200)], "doc_id long, n_tokens int"
    )
    out = length_balanced_sample(df).collect()
    # equal token counts always share a bucket (value-determined)
    seen = {}
    for r in out:
        assert seen.setdefault(r.n_tokens, r.quartile) == r.quartile
    # buckets ordered by token count
    by_q = {}
    for r in out:
        by_q.setdefault(r.quartile, []).append(r.n_tokens)
    qs = sorted(by_q)
    assert qs and qs[0] >= 1 and qs[-1] <= 4
    for lo, hi in zip(qs, qs[1:]):
        assert max(by_q[lo]) <= min(by_q[hi])
    # down-sampling actually thins upper quartiles on aggregate
    assert len(out) < 200


def test_length_balanced_exact_twin_balances_sizes(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "doc_id long, n_tokens int"
    )
    q = length_balanced_quartiles_exact(df).groupBy("quartile").count().collect()
    assert {r["count"] for r in q} == {25}


def test_remove_duplicated_spans(spark):
    from temporal_vector_database_spark.operators.textindex import (
        remove_duplicated_spans,
    )

    span = "one two three four five six seven eight"
    docs = _docs(
        spark,
        [
            "alpha beta " + span + " gamma delta",
            "epsilon " + span + " zeta",
            "unrelated words entirely different from the rest here now",
        ],
    )
    out = {r.doc_id: r for r in remove_duplicated_spans(docs, n=8).collect()}
    assert out[0].clean_text == "alpha beta gamma delta"
    assert out[0].n_removed == 8 and out[0].n_words == 12
    assert out[1].clean_text == "epsilon zeta"
    # doc without any cross-doc duplicated 8-gram is untouched
    assert out[2].n_removed == 0
    assert out[2].clean_text == "unrelated words entirely different from the rest here now"


def test_rrf_fuse_semantics(spark):
    from temporal_vector_database_spark.operators.textindex import rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(11, 1), (13, 2)], "doc_id long, rank int")
    out = {r.doc_id: r for r in rrf_fuse(a, b, k=60, top_n=10).collect()}
    # doc 11 appears in both lists → highest fused score
    assert out[11].rn == 1
    assert out[11].rrf == 1 / 62 + 1 / 61
    # single-list docs score only their own term; absent ranks are null
    assert out[10].rrf == 1 / 61 and out[10].rank_b is None
    assert out[13].rrf == 1 / 62 and out[13].rank_a is None
    assert set(out) == {10, 11, 12, 13}


def test_unigram_logprob_scores(spark):
    from math import log

    from temporal_vector_database_spark.operators.textindex import (
        unigram_logprob_scores,
    )

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c"), (2, "a")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_logprob_scores(docs).collect()}
    # corpus counts: a=3, b=2, c=1, total=6
    p = {"a": 3 / 6, "b": 2 / 6, "c": 1 / 6}
    exp0 = -(2 * log(p["a"]) + log(p["b"])) / 3
    exp1 = -(log(p["b"]) + log(p["c"])) / 2
    exp2 = -log(p["a"])
    assert out[0].n_tokens == 3 and abs(out[0].unigram_nll - exp0) < 1e-6
    assert out[1].n_tokens == 2 and abs(out[1].unigram_nll - exp1) < 1e-6
    assert out[2].n_tokens == 1 and abs(out[2].unigram_nll - exp2) < 1e-6
    # the common-word doc scores LOWER (closer to corpus) than the rare-word doc
    assert out[2].unigram_nll < out[1].unigram_nll


def test_bigram_logprob_scores(spark):
    from math import log

    from temporal_vector_database_spark.operators.textindex import (
        bigram_logprob_scores,
    )

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "x")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_logprob_scores(docs, lam=0.75).collect()}
    # bigrams: doc0 = (a,b),(b,a),(a,b); doc1 = (a,b); doc2 = none
    # big counts: (a,b)=3, (b,a)=1; ctx: a=3, b=1... wait: bigrams starting
    # with a: (a,b)x3 -> ctx a=3; starting with b: (b,a)x1 -> ctx b=1
    # unigrams: a=3, b=3, x=1, N=7
    p_ab = 0.75 * (3 / 3) + 0.25 * (3 / 7)
    p_ba = 0.75 * (1 / 1) + 0.25 * (3 / 7)
    exp0 = round(-(2 * log(p_ab) + log(p_ba)) / 3, 6)
    exp1 = round(-log(p_ab), 6)
    assert out[0].n_bigrams == 3 and abs(out[0].bigram_nll - exp0) < 2e-6
    assert out[1].n_bigrams == 1 and abs(out[1].bigram_nll - exp1) < 2e-6
    # single-token doc has no bigrams and is omitted
    assert 2 not in out

    # shuffle-join model path is bit-identical to the broadcast path
    alt = {
        r.doc_id: r.bigram_nll
        for r in bigram_logprob_scores(docs, lam=0.75, broadcast_model=False).collect()
    }
    assert alt == {k: v.bigram_nll for k, v in out.items()}


def test_bigram_logprob_scores_empty_and_whitespace_docs(spark):
    """Zero-word documents must be OMITTED, not crash: an unguarded
    slice(w, 1, size-1) raises 'slice length -1' on empty token arrays
    (r03 advice)."""
    from temporal_vector_database_spark.operators.textindex import (
        bigram_logprob_scores,
    )

    docs = spark.createDataFrame(
        [(0, "a b a"), (1, ""), (2, "   "), (3, "x")],
        "doc_id long, text string",
    )
    out = {r.doc_id for r in bigram_logprob_scores(docs).collect()}
    assert out == {0}


def test_corpus_top_ngrams_counts_and_ties(spark):
    from temporal_vector_database_spark.operators.textindex import (
        corpus_top_ngrams,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b c"),        # "a b" x2, "b a" x1, "b c" x1
            (2, "a b z z"),          # "a b" x1, "z z" x1
            (3, "q r"),              # singleton grams only
        ],
        "doc_id long, text string",
    )
    rows = corpus_top_ngrams(docs, n=2, k=10, min_count=2).collect()
    got = {r.ng: (r.n_occurrences, r.doc_freq) for r in rows}
    assert got == {"a b": (3, 2)}  # the only gram with >= 2 occurrences
    # k-cut determinism: min_count=1 surfaces all, ordered by count then text
    all_rows = corpus_top_ngrams(docs, n=2, k=3, min_count=1).collect()
    assert [r.ng for r in all_rows] == ["a b", "b a", "b c"]


def test_collocations_pmi_ranks_true_collocation_first(spark):
    """A pair that ALWAYS co-occurs outranks frequent-but-independent
    pairs; the fixed-point PMI matches the python mirror."""
    from pyspark.sql import functions as F  # noqa: F401

    from temporal_vector_database_spark.operators.textindex import (
        collocations_pmi,
    )

    # "new york" always adjacent (5x); "the cat"/"the dog" frequent but
    # 'the' is everywhere -> low PMI
    docs = spark.createDataFrame(
        [(i, "the cat saw the dog near new york today") for i in range(5)],
        "doc_id long, text string",
    )
    got = collocations_pmi(docs, k=50, min_count=2).collect()
    rows = {(r.a, r.b): r for r in got}
    assert ("new", "york") in rows
    top = got[0]
    # every bigram here occurs 5x; PMI separates by unigram rarity
    assert rows[("new", "york")].pmi_units > rows[("the", "cat")].pmi_units

    def score(x):
        L = x.bit_length() - 1
        return L * 65536 + ((x - (1 << L)) * 65536) // (1 << L)

    r = rows[("new", "york")]
    want = (score(r.c_ab) + score(45)) - (score(r.c_a) + score(r.c_b))
    assert r.pmi_units == want and r.c_ab == 5 and r.c_a == 5


def test_heavy_hitters_sketch_superset_contract_under_repartition(spark):
    """The published set equals the exact over-threshold set under ANY
    partitioning — the MG candidate union provably contains every true
    heavy hitter, and the exact-count filter trims the rest."""
    from collections import Counter

    from pyspark.sql import functions as F  # noqa: F401

    from temporal_vector_database_spark.operators.textindex import (
        heavy_hitters_sketch,
    )

    # one dominant bigram ("hot pair") + a long tail
    rows = [(i, "hot pair filler" + str(i) + " tail" + str(i % 17)) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def brute(kt):
        grams = Counter()
        for _, t in rows:
            ws = t.split(" ")
            for a, b in zip(ws, ws[1:]):
                grams[a + " " + b] += 1
        n = sum(grams.values())
        return {g: (c, n) for g, c in grams.items() if c * (kt + 1) > n}

    for parts in (1, 7, 32):
        got = {r.gram: (r.n_occurrences, r.n_grams)
               for r in heavy_hitters_sketch(
                   docs.repartition(parts), k_track=8, n=2).collect()}
        assert got == brute(8)
        assert "hot pair" in got


def test_streaming_heavy_hitters_superset_and_replay_noop(spark, tmp_path):
    """Folding per-batch MG summaries preserves the global guarantee:
    after 3 batches every gram with total count > N/(k+1) is in the
    committed summary; replaying a committed batch changes nothing."""
    from collections import Counter

    from pyspark.sql import functions as F  # noqa: F401

    from temporal_vector_database_spark.streaming.heavyhitters import (
        hh_candidates,
        process_hh_batch,
        read_hh_state,
    )

    rows = [(i, "hot pair x" + str(i) + " tail" + str(i % 13)) for i in range(240)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    state = str(tmp_path / "hh_state")
    kt = 8
    for bid in range(3):
        b = docs.where(F.col("doc_id") % 3 == bid)
        process_hh_batch(b, bid, state, k_track=kt, n=2)

    grams = Counter()
    for _, t in rows:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            grams[a + " " + b] += 1
    n = sum(grams.values())
    true_hh = {g for g, c in grams.items() if c * (kt + 1) > n}
    cands = {r.gram for r in hh_candidates(spark, state, kt).collect()}
    assert true_hh and true_hh <= cands            # superset guarantee
    _, total = read_hh_state(spark, state)
    assert total == n                              # exact stream total
    # deficit bound: committed counts within N/(k+1) of truth
    for r in hh_candidates(spark, state, kt).collect():
        assert grams[r.gram] >= r.mg_count >= grams[r.gram] - n // (kt + 1) - 1
    # redeliver the HEAD batch -> no-op
    before = sorted((r.gram, r.mg_count)
                    for r in hh_candidates(spark, state, kt).collect())
    process_hh_batch(docs.where(F.col("doc_id") % 3 == 2), 2, state,
                     k_track=kt, n=2)
    after = sorted((r.gram, r.mg_count)
                   for r in hh_candidates(spark, state, kt).collect())
    assert after == before


def test_cms_estimate_overcount_guarantee(spark):
    """CMS one-sided error: for every published gram the estimate is
    >= the exact count, and with width << vocabulary the estimate
    strictly overcounts at least once (collisions are real); k_track
    low enough that every gram is 'hot' so the guarantee is checked for
    the full vocabulary."""
    from temporal_vector_database_spark.operators.textindex import (
        cms_estimate_check,
    )

    rows = [(i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(30))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # k_track=0 -> threshold N/1: nothing passes; use k_track large so
    # every bigram (13*13 max kinds over 29*40=1160 grams) is hot
    out = cms_estimate_check(docs, k_track=10**6, n=2, depth=4, width=16)
    got = out.collect()
    # the stride corpus has exactly 13 distinct bigrams (w_k -> w_{k+1 mod 13})
    assert len(got) == 13
    assert all(r.cms_est >= r.n_occurrences for r in got)
    assert any(r.cms_est > r.n_occurrences for r in got)
    assert all(r.n_grams == 29 * 40 for r in got)


def test_streaming_cms_state_equals_batch_and_serves_estimates(spark, tmp_path):
    """CMS counters are additive: 3 micro-batches commit a counter
    table bit-identical to the one-shot build over all docs; point
    estimates served from state match the batch operator's estimates;
    head redelivery is a no-op; unseen grams estimate 0 (never
    undercounts)."""
    from temporal_vector_database_spark.operators.textindex import (
        cms_counters,
        cms_estimate_check,
    )
    from temporal_vector_database_spark.streaming.cms import (
        cms_point_estimates,
        process_cms_batch,
        read_cms_state,
    )

    rows = [(i, " ".join(f"w{(i + j) % 9}" for j in range(20)) + " hot gram" * 3)
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    state = str(tmp_path / "cms")
    kw = dict(n=2, depth=4, width=64)
    batches = [docs.where(F.col("doc_id") % 3 == r) for r in range(3)]
    for bid, b in enumerate(batches):
        process_cms_batch(b, bid, state, **kw)

    def canon(d):
        return sorted(tuple(r) for r in d.collect())

    counters, total = read_cms_state(spark, state)
    assert canon(counters) == canon(cms_counters(docs, **kw))
    assert total.collect()[0].n_grams == sum(
        len(t.split()) - 1 for _, t in rows
    )

    # serving matches the batch gate's estimates for the hot set
    batch_est = {r.gram: r.cms_est
                 for r in cms_estimate_check(docs, k_track=20, **kw).collect()}
    assert batch_est  # non-vacuous
    qg = spark.createDataFrame([(g,) for g in batch_est], "gram string")
    served = {r.gram: r.cms_est
              for r in cms_point_estimates(counters, qg, depth=4, width=64).collect()}
    assert served == batch_est

    # head redelivery -> no-op
    process_cms_batch(batches[2], 2, state, **kw)
    c2, _ = read_cms_state(spark, state)
    assert canon(c2) == canon(counters)

    # unseen gram: estimate can only overcount, and a gram whose buckets
    # are all untouched estimates 0
    unseen = spark.createDataFrame([("zzz qqq",)], "gram string")
    est = cms_point_estimates(counters, unseen, depth=4, width=64).collect()[0]
    assert est.cms_est >= 0

    # --- r07 meta persistence (ADVICE r06): the sketch parameters ride
    # every commit; mismatched reads/folds raise instead of silently
    # returning wrong estimates; state_dir= auto-loads the right params
    from temporal_vector_database_spark.streaming.cms import read_cms_meta

    assert read_cms_meta(state) == {"n": 2, "depth": 4, "width": 64}
    with pytest.raises(ValueError, match="width"):
        read_cms_state(spark, state, width=256)
    with pytest.raises(ValueError, match="mismatched|parameters"):
        process_cms_batch(docs, 3, state, n=2, depth=4, width=256)
    auto = {r.gram: r.cms_est
            for r in cms_point_estimates(counters, qg, state_dir=state).collect()}
    assert auto == batch_est


def test_zipf_fit_slopes_separate_zipfian_from_uniform(spark):
    """A corpus drawn with word frequency ∝ 1/rank fits slope ≈ −1; a
    uniform corpus fits near 0 — the diagnostic separates them. Exact
    moment invariants: k_fit == min(top_k, n_types), counts exact."""
    from temporal_vector_database_spark.operators.textindex import zipf_fit

    # zipfian: word i appears floor(1200/i) times
    words = []
    for i in range(1, 60):
        words += [f"z{i}"] * (1200 // i)
    zdocs = spark.createDataFrame(
        [(k, " ".join(words[k::10])) for k in range(10)], "doc_id long, text string"
    )
    zf = zipf_fit(zdocs, top_k=50).collect()[0]
    assert zf.k_fit == 50 and zf.n_types == 59
    assert -1.2 < zf.zipf_slope < -0.8

    # uniform: every word the same count
    udocs = spark.createDataFrame(
        [(k, " ".join(f"u{i}" for i in range(40))) for k in range(10)],
        "doc_id long, text string",
    )
    uf = zipf_fit(udocs, top_k=50).collect()[0]
    assert uf.k_fit == 40 and uf.n_tokens == 400
    assert abs(uf.zipf_slope) < 0.05


def test_vocab_gini_separates_concentrated_from_uniform(spark):
    """A source whose tokens are one word repeated (max concentration)
    scores near 1 - 1/n_tokens... in Gini terms HIGHER than a perfectly
    uniform vocabulary (Gini 0); hand-checked small case; overflow
    guard raises."""
    import pytest as _pytest

    from temporal_vector_database_spark.operators.textindex import vocab_gini

    rows = [
        (1, "spam spam spam spam spam spam spam rare", "concentrated"),
        (2, "a b c d e f g h", "uniform"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in vocab_gini(docs).collect()}
    u = got["uniform"]
    # all counts equal -> Gini exactly 0
    assert u.n_types == 8 and u.gini == 0.0
    c = got["concentrated"]
    # counts [1, 7]: G = 2*(1*1 + 2*7)/(2*8) - 3/2 = 30/16 - 1.5 = 0.375
    assert c.n_types == 2 and c.gini == 0.375
    assert c.gini > u.gini


def test_frequent_token_pairs_apriori_and_lift(spark):
    """r08: pair support counts DOCUMENTS (duplicate mentions in one doc
    count once); the apriori prune removes pairs with an individually
    infrequent member before any pair is generated; lift is the exact
    integer ratio; the per-doc bound raises, never truncates."""
    import pytest as _pytest

    from temporal_vector_database_spark.operators.textindex import (
        frequent_token_pairs,
    )

    rows = [
        (1, "apple banana apple"),        # apple+banana (dup mention once)
        (2, "apple banana cherry"),
        (3, "apple banana"),
        (4, "apple cherry"),
        (5, "durian unique"),             # infrequent tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # N=5, minsup = ceil(0.4*5) = 2
    got = {
        (r.tok_a, r.tok_b): r
        for r in frequent_token_pairs(
            docs, min_support_num=40, min_support_den=100
        ).collect()
    }
    # df: apple 4, banana 3, cherry 2 (durian/unique df 1 -> pruned)
    assert set(got) == {("apple", "banana"), ("apple", "cherry")}
    ab = got[("apple", "banana")]
    assert ab.n_docs == 3 and ab.lift == float(3 * 5) / float(4 * 3)
    ac = got[("apple", "cherry")]
    assert ac.n_docs == 2 and ac.lift == float(2 * 5) / float(4 * 2)

    with _pytest.raises(ValueError, match="frequent tokens"):
        frequent_token_pairs(
            docs, min_support_num=1, min_support_den=100, max_doc_items=2
        )


def test_winnow_shared_pairs_span_matching_and_noise_rule(spark):
    """r08: two docs sharing a >= k+w-1 substring share fingerprints
    (the winnowing guarantee) and surface as a pair with exact shared
    counts; the max_fp_df noise rule drops corpus-boilerplate prints;
    df-1 prints can't pair."""
    from temporal_vector_database_spark.operators.textindex import (
        winnow_shared_pairs,
    )

    span = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, "alpha " + span + " omega"),
        (2, "start " + span + " finish"),
        (3, "completely unrelated text with no overlap at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.a_id, r.b_id): r.n_shared
        for r in winnow_shared_pairs(docs, k=5, w=4, min_shared=1).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 1
    assert all(3 not in pair for pair in got)

    # noise rule: a print in EVERY doc is boilerplate — with
    # max_fp_df=2 the 3-doc shared span is dropped and no pair remains
    rows_all = [(i, "prefix%d " % i + span) for i in range(1, 4)]
    docs_all = spark.createDataFrame(rows_all, "doc_id long, text string")
    noisy = winnow_shared_pairs(
        docs_all, k=5, w=4, min_shared=1, max_fp_df=2
    ).collect()
    # every span print has df=3 > 2 -> dropped; prefix prints are df-1
    assert noisy == []


def test_bleu_score_pairs_hand_case(spark):
    """r09: clipped precisions, brevity penalty, log-domain BLEU —
    verified against hand-computed values."""
    import math

    from temporal_vector_database_spark.operators.textindex import (
        bleu_score_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),          # reference (6 tokens)
            (2, "the cat the cat on the mat"),      # candidate (7 tokens)
            (3, "xyz"),                             # no overlap, shorter
            (4, ""),                                # empty candidate
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "a_id long, b_id long"
    )
    got = {(r.a_id, r.b_id): r for r in bleu_score_pairs(docs, pairs).collect()}

    # (1,2): cand counts the=3,cat=2,on=1,mat=1; ref the=2,cat=1,on=1,
    # sat=1,mat=1 -> clipped 2+1+1+1=5 of 7 -> p1=5/7.
    # cand bigrams: the_cat x2, cat_the, cat_on, on_the, the_mat;
    # ref bigrams: the_cat, cat_sat, sat_on, on_the, the_mat ->
    # clipped: the_cat 1, on_the 1, the_mat 1 = 3 of 6 -> p2=1/2.
    # c=7 > r=6 -> log_bp = 0.
    r12 = got[(1, 2)]
    assert r12.p1 == round(5 / 7, 6) and r12.p2 == 0.5 and r12.log_bp == 0.0
    assert r12.log_bleu == round((math.log(5 / 7) + math.log(0.5)) / 2, 6)
    # (1,3): no overlap -> p1 = 0, p2 None (no bigrams), log_bleu NULL;
    # c=1 < r=6 -> log_bp = 1 - 6/1 = -5
    r13 = got[(1, 3)]
    assert r13.p1 == 0.0 and r13.p2 is None and r13.log_bp == -5.0
    assert r13.log_bleu is None
    # (1,4): empty candidate -> everything NULL
    r14 = got[(1, 4)]
    assert r14.p1 is None and r14.p2 is None
    assert r14.log_bp is None and r14.log_bleu is None


def test_tokenizer_fertility_hand_case(spark):
    """r09: fertility = tokens/words per group under a learned merge
    table; chars count word chars only."""
    from temporal_vector_database_spark.operators.tokenize import (
        tokenizer_fertility,
    )

    docs = spark.createDataFrame(
        [(1, "ab ab cd", "s1"), (2, "ab", "s1"), (3, "ee ff", "s2")],
        "doc_id long, text string, source string",
    )
    # merges: (a,b)->ab only; 'ab' -> 1 token, 'cd' -> 2, 'ee','ff' -> 2
    out = {
        r.group: r
        for r in tokenizer_fertility(docs, [(1, "a", "b")]).collect()
    }
    s1 = out["s1"]  # words: ab,ab,cd,ab = 4; tokens: 1+1+2+1 = 5; chars 8
    assert (s1.n_docs, s1.n_words, s1.n_tokens, s1.n_chars) == (2, 4, 5, 8)
    assert s1.fertility == 1.25 and s1.chars_per_token == 1.6
    s2 = out["s2"]  # words 2, tokens 4, chars 4
    assert (s2.n_words, s2.n_tokens) == (2, 4)
    assert s2.fertility == 2.0 and s2.chars_per_token == 1.0


def test_rouge_score_pairs_python_parity(spark):
    """r09: ROUGE-1/2 P/R/F1 match an independent pure-Python
    computation on a deterministic mixed fixture (overlaps, repeats,
    empty docs, disjoint vocab)."""
    from collections import Counter

    from temporal_vector_database_spark.operators.textindex import (
        rouge_score_pairs,
    )

    texts = {
        1: "a b c a b",
        2: "a b a",
        3: "",
        4: "x y z",
        5: "a a a a",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    plist = [(1, 2), (1, 3), (3, 1), (1, 4), (1, 5), (5, 1)]
    pairs = spark.createDataFrame(plist, "a_id long, b_id long")

    def grams(t, n):
        ws = [w for w in t.split() if w]
        return Counter(tuple(ws[i:i + n]) for i in range(len(ws) - n + 1))

    def ref(a, b, n):
        ga, gb = grams(texts[a], n), grams(texts[b], n)
        num = sum(min(c, gb.get(g, 0)) for g, c in ga.items())
        dena, denb = sum(ga.values()), sum(gb.values())
        if dena == 0:
            # empty REFERENCE: metric undefined for this order — the
            # operator (and oracle, consistently) publish NULL
            return None, None, None
        r = round(num / dena, 6) if dena else None
        p = round(num / denb, 6) if denb else None
        f = (
            round(2 * (num / denb) * (num / dena)
                  / ((num / denb) + (num / dena)), 6)
            if dena and denb and num else None
        )
        return r, p, f

    got = {(r.a_id, r.b_id): r for r in rouge_score_pairs(docs, pairs).collect()}
    assert set(got) == set(plist)
    for a, b in plist:
        r1, p1, f1 = ref(a, b, 1)
        r2, p2, f2 = ref(a, b, 2)
        row = got[(a, b)]
        assert (row.r1, row.p1_, row.f1) == (r1, p1, f1), (a, b, 1)
        assert (row.r2, row.p2_, row.f2) == (r2, p2, f2), (a, b, 2)


def test_perplexity_band_bounds_and_vocab_coverage(spark):
    """r09: the percent-rank band keeps exactly the integer-math band
    (verified against a python replay); vocab_coverage hand case."""
    from temporal_vector_database_spark.operators.textindex import (
        perplexity_band_select,
        unigram_logprob_scores,
        vocab_coverage,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i % 7 + 1)) + f" u{i}")
         for i in range(40)],
        "doc_id long, text string",
    )
    scored = sorted(
        ((r.unigram_nll, r.doc_id) for r in unigram_logprob_scores(docs).collect())
    )
    n1 = len(scored) - 1
    expect = {
        did for rank0, (_, did) in enumerate(scored)
        if 25 * n1 <= rank0 * 100 < 75 * n1
    }
    got = {r.doc_id for r in perplexity_band_select(docs, 25, 75).collect()}
    assert got == expect and 0 < len(got) < len(scored)

    import pytest

    with pytest.raises(ValueError, match="lo < hi"):
        perplexity_band_select(docs, 80, 20)

    # vocab_coverage hand case: corpus 'a a a b b c' -> ranks a,b,c
    d2 = spark.createDataFrame([(1, "a a a b b c")], "doc_id long, text string")
    cov = {r.vocab_size: r for r in vocab_coverage(d2, sizes=(1, 2, 99)).collect()}
    assert (cov[1].covered_tokens, cov[1].coverage) == (3, 0.5)
    assert (cov[2].covered_tokens, cov[2].coverage) == (5, round(5 / 6, 6))
    assert cov[99].covered_tokens == 6 and cov[99].coverage == 1.0
    assert cov[1].n_types == 3 and cov[1].total_tokens == 6


def test_streaming_wordcount_coverage_equals_batch_and_replay(spark, tmp_path, sf_dir):
    """r09: coverage served from the streamed term-count state equals
    the one-shot batch vocab_coverage bit-for-bit; same-batch replay is
    a no-op by value."""
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.textindex import vocab_coverage
    from temporal_vector_database_spark.streaming.wordcount import (
        coverage_from_state,
        process_wordcount_batch,
    )

    docs = spark.read.parquet(sf_dir + "/documents.parquet").where(
        F.col("doc_id") % 4 == 0
    )
    state = str(tmp_path / "wc")
    assert coverage_from_state(spark, state) is None
    for bid in range(3):
        process_wordcount_batch(docs.where(F.col("doc_id") % 3 == bid), bid, state)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    served = canon(coverage_from_state(spark, state, sizes=(10, 100, 1000)))
    batch = canon(vocab_coverage(docs, sizes=(10, 100, 1000)))
    assert served == batch and len(served) == 3

    # replay of a committed batch: partition overwrite -> unchanged
    process_wordcount_batch(docs.where(F.col("doc_id") % 3 == 1), 1, state)
    assert canon(coverage_from_state(spark, state, sizes=(10, 100, 1000))) == served


def test_streaming_unigram_nll_from_state_equals_batch(spark, tmp_path, sf_dir):
    """r09: scoring the streamed corpus against its own maintained
    term-count state is bit-equal to the batch self-scored operator;
    unseen candidate terms drop at the model join."""
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.textindex import (
        unigram_logprob_scores,
    )
    from temporal_vector_database_spark.streaming.wordcount import (
        process_wordcount_batch,
        unigram_nll_from_state,
    )

    docs = spark.read.parquet(sf_dir + "/documents.parquet").where(
        F.col("doc_id") % 5 == 1
    )
    state = str(tmp_path / "wc2")
    assert unigram_nll_from_state(spark, state, docs) is None
    for bid in range(2):
        process_wordcount_batch(docs.where(F.col("doc_id") % 2 == bid), bid, state)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    assert canon(unigram_nll_from_state(spark, state, docs)) == canon(
        unigram_logprob_scores(docs)
    )

    # a candidate doc of entirely unseen terms scores no rows (every
    # term drops at the model join — no fake probability mass)
    alien = spark.createDataFrame(
        [(999999, "zzzzqqq wwwwxxx")], "doc_id long, text string"
    )
    assert unigram_nll_from_state(spark, state, alien).count() == 0


def _mkn_reference(texts):
    """Pure-Python modified Kneser-Ney trigram NLL (Chen & Goodman 1999
    §3) mirroring the operator's exact formula — independent
    implementation path (dict walks, not relational algebra)."""
    import math
    from collections import Counter, defaultdict

    docs = {i: t.split() for i, t in enumerate(texts)}
    tri = Counter()
    for toks in docs.values():
        for i in range(len(toks) - 2):
            tri[(toks[i], toks[i + 1], toks[i + 2])] += 1

    def discounts(counts):
        n = Counter(counts.values())
        n1, n2, n3, n4 = (float(n.get(k, 0)) for k in (1, 2, 3, 4))
        y = n1 / (n1 + 2.0 * n2) if n1 + 2.0 * n2 > 0 else 0.5
        d1 = max(1.0 - 2.0 * y * n2 / n1, 0.0) if n1 > 0 else 0.5
        d2 = max(2.0 - 3.0 * y * n3 / n2, 0.0) if n2 > 0 else 1.0
        d3 = max(3.0 - 4.0 * y * n4 / n3, 0.0) if n3 > 0 else 1.5
        return d1, d2, d3

    D = discounts(tri)
    cbig = Counter()  # continuation bigram: distinct w1 per (w2, w3)
    for (w1, w2, w3), _ in tri.items():
        cbig[(w2, w3)] += 1
    E = discounts(cbig)
    c3 = defaultdict(int)
    buck3 = defaultdict(lambda: [0, 0, 0])
    for (w1, w2, w3), c in tri.items():
        c3[(w1, w2)] += c
        buck3[(w1, w2)][min(c, 3) - 1] += 1
    c2 = defaultdict(int)
    buck2 = defaultdict(lambda: [0, 0, 0])
    for (w2, w3), c in cbig.items():
        c2[w2] += c
        buck2[w2][min(c, 3) - 1] += 1
    cont = Counter(w3 for (w2, w3) in cbig)
    n_types = float(len(cbig))

    def disc(d, c):
        return d[min(c, 3) - 1]

    out = {}
    for i, toks in docs.items():
        if len(toks) < 3:
            continue
        s, nt = 0.0, 0
        for j in range(len(toks) - 2):
            g = (toks[j], toks[j + 1], toks[j + 2])
            c = tri[g]
            pcont = cont[g[2]] / n_types
            cp = cbig[(g[1], g[2])]
            g2 = (
                E[0] * buck2[g[1]][0] + E[1] * buck2[g[1]][1] + E[2] * buck2[g[1]][2]
            ) / c2[g[1]]
            p2 = max(cp - disc(E, cp), 0.0) / c2[g[1]] + g2 * pcont
            ctx = (g[0], g[1])
            g3 = (
                D[0] * buck3[ctx][0] + D[1] * buck3[ctx][1] + D[2] * buck3[ctx][2]
            ) / c3[ctx]
            p3 = max(c - disc(D, c), 0.0) / c3[ctx] + g3 * p2
            assert p3 > 0.0
            s += -math.log(p3)
            nt += 1
        out[i] = (nt, round(s / nt, 6))
    return out


def test_modified_kn_scores(spark):
    """r10: the relational modified-KN trigram matches an independent
    pure-Python implementation of the Chen-Goodman formula on a corpus
    with count-1/2/3+ trigram types, repeated contexts, and short docs
    (omitted)."""
    from temporal_vector_database_spark.operators.textindex import (
        modified_kn_logprob_scores,
    )

    texts = [
        "a b c a b c a b d",
        "a b c d e f",
        "b c a b c a",
        "x y z x y z x y z x y w",
        "a b",  # < 3 tokens -> omitted
        "q r s",
    ]
    want = _mkn_reference(texts)
    out = {
        r.doc_id: (r.n_trigrams, r.mkn_nll)
        for r in modified_kn_logprob_scores(_docs(spark, texts)).collect()
    }
    assert set(out) == set(want)
    for k in want:
        assert out[k][0] == want[k][0]
        assert abs(out[k][1] - want[k][1]) < 1e-6, (k, out[k], want[k])
    # sanity: probability mass seen more often scores lower NLL
    assert out[3][1] < out[5][1]


def test_coverage_duplicate_sizes(spark):
    """ADVICE r09: duplicate entries in sizes must not raise (collapsed
    to one row per distinct V, order preserved)."""
    from temporal_vector_database_spark.operators.textindex import vocab_coverage

    docs = _docs(spark, ["a a b c", "b b d"])
    rows = vocab_coverage(docs, sizes=(2, 2, 100)).collect()
    assert [r.vocab_size for r in rows] == [2, 100]
    assert rows[1].coverage == 1.0


def test_streaming_bigram_nll_from_state_equals_batch(spark, tmp_path, sf_dir):
    """r10 (VERDICT r09 #5): scoring the streamed corpus against its
    own maintained term+bigram count states is bit-equal to the batch
    self-scored bigram_logprob_scores; a torn (uncommitted) batch dir
    is invisible to the serving path (ADVICE r09)."""
    import os

    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.textindex import (
        bigram_logprob_scores,
    )
    from temporal_vector_database_spark.streaming.wordcount import (
        bigram_nll_from_state,
        process_bigram_batch,
        process_wordcount_batch,
    )

    docs = spark.read.parquet(sf_dir + "/documents.parquet").where(
        F.col("doc_id") % 5 == 2
    )
    tstate = str(tmp_path / "terms")
    bstate = str(tmp_path / "bigrams")
    assert bigram_nll_from_state(spark, tstate, bstate, docs) is None
    for bid in range(2):
        part = docs.where(F.col("doc_id") % 2 == bid)
        process_wordcount_batch(part, bid, tstate)
        process_bigram_batch(part, bid, bstate)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    served = canon(bigram_nll_from_state(spark, tstate, bstate, docs))
    assert served == canon(bigram_logprob_scores(docs)) and len(served) > 0

    # torn-write gating: a batch dir without _SUCCESS is ignored
    torn = os.path.join(bstate, "batch=9")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-zzz.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert canon(bigram_nll_from_state(spark, tstate, bstate, docs)) == served

    # foreign/leftover entries with a NON-INTEGER batch= suffix are
    # skipped, not fatal (ADVICE r10) — even one carrying a _SUCCESS
    foreign = os.path.join(bstate, "batch=tmp-leftover")
    os.makedirs(foreign)
    with open(os.path.join(foreign, "_SUCCESS"), "w") as f:
        f.write("")
    assert canon(bigram_nll_from_state(spark, tstate, bstate, docs)) == served


def test_process_lm_batch_states_bit_equal_per_order_writers(spark, tmp_path, sf_dir):
    """r13 (VERDICT r12 #5): the combined tokenize-once writer must
    leave every state's parquet CONTENTS bit-identical to the per-order
    writers folding the same batches — terms, bigrams, and trigrams —
    including the empty-batch no-op."""
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.streaming.wordcount import (
        process_bigram_batch,
        process_lm_batch,
        process_trigram_batch,
        process_wordcount_batch,
    )

    docs = spark.read.parquet(sf_dir + "/documents.parquet").where(
        F.col("doc_id") % 7 == 3
    )
    old = {n: str(tmp_path / ("old_" + n)) for n in ("t", "b", "g")}
    new = {n: str(tmp_path / ("new_" + n)) for n in ("t", "b", "g")}
    for bid in range(2):
        part = docs.where(F.col("doc_id") % 2 == bid)
        process_wordcount_batch(part, bid, old["t"])
        process_bigram_batch(part, bid, old["b"])
        process_trigram_batch(part, bid, old["g"])
        process_lm_batch(
            part,
            bid,
            term_state_dir=new["t"],
            bigram_state_dir=new["b"],
            trigram_state_dir=new["g"],
        )
    # an empty batch writes nothing on either path
    empty = docs.where(F.lit(False))
    process_wordcount_batch(empty, 9, old["t"])
    process_lm_batch(empty, 9, term_state_dir=new["t"], bigram_state_dir=new["b"])
    import os

    assert not os.path.exists(os.path.join(old["t"], "batch=9"))
    assert not os.path.exists(os.path.join(new["t"], "batch=9"))

    def canon(path):
        return sorted(
            tuple(r)
            for r in spark.read.option("basePath", path).parquet(path).collect()
        )

    for n in ("t", "b", "g"):
        rows = canon(new[n])
        assert rows == canon(old[n]) and len(rows) > 0
    # single-state call delegates to the per-order writer (no pin paid)
    solo_old = str(tmp_path / "solo_old")
    solo_new = str(tmp_path / "solo_new")
    process_trigram_batch(docs, 0, solo_old)
    process_lm_batch(docs, 0, trigram_state_dir=solo_new)
    assert canon(solo_new) == canon(solo_old)


def test_process_bigram_batch_tolerates_caller_one_column(spark, tmp_path):
    """ADVICE r10: a batch whose schema already carries a ``_one``
    column is counted correctly (the old implementation injected a
    constant ``_one`` id via withColumn, silently clobbering it)."""
    from temporal_vector_database_spark.streaming.wordcount import (
        process_bigram_batch,
        read_bigram_counts,
    )

    batch = spark.createDataFrame(
        [(1, "a b a b", "keep-me"), (2, "b a", "keep-me-too")],
        "doc_id long, text string, _one string",
    )
    state = str(tmp_path / "bstate")
    process_bigram_batch(batch, 0, state)
    got = {
        (r.w1, r.w2): r.b_cnt
        for r in read_bigram_counts(spark, state).collect()
    }
    assert got == {("a", "b"): 2, ("b", "a"): 2}


def test_streaming_trigram_nll_from_state_equals_batch(spark, tmp_path, sf_dir):
    """r10: JM-trigram scoring served from the three maintained count
    states (term/bigram/trigram) is bit-equal to the batch self-scored
    trigram_logprob_scores."""
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.textindex import (
        trigram_logprob_scores,
    )
    from temporal_vector_database_spark.streaming.wordcount import (
        process_bigram_batch,
        process_trigram_batch,
        process_wordcount_batch,
        trigram_nll_from_state,
    )

    docs = spark.read.parquet(sf_dir + "/documents.parquet").where(
        F.col("doc_id") % 5 == 3
    )
    t, b, g = (str(tmp_path / d) for d in ("t", "b", "g"))
    assert trigram_nll_from_state(spark, t, b, g, docs) is None
    for bid in range(2):
        part = docs.where(F.col("doc_id") % 2 == bid)
        process_wordcount_batch(part, bid, t)
        process_bigram_batch(part, bid, b)
        process_trigram_batch(part, bid, g)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    served = canon(trigram_nll_from_state(spark, t, b, g, docs))
    assert served == canon(trigram_logprob_scores(docs)) and len(served) > 0


def test_streaming_perplexity_band_from_state_equals_batch(spark, tmp_path, sf_dir):
    """r10: band selection served from the maintained term-count state
    is bit-equal to the batch perplexity_band_select when self-selecting
    the streamed corpus (shared band_from_scores core)."""
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.textindex import (
        perplexity_band_select,
    )
    from temporal_vector_database_spark.streaming.wordcount import (
        perplexity_band_from_state,
        process_wordcount_batch,
    )

    docs = spark.read.parquet(sf_dir + "/documents.parquet").where(
        F.col("doc_id") % 5 == 4
    )
    state = str(tmp_path / "pb")
    assert perplexity_band_from_state(spark, state, docs) is None
    for bid in range(2):
        process_wordcount_batch(docs.where(F.col("doc_id") % 2 == bid), bid, state)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    served = canon(perplexity_band_from_state(spark, state, docs))
    assert served == canon(perplexity_band_select(docs)) and len(served) > 0


def test_modified_kn_property_random_corpora(spark):
    """r10 hypothesis-style property (fixed seeds, no runtime RNG):
    the relational modified-KN matches the pure-Python dict-walk
    reference on several generated corpora with varied vocabularies,
    repetition structure, and doc lengths."""
    import random

    from temporal_vector_database_spark.operators.textindex import (
        modified_kn_logprob_scores,
    )

    for seed in (1, 2, 5):
        rng = random.Random(seed)
        vocab = [f"w{j}" for j in range(rng.randint(3, 12))]
        texts = []
        for _ in range(rng.randint(4, 12)):
            n = rng.randint(0, 14)
            texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
        want = _mkn_reference(texts)
        out = {
            r.doc_id: (r.n_trigrams, r.mkn_nll)
            for r in modified_kn_logprob_scores(_docs(spark, texts)).collect()
        }
        assert set(out) == set(want), (seed, set(out) ^ set(want))
        for k in want:
            assert out[k][0] == want[k][0], (seed, k)
            assert abs(out[k][1] - want[k][1]) < 1e-6, (seed, k, out[k], want[k])


def test_streaming_kn_and_mkn_from_state_equal_batch(spark, tmp_path, sf_dir):
    """r10: Kneser-Ney bigram AND modified-KN trigram served from
    their single maintained count states are bit-equal to the batch
    self-scored operators (shared from_counts cores)."""
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.textindex import (
        kneser_ney_logprob_scores,
        modified_kn_logprob_scores,
    )
    from temporal_vector_database_spark.streaming.wordcount import (
        kneser_ney_nll_from_state,
        modified_kn_nll_from_state,
        process_bigram_batch,
        process_trigram_batch,
    )

    docs = spark.read.parquet(sf_dir + "/documents.parquet").where(
        F.col("doc_id") % 7 == 1
    )
    b, g = str(tmp_path / "b"), str(tmp_path / "g")
    assert kneser_ney_nll_from_state(spark, b, docs) is None
    assert modified_kn_nll_from_state(spark, g, docs) is None
    for bid in range(2):
        part = docs.where(F.col("doc_id") % 2 == bid)
        process_bigram_batch(part, bid, b)
        process_trigram_batch(part, bid, g)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    kn = canon(kneser_ney_nll_from_state(spark, b, docs))
    assert kn == canon(kneser_ney_logprob_scores(docs)) and len(kn) > 0
    mkn = canon(modified_kn_nll_from_state(spark, g, docs))
    assert mkn == canon(modified_kn_logprob_scores(docs)) and len(mkn) > 0


def test_bigram_nll_stream_gate_equals_batch_gate(spark, sf_dir):
    """r11 (VERDICT r10 #2): the oracle-gated streaming-serve query
    (3-batch state build inside the query) is bit-equal to the batch
    bigram_nll gate — the stream==batch exactness the driver's oracle
    now checks end-to-end."""
    from temporal_vector_database_spark.plans.registry import (
        q_bigram_nll,
        q_bigram_nll_stream,
    )

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    got = canon(q_bigram_nll_stream(spark, sf_dir))
    assert got == canon(q_bigram_nll(spark, sf_dir)) and len(got) > 0


def test_remaining_stream_serve_gates_equal_batch_gates(spark, sf_dir):
    """r11: the four serve gates added past the rotation cap
    (trigram/KN/MKN/band) are bit-equal to their batch twins — the
    same stream==batch exactness the driver's oracle checks."""
    from temporal_vector_database_spark.plans.registry import (
        q_kneser_ney_nll,
        q_kneser_ney_nll_stream,
        q_perplexity_band,
        q_perplexity_band_stream,
    )

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    got = canon(q_kneser_ney_nll_stream(spark, sf_dir))
    assert got == canon(q_kneser_ney_nll(spark, sf_dir)) and len(got) > 0
    got = canon(q_perplexity_band_stream(spark, sf_dir))
    assert got == canon(q_perplexity_band(spark, sf_dir)) and len(got) > 0
