"""Subword tokenizer tests (operators/tokenize.py)."""

import hashlib


def test_build_subword_vocab_deterministic_topk(spark):
    from temporal_vector_database_spark.operators.tokenize import build_subword_vocab

    docs = spark.createDataFrame(
        [(0, "abab ab"), (1, "abab cd")], "doc_id long, text string"
    )
    got = [(r.gram, r.cnt) for r in build_subword_vocab(docs, vocab_size=5, max_len=2).collect()]
    # grams of 'abab' (x2): a,b,a,b, ab,ba,ab ; 'ab': a,b,ab ; 'cd': c,d,cd
    # counts: a=5, b=5, ab=5, ba=2, c=1, d=1, cd=1
    assert got[:3] == [("a", 5), ("ab", 5), ("b", 5)]  # ties broken by gram asc
    assert got[3] == ("ba", 2)
    assert len(got) == 5 and got[4] == ("c", 1)


def test_wordpiece_tokenize_greedy_cover_and_oov(spark):
    from temporal_vector_database_spark.operators.tokenize import wordpiece_tokenize

    docs = spark.createDataFrame(
        [(0, "abcd xyz"), (1, ""), (2, "abab")], "doc_id long, text string"
    )
    vocab = ["abc", "ab", "cd", "d"]
    out = {r.doc_id: r for r in wordpiece_tokenize(docs, vocab, max_len=4).collect()}
    # 'abcd': longest-first tries 'abcd'(no), 'abc'(yes) -> then 'd'(yes)
    # 'xyz': all OOV single chars
    exp0 = "abc d x y z"
    assert out[0].n_words == 2 and out[0].n_pieces == 5
    assert out[0].pieces_md5 == hashlib.md5(exp0.encode()).hexdigest()
    # empty doc: zero words, zero pieces, md5 of empty string
    assert out[1].n_words == 0 and out[1].n_pieces == 0
    assert out[1].pieces_md5 == hashlib.md5(b"").hexdigest()
    # 'abab': 'abab'(no), 'aba'(no), 'ab'(yes) x2
    assert out[2].n_pieces == 2
    assert out[2].pieces_md5 == hashlib.md5(b"ab ab").hexdigest()


def test_wordpiece_with_corpus_vocab_covers_all_text(spark, sf_dir):
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.tokenize import (
        build_subword_vocab,
        wordpiece_tokenize,
    )

    docs = spark.read.parquet(sf_dir + "/documents.parquet").limit(50)
    vocab = build_subword_vocab(docs, vocab_size=128, max_len=3)
    toks = wordpiece_tokenize(docs, vocab, max_len=3)
    # segmentation always covers: pieces per doc >= words per doc, and
    # total piece chars == total word chars (cover-exactly invariant is
    # pinned at word grain in the unit test; here at corpus grain)
    joined = toks.join(
        docs.select(
            "doc_id",
            F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("nw"),
        ),
        "doc_id",
    )
    bad = joined.where((F.col("n_words") != F.col("nw")) | (F.col("n_pieces") < F.col("n_words")))
    assert bad.count() == 0 and toks.count() == 50


def test_merge_word_greedy_parity():
    """Greedy non-overlapping merge: a run of k identical tokens merges
    floor(k/2) times at offsets 0, 2, 4, … — the parity rule the
    relational oracle mirrors."""
    from temporal_vector_database_spark.operators.tokenize import _merge_word

    assert _merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert _merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _merge_word(list("aaaaa"), "a", "a") == ["aa", "aa", "a"]
    assert _merge_word(list("abab"), "a", "b") == ["ab", "ab"]
    assert _merge_word(list("xaby"), "a", "b") == ["x", "ab", "y"]
    assert _merge_word(["ab", "ab", "c"], "ab", "ab") == ["abab", "c"]
    assert _merge_word([], "a", "b") == []


def test_bpe_train_learns_expected_merges(spark):
    """Hand-computable corpus: 'aaab' x3 + 'ab' x2. Round 1: (a,a)
    counts 2 per 'aaab' (overlaps included, Sennrich get_stats) = 6 >
    (a,b) = 5 -> merge (a,a); 'aaab' -> [aa,a,b]. Round 2: (a,b)
    appears in 'aaab' (x3) and 'ab' (x2) = 5 -> merge. Round 3:
    (aa,ab) = 3."""
    from temporal_vector_database_spark.operators.tokenize import bpe_train

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab"), (2, "aaab ab")], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train(docs, n_merges=3).collect()]
    assert got == [
        (1, "a", "a", "aa", 6),
        (2, "a", "b", "ab", 5),
        (3, "aa", "ab", "aaab", 3),
    ]


def test_bpe_train_deterministic_tiebreak_and_early_stop(spark):
    """Equal-count pairs break lexicographically; a corpus that runs
    out of pairs stops early with fewer rows."""
    from temporal_vector_database_spark.operators.tokenize import bpe_train

    docs = spark.createDataFrame([(1, "ba dc")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(docs, n_merges=5).collect()]
    # counts all 1 -> lexicographic: (b,a) < (d,c); then no pairs remain
    assert got == [(1, "b", "a", "ba", 1), (2, "d", "c", "dc", 1)]


def test_bpe_apply_matches_training_state_and_handles_oov(spark):
    """Applying trained merges in rank order reproduces the training
    fold's word states (in-vocab) and degrades to chars + applicable
    merges on OOV words; rule input works as DataFrame or list."""
    from temporal_vector_database_spark.operators.tokenize import (
        bpe_apply,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab"), (2, "aaab ab")], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=3)  # (a,a), (a,b), (aa,ab)
    out = {r.doc_id: r for r in bpe_apply(docs, merges).collect()}
    import hashlib

    # 'aaab' -> [aaab]; 'ab' -> [ab]
    assert out[1].n_words == 3 and out[1].n_tokens == 3
    assert out[1].tokens_md5 == hashlib.md5(b"aaab aaab ab").hexdigest()
    assert out[2].n_tokens == 2

    # OOV: 'aabb' -> aa/b/b via (a,a); 'zz' -> z/z (no rule applies)
    oov = spark.createDataFrame([(9, "aabb zz")], "doc_id long, text string")
    r = bpe_apply(oov, [(1, "a", "a"), (2, "a", "b"), (3, "aa", "ab")]).collect()[0]
    assert r.n_tokens == 5
    assert r.tokens_md5 == hashlib.md5(b"aa b b z z").hexdigest()


def test_bpe_train_incremental_equals_naive_at_64_merges(spark):
    """r08 (VERDICT r07 #3): the incremental pair-count trainer learns
    the IDENTICAL merge table to the naive full-re-aggregate fold at a
    production-shaped merge count — including single-char and repeated
    words (the adjacency predicate must not error on size<2 token
    streams, and a NULL predicate must not drop a word from both the
    affected and rest branches)."""
    from temporal_vector_database_spark.operators.tokenize import (
        bpe_train,
        bpe_train_incremental,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the lazy dog sleeps while the quick fox runs"),
        (3, "pack my box with five dozen liquor jugs quickly"),
        (4, "a a b i o u zz the aaaa"),  # 1-char words + same-token runs
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    naive = [tuple(r) for r in bpe_train(docs, n_merges=64).collect()]
    inc = [tuple(r) for r in bpe_train_incremental(docs, n_merges=64).collect()]
    assert inc == naive and len(inc) >= 32

    # early exhaustion: a corpus whose pairs run out stops both the same
    tiny = spark.createDataFrame([(1, "ab ab a b")], "doc_id long, text string")
    n2 = [tuple(r) for r in bpe_train(tiny, n_merges=10).collect()]
    i2 = [tuple(r) for r in bpe_train_incremental(tiny, n_merges=10).collect()]
    assert i2 == n2 and len(i2) < 10


def _py_bpe_batched(texts, n_merges, batch):
    """Independent pure-Python reference of the batch-greedy semantics:
    per round, top-B symbol-disjoint pairs of the counts ENTERING the
    round (cnt desc, pair lex asc), greedy non-overlapping merges."""
    from collections import Counter

    from temporal_vector_database_spark.operators.tokenize import _merge_word

    words = Counter(w for t in texts for w in t.split() if w)
    state = {w: [ch for ch in w] for w in words}
    rules = []
    rnd = 0
    while len(rules) < n_merges:
        rnd += 1
        counts = Counter()
        for w, toks in state.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += words[w]
        cands = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        used, picked = set(), []
        for (l, r), cnt in cands:
            if len(picked) == min(batch, n_merges - len(rules)):
                break
            syms = {l, r, l + r}
            if syms & used:
                continue
            used |= syms
            picked.append((l, r, cnt))
        if not picked:
            break
        for l, r, cnt in picked:
            rules.append((len(rules) + 1, l, r, l + r, cnt, rnd))
        for w in state:
            for l, r, _ in picked:
                state[w] = _merge_word(state[w], l, r)
    return rules, state


def test_bpe_train_batched_semantics_and_b1_equality(spark):
    """r09 (VERDICT r08 #4): the batched trainer (a) at batch_size=1 IS
    the sequential incremental fold, (b) at B>1 matches an independent
    pure-Python formulation of the batch-greedy semantics, and (c) is
    order-independent within a round (symbol-disjointness theorem:
    applying the round's picks in reverse gives the same state)."""
    from temporal_vector_database_spark.operators.tokenize import (
        _merge_word,
        bpe_train_batched,
        bpe_train_incremental,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the lazy dog sleeps while the quick fox runs"),
        (3, "pack my box with five dozen liquor jugs quickly"),
        (4, "a a b i o u zz the aaaa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # (a) B=1 == sequential (batch_round == merge_rank there)
    seq = [tuple(r) for r in bpe_train_incremental(docs, n_merges=24).collect()]
    b1 = [
        tuple(r)[:5]
        for r in bpe_train_batched(docs, n_merges=24, batch_size=1).collect()
    ]
    assert b1 == seq
    # (b) B=3 == the pure-Python batch-greedy reference
    texts = [t for _, t in rows]
    ref_rules, ref_state = _py_bpe_batched(texts, 24, 3)
    got = [
        tuple(r)
        for r in bpe_train_batched(docs, n_merges=24, batch_size=3).collect()
    ]
    assert got == ref_rules
    # (c) within-round order independence on the reference state
    from collections import defaultdict

    by_round = defaultdict(list)
    for rank, l, r, m, cnt, rnd in ref_rules:
        by_round[rnd].append((l, r))
    words = {w for t in texts for w in t.split() if w}
    for w in words:
        fwd = [ch for ch in w]
        rev = [ch for ch in w]
        for rnd in sorted(by_round):
            for l, r in by_round[rnd]:
                fwd = _merge_word(fwd, l, r)
            for l, r in reversed(by_round[rnd]):
                rev = _merge_word(rev, l, r)
        assert fwd == rev == ref_state[w], w

    import pytest

    with pytest.raises(ValueError, match="batch_size"):
        bpe_train_batched(docs, batch_size=0)


def test_bpe_batched_divergence_curve(spark):
    """r10 (VERDICT r09 #7): the SCALE.md batched-BPE divergence figure,
    pinned — on the sf0.01 corpus at 32 merges, B=8 shares exactly 19 of
    32 learned rules with the sequential fold (everything deterministic,
    so this is an exact equality, not a floor). Guards the docstring's
    empirical claim against silent selection-rule drift."""
    from temporal_vector_database_spark.operators.tokenize import (
        bpe_train_batched,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    seq = [
        (r.left_tok, r.right_tok)
        for r in bpe_train_batched(docs, n_merges=32, batch_size=1)
        .orderBy("merge_rank")
        .collect()
    ]
    b8 = [
        (r.left_tok, r.right_tok)
        for r in bpe_train_batched(docs, n_merges=32, batch_size=8)
        .orderBy("merge_rank")
        .collect()
    ]
    assert len(seq) == 32 and len(b8) == 32
    assert len(set(seq) & set(b8)) == 19
