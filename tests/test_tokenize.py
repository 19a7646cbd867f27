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
