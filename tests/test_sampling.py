"""Deterministic sampling / splitting / sharding: membership must be a
property of the key (stable on any subset/superset of the corpus), and
chunk boundaries must be exact integer arithmetic."""

from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.sampling import (
    deterministic_sample,
    split_assign,
    token_budget_chunks,
)


def _docs(spark, n=400):
    return spark.createDataFrame(
        [(i, f"src{i % 3}", " ".join(f"w{j}" for j in range(1 + i % 50))) for i in range(n)],
        ["doc_id", "source", "text"],
    )


def test_sample_membership_is_key_stable(spark):
    docs = _docs(spark)
    full = {r.doc_id for r in deterministic_sample(docs, 0.3).collect()}
    # sampling a SUBSET yields exactly the intersection — no re-rolls
    subset = docs.where(F.col("doc_id") % 2 == 0)
    sub = {r.doc_id for r in deterministic_sample(subset, 0.3).collect()}
    assert sub == {d for d in full if d % 2 == 0}
    # fraction is approximately honored
    assert 0.2 < len(full) / 400 < 0.4


def test_sample_fraction_monotone(spark):
    docs = _docs(spark)
    s_small = {r.doc_id for r in deterministic_sample(docs, 0.1).collect()}
    s_big = {r.doc_id for r in deterministic_sample(docs, 0.5).collect()}
    assert s_small <= s_big  # nested samples: raising the fraction only adds


def test_split_assign_partition_and_determinism(spark):
    docs = _docs(spark)
    a = {r.doc_id: r.split for r in split_assign(docs).collect()}
    b = {r.doc_id: r.split for r in split_assign(docs).collect()}
    assert a == b and set(a.values()) == {"train", "val", "test"}
    n = len(a)
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.8 < n_train / n < 1.0  # 90% nominal
    # split of a subset never reassigns anyone (leak-proof)
    sub = {r.doc_id: r.split for r in split_assign(docs.where(F.col("doc_id") < 100)).collect()}
    assert all(a[d] == s for d, s in sub.items())


def test_token_chunks_budget_bound(spark):
    docs = _docs(spark).withColumn("n_tokens", F.size(F.split("text", " ")))
    res = token_budget_chunks(docs, budget=100).collect()
    by_chunk: dict = {}
    for r in res:
        by_chunk.setdefault((r.source, r.chunk_id), []).append(r)
    for (_, _), rows in by_chunk.items():
        total = sum(r.n_tokens for r in rows)
        # every chunk starts under budget and overhangs by < one doc
        assert min(r.tokens_before for r in rows) % 100 * 0 == 0
        assert total < 100 + max(r.n_tokens for r in rows)
    # chunk ids are dense and ordered by doc within each source
    for r in res:
        assert r.chunk_id == r.tokens_before // 100


def test_stratified_sample_per_stratum_thresholds(spark):
    from temporal_vector_database_spark.operators.sampling import stratified_sample

    docs = _docs(spark)
    kept = stratified_sample(
        docs, {"src0": 1.0, "src1": 0.0}, default_fraction=0.5
    ).collect()
    by_src: dict = {}
    for r in kept:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    n0 = docs.where(F.col("source") == "src0").count()
    assert len(by_src.get("src0", set())) == n0  # fraction 1.0 keeps all
    assert "src1" not in by_src  # fraction 0.0 keeps none
    # default stratum behaves like deterministic_sample at the same rate
    want = {r.doc_id for r in deterministic_sample(docs.where(F.col("source") == "src2"), 0.5).collect()}
    assert by_src.get("src2", set()) == want


def test_temperature_rebalance_rates_and_membership(spark):
    from math import sqrt

    from temporal_vector_database_spark.operators.sampling import (
        temperature_rebalance,
    )

    # 64 docs of lang 'big', 4 of lang 'small'
    rows = [(i, "big" if i < 64 else "small") for i in range(68)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_rebalance(docs, k=4.0).collect()
    rates = {r.lang: r.keep_rate for r in out}
    # big: 4/sqrt(64) = 0.5; small: 4/sqrt(4) = 2 -> capped at 1.0
    assert rates["big"] == 0.5
    assert rates["small"] == 1.0
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    # rare language kept whole
    assert by_lang["small"] == set(range(64, 68))
    # dominant language downsampled to exactly the md5-threshold members
    from temporal_vector_database_spark.operators.sampling import (
        deterministic_sample,
    )

    want = {
        r.doc_id
        for r in deterministic_sample(
            docs.where("lang = 'big'"), 4.0 / sqrt(64)
        ).collect()
    }
    assert by_lang["big"] == want
    # subset-stability: rerunning on the kept set with rate 1.0 keeps all
    assert 0 < len(by_lang["big"]) < 64


def test_pack_concat_chunks_partitions_token_stream(spark):
    from temporal_vector_database_spark.operators.sampling import pack_concat_chunks

    rows = [
        (0, "a", 5),
        (1, "a", 10),   # spans the 8-cut: seqs 0 and 1
        (2, "a", 0),    # zero tokens: emits nothing
        (3, "a", 17),   # spans seqs 1..3
        (4, "b", 8),    # exactly one full sequence
        (5, "b", 1),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    out = pack_concat_chunks(docs, seq_len=8).collect()
    got = {(r.doc_id, r.seq_id): (r.tok_start, r.tok_end) for r in out}
    assert got == {
        (0, 0): (0, 5),
        (1, 0): (0, 3),    # tokens 5..7 of the stream
        (1, 1): (3, 10),   # tokens 8..14
        (3, 1): (0, 1),    # stream 15
        (3, 2): (1, 9),    # stream 16..23
        (3, 3): (9, 17),   # stream 24..31
        (4, 0): (0, 8),
        (5, 1): (0, 1),
    }
    # every sequence is exactly filled (spans tile the stream):
    # per (source, seq) the interval lengths sum to min(seq_len, remaining)
    from collections import defaultdict

    per_seq = defaultdict(int)
    for r in out:
        per_seq[(r.source, r.seq_id)] += r.tok_end - r.tok_start
    assert per_seq[("a", 0)] == 8 and per_seq[("a", 1)] == 8
    assert per_seq[("a", 2)] == 8 and per_seq[("a", 3)] == 8
    assert per_seq[("b", 0)] == 8 and per_seq[("b", 1)] == 1


def test_cluster_capped_sample_cap_and_determinism(spark):
    from temporal_vector_database_spark.operators.sampling import (
        cluster_capped_sample,
    )

    rows = [(i, i % 3) for i in range(60)]  # 3 clusters of 20
    assign = spark.createDataFrame(rows, "vid long, centroid_id int")
    out = cluster_capped_sample(assign, cap=5).collect()
    by_c: dict = {}
    for r in out:
        by_c.setdefault(r.centroid_id, []).append(r)
    assert set(by_c) == {0, 1, 2}
    for c, members in by_c.items():
        assert len(members) == 5
        assert sorted(r.rn for r in members) == [1, 2, 3, 4, 5]
    # determinism + subset-stability: rerun on half the clusters picks
    # the identical survivors for those clusters
    half = assign.where("centroid_id < 2")
    again = {
        (r.centroid_id, r.vid)
        for r in cluster_capped_sample(half, cap=5).collect()
    }
    want = {(r.centroid_id, r.vid) for r in out if r.centroid_id < 2}
    assert again == want
    # cap >= cluster size keeps everything
    assert cluster_capped_sample(assign, cap=100).count() == 60


def test_leakage_safe_split_duplicates_share_split(spark):
    """Exact duplicates land in the SAME split regardless of doc_id —
    the whole point vs split_assign's id hashing."""
    from temporal_vector_database_spark.operators.sampling import (
        leakage_safe_split,
        split_assign,
    )

    rows = [(i, f"shared text body {i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(df).collect()
    by_text = {}
    for r in out:
        by_text.setdefault(r.text, set()).add(r.split)
    assert all(len(s) == 1 for s in by_text.values())
    # sanity: id-hash splitting DOES scatter these same clusters
    scattered = split_assign(df).collect()
    by_text2 = {}
    for r in scattered:
        by_text2.setdefault(r.text, set()).add(r.split)
    assert any(len(s) > 1 for s in by_text2.values())


def test_leakage_safe_split_cluster_col_grain(spark):
    """With cluster_col, every member of a precomputed cluster (e.g. a
    near-dup connected component) draws one split."""
    from temporal_vector_database_spark.operators.sampling import (
        leakage_safe_split,
    )

    rows = [(i, f"unique text {i}", f"c{i % 5}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, cc string")
    out = leakage_safe_split(df, cluster_col="cc").collect()
    by_cc = {}
    for r in out:
        by_cc.setdefault(r.cc, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cc.values())


def test_leakage_safe_split_weight_validation(spark):
    import pytest

    from temporal_vector_database_spark.operators.sampling import (
        leakage_safe_split,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        leakage_safe_split(df, weights=(0.5, 0.5), names=("a", "b", "c"))


def test_token_budget_select_matches_naive_window_and_caps_budget(spark):
    """Two-phase prefix-sum selection == naive per-source running-sum
    selection, and no selected source exceeds its budget."""
    import random

    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.sampling import (
        _u32,
        token_budget_select,
    )

    rng = random.Random(3)
    rows = [(i, f"s{i % 3}", rng.randrange(1, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    budgets = {"s0": 900, "s1": 40}  # s2 unbudgeted
    got = token_budget_select(df, budgets, n_range_buckets=8).collect()

    # naive reference in python: per-source running sum in draw order,
    # keep rows whose INCLUSIVE running total fits the budget
    u = {r.doc_id: r.u for r in df.select("doc_id", _u32(F.col("doc_id")).alias("u")).collect()}
    got_map = {r.doc_id: r.cum_tokens for r in got}
    expect = {}
    for s in ("s0", "s1", "s2"):
        cum = 0
        for did, src, nt in sorted(rows, key=lambda r: (u[r[0]], r[0])):
            if src != s:
                continue
            cum += nt
            if s not in budgets or cum <= budgets[s]:
                expect[did] = cum
    assert got_map == expect
    per_source = {}
    for r in got:
        per_source[r.source] = per_source.get(r.source, 0) + r.n_tokens
    assert per_source["s0"] <= 900 and per_source["s1"] <= 40
    assert per_source["s2"] == sum(nt for _, s, nt in rows if s == "s2")


def test_weighted_reservoir_exact_k_and_weight_bias(spark):
    """A-ES reservoir: exactly k rows, python-mirror parity of the
    integer clocks, and heavier rows are over-represented."""
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.sampling import (
        _u32,
        weighted_reservoir_sample,
    )

    rows = [(i, 10 if i % 10 else 10_000) for i in range(1, 1001)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    k = 100
    got = weighted_reservoir_sample(df, k=k, weight_col="w").collect()
    assert len(got) == k

    u = {r.doc_id: r.u for r in df.select(
        "doc_id", _u32(F.col("doc_id")).alias("u")).collect()}

    def clock(did, w):
        x = u[did] + 1
        L = x.bit_length() - 1
        s = L * 65536 + ((x - (1 << L)) * 65536) // (1 << L)
        return ((32 * 65536 - s) << 20) // w

    expect = sorted(((clock(d, w), d) for d, w in rows))[:k]
    assert sorted((r.priority_units, r.doc_id) for r in got) == expect
    # the 10% heavy rows (1000x weight) dominate the sample
    heavy = sum(1 for r in got if r.doc_id % 10 == 0)
    assert heavy > k * 0.7


def test_epoch_shuffle_permutation_and_epoch_variation(spark):
    """r08: every doc appears exactly once with a contiguous 1..n_s
    position per shard; two epochs give different orders (the salt
    works) while each is identical across reruns; n_shards=1 degrades
    to a single full permutation."""
    from temporal_vector_database_spark.operators.sampling import epoch_shuffle

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    e1 = epoch_shuffle(docs, epoch=1, n_shards=4).collect()
    assert len(e1) == 100 and len({r.doc_id for r in e1}) == 100
    by_shard = {}
    for r in e1:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), s
    assert set(by_shard) <= set(range(4)) and len(by_shard) == 4

    # determinism across reruns; variation across epochs
    e1b = epoch_shuffle(docs, epoch=1, n_shards=4).collect()
    assert sorted(map(tuple, e1)) == sorted(map(tuple, e1b))
    e2 = epoch_shuffle(docs, epoch=2, n_shards=4).collect()
    k1 = {r.doc_id: (r.shard, r.pos) for r in e1}
    k2 = {r.doc_id: (r.shard, r.pos) for r in e2}
    assert k1 != k2

    # single shard: one permutation 1..N
    one = epoch_shuffle(docs, epoch=1, n_shards=1).collect()
    assert sorted(r.pos for r in one) == list(range(1, 101))


def test_kfold_assign_exact_stratified_balance(spark):
    """r09: within every stratum fold sizes differ by <= 1, assignment
    is deterministic across reruns, and k<2 raises."""
    from collections import Counter

    from temporal_vector_database_spark.operators.sampling import kfold_assign

    rows = [(i, f"s{i % 3}") for i in range(101)] + [(1000, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = [(r.doc_id, r.stratum, r.fold) for r in kfold_assign(df, k=5).collect()]
    assert len(out) == 102 and all(0 <= f < 5 for _, _, f in out)
    per = Counter()
    for _, s, f in out:
        per[(s, f)] += 1
    for s in ("s0", "s1", "s2"):
        sizes = [per[(s, f)] for f in range(5)]
        assert max(sizes) - min(sizes) <= 1, (s, sizes)
    # the 1-row stratum lands wholly in fold 0 (rank 0 % k)
    assert per[("tiny", 0)] == 1
    # deterministic rerun
    out2 = [(r.doc_id, r.stratum, r.fold) for r in kfold_assign(df, k=5).collect()]
    assert sorted(out) == sorted(out2)

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        kfold_assign(df, k=1)
