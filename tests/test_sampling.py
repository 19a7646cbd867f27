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
