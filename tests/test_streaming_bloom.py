"""Streaming Bloom decontamination: growing-eval state maintenance
(union-distinct associativity), stream == batch on the merged suite,
monotonic flags, replay idempotency, and the empty-state probe."""

from pyspark.sql import functions as F  # noqa: F401

from temporal_vector_database_spark.operators.bloomfilter import (
    bloom_decontaminate,
    eval_bloom_positions,
)
from temporal_vector_database_spark.streaming.bloom import (
    process_eval_bloom_batch,
    process_probe_batch,
    read_bloom_positions,
    read_probe_reports,
)


def _data(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox sat on a mat today"),
            (3, "pack my box with five dozen liquor jugs"),
            (4, "totally disjoint vocabulary nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    ev1 = spark.createDataFrame(
        [(100, "the quick brown fox jumps over a fence")],
        "doc_id long, text string",
    )
    ev2 = spark.createDataFrame(
        [(101, "pack my box with five dozen bottles")],
        "doc_id long, text string",
    )
    return docs, ev1, ev2


def test_eval_state_equals_union_and_probe_equals_batch(spark, tmp_path):
    docs, ev1, ev2 = _data(spark)
    state = str(tmp_path / "bloom_state")
    out = str(tmp_path / "reports")
    process_eval_bloom_batch(ev1, 0, state)
    process_eval_bloom_batch(ev2, 1, state)
    # positions state == eval_bloom_positions of the union (set union
    # is associative/order-insensitive)
    got = sorted(r.pos for r in read_bloom_positions(spark, state).collect())
    want = sorted(
        r.pos for r in eval_bloom_positions(ev1.union(ev2)).collect()
    )
    assert got == want
    # probing after the full suite merged == one-shot batch operator
    process_probe_batch(docs, 0, state, out, min_hits=1)
    cols = ["doc_id", "n_ngrams", "n_bloom_hits", "bloom_frac", "is_contaminated"]
    stream = sorted(
        map(tuple, read_probe_reports(spark, out).select(*cols).collect())
    )
    batch = sorted(
        map(
            tuple,
            bloom_decontaminate(docs, ev1.union(ev2), min_hits=1)
            .select(*cols)
            .collect(),
        )
    )
    assert stream == batch


def test_flags_are_monotone_in_eval_progress(spark, tmp_path):
    docs, ev1, ev2 = _data(spark)
    state = str(tmp_path / "bloom_state")
    out1 = str(tmp_path / "r1")
    out2 = str(tmp_path / "r2")
    process_eval_bloom_batch(ev1, 0, state)
    process_probe_batch(docs, 0, state, out1, min_hits=1)
    h1 = {
        r.doc_id: r.n_bloom_hits
        for r in read_probe_reports(spark, out1).collect()
    }
    process_eval_bloom_batch(ev2, 1, state)
    process_probe_batch(docs, 0, state, out2, min_hits=1)
    h2 = {
        r.doc_id: r.n_bloom_hits
        for r in read_probe_reports(spark, out2).collect()
    }
    assert all(h2[d] >= h1[d] for d in h1)
    assert h1[3] == 0 and h2[3] > 0  # doc 3 flagged only once ev2 lands
    assert h1[4] == 0 and h2[4] == 0  # disjoint stays clean


def test_eval_replay_is_noop_and_uncommitted_recovers(spark, tmp_path):
    import os
    import shutil

    docs, ev1, ev2 = _data(spark)
    state = str(tmp_path / "bloom_state")
    process_eval_bloom_batch(ev1, 0, state)
    process_eval_bloom_batch(ev2, 1, state)
    before = sorted(r.pos for r in read_bloom_positions(spark, state).collect())
    # replay of a committed batch: no-op
    process_eval_bloom_batch(ev2, 1, state)
    after = sorted(r.pos for r in read_bloom_positions(spark, state).collect())
    assert before == after
    # torn write (no _SUCCESS) is invisible; the replay rewrites it
    torn = os.path.join(state, "v=2")
    os.makedirs(torn)
    assert read_bloom_positions(spark, state).count() == len(before)
    shutil.rmtree(torn)
    process_eval_bloom_batch(ev2, 2, state)
    assert sorted(
        r.pos for r in read_bloom_positions(spark, state).collect()
    ) == before  # ev2 re-merge adds nothing new


def test_probe_with_no_eval_state_reports_clean(spark, tmp_path):
    docs, _, _ = _data(spark)
    state = str(tmp_path / "empty_state")
    out = str(tmp_path / "reports")
    process_probe_batch(docs, 0, state, out, min_hits=1)
    rows = read_probe_reports(spark, out).collect()
    assert len(rows) == 4
    assert all(r.n_bloom_hits == 0 and not r.is_contaminated for r in rows)
