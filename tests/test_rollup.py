"""Continuous-aggregate rollup: incremental merge must equal a full
rebuild, on any split of the input into append batches."""

from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.rollup import (
    rollup_merge,
    rollup_report,
    version_rollup,
)


def _canon(report_df):
    return {
        (r.content_id, r.bucket_start): tuple(
            r[c]
            for c in (
                "n_versions",
                "n_bases",
                "n_deltas",
                "avg_magnitude",
                "max_magnitude",
                "avg_dims_changed",
            )
        )
        for r in report_df.collect()
    }


def test_incremental_merge_equals_full_rebuild(versions):
    full = _canon(rollup_report(version_rollup(versions)))
    assert len(full) > 0

    # split by sequence: initial load = seq <= 6, appended batch = rest —
    # the merge path sees partially-filled buckets on both sides
    first = versions.where(F.col("seq") <= 6)
    rest = versions.where(F.col("seq") > 6)
    incr = rollup_merge(version_rollup(first), rest)
    assert _canon(rollup_report(incr)) == full

    # three-way split, merged twice (associativity of the state)
    a = versions.where(F.col("seq") <= 3)
    b = versions.where((F.col("seq") > 3) & (F.col("seq") <= 9))
    c = versions.where(F.col("seq") > 9)
    incr2 = rollup_merge(rollup_merge(version_rollup(a), b), c)
    assert _canon(rollup_report(incr2)) == full


def test_base_only_buckets_have_null_delta_stats(versions):
    rep = rollup_report(version_rollup(versions.where(F.col("kind") == "base")))
    for r in rep.collect():
        assert r.n_deltas == 0 and r.avg_magnitude is None and r.max_magnitude is None


def test_streaming_rollup_equals_full_rebuild(spark, versions, tmp_path):
    """Stream the versions table file-by-file (maxFilesPerTrigger=1 →
    multiple micro-batches); the maintained state must equal a one-shot
    full rebuild over the same rows."""
    from temporal_vector_database_spark.streaming.rollup import run_rollup_stream

    src = str(tmp_path / "src")
    # three append batches, distinct files, partially overlapping buckets
    versions.where(F.col("seq") <= 4).coalesce(1).write.mode("append").parquet(src)
    versions.where((F.col("seq") > 4) & (F.col("seq") <= 8)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    versions.where(F.col("seq") > 8).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(versions.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    run_rollup_stream(stream, state, str(tmp_path / "ckpt"))

    from temporal_vector_database_spark.streaming.rollup import read_rollup_state

    got = _canon(rollup_report(read_rollup_state(spark, state)))
    want = _canon(rollup_report(version_rollup(versions)))
    assert got == want and len(got) > 0


def test_rollup_batch_replay_is_idempotent(spark, versions, tmp_path):
    """foreachBatch is at-least-once: re-invoking a batch with the same
    batch_id (crash-before-checkpoint replay) must not double-merge, and
    the pre-batch state version must survive until the batch commits."""
    from temporal_vector_database_spark.streaming.rollup import (
        process_rollup_batch,
        read_rollup_state,
    )

    state = str(tmp_path / "state")
    b0 = versions.where(F.col("seq") <= 6)
    b1 = versions.where(F.col("seq") > 6)
    process_rollup_batch(b0, 0, state)
    process_rollup_batch(b1, 1, state)
    process_rollup_batch(b1, 1, state)  # replay of committed batch: no-op
    got = _canon(rollup_report(read_rollup_state(spark, state)))
    want = _canon(rollup_report(version_rollup(versions)))
    assert got == want and len(got) > 0
