"""Streaming maintenance of the DSIR importance model — the streaming
half of ``operators/dsir.py``.

The model's sufficient statistic (per-bucket hashed-gram counts for the
target and raw corpora) is PURELY ADDITIVE, so maintenance is the
simplest state discipline in the repo: each document micro-batch
aggregates to its own ``n_buckets``-row count table and folds in by
integer sum — per-batch cost ∝ batch size + n_buckets, never corpus
history, and the fold commutes (any batching order commits identical
state). λ and document weights are derived on the READ side from the
committed counts (``lambda_from_counts``), so scoring always uses the
freshest model without rebuilding anything.

State versioning: the ``v=<batch_id>`` commit scheme of
``streaming/ohlc.py`` — replays of a committed batch are no-ops.
Separate state dirs for the target and raw models (they usually grow
at very different rates; the eval/target set may even be static).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.dsir import bucket_counts
from temporal_vector_database_spark.streaming._state import committed_versions, replay_guard


def _committed_versions(state_dir: str) -> list[int]:
    return committed_versions(state_dir)


def read_counts_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The current committed (bucket, c) model counts, or None."""
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))


def process_dsir_counts_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold one document micro-batch into the model counts state."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    vs = _committed_versions(state_dir)
    if replay_guard(vs, batch_id, state_dir):
        return
    delta = bucket_counts(batch_df, n_buckets, id_col, text_col)
    prev = spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}")) if vs else None
    merged = (
        delta
        if prev is None
        else prev.unionByName(delta)
        .groupBy("bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, f"v={batch_id}"))
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def run_dsir_counts_stream(
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> None:
    """Drain available document batches (Trigger.AvailableNow) into the
    counts state; afterwards ``lambda_from_counts`` over the committed
    target/raw states is BIT-IDENTICAL to the one-shot
    ``dsir_lambda_table`` over everything streamed (pinned in tests)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_dsir_counts_batch(batch_df, batch_id, state_dir, **kwargs)

    q = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dsir_select_from_state(
    spark: SparkSession,
    raw_state_dir: str,
    target_state_dir: str,
    docs: DataFrame,
    k: int,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame | None:
    """Top-``k`` DSIR selection SERVED from the two maintained model
    count states (r11): λ derives from the committed raw/target bucket
    counts (``lambda_from_counts`` — the shared read side), candidate
    ``docs`` are scored with the batch op's own scoring half
    (``operators/dsir.py weights_from_lambda``), so self-selecting the
    streamed corpus is bit-equal to the batch ``dsir_select``. None
    before either state's first commit. The λ table is pinned — it is
    ``n_buckets`` rows and every reference re-reads both state
    parquets and re-aggregates the totals."""
    from temporal_vector_database_spark.operators.dsir import (
        lambda_from_counts,
        weights_from_lambda,
    )

    rc = read_counts_state(spark, raw_state_dir)
    tc = read_counts_state(spark, target_state_dir)
    if rc is None or tc is None:
        return None
    lam = lambda_from_counts(spark, tc, rc, n_buckets).localCheckpoint()
    w = weights_from_lambda(docs, lam, n_buckets, id_col, text_col)
    return w.orderBy(F.desc("weight_units"), F.asc(id_col)).limit(int(k))
