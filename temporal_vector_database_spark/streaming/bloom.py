"""Streaming Bloom-filter decontamination (beyond-reference): the
continuous twin of ``operators/bloomfilter.py`` for a GROWING benchmark
suite.

Two coupled micro-batch processors:

- **Eval side** (``process_eval_bloom_batch``): new benchmark documents
  arrive; their n-gram bit positions fold into the positions state by
  union-distinct — a set union, hence associative and order-insensitive,
  so any batching of the same eval corpus commits the identical state.
  State is versioned (``v=<batch_id>`` + ``_SUCCESS``, the
  ``streaming/rollup.py`` discipline): replayed batches recompute from
  the pre-batch version and overwrite only their own directory — no
  double-merge, no torn reads.
- **Corpus side** (``process_probe_batch``): each document batch is
  probed against the bitset packed from the HIGHEST COMMITTED positions
  version, writing its report to a per-batch OVERWRITE partition
  (replay-idempotent). The probe itself is the batch operator's
  shuffle-free Arrow scan — per-batch cost is the batch, never history.

Monotonicity contract: Bloom set-bits only ever grow, so a document's
``n_bloom_hits`` is non-decreasing in eval progress — a doc cleared
against eval-so-far may be flagged later (re-probe on suite updates),
but a flag never silently un-flags. Probing after ALL eval batches have
merged equals the one-shot ``bloom_decontaminate`` on the full eval set
bit-for-bit (pinned in tests), because the positions state is exactly
``eval_bloom_positions`` of the union.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from temporal_vector_database_spark.operators.bloomfilter import (
    NUM_BITS,
    NUM_HASHES,
    bloom_probe,
    eval_bloom_positions,
    positions_to_bitset,
)
from temporal_vector_database_spark.streaming._state import committed_versions, replay_guard


def _committed_versions(state_dir: str) -> list[int]:
    return committed_versions(state_dir)


def read_bloom_positions(
    spark: SparkSession, state_dir: str
) -> DataFrame | None:
    """The current (highest committed version) positions state, or None
    when no eval batch has committed yet."""
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))


def process_eval_bloom_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    text_col: str = "text",
    n: int = 3,
    num_bits: int = NUM_BITS,
    num_hashes: int = NUM_HASHES,
) -> None:
    """Fold one eval micro-batch's bit positions into the state. Replay
    of a committed batch is a no-op; an uncommitted replay recomputes
    from the pre-batch version."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    vs = _committed_versions(state_dir)
    if replay_guard(vs, batch_id, state_dir):
        return
    new_pos = eval_bloom_positions(batch_df, text_col, n, num_bits, num_hashes)
    prev = (
        spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))
        if vs
        else None
    )
    merged = new_pos if prev is None else prev.union(new_pos).distinct()
    merged.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"v={batch_id}")
    )
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def process_probe_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    output_dir: str,
    text_col: str = "text",
    n: int = 3,
    num_bits: int = NUM_BITS,
    num_hashes: int = NUM_HASHES,
    min_hits: int = 2,
    id_col: str = "doc_id",
) -> None:
    """Probe one document micro-batch against the committed filter and
    write its report to a per-batch overwrite partition. With no
    committed eval state the filter is empty — every doc reports clean
    (a miss is a guaranteed non-overlap of eval-so-far)."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    pos = read_bloom_positions(spark, state_dir)
    bits = positions_to_bitset(
        (r.pos for r in pos.collect()) if pos is not None else (), num_bits
    )
    report = bloom_probe(
        batch_df, bits, text_col, n, num_bits, num_hashes, min_hits, id_col
    )
    report.write.mode("overwrite").parquet(
        os.path.join(output_dir, f"batch={batch_id}")
    )


def read_probe_reports(
    spark: SparkSession, output_dir: str
) -> DataFrame | None:
    if not os.path.isdir(output_dir) or not any(
        d.startswith("batch=") for d in os.listdir(output_dir)
    ):
        return None
    return spark.read.parquet(output_dir)


def run_eval_bloom_stream(
    eval_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> None:
    """Drain available eval batches (Trigger.AvailableNow), maintaining
    the positions state via ``process_eval_bloom_batch``."""
    (
        eval_stream.writeStream.foreachBatch(
            lambda df, bid: process_eval_bloom_batch(df, bid, state_dir, **kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
