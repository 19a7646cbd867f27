"""Streaming corpus dedup against a growing signature store
(beyond-reference, SURVEY.md §7.5).

Documents stream in; each micro-batch is deduplicated against everything
seen so far via ``incremental_near_duplicate_pairs`` — only the batch is
shingled, history participates as its stored MinHash signatures. Each
near-dup pair is emitted exactly once: when its younger member arrives.

This composes the two scale patterns the batch operators establish:
signature-store incrementality (per-batch cost ∝ batch) and LSH banding
(new-vs-all, never all-vs-all). The state directory is an append-only
signature table — on a production lake, a partitioned table the stream
appends to.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from temporal_vector_database_spark.operators.dedup import (
    incremental_near_duplicate_pairs,
    minhash_signatures,
)


def run_dedup_stream(
    doc_stream: DataFrame,
    state_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 2,
    width: int = 3,
    min_jaccard_est: float = 0.5,
) -> None:
    """Drain available document batches (Trigger.AvailableNow): per batch,
    emit near-dup pairs vs the signature store to ``output_dir`` and
    append the batch's signatures to ``state_dir``. After the drain, the
    union of emitted pairs equals a one-shot ``near_duplicate_pairs`` over
    every document streamed (pinned in tests)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            existing = spark.read.parquet(state_dir)
        else:
            existing = minhash_signatures(batch_df.limit(0), text_col, num_hashes, width)
        pairs, new_sigs = incremental_near_duplicate_pairs(
            existing,
            batch_df,
            text_col,
            num_hashes,
            bands,
            width,
            min_jaccard_est,
        )
        pairs.write.mode("append").parquet(output_dir)
        new_sigs.write.mode("append").parquet(state_dir)

    q = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
