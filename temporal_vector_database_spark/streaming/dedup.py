"""Streaming corpus dedup against a growing signature store
(beyond-reference, SURVEY.md §7.5).

Documents stream in; each micro-batch is deduplicated against everything
seen so far via ``incremental_near_duplicate_pairs`` — only the batch is
shingled, history participates as its stored MinHash signatures. Each
near-dup pair is emitted exactly once: when its younger member arrives.

Idempotent under foreachBatch's at-least-once replay: every batch writes
its pairs and signatures to per-batch partitions (``batch=<id>/``) in
OVERWRITE mode, and reads of the store exclude the current batch id — a
replayed batch therefore recomputes against exactly the pre-batch store
and overwrites its own previous (possibly partial) output instead of
appending duplicates. On a production lake the same body would be a
transactional MERGE keyed by batch id.

This composes the two scale patterns the batch operators establish:
signature-store incrementality (per-batch cost ∝ batch) and LSH banding
(new-vs-all, never all-vs-all).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.dedup import (
    incremental_near_duplicate_pairs,
)


def _has_batches(path: str) -> bool:
    return os.path.isdir(path) and any(d.startswith("batch=") for d in os.listdir(path))


def read_signature_store(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current signature store (all committed batches; ``batch`` column =
    the micro-batch that contributed each row). None if empty."""
    if not _has_batches(state_dir):
        return None
    return spark.read.option("basePath", state_dir).parquet(
        os.path.join(state_dir, "batch=*")
    )


def process_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    output_dir: str,
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 2,
    width: int = 3,
    min_jaccard_est: float = 0.5,
) -> None:
    """One micro-batch: emit pairs vs the store, append signatures.
    Safe to re-invoke with the same ``batch_id`` (replay) — outputs are
    per-batch overwritten partitions and the store read excludes this
    batch's own (possibly partial) prior attempt."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    store = read_signature_store(spark, state_dir)
    if store is not None:
        existing = store.where(F.col("batch") != batch_id).drop("batch")
    else:
        from temporal_vector_database_spark.operators.dedup import minhash_signatures

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
    pairs.write.mode("overwrite").parquet(os.path.join(output_dir, f"batch={batch_id}"))
    new_sigs.write.mode("overwrite").parquet(os.path.join(state_dir, f"batch={batch_id}"))


def read_emitted_pairs(spark: SparkSession, output_dir: str) -> DataFrame | None:
    """All pairs emitted so far (union over committed batches)."""
    if not _has_batches(output_dir):
        return None
    return (
        spark.read.option("basePath", output_dir)
        .parquet(os.path.join(output_dir, "batch=*"))
        .drop("batch")
    )


def compact_signature_store(
    spark: SparkSession, state_dir: str, keep_last: int = 1
) -> int:
    """Fold committed per-batch signature partitions into the sentinel
    partition ``batch=-1`` — the small-files compaction a long-running
    stream needs (thousands of tiny ``batch=N`` dirs → one table scanable
    partition). Returns the number of batch partitions folded.

    The newest ``keep_last`` batch partitions are left in place: only a
    stream's LAST batch can ever be replayed (foreachBatch commits its
    checkpoint before moving on), and a replayed batch must still find
    its own rows excluded from store reads via the ``batch != id``
    filter — rows folded into the sentinel would defeat that. Run it
    between drains or on the fully committed prefix.
    """
    import shutil

    if not os.path.isdir(state_dir):
        return 0
    ids = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(state_dir)
        if d.startswith("batch=") and int(d.split("=", 1)[1]) >= 0
    )
    fold = ids[: len(ids) - keep_last] if keep_last > 0 else ids
    if not fold:
        return 0
    parts = [os.path.join(state_dir, f"batch={i}") for i in fold]
    existing_sentinel = os.path.join(state_dir, "batch=-1")
    if os.path.isdir(existing_sentinel):
        parts.append(existing_sentinel)
    merged = spark.read.parquet(*parts)
    tmp = os.path.join(state_dir, "_compact_tmp")
    merged.coalesce(max(1, merged.rdd.getNumPartitions() // 8)).write.mode(
        "overwrite"
    ).parquet(tmp)
    # swap: new sentinel in, folded partitions out
    if os.path.isdir(existing_sentinel):
        shutil.rmtree(existing_sentinel)
    os.replace(tmp, existing_sentinel)
    for i in fold:
        shutil.rmtree(os.path.join(state_dir, f"batch={i}"), ignore_errors=True)
    return len(fold)


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
    every document streamed (pinned in tests), including across replays
    (idempotency pinned in tests)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_dedup_batch(
            batch_df,
            batch_id,
            state_dir,
            output_dir,
            text_col,
            num_hashes,
            bands,
            width,
            min_jaccard_est,
        )

    q = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def compact_store_to_band_table(
    spark: SparkSession,
    state_dir: str,
    table_name: str,
    num_hashes: int = 8,
    bands: int = 4,
    buckets: int = 64,
) -> None:
    """Rebuild the serving-layout LSH band table
    (``operators.dedup.write_lsh_band_store``) from the stream's
    signature store — the second compaction tier:

        tier 1 (``compact_signature_store``): many tiny ``batch=N`` dirs
          → one sentinel partition (file-count hygiene, same schema);
        tier 2 (this): signature rows → band-exploded, tiling-salted,
          BUCKETED table, after which near-dup pair queries are
          scan → verify with zero exchanges.

    Run it on the committed prefix between drains (same replay caveat as
    tier 1). Idempotent: the table is overwritten atomically by Spark's
    saveAsTable(overwrite). Reading the result with
    ``near_dup_pairs_from_band_store`` equals a full recompute over every
    streamed document (pinned in tests).
    """
    from temporal_vector_database_spark.operators.dedup import write_lsh_band_store

    sigs = read_signature_store(spark, state_dir)
    if sigs is None:
        return
    write_lsh_band_store(
        sigs.drop("batch"), table_name, num_hashes=num_hashes, bands=bands, buckets=buckets
    )
