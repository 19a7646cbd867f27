"""Streaming ingest into the incrementally-maintained IVF store
(beyond-reference; the streaming twin of ``operators/ivf_store.py``).

Vector upserts and deletes arrive as a stream; each micro-batch is
applied through ``foreachBatch`` as one delta/tombstone write against
the store — the index serves merge-on-read throughout, and periodic
``ivf_store_compact`` folds history exactly as in batch.

Sequencing & idempotency: batch ``b`` applies its deletes at seq
``2b + 1`` and its upserts at seq ``2b + 2`` — so within a batch an
upsert of a deleted vid wins (the standard apply-deletes-then-upserts
micro-batch contract), across batches later batches win, and a REPLAYED
batch (foreachBatch is at-least-once) rewrites its own seq directories
in overwrite mode instead of stacking new history. State after replay
is byte-identical, pinned in tests.

Ordering contract: correctness of latest-wins relies on batch ids being
applied in order per vid, which Structured Streaming guarantees
(micro-batches are sequential).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.ivf_store import (
    ivf_store_delete,
    ivf_store_upsert,
)


def process_ivf_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    op_col: str = "op",
) -> None:
    """Apply one micro-batch of index maintenance. Rows carry ``op``
    ('upsert' | 'delete'); a batch without the column is all-upserts.
    Safe to re-invoke with the same ``batch_id`` (replay overwrites)."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    has_op = op_col in batch_df.columns
    dels = (
        batch_df.where(F.col(op_col) == "delete").select(id_col)
        if has_op
        else None
    )
    ups = batch_df.where(F.col(op_col) == "upsert") if has_op else batch_df
    if dels is not None and not dels.isEmpty():
        ivf_store_delete(spark, store_path, dels, id_col=id_col, seq=2 * batch_id + 1)
    if not ups.isEmpty():
        ivf_store_upsert(
            spark,
            store_path,
            ups.select(id_col, emb_col),
            id_col=id_col,
            emb_col=emb_col,
            seq=2 * batch_id + 2,
        )


def run_ivf_ingest_stream(
    maintenance_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    op_col: str = "op",
):
    """Wire a maintenance stream into the store. Returns the started
    StreamingQuery (caller awaits/stops)."""
    return (
        maintenance_stream.writeStream.foreachBatch(
            lambda df, bid: process_ivf_ingest_batch(
                df, bid, store_path, id_col=id_col, emb_col=emb_col, op_col=op_col
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
