"""Streaming similarity-query serving (beyond-reference, SURVEY.md §7.5).

Queries arrive as a stream; each micro-batch is scored against a STATIC
index via ``foreachBatch`` — the standard Spark pattern for
stream-vs-static operations that need full batch semantics (per-query
top-k windows aren't expressible as an incremental streaming aggregate).

Two index forms, one entry point:

- ``index`` as a **DataFrame**: the materialized exact-cosine index
  (``operators/search.build_search_index``) — every batch pays one
  broadcast join, bit-identical to batch ``topk_cosine_indexed``.
- ``index`` as a **path**: the persisted partitioned IVF layout
  (``operators/search.write_ivf_index``) — probes prune to their
  ``centroid_id=`` directories; approximate, bit-identical to batch
  ``ivf_topk`` on the same data.

Idempotent under foreachBatch's at-least-once replay: results land in
per-batch ``batch=<id>/`` partitions in OVERWRITE mode (same scheme as
``streaming.dedup``), so a replayed batch rewrites its own output
instead of duplicating rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def process_search_batch(
    batch_df: DataFrame,
    batch_id: int,
    index: DataFrame | str,
    output_dir: str,
    k: int | None = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """One micro-batch of queries → per-batch top-k output partition.
    Safe to re-invoke with the same ``batch_id`` (replay overwrites)."""
    if batch_df.isEmpty():
        return
    if isinstance(index, str):
        from temporal_vector_database_spark.operators.search import ivf_topk_persisted

        res = ivf_topk_persisted(
            batch_df.sparkSession,
            index,
            batch_df,
            k=k if k is not None else 10,
            nprobe=nprobe,
            id_col=id_col,
            emb_col=emb_col,
        )
    else:
        from temporal_vector_database_spark.operators.search import topk_cosine_indexed

        res = topk_cosine_indexed(index, batch_df, k=k)
    res.write.mode("overwrite").parquet(os.path.join(output_dir, f"batch={batch_id}"))


def read_search_results(spark: SparkSession, output_dir: str) -> DataFrame | None:
    """All results served so far (union over committed batches)."""
    if not (
        os.path.isdir(output_dir)
        and any(d.startswith("batch=") for d in os.listdir(output_dir))
    ):
        return None
    return (
        spark.read.option("basePath", output_dir)
        .parquet(os.path.join(output_dir, "batch=*"))
        .drop("batch")
    )


def run_search_stream(
    query_stream: DataFrame,
    index: DataFrame | str,
    output_dir: str,
    checkpoint_dir: str,
    k: int | None = None,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Drain available query batches (Trigger.AvailableNow) against the
    static index (exact-cosine DataFrame or persisted-IVF path). After
    the drain, the union of served results equals the one-shot batch
    query over every query streamed (pinned in tests for both modes)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_search_batch(
            batch_df, batch_id, index, output_dir, k, nprobe, id_col, emb_col
        )

    q = (
        query_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
