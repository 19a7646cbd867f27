"""Streaming ANN query serving against a persisted IVF index
(beyond-reference, SURVEY.md §7.5).

Queries arrive as a stream; each micro-batch is routed against the
``write_ivf_index`` layout (centroid table broadcast, probed inverted
lists read via partition pruning) and the batch's top-k results land in
a per-batch output partition. This is the serving half of the
build-once/serve-many pattern: the index build is a batch job, the
query path never rescans or reshuffles the corpus — per batch it reads
only the probed ``centroid_id=`` directories.

Idempotent under foreachBatch's at-least-once replay: results are
written to ``batch=<id>/`` in OVERWRITE mode, so a replayed batch
rewrites its own output instead of duplicating rows (same scheme as
``streaming.dedup``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def process_search_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    output_dir: str,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """One micro-batch of queries → per-batch top-k output partition.
    Safe to re-invoke with the same ``batch_id`` (replay overwrites)."""
    if batch_df.isEmpty():
        return
    from temporal_vector_database_spark.operators.search import ivf_topk_persisted

    res = ivf_topk_persisted(
        batch_df.sparkSession,
        index_path,
        batch_df,
        k=k,
        nprobe=nprobe,
        id_col=id_col,
        emb_col=emb_col,
    )
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
    index_path: str,
    output_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Drain available query batches (Trigger.AvailableNow) against the
    persisted IVF index. After the drain, the union of served results
    equals a one-shot ``ivf_topk`` over every query streamed (pinned in
    tests — the persisted path is bit-equal to the in-memory one)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_search_batch(
            batch_df, batch_id, index_path, output_dir, k, nprobe, id_col, emb_col
        )

    q = (
        query_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
