"""Streaming similarity search (beyond-reference, SURVEY.md §7.5).

Queries arrive as a stream; each micro-batch is scored against the
MATERIALIZED search index (``operators/search.build_search_index``) via
``foreachBatch`` — the standard Spark pattern for stream-vs-static-batch
operations that need full batch semantics (per-query top-k windows aren't
expressible as an incremental streaming aggregate).

This is the serving-adjacent path: the index is built once per refresh
(e.g. on a schedule from the ``versions`` table), queries stream in, each
batch pays one broadcast join. True low-latency point serving belongs in a
specialized ANN service; this operator covers the bulk/near-line tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from temporal_vector_database_spark.operators.search import topk_cosine_indexed


def run_search_stream(
    query_stream: DataFrame,
    index: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    k: int | None = None,
) -> None:
    """Drain available query batches (Trigger.AvailableNow), writing
    per-query top-k results to ``output_dir``. Results are byte-identical
    to running ``topk_cosine_indexed`` on the same queries in batch."""

    def process(batch_df: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        if batch_df.isEmpty():
            return
        topk_cosine_indexed(index, batch_df, k=k).write.mode("append").parquet(output_dir)

    q = (
        query_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
