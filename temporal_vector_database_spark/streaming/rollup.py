"""Streaming maintenance of the continuous aggregate (beyond-reference,
SURVEY.md §7.5).

Freshly encoded versions arrive as a stream; each micro-batch folds into
the parquet-backed rollup state with ``rollup_merge`` — the streaming
half of the hypertable-rollup pattern (``operators/rollup.py``). The
merge only ever touches rollup ROWS (contents × buckets), so per-batch
cost is proportional to the batch, never to history.

State swap: the state table is tiny relative to the raw stream (one row
per content × bucket), so each batch materializes the merged state and
overwrites the directory. On a production lake the same ``foreachBatch``
body would be a Delta/Iceberg MERGE INTO keyed by (content_id,
bucket_start) — the mergeable-partial-state design is what makes either
sink work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from temporal_vector_database_spark.operators.rollup import rollup_merge, version_rollup


def run_rollup_stream(
    version_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    bucket: str = "day",
) -> None:
    """Drain available version batches (Trigger.AvailableNow), maintaining
    the rollup state at ``state_dir``. After the drain, the state equals
    ``version_rollup`` over everything streamed so far (pinned in tests)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            merged = rollup_merge(spark.read.parquet(state_dir), batch_df, bucket)
        else:
            merged = version_rollup(batch_df, bucket)
        # materialize BEFORE overwriting the directory being read from
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(state_dir)

    q = (
        version_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
