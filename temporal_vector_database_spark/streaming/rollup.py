"""Streaming maintenance of the continuous aggregate (beyond-reference,
SURVEY.md §7.5).

Freshly encoded versions arrive as a stream; each micro-batch folds into
the parquet-backed rollup state with ``rollup_merge`` — the streaming
half of the hypertable-rollup pattern (``operators/rollup.py``). The
merge only ever touches rollup ROWS (contents × buckets), so per-batch
cost is proportional to the batch, never to history.

State versioning: each batch writes the merged state to a NEW directory
``v=<batch_id>/`` and readers take the highest committed version — the
directory being read is never overwritten (no localCheckpoint
materialize-then-clobber window; executor loss mid-write leaves the
previous version intact). This also makes foreachBatch's at-least-once
replay idempotent: a replayed batch sees highest-committed < batch_id
(its own partial write has no ``_SUCCESS``), recomputes from the
pre-batch state and overwrites only its own version dir; a batch whose
version is already committed is skipped, so nothing is double-merged.
On a production lake the same body would be a transactional MERGE INTO
keyed by (content_id, bucket_start) with batch id dedup — the
mergeable-partial-state design is what makes either sink work.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from temporal_vector_database_spark.operators.rollup import rollup_merge, version_rollup
from temporal_vector_database_spark.streaming._state import committed_versions, replay_guard


def _committed_versions(state_dir: str) -> list[int]:
    return committed_versions(state_dir)


def read_rollup_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The current (highest committed version) rollup state, or None."""
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))


def process_rollup_batch(
    batch_df: DataFrame, batch_id: int, state_dir: str, bucket: str = "day"
) -> None:
    """One micro-batch: merge into a new state version. Re-invoking with
    the same ``batch_id`` (replay) is a no-op if that version committed,
    else recomputes from the pre-batch state."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    vs = _committed_versions(state_dir)
    if replay_guard(vs, batch_id, state_dir):
        return
    prev = spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}")) if vs else None
    merged = (
        rollup_merge(prev, batch_df, bucket) if prev is not None else version_rollup(batch_df, bucket)
    )
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, f"v={batch_id}"))
    # GC: the new version and its predecessor (replay safety net) suffice
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def run_rollup_stream(
    version_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    bucket: str = "day",
) -> None:
    """Drain available version batches (Trigger.AvailableNow), maintaining
    the rollup state at ``state_dir``. After the drain, the state equals
    ``version_rollup`` over everything streamed so far (pinned in tests),
    including across replays (idempotency pinned in tests)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_rollup_batch(batch_df, batch_id, state_dir, bucket)

    q = (
        version_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
