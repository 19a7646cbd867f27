"""Streaming maintenance of the time-travel snapshot export — the
incremental-materialized-view pattern at PARTITION grain (beyond-
reference; the batch sink is ``operators/maintenance.export_snapshot``).

A deployment serves trainers/index-builds from the materialized "state
as of now" table. Rebuilding it per micro-batch re-folds the whole
store; this module instead refreshes ONLY the hash buckets that contain
contents touched by the batch: per batch, (1) re-encode/merge handled
upstream writes new version rows, (2) the touched contents' buckets are
recomputed from the CURRENT versions table, and (3) each touched
``bucket=`` directory is overwritten atomically via dynamic partition
overwrite — untouched buckets never move, so maintenance cost is
``O(touched buckets × bucket size)``, not table size. That is precisely
how a partitioned MV refresh behaves on a lakehouse (Delta
`replaceWhere` / Hive dynamic-partition-overwrite semantics), built here
on plain parquet.

Idempotency: the refresh derives the bucket's FULL content from the
committed versions table, so replaying a micro-batch rewrites the same
bytes (foreachBatch redelivery is a no-op by value — pinned in tests),
the ``streaming/dedup.py`` overwrite discipline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SNAPSHOT_BUCKETS = 8


def _bucket(col, buckets: int = SNAPSHOT_BUCKETS):
    # The modulus MUST match the one used by export_snapshot for this
    # layout, else touched rows land in (and overwrite) the wrong
    # bucket= partitions while stale dupes persist in the right ones.
    return F.pmod(F.xxhash64(col), F.lit(int(buckets))).cast("int")


def refresh_snapshot_buckets(
    versions: DataFrame,
    touched_contents: DataFrame,
    snapshot_path: str,
    buckets: int = SNAPSHOT_BUCKETS,
) -> list[int]:
    """Recompute and overwrite ONLY the snapshot buckets containing
    ``touched_contents`` from the current ``versions`` table (latest
    state per content — the "as of now" snapshot). Returns the bucket
    ids refreshed. One reconstruction fold over the touched buckets'
    contents (bounded by batch locality, never the table), one dynamic
    partition overwrite."""
    from temporal_vector_database_spark.operators.reconstruct import (
        reconstruct_latest,
    )

    import shutil

    spark = versions.sparkSession
    tb = (
        touched_contents.select(
            _bucket(F.col("content_id"), buckets).alias("bucket")
        )
        .distinct()
        .collect()
    )
    bucket_ids = sorted(r.bucket for r in tb)
    if not bucket_ids:
        return []
    in_buckets = versions.where(
        _bucket(F.col("content_id"), buckets).isin(
            [int(b) for b in bucket_ids]
        )
    )
    snap = reconstruct_latest(in_buckets).select(
        "content_id", "target_seq", "base_seq", "cost", "embedding"
    )
    out = snap.withColumn("bucket", _bucket(F.col("content_id"), buckets))
    # Dynamic partition overwrite only rewrites partitions PRESENT in the
    # output. A touched bucket whose every content was deleted upstream
    # produces zero rows, so its stale directory must be removed
    # explicitly (k-row collect: bucket ids only).
    present = {
        r.bucket
        for r in out.select("bucket").distinct().collect()
    }
    for b in bucket_ids:
        if int(b) not in present:
            shutil.rmtree(
                os.path.join(snapshot_path, f"bucket={int(b)}"),
                ignore_errors=True,
            )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy("bucket").parquet(snapshot_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # keep the integrity manifest fresh at the same partition grain:
    # only the touched buckets' fingerprints recompute (pruned read)
    from temporal_vector_database_spark.operators.maintenance import (
        write_snapshot_manifest,
    )

    write_snapshot_manifest(
        spark,
        snapshot_path,
        buckets=int(buckets),
        only_buckets=[int(b) for b in bucket_ids],
    )
    return [int(b) for b in bucket_ids]


def process_snapshot_batch(
    batch_df: DataFrame,
    batch_id: int,
    versions_path: str,
    snapshot_path: str,
    buckets: int = SNAPSHOT_BUCKETS,
) -> None:
    """foreachBatch hook: after the upstream ingest committed the
    batch's version rows to ``versions_path``, refresh the snapshot
    buckets its contents live in. Value-idempotent under redelivery
    (the refresh reads committed state, not the batch payload)."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    versions = spark.read.parquet(versions_path)
    refresh_snapshot_buckets(
        versions, batch_df.select("content_id").distinct(), snapshot_path, buckets
    )
