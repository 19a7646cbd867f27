"""Streaming SCD2 maintenance (beyond-reference; the streaming twin of
``operators/temporal.py::scd2_intervals``).

Attribute updates arrive continuously — possibly LATE — and a mutable
SCD2 interval store stays equal to what a one-shot batch build over all
updates-so-far would produce (stream==batch pinned in tests).

Design: ``foreachBatch`` against two parquet stores —

* ``<store>_raw`` — the update log, partitioned by ``(batch, bucket)``.
  A replayed micro-batch rewrites exactly its own ``batch=<id>``
  partitions (the ``ivf_ingest`` seq-dir idempotency scheme), so
  at-least-once delivery cannot duplicate history. The raw log is
  REQUIRED for correctness, not convenience: change-compression
  decisions are neighbor-dependent, so a late row can resurrect an
  update the compressed interval table already folded away (raw
  ``a@10, a@20`` compresses to ``a@10``; late ``b@15`` must rebuild to
  ``a@10, b@15, a@20`` — unrecoverable from intervals alone). A
  production deployment prunes raw past its lateness watermark and
  freezes older intervals.
* ``<store>`` — the SCD2 intervals, partitioned by ``bucket =
  abs(hash(key)) % n_buckets``. Each batch rebuilds ONLY the keys it
  touches (full per-key history re-read, bounded by those keys' update
  counts), carries the untouched keys of the affected buckets, and
  dynamic-partition-overwrites just those buckets.

Not transactional across the read-modify-write (same caveat as
``ivf_store_compact``); a table format would wrap the commit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.temporal import scd2_intervals


def _bucket_expr(key_col: str, n_buckets: int):
    return (F.abs(F.hash(F.col(key_col))) % n_buckets).cast("int")


def process_scd2_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    key_col: str = "user_id",
    time_col: str = "ts_ms",
    attr_cols: tuple[str, ...] = ("event_type",),
    tiebreak_cols: tuple[str, ...] = ("event_id",),
    n_buckets: int = 16,
) -> None:
    """Apply one micro-batch of (possibly late) updates. Safe to replay
    with the same ``batch_id``; exact duplicate (key, time, tiebreak)
    rows within a batch are dropped."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    raw_dir = store_dir + "_raw"
    dedup_keys = [key_col, time_col, *tiebreak_cols]
    cols = [key_col, *tiebreak_cols, time_col, *attr_cols]
    batch = batch_df.select(*cols).dropDuplicates(dedup_keys)

    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # 1. persist this batch's raw slice into its OWN batch partitions
        (
            batch.withColumn("bucket", _bucket_expr(key_col, n_buckets))
            .withColumn("batch", F.lit(int(batch_id)).cast("long"))
            .write.mode("overwrite")
            .partitionBy("batch", "bucket")
            .parquet(raw_dir)
        )
        spark.catalog.refreshByPath(raw_dir)

        # 2. touched keys / buckets (bucket list is <= n_buckets ints)
        touched_keys = batch.select(key_col).distinct()
        touched_buckets = [
            r[0]
            for r in batch.select(
                _bucket_expr(key_col, n_buckets).alias("b")
            )
            .distinct()
            .collect()
        ]

        # 3. rebuild the touched keys from their FULL raw history
        #    (bucket filter prunes raw partitions before the semi-join)
        raw_all = (
            spark.read.option("basePath", raw_dir)
            .parquet(raw_dir)
            .where(F.col("bucket").isin(touched_buckets))
        )
        hist = (
            raw_all.join(touched_keys, key_col, "left_semi")
            .dropDuplicates(dedup_keys)
            .select(*cols)
        )
        rebuilt = scd2_intervals(
            hist,
            key_cols=(key_col,),
            time_col=time_col,
            attr_cols=attr_cols,
            tiebreak_cols=tiebreak_cols,
        ).withColumn("bucket", _bucket_expr(key_col, n_buckets))

        # 4. carry untouched keys of the affected buckets, overwrite them
        have_store = os.path.isdir(store_dir) and any(
            d.startswith("bucket=") for d in os.listdir(store_dir)
        )
        if have_store:
            cur = (
                spark.read.option("basePath", store_dir)
                .parquet(store_dir)
                .where(F.col("bucket").isin(touched_buckets))
            )
            out = cur.join(touched_keys, key_col, "left_anti").unionByName(rebuilt)
        else:
            out = rebuilt
        # cut lineage — the plan reads the directory the write replaces
        out = out.localCheckpoint(eager=True)
        out.write.mode("overwrite").partitionBy("bucket").parquet(store_dir)
        spark.catalog.refreshByPath(store_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)


def read_scd2_store(spark, store_dir: str) -> DataFrame:
    """The maintained interval table (drops the bucket partition col)."""
    return (
        spark.read.option("basePath", store_dir).parquet(store_dir).drop("bucket")
    )


def run_scd2_stream(
    update_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    **kwargs,
):
    """Wire an update stream into the SCD2 store. Returns the started
    StreamingQuery (caller awaits/stops)."""
    return (
        update_stream.writeStream.foreachBatch(
            lambda df, bid: process_scd2_batch(df, bid, store_dir, **kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
