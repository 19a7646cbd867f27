"""Structured Streaming ingest (beyond-reference extension, SURVEY.md §7.5).

The reference is strictly batch (SURVEY.md §2.2: streaming ABSENT); this
module adds the streaming write path a production deployment would want:
version events arrive continuously, and each content's timeline is
delta-encoded incrementally with the SAME policy as the batch path
(``operators/ingest.py``) — sequence assignment, ``abs(Δ) >= 0.01``
sparsification, interval/sparsity/gap base promotion.

Engine design: ``applyInPandasWithState`` keyed by ``content_id`` carries
(last_seq, last_base_seq, reconstructed embedding) across micro-batches, so
a delta in batch N+1 is computed against the reconstruction of the last
version seen in batch N — byte-identical to what the batch encoder
produces for the concatenated input (test-verified). State size is one
float64 vector + two ints per live content; state is partitioned by key
across executors, so the operator scales horizontally with content count.

Ordering contract: events for one content must arrive time-ordered across
micro-batches (within a batch they are sorted). A production deployment
puts a watermark + re-sequencing buffer in front when the transport can
reorder; the encoding operator itself is transport-agnostic.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from temporal_vector_database_spark.config import DEFAULT_CONFIG, TVDBConfig
from temporal_vector_database_spark.operators.ingest import _delta_meta, _user_meta

RAW_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
        T.StructField("force_base", T.BooleanType()),
        T.StructField("base_interval", T.IntegerType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.StringType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("kind", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
        T.StructField("sparse_idx", T.ArrayType(T.IntegerType())),
        T.StructField("sparse_val", T.ArrayType(T.DoubleType())),
        T.StructField("from_seq", T.IntegerType()),
        T.StructField("magnitude", T.DoubleType()),
        T.StructField("n_changed", T.IntegerType()),
        T.StructField("total_dims", T.IntegerType()),
        T.StructField("version_id", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

# per-content carried state: last assigned seq, last base seq, reconstruction
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_seq", T.IntegerType()),
        T.StructField("last_base_seq", T.IntegerType()),
        T.StructField("recon", T.ArrayType(T.DoubleType())),
    ]
)


def _encode_group(cfg: TVDBConfig):
    threshold = cfg.sparsity_threshold
    promo = cfg.base_promotion_sparsity_threshold
    gap_factor = cfg.base_gap_factor
    default_interval = cfg.base_snapshot_interval

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (content_id,) = key
        if state.exists:
            last_seq, last_base_seq, recon_list = state.get
            recon = np.asarray(recon_list, dtype=np.float64)
        else:
            last_seq, last_base_seq, recon = 0, 0, None

        out: dict[str, list] = {f.name: [] for f in OUTPUT_SCHEMA.fields}
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            metas = pdf["metadata"] if "metadata" in pdf.columns else [None] * len(pdf)
            for ts, emb, force, interval, meta in zip(
                pdf["ts"], pdf["embedding"], pdf["force_base"], pdf["base_interval"], metas
            ):
                interval = int(interval) if pd.notna(interval) else default_interval
                raw_vec = np.asarray(emb, dtype=np.float64)
                dim = raw_vec.shape[0]
                seq = last_seq + 1
                if seq == 1 or bool(force):
                    is_base, diff, changed = True, None, None
                else:
                    diff = raw_vec - recon
                    changed = np.abs(diff) >= threshold
                    ratio = float(changed.sum()) / dim
                    is_base = (
                        ((seq - 1) % interval == 0)
                        or (ratio > promo)
                        or ((seq - last_base_seq) > gap_factor * interval)
                    )
                out["content_id"].append(content_id)
                out["seq"].append(seq)
                out["ts"].append(ts)
                out["total_dims"].append(dim)
                if is_base:
                    out["kind"].append("base")
                    out["embedding"].append(raw_vec)
                    out["sparse_idx"].append(None)
                    out["sparse_val"].append(None)
                    out["from_seq"].append(None)
                    out["magnitude"].append(None)
                    out["n_changed"].append(None)
                    out["version_id"].append(
                        f"{content_id}_{int(pd.Timestamp(ts).value // 1000)}"
                    )
                    out["metadata"].append(_user_meta(meta) or None)
                    recon = raw_vec.copy()
                    last_base_seq = seq
                else:
                    idx = np.nonzero(changed)[0]
                    vals = diff[idx]
                    out["kind"].append("delta")
                    out["embedding"].append(None)
                    out["sparse_idx"].append(idx.astype(np.int32))
                    out["sparse_val"].append(vals)
                    out["from_seq"].append(seq - 1)
                    out["magnitude"].append(float(math.sqrt(float((diff * diff).sum()))))
                    out["n_changed"].append(int(idx.shape[0]))
                    out["version_id"].append(f"{content_id}_v{seq}")
                    out["metadata"].append(_delta_meta(_user_meta(meta), int(idx.shape[0]), dim))
                    recon = recon.copy()
                    recon[idx] += vals
                last_seq = seq

        state.update((int(last_seq), int(last_base_seq), [float(x) for x in recon]))
        yield pd.DataFrame(out)

    return fn


def stream_encode_versions(
    events: DataFrame, cfg: TVDBConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Streaming O1+O2+O3: stateful per-content delta encoding.

    ``events`` is a STREAMING DataFrame with RAW_EVENT_SCHEMA columns
    (``force_base``/``base_interval`` optional).
    """
    from pyspark.sql import functions as F

    cols = set(events.columns)
    if "force_base" not in cols:
        events = events.withColumn("force_base", F.lit(False))
    if "base_interval" not in cols:
        events = events.withColumn(
            "base_interval", F.lit(cfg.base_snapshot_interval).cast("int")
        )
    return events.groupBy("content_id").applyInPandasWithState(
        _encode_group(cfg),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def read_version_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of raw version events (parquet drops)."""
    reader = spark.readStream.schema(RAW_EVENT_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.load(input_dir)


def run_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: TVDBConfig = DEFAULT_CONFIG,
) -> None:
    """Drain all currently-available files into the versions table
    (Trigger.AvailableNow), carrying encoder state in the checkpoint —
    repeated invocations continue each content's timeline."""
    events = read_version_stream(spark, input_dir)
    encoded = stream_encode_versions(events, cfg)
    q = (
        encoded.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def process_ooo_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    cfg: TVDBConfig = DEFAULT_CONFIG,
    policy: DataFrame | None = None,
) -> None:
    """Out-of-order-tolerant foreachBatch ingest into a MUTABLE versions
    store (parquet, partitioned by ``content_id``) — the repair-capable
    twin of the in-order stateful encoder above, built on
    ``operators.ingest.ingest_late``.

    Per batch: rows at-or-after their content's stored tail append
    incrementally (``append_versions``); rows arriving BEFORE the tail
    trigger a bounded ``ingest_late`` re-encode of just their contents.
    Either way the batch rewrites the COMPLETE chains of exactly the
    touched contents via dynamic partition overwrite — bounded by the
    batch (chains are short by construction: the base-interval policy
    caps chain length), idempotent under replay, and a no-op for
    exact (content_id, ts) redeliveries (at-least-once transports
    redeliver; a version IS its (content, instant)).

    Not transactional across the read-modify-write (same caveat as
    ``ivf_store_compact``); a table format would wrap the commit.
    """
    import os

    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.ingest import (
        append_versions,
        ingest,
        ingest_late,
    )

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    batch = batch_df.dropDuplicates(["content_id", "ts"])
    have_store = os.path.isdir(store_dir) and any(
        d.startswith("content_id=") for d in os.listdir(store_dir)
    )
    if not have_store:
        chains = ingest(batch, cfg)
    else:
        stored = spark.read.option("basePath", store_dir).parquet(store_dir)
        touched = stored.join(
            batch.select("content_id").distinct(), "content_id", "left_semi"
        )
        # exact redelivery: drop rows whose (content_id, ts) already exists
        batch = batch.join(
            touched.select("content_id", "ts"), ["content_id", "ts"], "left_anti"
        )
        if batch.isEmpty():
            return
        tails = touched.groupBy("content_id").agg(F.max("ts").alias("_tail_ts"))
        b = batch.join(tails, "content_id", "left")
        inorder = b.where(F.col("_tail_ts").isNull() | (F.col("ts") > F.col("_tail_ts"))).drop("_tail_ts")
        late = b.where(F.col("ts") <= F.col("_tail_ts")).drop("_tail_ts")
        chains = touched
        if not inorder.isEmpty():
            chains = chains.unionByName(
                append_versions(touched, inorder, cfg), allowMissingColumns=True
            )
        if not late.isEmpty():
            late_ids = late.select("content_id").distinct()
            repaired = ingest_late(
                chains.join(late_ids, "content_id", "left_semi"),
                late.select("content_id", "ts", "embedding"),
                cfg,
                policy=policy,
            )
            chains = chains.join(late_ids, "content_id", "left_anti").unionByName(
                repaired, allowMissingColumns=True
            )
    # rewrite the touched contents' full chains; cut lineage first (the
    # plan reads the directory the write replaces)
    chains = chains.select(
        "content_id", "seq", "ts", "kind", "embedding", "sparse_idx",
        "sparse_val", "from_seq", "magnitude", "n_changed", "total_dims",
        "version_id", "metadata",
    ).localCheckpoint(eager=True)
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        chains.write.mode("overwrite").partitionBy("content_id").parquet(store_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    spark.catalog.refreshByPath(store_dir)


def run_ooo_ingest_stream(
    event_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    cfg: TVDBConfig = DEFAULT_CONFIG,
):
    """Wire a (possibly out-of-order) raw-version stream into the
    mutable store. Returns the started StreamingQuery."""
    return (
        event_stream.writeStream.foreachBatch(
            lambda df, bid: process_ooo_ingest_batch(df, bid, store_dir, cfg)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
