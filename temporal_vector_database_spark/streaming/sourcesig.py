"""Streaming maintenance of the cross-source overlap signatures
(``operators/dedup.source_overlap``'s estimator half).

The source-level MinHash signature is a pure MIN-aggregate per (source,
hash slice) — associative, commutative, and IDEMPOTENT. That last
property makes this the simplest state in the whole streaming family:
folding a replayed micro-batch re-applies ``min`` over values already
absorbed and changes nothing, so the versioned-commit replay machinery
(``streaming/_state.py``) is unnecessary BY ALGEBRA — a plain
read-merge-overwrite per batch is exactly-once by value under any
redelivery. (Contrast: counters/sums need the ``v=<batch_id>`` scheme
because addition is not idempotent.)

Serving: pairwise source overlap estimates from the maintained
signature table — #sources² tiny rows, no corpus rescan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_HASHES = 8


def _batch_signatures(
    batch_df: DataFrame, text_col: str, source_col: str, width: int
) -> DataFrame:
    digs = (
        f"transform(sequence(1, greatest(length({text_col}) - {width - 1}, 1)),"
        f" i -> md5(substring({text_col}, i, {width})))"
    )
    ex = batch_df.select(
        F.col(source_col).alias("src"), F.explode(F.expr(digs)).alias("dig")
    )
    return ex.groupBy("src").agg(
        *[
            F.min(F.substring("dig", 1 + 4 * h, 4)).alias(f"mh_{h}")
            for h in range(N_HASHES)
        ]
    )


def process_source_sig_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    text_col: str = "text",
    source_col: str = "source",
    width: int = 3,
) -> None:
    """Fold one document micro-batch's per-source minima into the
    signature state. Idempotent under replay by the algebra of ``min``
    (re-minimizing absorbed values is a no-op) — no version ledger
    needed."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    part = _batch_signatures(batch_df, text_col, source_col, width)
    if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
        prev = spark.read.parquet(state_dir)
        part = (
            prev.unionByName(part)
            .groupBy("src")
            .agg(*[F.min(f"mh_{h}").alias(f"mh_{h}") for h in range(N_HASHES)])
        )
    part = part.localCheckpoint(eager=True)  # read+overwrite same path
    part.write.mode("overwrite").parquet(state_dir)


def read_source_overlap_estimates(
    spark: SparkSession, state_dir: str
) -> DataFrame | None:
    """Pairwise overlap estimates from the maintained signatures
    (``est_jaccard = matches / H``), or None before the first commit."""
    if not os.path.exists(os.path.join(state_dir, "_SUCCESS")):
        return None
    sig = spark.read.parquet(state_dir)
    sa = sig.select(
        F.col("src").alias("src_a"),
        *[F.col(f"mh_{h}").alias(f"a{h}") for h in range(N_HASHES)],
    )
    sb = sig.select(
        F.col("src").alias("src_b"),
        *[F.col(f"mh_{h}").alias(f"b{h}") for h in range(N_HASHES)],
    )
    m = sum(
        F.when(F.col(f"a{h}") == F.col(f"b{h}"), 1).otherwise(0)
        for h in range(N_HASHES)
    ).cast("long")
    return sa.join(sb, F.col("src_a") < F.col("src_b")).select(
        "src_a",
        "src_b",
        m.alias("n_match"),
        (m.cast("double") / F.lit(float(N_HASHES))).alias("est_jaccard"),
    )
