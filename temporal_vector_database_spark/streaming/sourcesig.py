"""Streaming maintenance of the cross-source overlap signatures
(``operators/dedup.source_overlap``'s estimator half).

The source-level MinHash signature is a pure MIN-aggregate per (source,
hash slice) — associative, commutative, and IDEMPOTENT. Min-idempotency
makes REDELIVERY of a micro-batch a no-op by value, but it does NOT
cover crash atomicity: an in-place ``mode("overwrite")`` deletes the
state dir before writing, so a crash mid-write would leave no
``_SUCCESS`` and the next batch would silently restart from empty
state, dropping every previously absorbed minimum (ADVICE r07). The
fold therefore uses the same versioned ``v=<batch_id>`` commit scheme
as every other maintenance module (``streaming/_state.py``): each batch
writes a FRESH version dir and readers take the highest committed one —
a torn write is simply an uncommitted version that the next fold
ignores and supersedes. Superseded versions are pruned after each
commit (keeping the read head + the new version, like every sibling
maintenance module) so a long-running stream's state dir stays
two-versions deep instead of growing one signature-table copy per
batch (ADVICE r08).

Serving: pairwise source overlap estimates from the maintained
signature table — #sources² tiny rows, no corpus rescan.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_vector_database_spark.streaming._state import (
    committed_versions,
    replay_guard,
)

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


def _read_committed(spark: SparkSession, state_dir: str) -> DataFrame | None:
    vs = committed_versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))


def process_source_sig_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    text_col: str = "text",
    source_col: str = "source",
    width: int = 3,
) -> None:
    """Fold one document micro-batch's per-source minima into the
    signature state. Versioned commit (crash-atomic: a torn write never
    becomes the read head); head redelivery skipped via the shared
    replay guard — min-idempotency would also absorb it, but skipping
    keeps the version ledger one-dir-per-batch."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    vs = committed_versions(state_dir)
    if replay_guard(vs, batch_id, state_dir):
        return
    part = _batch_signatures(batch_df, text_col, source_col, width)
    prev = _read_committed(spark, state_dir)
    if prev is not None:
        part = (
            prev.unionByName(part)
            .groupBy("src")
            .agg(*[F.min(f"mh_{h}").alias(f"mh_{h}") for h in range(N_HASHES)])
        )
    part.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"v={batch_id}")
    )
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def read_source_overlap_estimates(
    spark: SparkSession, state_dir: str
) -> DataFrame | None:
    """Pairwise overlap estimates from the maintained signatures
    (``est_jaccard = matches / H``), or None before the first commit."""
    sig = _read_committed(spark, state_dir)
    if sig is None:
        return None
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
