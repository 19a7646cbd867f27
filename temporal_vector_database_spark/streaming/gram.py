"""Streaming Gram-matrix maintenance → continuously refreshable PCA
basis (beyond-reference; the streaming half of ``operators/linalg.py``).

Embedding upserts arrive as a stream; the dim×dim Gram matrix and the
per-dimension sums/count fold ADDITIVELY per micro-batch — `X^T X` and
column sums over a union are exactly the elementwise sums of the parts,
so the state is (i, j, g) + (d, s) + n rows and per-batch cost is the
batch's Arrow pass plus a dim²-row merge, never history. ``pca_from_
state`` then assembles covariance ``G/n − μμᵀ`` and eigendecomposes on
the driver — a PCA basis that tracks the corpus without ever rescanning
it (the rotation ANN tier / ``pca_project`` consumes it directly).

Deletions are out of scope by design: Gram sums are additive, not
subtractive-safe under floating point drift off the fixture grid; a
production deployment recomputes affected partitions on compaction
(exactly the IVF-store discipline).

State versioning: the ``v=<batch_id>/`` commit scheme shared with
``streaming/rollup.py`` — committed replays no-op.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.linalg import gram_matrix
from temporal_vector_database_spark.streaming._state import committed_versions, replay_guard


def _committed_versions(state_dir: str) -> list[int]:
    return committed_versions(state_dir)


def _batch_state(batch_df: DataFrame, emb_col: str) -> DataFrame:
    """One batch's additive state: gram rows tagged kind='g' plus the
    per-dimension sum rows kind='s' (j = -1) and the count row kind='n'
    (i = j = -1) — a single long-format relation so the whole state
    merges with one (kind, i, j)-keyed sum."""
    g = gram_matrix(batch_df, emb_col).select(
        F.lit("g").alias("kind"), "i", "j", F.col("g").alias("v")
    )
    s = (
        batch_df.select(F.posexplode(F.col(emb_col)).alias("d", "x"))
        .groupBy("d")
        .agg(F.sum("x").alias("v"))
        .select(
            F.lit("s").alias("kind"),
            (F.col("d") + 1).cast("int").alias("i"),
            F.lit(-1).cast("int").alias("j"),
            "v",
        )
    )
    n = batch_df.select(
        F.lit("n").alias("kind"),
        F.lit(-1).cast("int").alias("i"),
        F.lit(-1).cast("int").alias("j"),
        F.count("*").cast("double").alias("v"),
    )
    return g.unionByName(s).unionByName(n)


def process_gram_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    emb_col: str = "embedding",
) -> None:
    """Fold one micro-batch of embeddings into the Gram/mean/count
    state. Replaying a committed ``batch_id`` is a no-op."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    vs = _committed_versions(state_dir)
    if replay_guard(vs, batch_id, state_dir):
        return
    part = _batch_state(batch_df, emb_col)
    if vs:
        prev = spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))
        part = (
            prev.unionByName(part)
            .groupBy("kind", "i", "j")
            .agg(F.sum("v").alias("v"))
        )
    part.write.mode("overwrite").parquet(os.path.join(state_dir, f"v={batch_id}"))
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def pca_from_state(
    spark: SparkSession,
    state_dir: str,
    n_components: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """Assemble covariance from the maintained state and eigendecompose
    — same sign-normalization as ``pca_fit``, so with identical input
    the bases are identical (pinned in tests). Returns (mu, W)."""
    vs = _committed_versions(state_dir)
    if not vs:
        raise ValueError(f"no committed gram state under {state_dir}")
    rows = spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}")).collect()
    n = None
    sums: dict[int, float] = {}
    g_rows = []
    for r in rows:
        if r.kind == "n":
            n = r.v
        elif r.kind == "s":
            sums[r.i] = r.v
        else:
            g_rows.append(r)
    dim = max(r.i for r in g_rows)
    G = np.zeros((dim, dim))
    for r in g_rows:
        G[r.i - 1, r.j - 1] = r.v
    mu = np.array([sums[i] / n for i in range(1, dim + 1)])
    C = G / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:n_components]
    W = vecs[:, order]
    for c in range(W.shape[1]):
        col = W[:, c]
        lead = int(np.argmax(np.abs(col)))
        if col[lead] < 0:
            W[:, c] = -col
    return mu, W


def run_gram_stream(
    embedding_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    emb_col: str = "embedding",
) -> None:
    """Drain available embedding batches (Trigger.AvailableNow); after
    the drain ``pca_from_state`` equals ``pca_fit`` over everything
    streamed (pinned in tests)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_gram_batch(batch_df, batch_id, state_dir, emb_col)

    q = (
        embedding_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
