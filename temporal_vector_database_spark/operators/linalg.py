"""Distributed dense linear algebra for embedding columns
(beyond-reference): one-pass Gram/covariance accumulation and PCA-reduced
retrieval.

The reference has no dimensionality-reduction surface; this is the
standard companion to its FAISS-style search (``storage/storage_engine.py``)
that production vector stacks bolt on (OPQ/PCA pre-rotation in FAISS,
Matryoshka truncation in modern embedding models).

Scale shape: the Gram matrix is accumulated as PER-ARROW-BATCH partial
``X^T X`` matrices (each batch emits exactly ``dim x dim`` rows regardless
of batch size), then summed under a ``(i, j)``-keyed aggregation — the
shuffle moves O(n_batches * dim^2) tiny rows, never embeddings. The
eigendecomposition happens on the driver over a ``dim x dim`` matrix (the
k-means-centroid discipline: only statistics come back, never data).
On the 1/1024-quantized fixture grid every product is exact in float64 and
sums are order-independent, so the matrix is bit-identical across engines
and summation orders (the DuckDB oracle recomputes it relationally).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(
    embeddings: DataFrame, emb_col: str = "embedding"
) -> DataFrame:
    """Uncentered Gram matrix ``G = X^T X`` of an embedding column as a
    (i, j, g) relation, 1-based indices. One narrow Arrow pass + one
    dim^2-keyed aggregation; nothing wide ever shuffles."""

    def _partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[emb_col].to_numpy())
            G = X.T @ X
            d = G.shape[0]
            i, j = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1), indexing="ij")
            yield pd.DataFrame(
                {"i": i.ravel(), "j": j.ravel(), "g": G.ravel()}
            )

    partials = embeddings.select(emb_col).mapInPandas(
        _partial, schema="i int, j int, g double"
    )
    return partials.groupBy("i", "j").agg(F.sum("g").alias("g"))


def column_means(embeddings: DataFrame, emb_col: str = "embedding") -> list[float]:
    """Per-dimension means via one partial-aggregated posexplode pass;
    only DIM rows return to the driver."""
    rows = (
        embeddings.select(F.posexplode(F.col(emb_col)).alias("d", "x"))
        .groupBy("d")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .orderBy("d")
        .collect()
    )
    return [r["s"] / r["n"] for r in rows]


def _assemble_cov(
    embeddings: DataFrame, emb_col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """Driver-side covariance assembly shared by ``pca_fit`` and
    ``pca_trace_check``: ``C = G/n - mu mu^T`` from the distributed Gram
    matrix + means. Every entry is a fixed chain of IEEE
    correctly-rounded ops on exact dyadic-grid sums, so C is
    bit-identical across engines and partition orders. Returns
    ``(n, mu, C)``."""
    n = embeddings.count()
    g_rows = gram_matrix(embeddings, emb_col).collect()
    dim = max(r["i"] for r in g_rows)
    G = np.zeros((dim, dim))
    for r in g_rows:
        G[r["i"] - 1, r["j"] - 1] = r["g"]
    mu = np.array(column_means(embeddings, emb_col))
    C = G / n - np.outer(mu, mu)
    return n, mu, C


def pca_trace_check(embeddings: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Value-level oracle contract for the PCA path (the check behind
    the otherwise rows-only ``pca_topk``): publishes ONE row with

    - ``n_vectors``: corpus size;
    - ``trace_e9``: ``sum_d floor(C_dd * 1e9 + 0.5)`` — per-dim e9
      rounding FIRST, then an exact BIGINT sum, so the value is
      independent of cross-dim float addition order. Each ``C_dd`` is
      ``ss_d/n - (s_d/n)^2`` on exact dyadic-grid sums — bit-identical
      to a relational recomputation (the DuckDB oracle replays it);
    - ``eig_trace_diff_e12``: ``floor((sum(eigh eigenvalues) -
      trace(C)) * 1e12 + 0.5)`` — trace preservation of the FULL
      eigendecomposition at 1e-12 grain; LAPACK's error is ~1e-14 *
      ||C||, so any real defect in the Gram assembly or the
      decomposition publishes nonzero while the correct pipeline
      deterministically publishes 0 (the oracle's literal).
    """
    import math

    n, _mu, C = _assemble_cov(embeddings, emb_col)
    trace_e9 = sum(int(math.floor(float(C[d, d]) * 1e9 + 0.5)) for d in range(C.shape[0]))
    vals = np.linalg.eigh(C)[0]
    diff = float(np.sum(vals)) - float(np.trace(C))
    diff_e12 = int(math.floor(diff * 1e12 + 0.5))
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(int(n), trace_e9, diff_e12)],
        "n_vectors long, trace_e9 long, eig_trace_diff_e12 long",
    )


def pca_fit(
    embeddings: DataFrame,
    n_components: int = 8,
    emb_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Fit PCA from the distributed Gram matrix + means: covariance
    ``C = G/n - mu mu^T`` is assembled on the driver (dim x dim), then
    ``eigh``. Components are sign-normalized (largest-|.| coordinate
    positive; ties -> earliest index) so the basis is deterministic.
    Returns (mu[dim], W[dim, n_components])."""
    _n, mu, C = _assemble_cov(embeddings, emb_col)
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:n_components]
    W = vecs[:, order]
    for c in range(W.shape[1]):
        col = W[:, c]
        lead = int(np.argmax(np.abs(col)))
        if col[lead] < 0:
            W[:, c] = -col
    return mu, W


def pca_project(
    df: DataFrame,
    mu: np.ndarray,
    W: np.ndarray,
    emb_col: str = "embedding",
    out_col: str = "pca_emb",
) -> DataFrame:
    """Project ``(x - mu) @ W`` as an Arrow batch pass; mu/W ride the
    UDF closure (dim x n_components doubles — broadcast-sized)."""
    cols = df.columns

    def _proj(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[emb_col].to_numpy())
            P = (X - mu) @ W
            out = pdf.drop(columns=[emb_col])
            out[out_col] = list(P)
            yield out

    schema = ", ".join(
        f"{c} {t}" for c, t in df.drop(emb_col).dtypes
    ) + f", {out_col} array<double>"
    return df.mapInPandas(_proj, schema=schema)


def pca_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_components: int = 8,
    shortlist: int = 50,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """PCA-reduced retrieval funnel: shortlist by cosine in the
    ``n_components``-dim PCA space, exact full-dim cosine re-rank of the
    shortlist only (same funnel discipline as ``pq_topk_reranked`` /
    ``mrl_topk``; with ``shortlist >= |corpus|`` it equals brute force —
    pinned in tests). ROWS-ONLY gate: the eigenbasis is not ANSI-SQL."""
    from temporal_vector_database_spark.functions.vector import l2_norm
    from temporal_vector_database_spark.operators.search import (
        _guarded_sim,
        topk_cosine,
    )
    from pyspark.sql import Window

    mu, W = pca_fit(embeddings, n_components, emb_col)
    red_c = pca_project(embeddings.select(id_col, emb_col), mu, W, emb_col).select(
        id_col, F.col("pca_emb").alias(emb_col)
    )
    red_q = pca_project(queries.select("query_id", emb_col), mu, W, emb_col).select(
        "query_id", F.col("pca_emb").alias(emb_col)
    )
    short = topk_cosine(red_c, red_q, k=shortlist, id_cols=(id_col,)).select(
        "query_id", id_col
    )
    exact = (
        short.join(
            embeddings.select(
                id_col, F.col(emb_col).alias("_v_emb"), l2_norm(emb_col).alias("_v_nrm")
            ),
            id_col,
        )
        .join(
            F.broadcast(
                queries.select(
                    "query_id",
                    F.col(emb_col).alias("_q_emb"),
                    l2_norm(emb_col).alias("_q_nrm"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            id_col,
            _guarded_sim("_q_emb", "_v_emb", "_q_nrm", "_v_nrm").alias("sim"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        exact.withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "sim")
    )


def quantile_normalize(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Per-DIMENSION rank/quantile normalization of an embedding table
    (r07) — the outlier-robust whitening a training pipeline applies
    before mixing embedding sources with mismatched scales: each
    dimension's values map onto [0, 1] by rank, so a feed whose dim-7
    runs 100× hot contributes the same distribution as every other
    source. Ties share the MIN rank (equal inputs map to equal
    quantiles — an ordinal tie-break would split them by id).

    Exactness: the per-dim rank is an integer window; the published
    per-vector summary keeps integer sums (``rank_sum``) and performs
    ONE terminal division for ``q_mean = rank_sum / (d·(n−1))``
    (rank−1 summed over dims) — engine-bit-stable. Plan: one explode
    (rows×dims — the honest cost of any per-dim order statistic), a
    RANK window PARTITIONED BY DIMENSION (distributed; never a global
    frame), and one group-back aggregate keyed by id.

    Output: ``(id_col, n_dims, rank_sum, q_mean)``; use the exploded
    intermediate directly when the full normalized vectors are needed
    downstream."""
    from pyspark.sql import Window

    n = embeddings.count()
    if n < 2:
        raise ValueError("quantile_normalize needs at least 2 vectors")
    ex = embeddings.select(
        F.col(id_col).alias("_id"), F.posexplode(F.col(emb_col)).alias("dim", "val")
    )
    w = Window.partitionBy("dim").orderBy("val")
    ranked = ex.withColumn("rk", F.rank().over(w).cast("long"))
    return (
        ranked.groupBy("_id")
        .agg(
            F.count("*").cast("int").alias("n_dims"),
            F.sum(F.col("rk") - 1).cast("long").alias("rank_sum"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_dims",
            "rank_sum",
            (
                F.col("rank_sum").cast("double")
                / (F.col("n_dims").cast("long") * (n - 1)).cast("double")
            ).alias("q_mean"),
        )
    )
