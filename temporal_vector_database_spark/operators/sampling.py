"""Deterministic sampling / splitting / sharding for training-data
pipelines (beyond-reference).

Every operator here is a pure column expression over a content-derived
hash — no RNG state, no seed files: re-running the pipeline on the same
corpus (or on any subset/superset) assigns every document identically.
That reproducibility is the point at 100 TB: samples and splits must
survive reruns, partial failures, and backfills without drift, and an
assignment must be derivable for ONE document without touching the rest
of the corpus.

Hash: the first 8 hex chars of ``md5(cast(key as string))`` as a uniform
32-bit integer — the same bytes-in/bits-out in any engine (the DuckDB
oracles parse the identical digest), so the gates check the exact
assignment, not just proportions. (xxhash64 would be faster but is not
expressible in ANSI SQL; at these costs — one md5 per ROW, not per
shingle — portability wins.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_U32_SPAN = float(2**32)


def _u32(key: Column) -> Column:
    """Uniform 32-bit hash of a key column, identical in any engine."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id"
) -> DataFrame:
    """Keep a reproducible ``fraction`` of rows: ``hash(key) / 2^32 <
    fraction``. Membership is a property of the KEY — stable across
    reruns, partitionings, and corpus growth (a doc's verdict never
    changes when neighbors arrive), unlike ``df.sample`` whose output
    depends on partition layout and seed plumbing."""
    return df.where(_u32(F.col(key_col)) < F.lit(int(fraction * _U32_SPAN)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-rebalancing step
    of a training mix (e.g. downsample boilerplate-heavy sources, keep
    all of a rare one). Same key-hash membership as
    ``deterministic_sample``, but the threshold is looked up per stratum
    from the (broadcast-literal) ``fractions`` map; strata absent from
    the map get ``default_fraction``. Still subset-stable per key."""
    u = _u32(F.col(key_col))
    thr = F.lit(int(default_fraction * _U32_SPAN))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == F.lit(stratum), F.lit(int(frac * _U32_SPAN))
        ).otherwise(thr)
    return df.where(u < thr)


def split_assign(
    df: DataFrame,
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    key_col: str = "doc_id",
) -> DataFrame:
    """Append a ``split`` column assigning each row to one of ``names``
    by hash-bucketing: cumulative weight thresholds over the same
    uniform hash. Deterministic and leak-proof — a document can never
    migrate between train and test across pipeline runs."""
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    u = _u32(F.col(key_col))
    acc = 0.0
    bounds = []
    for w in weights[:-1]:
        acc += w
        bounds.append(int(acc * _U32_SPAN))
    # names[-1] is the else-branch; earlier names claim [prev_bound, bound)
    expr = F.lit(names[-1])
    for name, b in zip(reversed(names[:-1]), reversed(bounds)):
        expr = F.when(u < F.lit(b), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def token_budget_chunks(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    shard_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to a contiguous token-budget chunk within its
    shard: ``chunk_id = floor(tokens_before / budget)`` over the
    shard-ordered running sum — the sharding step that turns a curated
    corpus into roughly ``budget``-token work units for tokenization /
    packing downstream.

    One window per shard (a single hash exchange on ``shard_col``); the
    running sum is exact integer arithmetic, so chunk boundaries are
    reproducible bit-for-bit. Documents are never reordered or split —
    a chunk may overhang by at most one document, the standard
    contiguous-sharding tradeoff (true bin packing is sequentially
    dependent and belongs downstream of the shuffle-free plan).
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tokens_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    return df.withColumn("tokens_before", tokens_before).withColumn(
        "chunk_id", F.floor(F.col("tokens_before") / F.lit(int(budget))).cast("long")
    )
