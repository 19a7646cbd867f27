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


def length_balanced_sample(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    key_col: str = "doc_id",
    keep_fracs: tuple[float, ...] = (1.0, 0.75, 0.5, 0.25),
) -> DataFrame:
    """Length-distribution rebalancing, the AT-SCALE form: documents are
    bucketed into token-count quartiles by THRESHOLD (exact distributed
    ``percentile`` — a single aggregate whose state is a value→count map
    over the bounded token-count domain, broadcast back as three
    scalars), then deterministically down-sampled per quartile with the
    same md5-threshold membership as the rest of this module. Long docs
    dominate token mass; training mixes thin them.

    There is NO global window anywhere in this plan (contrast
    ``length_balanced_quartiles_exact``, the single-task ``ntile`` twin
    kept for small-data parity checks): the percentile aggregate does a
    partial+final merge like any other agg, and bucket assignment is a
    per-row comparison against broadcast scalars — the plan survives a
    100× scale-up unchanged.

    Bucket semantics differ from ``ntile`` at ties: a quartile is
    ``1 + Σ (n_tokens > t_i)``, so equal token counts always land in the
    same bucket (value-determined, engine-portable), where ntile splits
    ties by arbitrary position to force equal bucket SIZES.
    """
    thresholds = df.agg(
        F.percentile(F.col(tokens_col), F.lit([0.25, 0.5, 0.75])).alias("ts")
    ).select(
        F.col("ts")[0].alias("t1"), F.col("ts")[1].alias("t2"), F.col("ts")[2].alias("t3")
    )
    quart = (
        F.lit(1)
        + (F.col(tokens_col) > F.col("t1")).cast("int")
        + (F.col(tokens_col) > F.col("t2")).cast("int")
        + (F.col(tokens_col) > F.col("t3")).cast("int")
    ).cast("int")
    u = _u32(F.col(key_col))
    bucketed = df.crossJoin(F.broadcast(thresholds)).withColumn("quartile", quart)
    cond = None
    for i, frac in enumerate(keep_fracs, start=1):
        c = (F.col("quartile") == i) & (u < F.lit(int(frac * _U32_SPAN)))
        cond = c if cond is None else (cond | c)
    return bucketed.where(cond).drop("t1", "t2", "t3")


def length_balanced_quartiles_exact(
    df: DataFrame, tokens_col: str = "n_tokens", key_col: str = "doc_id"
) -> DataFrame:
    """The equal-SIZE quartile twin: global ``ntile(4)`` with full tie
    break. A single-task total sort — correct, and useful as a parity
    oracle on small data, but NOT the at-scale plan (see
    ``length_balanced_sample``)."""
    w = Window.orderBy(F.asc(tokens_col), F.asc(key_col))
    return df.withColumn("quartile", F.ntile(4).over(w).cast("int"))
