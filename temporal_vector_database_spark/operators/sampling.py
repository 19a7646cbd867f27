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


def temperature_rebalance(
    df: DataFrame,
    k: float,
    lang_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based multilingual rebalancing (the XLM-R /
    mBERT-style corpus mix): keep each row of language ``l`` with
    probability ``r_l = min(1, k / sqrt(c_l))``, where ``c_l`` is the
    language's document count. Expected kept count is then
    ``min(c_l, k * sqrt(c_l))`` — proportional to ``p_l^0.5`` for the
    dominant languages (temperature alpha = 0.5) while rare languages
    are kept whole, exactly the flattening a multilingual training mix
    wants. ``k`` is the explicit mix knob (kept docs per unit sqrt-count)
    rather than a derived normalizer, which keeps every per-language
    rate a pure function of that language's own count — no cross-
    language float summation whose order could differ between engines.

    Determinism/portability: ``sqrt``, division, and multiplication are
    IEEE-754 correctly-rounded in both the JVM and DuckDB, so the
    per-language threshold ``r_l * 2^32`` is bit-identical in any
    engine, and membership is the module's standard md5-key comparison
    — subset-stable and engine-exact, so the oracle checks the precise
    document set, not just proportions.

    Plan: one tiny per-language count aggregate, broadcast back; the
    filter itself is a per-row hash compare — no second shuffle.
    """
    counts = df.groupBy(lang_col).agg(F.count("*").cast("long").alias("_lang_cnt"))
    rate = F.least(
        F.lit(1.0), F.lit(float(k)) / F.sqrt(F.col("_lang_cnt").cast("double"))
    )
    u = _u32(F.col(key_col))
    return (
        df.join(F.broadcast(counts), lang_col)
        .withColumn("keep_rate", rate)
        .where(u.cast("double") < F.col("keep_rate") * F.lit(_U32_SPAN))
        .drop("_lang_cnt")
    )


def pack_concat_chunks(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "n_tokens",
    shard_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: within each shard,
    documents are concatenated in ``order_col`` order and the token
    stream is cut every ``seq_len`` tokens; a document overlapping a cut
    appears in every sequence it spans, with its local token interval.
    Output grain is (document x training sequence):
    ``(seq_id, tok_start, tok_end)`` — ``tok_start``/``tok_end`` are the
    doc-relative token offsets (end exclusive) that land in ``seq_id``.
    Zero-token documents emit nothing.

    This is the packing step that turns a curated corpus into fixed-
    length training sequences with no padding waste; downstream
    tokenization reads exactly the spans listed here.

    Plan: one window per shard for the running token sum (a single hash
    exchange on ``shard_col``), then a per-row ``sequence()`` explode
    over the documents' spanned sequence ids — a document spans
    ``1 + (n_tokens - 1) // seq_len + (up to 1)`` sequences, so the
    explode is bounded by doc length, never by corpus size. Exact
    integer arithmetic end-to-end.
    """
    S = int(seq_len)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    n = F.col(tokens_col).cast("long")
    first_seq = F.floor(F.col("_before") / S).cast("long")
    last_seq = F.floor((F.col("_before") + n - 1) / S).cast("long")
    out = (
        df.withColumn("_before", before)
        .where(n > 0)
        .withColumn("seq_id", F.explode(F.sequence(first_seq, last_seq)))
    )
    seq_start = F.col("seq_id") * S
    return (
        out.withColumn(
            "tok_start",
            F.greatest(seq_start - F.col("_before"), F.lit(0)).cast("long"),
        )
        .withColumn(
            "tok_end",
            F.least(seq_start + S - F.col("_before"), n).cast("long"),
        )
        .drop("_before")
    )


def cluster_capped_sample(
    assign: DataFrame,
    cap: int,
    cluster_col: str = "centroid_id",
    key_col: str = "vid",
) -> DataFrame:
    """Diversity-capped sampling: keep at most ``cap`` members per
    semantic cluster (e.g. the nearest-centroid assignment from
    ``operators.search.ivf_assign`` / SemDeDup's clustering) — the
    de-biasing step that stops a handful of dense template clusters
    from dominating a training mix.

    WHICH members survive is deterministic and engine-portable: rank
    within cluster by the module's md5-key hash (ties by key) and keep
    rank <= cap — i.e. a uniform-without-replacement draw that is stable
    across reruns and subsets, like every sampler here.

    Plan: one window per cluster (single hash exchange). IVF-style
    cluster sizes are bounded by construction (a list is ~corpus/k), so
    the per-cluster task is bounded; for adversarially hot clusters
    compose with the salted-top-k pattern instead.
    """
    u = _u32(F.col(key_col))
    w = Window.partitionBy(cluster_col).orderBy(u.asc(), F.col(key_col).asc())
    return (
        assign.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= int(cap))
        .select(key_col, cluster_col, "rn")
    )


def leakage_safe_split(
    df: DataFrame,
    weights: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    text_col: str = "text",
    cluster_col: str | None = None,
) -> DataFrame:
    """``split_assign`` at CONTENT-CLUSTER grain: every member of a
    duplicate cluster draws the same split, so a document and its
    copies can never straddle train/test (the eval-leakage failure mode
    of hashing raw ids — near-identical rows with different ids land in
    different splits and the test set silently memorizes train).

    Cluster key: ``md5(text)`` by default (exact-duplicate clusters —
    pure column math, no extra shuffle: the hash IS the key, so no
    grouping is even needed). Pass ``cluster_col`` to split at a
    coarser precomputed grain instead — e.g. connected-component ids
    from the near-dup pair graph (``dedup.connected_components``) or
    semantic cluster ids (``ivf_assign``) — the standard Dolma/RefinedWeb
    discipline of deciding splits after clustering, not before.

    Determinism: the module's standard md5 hash-bucketing over the
    cluster key; zero shuffles in the default form.
    """
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    key = F.col(cluster_col) if cluster_col else F.md5(F.col(text_col))
    u = _u32(key)
    acc = 0.0
    bounds = []
    for w in weights[:-1]:
        acc += w
        bounds.append(int(acc * _U32_SPAN))
    expr = F.lit(names[-1])
    for name, b in zip(reversed(names[:-1]), reversed(bounds)):
        expr = F.when(u < F.lit(b), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def token_budget_select(
    df: DataFrame,
    budgets: dict,
    tokens_col: str = "n_tokens",
    source_col: str = "source",
    key_col: str = "doc_id",
    n_range_buckets: int = 1024,
) -> DataFrame:
    """Build a training MIXTURE under per-source token budgets: for each
    source, documents are taken in the deterministic md5-draw order
    until the source's token budget is exhausted (the doc that would
    cross the budget is excluded) — how a data mix ("X billion tokens of
    web, Y of code, Z of books") is actually materialized from a curated
    corpus.

    Scale story — a DISTRIBUTED PREFIX SUM, not a per-source window: a
    per-source running sum ordered by the draw would put each source's
    entire corpus into ONE window partition (a single task per source at
    100 TB). Instead the draw's u32 range splits into
    ``n_range_buckets`` RANGE buckets (bucket = u32 div (2^32/B), so
    bucket order IS draw order); per-(source, bucket) token sums — B
    rows per source — get a tiny window cumsum whose offsets broadcast
    back, and the inner cumsum runs within each (source, bucket) slice.
    global_cum = offset + inner cumsum, exact BIGINT, identical to the
    naive single-window form (the oracle computes the naive form).

    Budgets are a plain dict (source → max tokens); sources absent from
    it pass unfiltered. Output: the selected rows plus ``cum_tokens``
    (the source's running total INCLUDING the row).
    """
    span = _U32_SPAN // int(n_range_buckets)
    u = _u32(F.col(key_col))
    base = df.withColumn("_u", u).withColumn(
        "_rb", (F.col("_u") / F.lit(span)).cast("long")
    )
    # per-(source, range-bucket) partial sums -> tiny offset table
    parts = base.groupBy(source_col, "_rb").agg(
        F.sum(tokens_col).cast("long").alias("_part")
    )
    woff = (
        Window.partitionBy(source_col)
        .orderBy("_rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = parts.withColumn(
        "_off", F.coalesce(F.sum("_part").over(woff), F.lit(0)).cast("long")
    ).select(source_col, "_rb", "_off")
    # inner cumsum within the (source, bucket) slice, then add the offset
    win = (
        Window.partitionBy(source_col, "_rb")
        .orderBy(F.asc("_u"), F.asc(key_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        base.join(F.broadcast(offsets), [source_col, "_rb"])
        .withColumn(
            "cum_tokens",
            (F.col("_off") + F.sum(tokens_col).over(win)).cast("long"),
        )
    )
    spark = df.sparkSession
    bdf = spark.createDataFrame(
        [(s, int(b)) for s, b in sorted(budgets.items())],
        f"{source_col} string, _budget long",
    )
    return (
        cum.join(F.broadcast(bdf), source_col, "left")
        .where(F.col("_budget").isNull() | (F.col("cum_tokens") <= F.col("_budget")))
        .drop("_u", "_rb", "_off", "_budget")
    )


def weighted_reservoir_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
) -> DataFrame:
    """Fixed-SIZE sample of exactly ``k`` rows with inclusion
    probability proportional to an integer weight — Efraimidis &
    Spirakis (2006) A-ES weighted reservoir sampling, the
    without-replacement complement of the Bernoulli
    ``quality_weighted_sample`` (whose output size is random): rank by
    the exponential clock ``-log(u)/w`` and keep the k smallest.

    Determinism discipline: ``u`` is the md5 u32 draw, and the log is
    the EXACT fixed-point log2 of ``operators/dsir.py`` —
    ``-log2(u) = 32·2^16 − score(u32+1)`` in 1/2^16 units — so the
    priority ``floor(-log2(u)·2^20 / w)`` is a BIGINT identical in any
    engine (libm-free; same sample on Spark and DuckDB, ties → lower
    key). The integer floor is a documented surrogate of the real
    A-ES clock, bit-reproducible at the cost of a ≤2^-20 relative
    quantization of the priority.

    Plan: one projection + global top-k (TakeOrdered: per-partition
    k-heaps merged on k·P rows — no full sort)."""
    from temporal_vector_database_spark.operators.dsir import _fixed_log2_sql

    prio = F.expr(
        f"(({32 * 65536} - {_fixed_log2_sql(f'{_u32_sql(key_col)} + 1')})"
        f" * {1 << 20}) div CAST({weight_col} AS BIGINT)"
    )
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("priority_units", prio.cast("long"))
        .orderBy(F.asc("priority_units"), F.asc(key_col))
        .limit(int(k))
    )


def epoch_shuffle(
    docs: DataFrame,
    epoch: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic TRAINING-ORDER generator (r08): the data-order
    reproducibility contract a training run needs — every epoch yields
    a different but fully deterministic pseudo-random permutation of
    the corpus, sharded for parallel loaders, identical on any engine,
    partitioning, or rerun (``df.sample``/``orderBy(rand())`` give
    none of that).

    Order key = ``u32(md5('ep<epoch>|' || id))`` — a property of
    (epoch, id) only, so adding documents never perturbs the relative
    order of existing ones within an epoch. ``shard = key % n_shards``
    (uniform, loader-balanced); ``pos`` is the doc's 1-based position
    within its shard under ``(key, id)`` — id breaks 32-bit collisions,
    making the order total.

    Scale: positions come from ONE two-phase distributed global rank
    over ``(shard, key, id)`` (``_global_ranks`` — repartitionByRange +
    per-partition row_number + broadcast P-row offsets, never a
    single-partition global window) minus broadcast per-shard offsets
    (an n_shards-row aggregate) — so no shard ever serializes into one
    task, unlike a naive ``Window.partitionBy(shard)``.

    Output: ``(doc_id, epoch, shard, pos)``.
    """
    from temporal_vector_database_spark.operators.dedup import _global_ranks

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = _u32(F.concat(F.lit(f"ep{int(epoch)}|"), F.col(id_col).cast("string")))
    keyed = docs.select(
        F.col(id_col),
        key.alias("okey"),
    ).withColumn("shard", F.pmod(F.col("okey"), F.lit(int(n_shards))).cast("int"))
    ranked = _global_ranks(keyed, "shard", "okey", id_col)
    sc = ranked.groupBy("shard").agg(F.count("*").cast("long").alias("cnt"))
    counts = {r.shard: r.cnt for r in sc.collect()}  # n_shards rows
    offs, acc = [], 0
    for s in sorted(counts):
        offs.append((int(s), int(acc)))
        acc += counts[s]
    off_df = F.broadcast(
        docs.sparkSession.createDataFrame(offs, "shard int, _soff long")
    )
    return (
        ranked.join(off_df, "shard")
        .select(
            id_col,
            F.lit(int(epoch)).cast("int").alias("epoch"),
            "shard",
            (F.col("rank") - F.col("_soff")).cast("long").alias("pos"),
        )
    )


def kfold_assign(
    df: DataFrame,
    k: int = 5,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """STRATIFIED k-fold assignment (r09) — the cross-validation /
    ensemble-sharding split with an EXACT balance guarantee: within
    every stratum, fold sizes differ by at most one (hash-threshold
    splits like :func:`split_assign` only balance in expectation —
    a small stratum can land 0 rows in a fold). Each stratum's rows
    are ordered by a salted hash key (``u32(md5('kf|' || id))``, id
    tiebreak — deterministic, id-uncorrelated) and dealt round-robin:
    ``fold = per-stratum 0-based rank % k``.

    Scale: ONE two-phase distributed global rank over ``(stratum, key,
    id)`` (``_global_ranks``); within a stratum global ranks are
    contiguous, so the per-stratum rank is ``rank − min(rank over the
    stratum)`` — the min-rank table is stratum-bounded and broadcast.
    No ``Window.partitionBy(stratum)`` (few strata would serialize
    into few tasks — the ``epoch_shuffle`` posture).

    Output: ``(id, stratum, fold)``, fold in 0..k−1.
    """
    from temporal_vector_database_spark.operators.dedup import _global_ranks

    if int(k) < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    key = _u32(F.concat(F.lit("kf|"), F.col(id_col).cast("string")))
    keyed = df.select(
        F.col(id_col), F.col(stratum_col).alias("stratum"), key.alias("okey")
    )
    ranked = _global_ranks(keyed, "stratum", "okey", id_col)
    mins = F.broadcast(
        ranked.groupBy("stratum").agg(F.min("rank").alias("_smin"))
    )
    return (
        ranked.join(mins, "stratum")
        .select(
            id_col,
            "stratum",
            F.pmod(F.col("rank") - F.col("_smin"), F.lit(int(k)))
            .cast("int")
            .alias("fold"),
        )
    )


def _u32_sql(key_col: str) -> str:
    """The md5→u32 draw as a SQL snippet (the `_u32` Column twin)."""
    return f"CAST(conv(substring(md5(CAST({key_col} AS STRING)), 1, 8), 16, 10) AS BIGINT)"
