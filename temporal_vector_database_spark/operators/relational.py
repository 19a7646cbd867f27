"""Skew-resistant relational helpers (beyond-reference, 100 TB posture).

``top_k_per_key`` via a single window is the textbook plan — but
``Window.partitionBy(key)`` routes EVERY row of a hot key through one
task. On a skewed 100 TB corpus (one user with 10^9 events, one crawl
domain with 10^8 pages) that task is the job. The two-phase salted
variant bounds any task's input at ~|rows(key)| / n_salt and the final
pass at k * n_salt rows per key — exact same result, no hotspot.

Salts are derived from a deterministic column hash (never ``rand()``):
task retries and speculative attempts must re-derive identical salts or
the shuffle is non-deterministic under failure.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_phase_topk(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    salt_col: str | Column = None,
    n_salt: int = 16,
    rank_name: str = "rank",
) -> DataFrame:
    """Exact per-key top-k, skew-proof: partial top-k per (key, salt), then
    final top-k per key over the surviving ≤ k * n_salt rows.

    Correctness: the global top-k of a key is contained in the union of
    per-salt top-ks (any row outside every partial top-k is beaten by k
    rows in its own salt bucket, hence by ≥ k rows globally). ``order_cols``
    MUST be a total order (include a tiebreaker) so ranks are
    deterministic and engine-portable.

    ``salt_col``: any deterministic expression that varies WITHIN a key (a
    row id column is ideal). Defaults to a hash of every input column —
    deterministic under task retry, unlike ``rand()``.
    """
    keys = list(key_cols)
    order = list(order_cols)
    if salt_col is None:
        salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), n_salt)
    elif isinstance(salt_col, str):
        salt = F.pmod(F.hash(F.col(salt_col)), n_salt)
    else:
        salt = F.pmod(F.hash(salt_col), n_salt)
    salted = df.withColumn("_salt", salt)
    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order)
    partial = (
        salted.withColumn("_prank", F.row_number().over(w1))
        .where(F.col("_prank") <= k)
        .drop("_prank", "_salt")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        partial.withColumn(rank_name, F.row_number().over(w2))
        .where(F.col(rank_name) <= k)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salt: int = 16,
    salt_col: str | Column = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: identical rows to ``fact.join(dim, on, how)``.

    The fact side gets a deterministic salt in [0, n_salt); the dim side is
    replicated n_salt times; the join key becomes (on…, salt) — a hot fact
    key's rows now land on n_salt reducers instead of one. Use when the
    dim side is too big to broadcast AND the fact side is skewed on the
    key (the case AQE's skew-join handles only per-plan; this is the
    portable explicit form). Dim replication costs n_salt × |dim| shuffle
    rows — keep n_salt modest.

    Only inner/left joins are meaningful here (``how="right"``/"outer"
    would emit one row per replica for dim keys with no fact match).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left' only")
    keys = list(on)
    if salt_col is None:
        salt = F.pmod(F.hash(*[F.col(c) for c in fact.columns]), n_salt)
    elif isinstance(salt_col, str):
        salt = F.pmod(F.hash(F.col(salt_col)), n_salt)
    else:
        salt = F.pmod(F.hash(salt_col), n_salt)
    fact_s = fact.withColumn("_salt", salt)
    dim_r = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return fact_s.join(dim_r, [*keys, "_salt"], how).drop("_salt")


def key_skew_profile(
    df: DataFrame,
    key_cols: tuple[str, ...] | list[str],
    top_n: int = 20,
) -> DataFrame:
    """Skew diagnosis for a prospective join/agg key (beyond-reference
    ops tooling; the measurement behind this module's salting knobs):
    the ``top_n`` hottest key values with exact counts, the key's global
    share, and corpus totals — the numbers that decide whether a key
    needs `salted_join`/`two_phase_topk` or AQE skew handling.

    Plan: one keyed count aggregate (map-side combined), a 1-row global
    summary broadcast onto the top rows, and a TakeOrdered top-N — no
    global sort materializes, nothing driver-side beyond the N rows.
    """
    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    summary = counts.agg(
        F.sum("n").cast("long").alias("total_rows"),
        F.count("*").cast("long").alias("n_distinct_keys"),
    )
    top = counts.orderBy(F.desc("n"), *[F.asc(c) for c in keys]).limit(int(top_n))
    w = Window.orderBy(F.desc("n"), *[F.asc(c) for c in keys])
    return (
        top.crossJoin(F.broadcast(summary))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "rank",
            *keys,
            F.col("n").cast("long").alias("n"),
            (F.col("n").cast("double") / F.col("total_rows").cast("double")).alias(
                "share"
            ),
            "total_rows",
            "n_distinct_keys",
        )
    )


def _enc_col(c: str):
    """Unambiguous per-column string encoding for digesting: NULL-vs-
    value tag + length prefix (``N|`` / ``V<len>:<val>|``) — boundary
    shifts between adjacent columns and NULL↔'' flips cannot collide.
    Plain ANSI string ops, so DuckDB oracles replay it verbatim."""
    s = F.col(c).cast("string")
    return F.when(s.isNull(), F.lit("N|")).otherwise(
        F.concat(F.lit("V"), F.length(s).cast("string"), F.lit(":"), s, F.lit("|"))
    )


def table_checksum(
    df: DataFrame,
    key_cols: tuple = ("doc_id",),
    compare_cols: tuple = ("text",),
    group_cols: tuple = (),
) -> DataFrame:
    """Order-invariant dataset fingerprint (the pt-table-checksum /
    snapshot-verify primitive): did two copies of a table — before/after
    a migration, two replicas, a rewrite — end up row-identical, without
    moving either copy? One row per ``group_cols`` value (or one global
    row) with exact ``n_rows`` plus two XOR fingerprints over per-row
    md5 digests of the unambiguously-encoded key+payload columns.

    Determinism/scale: XOR is commutative/associative and overflow-free,
    so the fingerprint is identical under any partitioning and any row
    count (a SUM fingerprint would overflow BIGINT past ~2^31 rows of
    u32 digests). ``hi``/``lo`` are independent u32 slices of the same
    md5, giving 64 fingerprint bits. Caveat (standard for XOR
    checksums): two IDENTICAL full rows cancel — the digest includes the
    key columns, so cancellation requires duplicate keys with identical
    payloads, which the changefeed contract already forbids.

    Plan: digests are row-local; ONE map-side-combined aggregate; no
    joins, no windows — a full-table scan is the floor for any checksum.
    """
    cols = list(key_cols) + list(compare_cols)
    dig = F.md5(F.concat(*[_enc_col(c) for c in cols]))
    hi = F.conv(F.substring(dig, 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(dig, 9, 8), 16, 10).cast("bigint")
    gk = list(group_cols)
    rows = df.select(*gk, hi.alias("_hi"), lo.alias("_lo"))
    agg = [
        F.count("*").cast("long").alias("n_rows"),
        F.expr("bit_xor(_hi)").cast("long").alias("xor_hi"),
        F.expr("bit_xor(_lo)").cast("long").alias("xor_lo"),
    ]
    return rows.groupBy(*gk).agg(*agg) if gk else rows.agg(*agg)


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple = ("doc_id",),
    compare_cols: tuple = ("text",),
) -> DataFrame:
    """Changefeed between two dataset versions — the dataset-level CDC a
    curated-corpus pipeline needs for auditing what a re-run changed
    ("v2 removed 1.2M docs, rewrote 40k"): per key, status ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` with the md5 content
    digests of both sides (digest compare, so arbitrarily wide payloads
    diff at hash cost).

    The digested encoding is UNAMBIGUOUS (ADVICE r05): each column is
    tagged NULL-vs-value and length-prefixed (``N|`` vs
    ``V<len>:<val>|``), so boundary-shifted multi-column payloads
    (('ab','c') vs ('a','bc')) and NULL↔'' changes produce different
    digests — a bare ``concat_ws('')`` would hash them identically and
    misreport 'unchanged'. The encoding is plain ANSI string ops, so
    the DuckDB oracle replays it verbatim.

    Plan: digests are row-local projections; the diff is ONE full outer
    equi-join on the key (co-partitioned sides, no windows). At lake
    scale this runs partition-parallel over both snapshots — the
    Delta/Iceberg ``table_changes`` shape recomputed from plain
    parquet.
    """

    digest = F.md5(F.concat(*[_enc_col(c) for c in compare_cols]))
    keys = list(key_cols)
    o = old.select(*keys, digest.alias("old_hash"))
    n = new.select(*keys, digest.alias("new_hash"))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(*keys, "old_hash", "new_hash", status.alias("status"))


def group_entropy(
    df: DataFrame,
    key_cols: tuple,
    cat_col: str,
) -> DataFrame:
    """Shannon entropy of a categorical distribution per key —
    behavioral diversity ("does this user do one thing or many?"),
    the profiling/segmentation primitive.

    H = Σ (c_i/N)·(log2 N − log2 c_i), published as the exact BIGINT
    numerator ``entropy_num_units = Σ c_i·(score(N) − score(c_i))`` in
    the fixed-point-log2 units of ``operators/dsir.py`` (libm-free,
    engine-bit-stable) plus the single IEEE division
    ``entropy_bits = num / (N·2^16)``. Zero for single-category keys;
    exact log2(k) for k equal categories at powers of two.

    Plan: one (key, category) count + one key-level rollup — two
    map-side-combined exchanges, no windows.
    """
    from temporal_vector_database_spark.operators.dsir import _fixed_log2_sql

    keys = list(key_cols)
    counts = df.groupBy(*keys, F.col(cat_col).alias("_cat")).agg(
        F.count("*").cast("long").alias("c")
    )
    tot = counts.groupBy(*keys).agg(
        F.sum("c").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n_categories"),
    )
    # no broadcast hint: `tot` has one row PER KEY (unbounded cardinality,
    # e.g. per user_id at 100 TB) — let AQE pick broadcast when it is
    # actually small; the equi-join shuffles co-partitioned otherwise
    j = counts.join(tot, keys)
    term = F.expr(
        f"c * ({_fixed_log2_sql('n_total')} - {_fixed_log2_sql('c')})"
    ).cast("long")
    out = j.groupBy(*keys).agg(
        F.sum(term).cast("long").alias("entropy_num_units"),
        F.first("n_total").alias("n_total"),
        F.first("n_categories").alias("n_categories"),
    )
    return out.withColumn(
        "entropy_bits",
        F.col("entropy_num_units").cast("double")
        / (F.col("n_total").cast("double") * 65536.0),
    )


def dataset_drift(
    old: DataFrame,
    new: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group drift report between two dataset versions — the
    monitoring complement of :func:`dataset_diff`: document and token
    counts per group on each side plus their deltas, all exact BIGINTs
    (a re-run of a curation pipeline answers "which sources shrank and
    by how many tokens?" from this one table).

    Plan: one aggregation per side (map-side combined) + a full outer
    join on the group key — group cardinality rows, trivially
    broadcastable.
    """
    def side(df: DataFrame, tag: str) -> DataFrame:
        toks = F.size(F.filter(F.split(F.col(text_col), " "), lambda x: x != ""))
        return df.groupBy(group_col).agg(
            F.count("*").cast("long").alias(f"{tag}_docs"),
            F.sum(toks.cast("long")).cast("long").alias(f"{tag}_tokens"),
            F.sum(F.length(text_col).cast("long")).cast("long").alias(f"{tag}_chars"),
        )

    o, n = side(old, "v1"), side(new, "v2")
    j = o.join(n, group_col, "full_outer")
    out = j.select(
        group_col,
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("v1_docs", "v2_docs", "v1_tokens", "v2_tokens",
                      "v1_chars", "v2_chars")
        ],
    )
    return out.withColumn(
        "delta_docs", (F.col("v2_docs") - F.col("v1_docs")).cast("long")
    ).withColumn(
        "delta_tokens", (F.col("v2_tokens") - F.col("v1_tokens")).cast("long")
    )
