"""DSIR-style data selection via importance resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023): score every raw document by how much more likely its
hashed n-gram bag is under a TARGET corpus model than under the RAW
corpus model, then keep the top-weighted documents.

Pipeline (all relational, no driver-side data movement):

1. Featurize: word unigrams + bigrams, hashed into ``n_buckets``
   buckets via the portable md5→u32 draw (the ``sampling._u32``
   convention) — the paper's "hashed n-gram features".
2. Model: per-bucket occurrence counts over the target and the raw
   corpus (two aggregations collapsing to ``n_buckets`` rows each),
   add-one smoothed — two bag-of-buckets multinomials.
3. Weight: per-bucket log-likelihood ratio
   ``λ_b = [log p_target(b)] − [log p_raw(b)]``; a document's
   importance weight is the sum of ``λ`` over its gram OCCURRENCES.
4. Select: top-k by weight (deterministic doc_id tie-break). The
   paper resamples with Gumbel noise; the deterministic top-k is the
   zero-temperature limit and keeps the gate engine-reproducible.

Float-determinism policy (SCALE.md): libm ``log`` differs across
engines in the last ulp, so the published weights use an EXACT
fixed-point log2 — ``score(x) = floor(log2 x)·2^16 + frac16`` where
``frac16`` linearly interpolates between adjacent powers of two with
pure integer math (``floor((x − 2^L)·2^16 / 2^L)``). The surrogate is
monotone, within 0.086 of true log2·2^16/2^16 (max linear-interp error
of log2 on [1,2]), identical in every engine, and every published
weight is a BIGINT in 1/2^16 log2-units.

Plan shape / 100 TB posture: the gram explode is row-local; both model
aggregations collapse to ``n_buckets`` rows (map-side combined); the
λ-table is broadcast into the per-gram join; the only data-sized
exchange is the final per-doc weight aggregation keyed by doc_id. The
model tables are reusable state — refresh cost on new data is
proportional to the new documents, and the λ broadcast is index-like.

Reference: the reference engine has no corpus-selection surface; this
is beyond-reference breadth alongside the curation funnel
(``operators/pipeline.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LOG2_SCALE = 1 << 16


def _fixed_log2_sql(x_sql: str) -> str:
    """The same fixed-point log2 as a Spark SQL snippet over an
    arbitrary integral SQL expression (used via ``F.expr`` so the
    variable-distance ``shiftleft`` stays JVM-side)."""
    return (
        f"(CAST(length(bin(CAST({x_sql} AS BIGINT))) - 1 AS BIGINT) * {LOG2_SCALE}"
        f" + ((CAST({x_sql} AS BIGINT)"
        f"      - shiftleft(CAST(1 AS BIGINT),"
        f"                  CAST(length(bin(CAST({x_sql} AS BIGINT))) - 1 AS INT)))"
        f"     * {LOG2_SCALE})"
        f"   div shiftleft(CAST(1 AS BIGINT),"
        f"                 CAST(length(bin(CAST({x_sql} AS BIGINT))) - 1 AS INT)))"
    )


def fixed_log2_duckdb_sql(x_sql: str) -> str:
    """DuckDB rendering of the identical integer recurrence (``//``
    floor-division, ``<<`` shift) — value-identical because every
    intermediate is an exact integer."""
    return (
        f"(CAST(length(bin(CAST({x_sql} AS BIGINT))) - 1 AS BIGINT) * {LOG2_SCALE}"
        f" + ((CAST({x_sql} AS BIGINT)"
        f"      - (CAST(1 AS BIGINT) << (length(bin(CAST({x_sql} AS BIGINT))) - 1)))"
        f"     * {LOG2_SCALE})"
        f"   // (CAST(1 AS BIGINT) << (length(bin(CAST({x_sql} AS BIGINT))) - 1)))"
    )


def _doc_grams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, gram) per word unigram AND bigram occurrence — the paper's
    hashed n-gram feature stream before bucketing. Row-local."""
    ws = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    toks = docs.select(F.col(id_col).alias("_id"), ws.alias("ws"))
    uni = toks.select("_id", F.explode("ws").alias("gram"))
    bi = toks.where(F.size("ws") >= 2).select(
        "_id",
        F.explode(
            F.transform(
                F.slice(F.col("ws"), 1, F.size("ws") - 1),
                lambda w, i: F.concat_ws(
                    " ", w, F.element_at(F.col("ws"), i + F.lit(2))
                ),
            )
        ).alias("gram"),
    )
    return uni.unionByName(bi)


def _bucketed(grams: DataFrame, n_buckets: int) -> DataFrame:
    b = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("bigint")
        % F.lit(int(n_buckets))
    ).alias("bucket")
    return grams.select("_id", b)


def bucket_counts(
    docs: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-bucket gram-occurrence counts ``(bucket, c)`` for a corpus —
    the sufficient statistic of the DSIR multinomial model. PURELY
    ADDITIVE: counts over a union of corpora are the sums of per-corpus
    counts, which is what makes the model maintainable incrementally
    (``streaming/dsir.py``)."""
    b = _bucketed(_doc_grams(docs, id_col, text_col), n_buckets)
    return b.groupBy("bucket").agg(F.count("*").cast("long").alias("c"))


def lambda_from_counts(
    spark,
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int = 4096,
) -> DataFrame:
    """λ table from precomputed model counts (the shared read side of
    the batch and streaming paths): ``(bucket, lambda_units)`` with the
    add-one smoothed LLR in 1/2^16 log2-units,
    ``[score(ct+1) − score(Nt+V)] − [score(cr+1) − score(Nr+V)]``.
    ``n_buckets`` rows — broadcastable index state."""
    tc = target_counts.select("bucket", F.col("c").alias("ct"))
    rc = raw_counts.select("bucket", F.col("c").alias("cr"))
    tt = tc.agg(F.sum("ct").cast("long").alias("nt"))
    rt = rc.agg(F.sum("cr").cast("long").alias("nr"))
    grid = (
        spark.range(int(n_buckets))
        .select(F.col("id").alias("bucket"))
        .join(tc, "bucket", "left")
        .join(rc, "bucket", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "bucket",
            F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
            F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
            F.coalesce(F.col("nt"), F.lit(0)).alias("nt"),
            F.coalesce(F.col("nr"), F.lit(0)).alias("nr"),
        )
    )
    lam = F.expr(
        f"({_fixed_log2_sql('ct + 1')} - {_fixed_log2_sql('nt + ' + str(int(n_buckets)))})"
        f" - ({_fixed_log2_sql('cr + 1')} - {_fixed_log2_sql('nr + ' + str(int(n_buckets)))})"
    )
    return grid.select("bucket", lam.cast("long").alias("lambda_units"))


def dsir_lambda_table(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-shot λ table straight from the two corpora (composes
    :func:`bucket_counts` + :func:`lambda_from_counts`)."""
    return lambda_from_counts(
        raw_docs.sparkSession,
        bucket_counts(target_docs, n_buckets, id_col, text_col),
        bucket_counts(raw_docs, n_buckets, id_col, text_col),
        n_buckets,
    )


def dsir_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document DSIR importance weight: Σ over gram occurrences of
    the bucket's ``lambda_units``. Documents with no grams weight 0.
    Output: ``(id_col, weight_units BIGINT, n_grams BIGINT)``."""
    lam = dsir_lambda_table(raw_docs, target_docs, n_buckets, id_col, text_col)
    return weights_from_lambda(raw_docs, lam, n_buckets, id_col, text_col)


def weights_from_lambda(
    raw_docs: DataFrame,
    lam: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Scoring half of :func:`dsir_weights` against an EXPLICIT
    ``(bucket, lambda_units)`` table — shared with the streaming serve
    (``streaming/dsir.py dsir_select_from_state``: λ derives from the
    two maintained count states via ``lambda_from_counts``, so scoring
    the streamed corpus is bit-equal to the batch op)."""
    grams = _bucketed(_doc_grams(raw_docs, id_col, text_col), n_buckets)
    per_doc = (
        grams.join(F.broadcast(lam), "bucket")
        .groupBy("_id")
        .agg(
            F.sum("lambda_units").cast("long").alias("weight_units"),
            F.count("*").cast("long").alias("n_grams"),
        )
    )
    ids = raw_docs.select(F.col(id_col).alias("_id"))
    return (
        ids.join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("weight_units"), F.lit(0)).cast("long").alias("weight_units"),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        )
    )


def dsir_select(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k raw documents by DSIR importance weight (ties → lower id):
    the zero-temperature selection step. A bounded global top-k —
    Spark's sort-limit is a per-partition top-k plus a k-row merge, no
    full sort materialization."""
    w = dsir_weights(raw_docs, target_docs, n_buckets, id_col, text_col)
    return w.orderBy(F.desc("weight_units"), F.asc(id_col)).limit(int(k))
