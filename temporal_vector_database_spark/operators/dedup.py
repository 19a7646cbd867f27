"""Deduplication operators (beyond-reference, BASELINE.json north star).

- exact: hash-groupBy on the full text (md5) — one shuffle on the hash;
- near-dup: MinHash over character 3-shingles + LSH banding. The minhash
  uses md5-based hash families so Spark and the DuckDB oracle compute
  identical signatures (Spark's ``hash()`` is murmur3, DuckDB's differs —
  md5 is the portable choice). min() over shingles is idempotent, so no
  DISTINCT is needed before the aggregate.

Scale posture: signatures are one explode + one groupBy(doc) — shuffle
size is bounded by docs × H strings. LSH banding turns the quadratic
all-pairs comparison into an equi-join on (band, band_hash) buckets;
only bucket-colliding pairs are scored. At 100 TB, band-bucket skew
(very common shingles) is the known hot spot — AQE skew-join handles
moderate skew; salting hot buckets is the escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: md5 text hash, duplicate-group size, canonical flag
    (lowest doc_id wins)."""
    w = Window.partitionBy("text_hash")
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("text_hash"))
        .withColumn("dup_count", F.count("*").over(w).cast("long"))
        .withColumn("is_canonical", F.col("doc_id") == F.min("doc_id").over(w))
    )


def _shingles(docs: DataFrame, text_col: str, width: int) -> DataFrame:
    return docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length({text_col}) - {width - 1}, 1)),"
                f" i -> substring({text_col}, i, {width}))"
            )
        ).alias("sh"),
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", num_hashes: int = 8, width: int = 3
) -> DataFrame:
    """MinHash signature per document: ``mh_i = min(md5('i:' || shingle))``
    over all character ``width``-shingles."""
    sh = _shingles(docs, text_col, width)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{h}:"), F.col("sh")))).alias(f"mh_{h}")
        for h in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def near_duplicate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 2,
    width: int = 3,
    min_jaccard_est: float = 0.5,
) -> DataFrame:
    """LSH near-duplicate candidate pairs with estimated Jaccard.

    Bands of ``num_hashes/bands`` rows; a pair is a candidate iff all rows
    of some band agree; estimated Jaccard = fraction of agreeing
    minhashes. Output: a_id < b_id, n_match, est_jaccard (exact rational).
    """
    sig = minhash_signatures(docs, text_col, num_hashes, width)
    rows_per_band = num_hashes // bands
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)])
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *[F.col(f"mh_{h}") for h in range(num_hashes)], *band_cols)
    bucket = banded.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias(
            "band_id", "band_hash"
        ),
    )
    pairs = (
        bucket.alias("a")
        .join(
            bucket.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    a_sig = banded.select(F.col("doc_id").alias("a_id"), *[F.col(f"mh_{h}").alias(f"a_mh_{h}") for h in range(num_hashes)])
    b_sig = banded.select(F.col("doc_id").alias("b_id"), *[F.col(f"mh_{h}").alias(f"b_mh_{h}") for h in range(num_hashes)])
    scored = (
        pairs.join(a_sig, "a_id")
        .join(b_sig, "b_id")
        .withColumn(
            "n_match",
            sum(
                F.when(F.col(f"a_mh_{h}") == F.col(f"b_mh_{h}"), 1).otherwise(0)
                for h in range(num_hashes)
            ).cast("int"),
        )
        .withColumn("est_jaccard", F.col("n_match").cast("double") / F.lit(float(num_hashes)))
        .where(F.col("est_jaccard") >= min_jaccard_est)
        .select("a_id", "b_id", "n_match", "est_jaccard")
    )
    return scored
