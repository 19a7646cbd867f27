"""Incremental lexical-index maintenance (streaming twin of
``operators/textindex.py``'s corpus statistics).

BM25/TF-IDF need corpus-level state — per-term document frequencies,
document count, total token count — that naively requires a full corpus
rescan whenever documents arrive. Both are SUMS over per-document
contributions, so the stream maintains them as additive per-batch
partials (``batch=N`` parquet partitions, the same versioned-state
pattern as ``streaming/dedup.py``): a replayed batch overwrites its own
partition (idempotent), and the serving-side merge is one small
aggregate over partial rows, never the corpus.

Pinned in tests: after draining any stream of documents, the merged
statistics (and BM25 scores computed from them) equal a one-shot batch
computation over every streamed document.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.textindex import _words
from temporal_vector_database_spark.streaming.dedup import _has_batches


def process_textindex_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    text_col: str = "text",
) -> None:
    """Fold one micro-batch of documents into the index state: per-term
    partial document frequencies plus a single corpus-stats row
    (``term = NULL``: n_docs and summed doc length). Safe to replay with
    the same ``batch_id`` (partition overwrite)."""
    if batch_df.isEmpty():
        return
    toks = batch_df.select(
        "doc_id", F.explode_outer(F.array_distinct(_words(text_col))).alias("term")
    )
    df_part = toks.where(F.col("term").isNotNull()).groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df_part")
    )
    corpus = batch_df.agg(
        F.countDistinct("doc_id").cast("long").alias("df_part"),
        F.sum(F.size(_words(text_col))).cast("long").alias("sum_dl"),
    ).select(F.lit(None).cast("string").alias("term"), "df_part", "sum_dl")
    out = df_part.withColumn("sum_dl", F.lit(None).cast("long")).unionByName(corpus)
    out.write.mode("overwrite").parquet(os.path.join(state_dir, f"batch={batch_id}"))


def read_index_stats(spark: SparkSession, state_dir: str):
    """Merge the partial state into serving form: a per-term ``(term,
    df)`` DataFrame and a ``(n_docs, avgdl)`` row. The merge aggregates
    PARTIAL rows (≤ batches × vocabulary), never documents."""
    if not _has_batches(state_dir):
        return None, None
    raw = spark.read.option("basePath", state_dir).parquet(
        os.path.join(state_dir, "batch=*")
    )
    dfreq = (
        raw.where(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.sum("df_part").cast("long").alias("df"))
    )
    stats = raw.where(F.col("term").isNull()).agg(
        F.sum("df_part").cast("long").alias("n_docs"),
        (
            F.sum("sum_dl").cast("double") / F.sum("df_part").cast("double")
        ).alias("avgdl"),
    )
    return dfreq, stats


def run_textindex_stream(
    doc_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
) -> None:
    """Drain available document batches into the index state
    (Trigger.AvailableNow)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_textindex_batch(batch_df, batch_id, state_dir, text_col)

    q = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def bm25_from_index(
    docs: DataFrame,
    query_terms: list[str],
    dfreq: DataFrame,
    stats: DataFrame,
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 over a candidate document set using the INCREMENTALLY
    maintained statistics — the serving path: corpus-level state comes
    from the index store (broadcast, tiny), only the candidate docs are
    scanned. Equal to ``operators.textindex.bm25_scores`` over the full
    corpus when ``docs`` is that corpus (pinned in tests)."""
    from pyspark.sql import Window

    terms = sorted(set(query_terms))
    toks = docs.select(
        id_col,
        F.explode(_words(text_col)).alias("term"),
        F.size(_words(text_col)).cast("bigint").alias("dl"),
    )
    tf = toks.where(F.col("term").isin(terms)).groupBy(id_col, "term", "dl").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    joined = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
    )
    scored = joined.groupBy(id_col).agg(
        F.round(F.sum(idf * tf_d * F.lit(k1 + 1.0) / denom), 6).alias("bm25")
    )
    top = scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(top_n)
    w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    return top.withColumn("rn", F.row_number().over(w).cast("int")).select(
        id_col, "rn", "bm25"
    )
