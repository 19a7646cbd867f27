"""Streaming maintenance of a Misra–Gries heavy-hitter summary — the
streaming half of ``operators/textindex.heavy_hitters_sketch``.

MG summaries are MERGEABLE (Agarwal et al., PODS'12): two k-counter
summaries merge by counter addition followed by the quantile decrement
back down to k counters, and the merged deficit is bounded by
``(N₁+N₂)/(k+1)`` — so folding per-batch summaries batch-by-batch keeps
the global guarantee: any gram whose total streamed count exceeds
``N/(k+1)`` is ALWAYS present in the committed summary (pinned in
tests against brute force). The state is tiny (≤ k rows + a 1-row
total), so the merge runs driver-side on collected counters — the same
k-row-collect class as the IVF centroid tables.

What the summary gives you at read time: candidate grams with
deficit-bounded counts (``true ∈ [mg_count, mg_count + N/(k+1)]``).
Exact counts for the candidates, when needed, come from one bounded
semi-join against the corpus — the batch operator's contract step.

Versioned ``v=<batch_id>`` commits (both ``summary`` and ``total``
must have ``_SUCCESS``); replays of committed batches are no-ops.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from temporal_vector_database_spark.streaming._state import committed_versions, replay_guard


def _committed_versions(state_dir: str) -> list[int]:
    return committed_versions(state_dir, markers=("summary", "total"))


def read_hh_state(
    spark: SparkSession, state_dir: str
) -> tuple[DataFrame, int] | None:
    """(summary DF, total gram count) at the highest committed version."""
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    base = os.path.join(state_dir, f"v={vs[-1]}")
    total = spark.read.parquet(os.path.join(base, "total")).collect()[0]["n_grams"]
    return spark.read.parquet(os.path.join(base, "summary")), int(total)


def _mg_fold(counters: dict, kt: int) -> dict:
    if len(counters) <= kt:
        return counters
    vals = sorted(counters.values())
    m = vals[len(vals) - kt - 1]
    return {g: c - m for g, c in counters.items() if c > m}


def process_hh_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    k_track: int = 64,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold one document micro-batch's MG summary into the state."""
    from temporal_vector_database_spark.operators.textindex import _words

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    vs = _committed_versions(state_dir)
    if replay_guard(vs, batch_id, state_dir):
        return
    kt = int(k_track)

    ws = _words(text_col)
    toks = batch_df.select(F.col(id_col).alias("_id"), ws.alias("ws"))
    grams = toks.where(F.size("ws") >= n).select(
        F.explode(
            F.transform(
                F.slice(F.col("ws"), 1, F.size("ws") - F.lit(n - 1)),
                lambda w, i: F.concat_ws(
                    " ",
                    w,
                    *[F.element_at(F.col("ws"), i + F.lit(j + 1)) for j in range(1, n)],
                ),
            )
        ).alias("gram")
    )
    # bounded fold: per-partition MG summaries (<= kt rows each, the
    # shared `_mg_partition_fn` pass — no shuffle, no unbounded
    # collect), then a driver-side weighted-MG merge of <= kt*partitions
    # summary rows into the committed summary. Partition summaries are
    # themselves valid MG summaries, and MG merge preserves the global
    # deficit bound (mergeable summaries), so the superset guarantee
    # covers everything streamed so far.
    from temporal_vector_database_spark.operators.textindex import (
        _mg_partition_fn,
    )

    batch_summary = grams.mapInPandas(
        _mg_partition_fn(kt), schema="gram string, mg_count long"
    )
    batch_total = grams.count()

    prev = read_hh_state(spark, state_dir)
    counters: dict = {}
    total = 0
    if prev is not None:
        sdf, total = prev
        counters = {r.gram: r.mg_count for r in sdf.collect() if r.gram != ""}
    for r in batch_summary.collect() if batch_total else []:
        counters[r.gram] = counters.get(r.gram, 0) + int(r.mg_count)
    counters = _mg_fold(counters, kt)
    total += int(batch_total)

    base = os.path.join(state_dir, f"v={batch_id}")
    sdf = spark.createDataFrame(
        [(g, int(c)) for g, c in sorted(counters.items())] or [("", 0)],
        "gram string, mg_count long",
    )
    sdf.write.mode("overwrite").parquet(os.path.join(base, "summary"))
    spark.createDataFrame([(int(total),)], "n_grams long").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "total"))
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def hh_candidates(spark: SparkSession, state_dir: str, k_track: int = 64) -> DataFrame:
    """Candidate grams with deficit-bounded counts: every gram whose
    total streamed count exceeds n_grams/(k_track+1) is present."""
    st = read_hh_state(spark, state_dir)
    if st is None:
        return spark.createDataFrame([], "gram string, mg_count long, n_grams long")
    sdf, total = st
    return sdf.where(F.col("gram") != "").withColumn("n_grams", F.lit(int(total)))
