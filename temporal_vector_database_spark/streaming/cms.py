"""Streaming Count-Min sketch maintenance (foreachBatch).

CMS counters are PURELY ADDITIVE integer bucket sums
(``operators/textindex.py cms_counters``): counter tables computed over
any batching of the corpus fold by per-(r, b) integer addition, so the
committed state after N micro-batches is BIT-IDENTICAL to the one-shot
table over everything streamed (pinned in tests). State is
``depth x width (+1 total)`` rows regardless of corpus size — the
mergeable-summaries shape shared with ``streaming/heavyhitters.py``,
under the same ``v=<batch_id>`` commit scheme + shared replay guard.

Serving: :func:`cms_point_estimates` answers "how often has THIS gram
occurred so far?" for any query grams from the committed counters —
min over depth bucket reads, no corpus rescan.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.textindex import (
    _cms_bucket,
    _gram_stream,
    cms_counters,
)
from temporal_vector_database_spark.streaming._state import replay_guard


def _committed_versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    out = []
    for d in os.listdir(state_dir):
        if (
            d.startswith("v=")
            and os.path.exists(os.path.join(state_dir, d, "counters", "_SUCCESS"))
            and os.path.exists(os.path.join(state_dir, d, "total", "_SUCCESS"))
        ):
            out.append(int(d.split("=", 1)[1]))
    return sorted(out)


def process_cms_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    n: int = 2,
    depth: int = 4,
    width: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold one document micro-batch's counter table into the state by
    per-(r, b) integer addition; total gram count folds alongside."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    vs = _committed_versions(state_dir)
    if replay_guard(vs, batch_id, state_dir):
        return
    part = cms_counters(batch_df, n=n, depth=depth, width=width,
                        id_col=id_col, text_col=text_col)
    part_total = _gram_stream(batch_df, n, id_col, text_col).agg(
        F.count("*").cast("long").alias("n_grams")
    )
    if vs:
        prev_c = spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}", "counters"))
        prev_t = spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}", "total"))
        part = (
            prev_c.unionByName(part)
            .groupBy("r", "b")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        part_total = prev_t.unionByName(part_total).agg(
            F.sum("n_grams").cast("long").alias("n_grams")
        )
    vdir = os.path.join(state_dir, f"v={batch_id}")
    part.write.mode("overwrite").parquet(os.path.join(vdir, "counters"))
    part_total.write.mode("overwrite").parquet(os.path.join(vdir, "total"))
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def read_cms_state(
    spark: SparkSession, state_dir: str
) -> tuple[DataFrame, DataFrame] | None:
    """(counters, total) at the highest committed version, or None."""
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    v = os.path.join(state_dir, f"v={vs[-1]}")
    return (
        spark.read.parquet(os.path.join(v, "counters")),
        spark.read.parquet(os.path.join(v, "total")),
    )


def cms_point_estimates(
    counters: DataFrame,
    query_grams: DataFrame,
    depth: int = 4,
    width: int = 256,
    gram_col: str = "gram",
) -> DataFrame:
    """Point estimates for ``query_grams`` from a committed counter
    table: min over the depth bucket reads; a gram whose buckets were
    never touched estimates 0 (coalesced — CMS never undercounts)."""
    d = int(depth)
    probes = query_grams.select(F.col(gram_col).alias("gram")).select(
        "gram", F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r")
    ).select("gram", "r", _cms_bucket("r", "gram", width))
    return (
        probes.join(counters, ["r", "b"], "left")
        .groupBy("gram")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cms_est"))
    )
