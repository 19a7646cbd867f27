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

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.textindex import (
    _cms_bucket,
    _gram_stream,
    cms_counters,
)
from temporal_vector_database_spark.streaming._state import committed_versions, replay_guard


def _committed_versions(state_dir: str) -> list[int]:
    return committed_versions(state_dir, markers=("counters", "total"))


def read_cms_meta(state_dir: str) -> dict | None:
    """Sketch parameters (n, depth, width) of the committed head, or
    None when no batch has committed. The meta file is written BEFORE
    the version's parquet commits, so every committed version carries
    one (ADVICE r06: estimates from a state read with the wrong
    depth/width are silently wrong — the bucket mapping changes and the
    min runs over mismatched rows)."""
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    p = os.path.join(state_dir, f"v={vs[-1]}", "meta.json")
    if not os.path.exists(p):  # pre-r07 state: committed before meta existed
        return None
    with open(p) as f:
        return json.load(f)


def _check_meta(state_dir: str, n: int, depth: int, width: int) -> None:
    meta = read_cms_meta(state_dir)
    if meta is None:
        return
    got = (meta["n"], meta["depth"], meta["width"])
    if got != (n, depth, width):
        raise ValueError(
            f"CMS state at {state_dir!r} was built with (n, depth, width)="
            f"{got} but was called with {(n, depth, width)}: a sketch read "
            "with mismatched parameters returns silently wrong estimates. "
            "Pass the committed parameters (read_cms_meta) or use a fresh "
            "state_dir."
        )


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
    _check_meta(state_dir, n, depth, width)  # folding across params corrupts
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
    # meta first: the version only becomes visible once BOTH parquet
    # _SUCCESS markers land, so every committed version carries its meta
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "meta.json"), "w") as f:
        json.dump({"n": int(n), "depth": int(depth), "width": int(width)}, f)
    part.write.mode("overwrite").parquet(os.path.join(vdir, "counters"))
    part_total.write.mode("overwrite").parquet(os.path.join(vdir, "total"))
    for v in vs[:-1]:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)


def read_cms_state(
    spark: SparkSession,
    state_dir: str,
    n: int | None = None,
    depth: int | None = None,
    width: int | None = None,
) -> tuple[DataFrame, DataFrame] | None:
    """(counters, total) at the highest committed version, or None.

    Passing any of ``n/depth/width`` validates it against the committed
    meta and raises on mismatch (estimates from a sketch read with the
    wrong parameters are silently wrong); omit them to accept whatever
    the state was built with (``read_cms_meta`` reports it)."""
    vs = _committed_versions(state_dir)
    if not vs:
        return None
    meta = read_cms_meta(state_dir) or {}
    for key, val in (("n", n), ("depth", depth), ("width", width)):
        if val is not None and key in meta and meta[key] != int(val):
            raise ValueError(
                f"CMS state at {state_dir!r} was built with {key}="
                f"{meta[key]} but caller expects {key}={val}"
            )
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
    state_dir: str | None = None,
) -> DataFrame:
    """Point estimates for ``query_grams`` from a committed counter
    table: min over the depth bucket reads; a gram whose buckets were
    never touched estimates 0 (coalesced — CMS never undercounts).

    Pass ``state_dir`` to AUTO-LOAD depth/width from the committed meta
    (ADVICE r06) — the explicit ``depth``/``width`` arguments are then
    ignored; querying with parameters other than the build's returns
    silently wrong estimates (different bucket mapping, min over
    mismatched rows)."""
    if state_dir is not None:
        meta = read_cms_meta(state_dir)
        if meta is None:
            raise ValueError(f"no committed CMS state at {state_dir!r}")
        depth, width = meta["depth"], meta["width"]
    d = int(depth)
    probes = query_grams.select(F.col(gram_col).alias("gram")).select(
        "gram", F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r")
    ).select("gram", "r", _cms_bucket("r", "gram", width))
    return (
        probes.join(counters, ["r", "b"], "left")
        .groupBy("gram")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cms_est"))
    )
