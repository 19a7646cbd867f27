"""Incremental maintenance of the persisted IVF index — the LSM /
merge-on-read pattern (Delta/Iceberg-style) applied to ANN serving
(beyond-reference; the reference re-scans every base snapshot per
search, /root/reference/storage/storage_engine.py — here index
maintenance is
an incremental data-layout operation).

Layout under ``<path>/``::

    centroids/                      fixed centroid table (init-time)
    lists/centroid_id=<c>/          base rows (vid, emb, nrm), seq 0
    delta/seq=<n>/centroid_id=<c>/  rows upserted by batch n
    tombstones/                     append-only (vid, seq) parquet

Semantics: **latest-wins per vid** — among all base+delta rows of a
vid the highest ``seq`` is current, and a tombstone at seq ``t`` kills
any row with seq < t (so a later upsert resurrects the id). Centroids
are index *parameters*, fixed at init: incremental batches are assigned
to the existing centroids, never re-seeded — exactly how a production
IVF deployment amortizes training.

Scale posture (the reason this shape wins at 100 TB):

- An upsert touches only its own batch: one nearest-centroid assignment
  pass (centroids broadcast) and a partitioned write of |batch| rows.
  Nothing existing is read or rewritten.
- A delete appends |ids| rows to the tombstone log. Nothing is scanned.
- Serving reads prune to the probed ``centroid_id=`` directories of
  BOTH base and delta (partition-column filters), broadcast the (small,
  regularly-compacted) tombstone log, and resolve latest-wins only over
  the probed candidates — the per-vid window runs on a bounded set.
- Compaction — the only operation that rewrites history — is bounded by
  the AFFECTED partitions (delta partitions ∪ partitions holding
  tombstoned vids, found via a column-pruned vid scan) and overwrites
  them via dynamic partition overwrite; untouched lists are never read
  or written.

Not transactional: a crash between the writes of ``compact`` can leave
a delta applied twice (idempotent — latest-wins absorbs replays) or a
cleared log with uncompacted rows (repair = rerun compact). A real
deployment would wrap these moves in a table-format commit protocol;
the data movement — which is what matters for scale — is identical.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.search import (
    ivf_assign,
    write_ivf_index,
)


def ivf_store_init(
    embeddings: DataFrame,
    path: str,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Build the base index (see ``write_ivf_index``) and start the
    delta/tombstone logs empty."""
    write_ivf_index(embeddings, path, centroid_mod, centroid_rem, id_col, emb_col)
    for sub in ("delta", "tombstones"):
        shutil.rmtree(os.path.join(path, sub), ignore_errors=True)


def _existing_seqs(path: str) -> list[int]:
    seqs = [0]
    delta = os.path.join(path, "delta")
    if os.path.isdir(delta):
        for d in os.listdir(delta):
            m = re.fullmatch(r"seq=(\d+)", d)
            if m:
                seqs.append(int(m.group(1)))
    tomb = os.path.join(path, "tombstones", "_max_seq")
    if os.path.isfile(tomb):
        seqs.append(int(open(tomb).read().strip()))
    return seqs


def _next_seq(path: str) -> int:
    return max(_existing_seqs(path)) + 1


def _record_tomb_seq(path: str, seq: int) -> None:
    d = os.path.join(path, "tombstones")
    os.makedirs(d, exist_ok=True)
    marker = os.path.join(d, "_max_seq")
    prev = int(open(marker).read().strip()) if os.path.isfile(marker) else 0
    with open(marker, "w") as f:
        f.write(str(max(prev, seq)))


def ivf_store_upsert(
    spark,
    path: str,
    batch: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seq: int | None = None,
) -> int:
    """Insert-or-replace a batch of vectors: assign against the FIXED
    centroids (broadcast; one narrow pass over the batch) and write one
    new delta partition set. Returns the batch's sequence number.

    ``seq`` may be supplied explicitly (e.g. derived from a streaming
    batch id): the delta directory for that seq is OVERWRITTEN, making a
    replayed batch rewrite itself instead of stacking — the idempotency
    contract the streaming ingest twin relies on."""
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    _, assign = ivf_assign(
        batch, id_col=id_col, emb_col=emb_col, centroids=cents
    )
    if seq is None:
        seq = _next_seq(path)
    assign.write.mode("overwrite").partitionBy("centroid_id").parquet(
        os.path.join(path, "delta", f"seq={seq}")
    )
    return seq


def ivf_store_delete(
    spark,
    path: str,
    ids: DataFrame,
    id_col: str = "vec_id",
    seq: int | None = None,
) -> int:
    """Delete by id: write (vid) tombstones under ``tombstones/log/
    seq=<n>/``. Nothing is scanned or rewritten — the read path and the
    next compaction apply them. Explicit ``seq`` overwrites that seq's
    log directory (replay-idempotent, as for upserts)."""
    if seq is None:
        seq = _next_seq(path)
    (
        ids.select(F.col(id_col).alias("vid"))
        .write.mode("overwrite")
        .parquet(os.path.join(path, "tombstones", "log", f"seq={seq}"))
    )
    _record_tomb_seq(path, seq)
    return seq


def _raw_rows(spark, path: str) -> DataFrame:
    """Base ∪ delta rows with their seq. Partition-column filters on
    ``centroid_id`` pushed by the caller prune both layers' directories."""
    base = spark.read.parquet(os.path.join(path, "lists")).withColumn(
        "seq", F.lit(0).cast("long")
    )
    delta_dir = os.path.join(path, "delta")
    if os.path.isdir(delta_dir) and os.listdir(delta_dir):
        deltas = (
            spark.read.option("basePath", delta_dir)
            .parquet(*[os.path.join(delta_dir, d) for d in sorted(os.listdir(delta_dir))])
            .withColumn("seq", F.col("seq").cast("long"))
            .select("vid", "emb", "nrm", "centroid_id", "seq")
        )
        base = base.select("vid", "emb", "nrm", "centroid_id", "seq").unionByName(
            deltas
        )
    return base


def _tombstones(spark, path: str) -> DataFrame | None:
    log = os.path.join(path, "tombstones", "log")
    if not os.path.isdir(log):
        return None
    seq_dirs = [os.path.join(log, d) for d in sorted(os.listdir(log)) if d.startswith("seq=")]
    if not seq_dirs:
        return None
    return (
        spark.read.option("basePath", log)
        .parquet(*seq_dirs)
        .groupBy("vid")
        .agg(F.max("seq").cast("long").alias("del_seq"))
    )


def _resolve(rows: DataFrame, tombs: DataFrame | None) -> DataFrame:
    """Latest-wins per vid, then drop rows superseded by a tombstone.
    Run this AFTER partition pruning — the window is per-vid over the
    already-bounded candidate set."""
    w = Window.partitionBy("vid").orderBy(F.desc("seq"), F.asc("centroid_id"))
    latest = rows.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    if tombs is not None:
        latest = latest.join(F.broadcast(tombs), "vid", "left").where(
            F.col("del_seq").isNull() | (F.col("del_seq") < F.col("seq"))
        )
    return latest.select("vid", "emb", "nrm", "centroid_id")


def ivf_store_current(spark, path: str) -> DataFrame:
    """The logically-current corpus (vid, emb, nrm, centroid_id) — what a
    full rebuild over live data would contain, resolved merge-on-read."""
    return _resolve(_raw_rows(spark, path), _tombstones(spark, path))


def ivf_store_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine against the live (base + delta −
    tombstones) index state. Identical probe routing, scoring, and
    tie-breaks to ``ivf_topk_persisted``; the only addition is the
    merge-on-read resolution over the PROBED candidates."""
    from temporal_vector_database_spark.functions.vector import l2_norm
    from temporal_vector_database_spark.operators.search import _guarded_sim

    cents = spark.read.parquet(os.path.join(path, "centroids"))
    q = queries.select(
        F.col("query_id"),
        F.col(emb_col).alias("q_emb"),
        l2_norm(F.col(emb_col)).alias("q_nrm"),
    )
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "q_emb", "q_nrm", "centroid_id",
        _guarded_sim("q_emb", "c_emb", "q_nrm", "c_nrm").alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("centroid_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", "q_nrm", "centroid_id")
    )
    # driver-side query router (|queries| × nprobe ints, not a data collect)
    probe_ids = sorted(
        r["centroid_id"] for r in probes.select("centroid_id").distinct().collect()
    )
    cid_type = cents.schema["centroid_id"].dataType.simpleString()
    rows = (
        _raw_rows(spark, path)
        .where(F.col("centroid_id").isin(probe_ids))
        .withColumn("centroid_id", F.col("centroid_id").cast(cid_type))
    )
    live = _resolve(rows, _tombstones(spark, path))
    cands = probes.join(live, "centroid_id").select(
        "query_id", "vid", _guarded_sim("q_emb", "emb", "q_nrm", "nrm").alias("sim")
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        cands.where(F.col("sim") > 0)
        .withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vid").alias(id_col), "sim")
    )


def ivf_store_compact(spark, path: str) -> None:
    """Fold deltas + tombstones into the base lists and clear the logs.

    Touches only AFFECTED partitions: every partition a delta wrote to,
    plus every base partition holding a tombstoned vid (found with a
    column-pruned (vid, centroid_id) scan — no embedding bytes move for
    the search). Affected partitions are rewritten with their resolved
    contents via dynamic partition overwrite; a partition whose rows all
    died is deleted outright (dynamic overwrite never touches an
    empty-result partition)."""
    delta_dir = os.path.join(path, "delta")
    tombs = _tombstones(spark, path)
    affected: set = set()
    if os.path.isdir(delta_dir):
        for d in os.listdir(delta_dir):
            seq_dir = os.path.join(delta_dir, d)
            if not os.path.isdir(seq_dir):
                continue
            for p in os.listdir(seq_dir):
                m = re.fullmatch(r"centroid_id=(.+)", p)
                if m:
                    affected.add(m.group(1))
    lists_dir = os.path.join(path, "lists")
    if tombs is not None:
        hit = (
            spark.read.parquet(lists_dir)
            .select("vid", "centroid_id")
            .join(F.broadcast(tombs.select("vid")), "vid")
            .select("centroid_id")
            .distinct()
            .collect()
        )
        affected.update(str(r["centroid_id"]) for r in hit)
    if not affected:
        return
    try:
        cid_vals = sorted(int(c) for c in affected)  # native type → pruning
    except ValueError:
        cid_vals = sorted(affected)
    rows = _raw_rows(spark, path).where(F.col("centroid_id").isin(cid_vals))
    # materialize BEFORE overwriting: the resolved plan reads the very
    # directory the write replaces, so the lineage must be cut first
    resolved = _resolve(rows, tombs).localCheckpoint(eager=True)
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        resolved.write.mode("overwrite").partitionBy("centroid_id").parquet(lists_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    # partitions whose every row died: dynamic overwrite wrote nothing —
    # remove their directories explicitly
    survivors = {
        str(r["centroid_id"])
        for r in resolved.select("centroid_id").distinct().collect()
    }
    for cid in affected - survivors:
        shutil.rmtree(os.path.join(lists_dir, f"centroid_id={cid}"), ignore_errors=True)
    shutil.rmtree(delta_dir, ignore_errors=True)
    shutil.rmtree(os.path.join(path, "tombstones"), ignore_errors=True)
    # drop Spark's cached file listing for the rewritten layout
    spark.catalog.refreshByPath(lists_dir)
