"""Graph analytics over similarity graphs (beyond-reference breadth:
the duplicate-cluster graphs that dedup builds — LSH near-dup pairs,
exact-signature cliques — are graphs, and corpus curation wants graph
centrality on them: PageRank picks the canonical representative of a
duplication neighborhood, and authority scores feed quality weighting).

Connected components live in ``operators/dedup.py``
(min-neighborhood contraction); this module adds PageRank.

Float-determinism policy (SCALE.md): classic PageRank is a float
recurrence whose sums are order-dependent. This implementation is
FIXED-POINT: ranks are BIGINT units of 1/SCALE, per-edge contributions
use integer floor division, and per-node sums are integer sums — every
iteration is bit-identical in any engine and under any partitioning.
The floors leak O(deg) units of probability mass per node per
iteration (bounded by N·avg_deg/SCALE ≪ 1%), the standard cost of a
deterministic fixed-point formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank_fixed(
    edges: DataFrame,
    n_iter: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = PR_SCALE,
) -> DataFrame:
    """Fixed-point PageRank over a DIRECTED edge list (symmetrize first
    for an undirected similarity graph): ``n_iter`` unrolled power
    iterations of

        pr'(v) = (1−d)·S/N  +  Σ_{u→v} floor(pr(u)·d_num / (d_den·deg(u)))

    with every quantity an exact BIGINT in 1/``scale`` units.

    Plan shape: degree and the node set are one-time aggregates; each
    iteration is an equi-join of the edge list with the current N-row
    rank table keyed by ``src`` followed by a ``dst``-keyed integer sum
    — 2 bounded shuffles per iteration, no windows, no floats. At
    cluster scale the edge list is the reused big side: pre-partition
    (or bucket) it by ``src`` once and every iteration's join reuses
    that layout; the rank table is the small, changing side.

    Output: ``(id, pr_units BIGINT, deg BIGINT)`` for every node
    appearing in the edge list. Ranks of nodes with no in-edges settle
    at the teleport floor ``(1−d)·S/N``.

    Contract: requires ``0 < damping_num <= damping_den`` (a damping
    factor above 1 makes the teleport term negative and the iteration
    divergent — validated, raises ``ValueError``). DANGLING NODES (out-
    degree 0) do not redistribute their rank mass — it simply decays
    toward the teleport floor, so total mass is conserved only on
    graphs where every node has an out-edge (the symmetrized near-dup
    graph this serves always does). For general directed graphs with
    sinks, add self-loops or symmetrize before calling.
    """
    if not (0 < int(damping_num) <= int(damping_den)):
        raise ValueError(
            f"pagerank_fixed requires 0 < damping_num <= damping_den, got "
            f"{damping_num}/{damping_den}"
        )
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    n1 = nodes.agg(F.count("*").cast("long").alias("n"))
    s, dn, dd = int(scale), int(damping_num), int(damping_den)
    pr = (
        nodes.crossJoin(F.broadcast(n1))
        .select("id", F.expr(f"CAST({s} AS BIGINT) div n").alias("pr_units"), "n")
    )
    for _ in range(int(n_iter)):
        contrib = (
            e.join(pr.select(F.col("id").alias("src"), "pr_units"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                F.expr(f"(pr_units * {dn}) div ({dd} * deg)").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").cast("long").alias("in_mass"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(n1))
            .join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.expr(f"CAST({s} AS BIGINT) * {dd - dn} div ({dd} * n)")
                    + F.coalesce(F.col("in_mass"), F.lit(0))
                )
                .cast("long")
                .alias("pr_units"),
                "n",
            )
        )
    return pr.join(deg.withColumnRenamed("src", "id"), "id", "left").select(
        "id",
        "pr_units",
        F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("deg"),
    )
