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
    # pin the edge list (r10 plan audit): every iteration's join plus
    # the node/degree derivations re-reference it, and when it arrives
    # as a lazy LSH candidate-join plan each reference re-executes that
    # whole pipeline (the neardup_pagerank gate scanned its inputs 30×
    # unpinned) — the kcore/label_propagation discipline
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
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


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """Semi-supervised LABEL PROPAGATION over a directed edge list
    (symmetrize first for an undirected similarity graph) — the
    curation move that turns a handful of human-labeled exemplars into
    cluster labels for whole duplication neighborhoods: ``n_iter``
    SYNCHRONOUS rounds of

        label'(v) = seed(v)                    if v is a seed (clamped)
                  | argmax_label |{u→v : label(u)=label}|   else
                  | label(v)                   if no labeled in-neighbor

    with the argmax fully deterministic: highest vote count, ties by
    lexicographically smallest label. Unreached non-seed nodes keep a
    NULL label.

    Plan shape per round: one equi-join of the edge list with the
    node-sized label table keyed by ``src``, a (dst, label) vote
    aggregate, then the argmax as a max-count aggregate + join-back +
    min-label aggregate — all node/vocabulary-bounded, no windows, no
    driver traffic. At cluster scale the edge list is the reused big
    side (pre-partition by ``src`` once); the label table is the
    small, changing side — the ``pagerank_fixed`` posture.

    Output: ``(id, label, is_seed)`` for every node in the edge list.
    """
    # pin the edge list: it is the reused big side of EVERY round's
    # join (and of the node derivation) — without the checkpoint an
    # expensive upstream derivation (an LSH candidate join) would
    # re-execute once per round per branch (the kcore discipline)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    # pin the seed table too (r10 plan audit): it is re-referenced in
    # EVERY round's rebuild plus the final select — 2·n_iter + 2
    # executions of whatever upstream derived the seeds if left lazy
    sd = seeds.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("_seed_label")
    ).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.join(sd, "id", "left").select(
        "id", F.col("_seed_label").alias("label")
    )
    for rnd in range(1, int(n_iter) + 1):
        votes = (
            e.join(
                labels.where(F.col("label").isNotNull()).select(
                    F.col("id").alias("src"), "label"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        mx = votes.groupBy("id").agg(F.max("cnt").alias("_mx"))
        best = (
            votes.join(mx, "id")
            .where(F.col("cnt") == F.col("_mx"))
            .groupBy("id")
            .agg(F.min("label").alias("_new_label"))
        )
        labels = (
            nodes.join(sd, "id", "left")
            .join(best, "id", "left")
            .join(labels.withColumnRenamed("label", "_old"), "id", "left")
            .select(
                "id",
                F.coalesce("_seed_label", "_new_label", "_old").alias("label"),
            )
        )
        # each round references the PREVIOUS round's labels plan twice
        # (votes->best and the _old join-back); without a periodic pin
        # the logical plan and earlier rounds' vote recomputation grow
        # ~2^n_iter — fine at the default 3, pathological at the public
        # knob's larger values (the bpe_train_batched cadence,
        # operators/tokenize.py).
        if rnd % 4 == 0 and rnd < int(n_iter):
            labels = labels.localCheckpoint()
    return (
        labels.join(sd, "id", "left")
        .select(
            "id",
            "label",
            F.col("_seed_label").isNotNull().alias("is_seed"),
        )
    )


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient
    over an UNDIRECTED graph (pass either orientation or both; edges
    are canonicalized to ``a < b`` and deduped first) — the
    dedup-cluster QA metric: a duplication neighborhood whose near-dup
    pairs close into triangles is a genuine clique (one source copied
    many times); low closure means chained borderline matches that a
    transitive-closure dedup would over-merge.

    Algorithm: rank-oriented node-iterator (the MapReduce triangle
    standard, Suri & Vassilvitskii WWW'11): orient every canonical edge
    from lower to higher ``(deg, id)`` rank, enumerate wedges at their
    LOWEST-rank vertex (each node pairs only its higher-ranked
    neighbors, so skewed hubs never enumerate their full neighbor
    square — wedge work is bounded by arboricity, not max degree), then
    close wedges with an equi-join against the oriented edge list.
    Each triangle is counted exactly once.

    Plan shape: two aggregations (degree, per-corner counts) + two
    equi-joins (wedge build, wedge close); everything integer,
    partition-order-proof. ``ccoef = 2T / (deg·(deg−1))`` is the single
    IEEE division of two exact BIGINTs (NULL for deg < 2).

    Output: ``(id, deg BIGINT, n_triangles BIGINT, ccoef DOUBLE)`` for
    every node of the canonical edge list.
    """
    a, b = F.col(src_col), F.col(dst_col)
    ce = (
        edges.where(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    # the canonical edge list is referenced 5x downstream (degree, both
    # orientation joins, wedge build x2, wedge close) — materialize it
    # once so an expensive upstream (LSH band join + verify) doesn't
    # recompute per reference (measured 4.5 s -> ~1.5 s at sf0.1); at
    # cluster scale this is the standard persist-the-edge-side of
    # iterative graph algorithms (same discipline as pagerank_fixed's
    # reusable big side)
    ce = ce.localCheckpoint()
    deg = (
        ce.select(F.col("a").alias("id"))
        .unionByName(ce.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("degb"))
    wd = ce.join(da, "a").join(db, "b")
    # orient low (deg, id) -> high (deg, id)
    a_low = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    o = wd.select(
        F.when(a_low, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_low, F.col("b")).otherwise(F.col("a")).alias("w"),
        F.when(a_low, F.col("degb")).otherwise(F.col("dega")).alias("degw"),
    )
    e1 = o.select(F.col("u"), F.col("w").alias("w1"), F.col("degw").alias("d1"))
    e2 = o.select(F.col("u"), F.col("w").alias("w2"), F.col("degw").alias("d2"))
    wedges = e1.join(e2, "u").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("w1") < F.col("w2")))
    )
    tri = wedges.join(
        o.select(F.col("u").alias("w1"), F.col("w").alias("w2")), ["w1", "w2"]
    ).select("u", "w1", "w2")
    corners = (
        tri.select(F.col("u").alias("id"))
        .unionByName(tri.select(F.col("w1").alias("id")))
        .unionByName(tri.select(F.col("w2").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    out = deg.join(corners, "id", "left").select(
        "id",
        "deg",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
    )
    return out.withColumn(
        "ccoef",
        F.when(
            F.col("deg") >= 2,
            (F.lit(2) * F.col("n_triangles")).cast("double")
            / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
        ).otherwise(F.lit(None).cast("double")),
    )


def kcore(
    edges: DataFrame,
    k: int = 2,
    max_iter: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core decomposition membership of an UNDIRECTED graph
    (canonicalized/deduped like :func:`triangle_counts`): repeatedly
    peel nodes whose degree within the surviving subgraph is below
    ``k`` — the densest-community extractor for duplication
    neighborhoods (a 2-core separates genuinely clustered near-dup
    structure from dangling chains that transitive closure would
    over-merge).

    BOUNDED peeling (``max_iter`` rounds, early-stopped at the
    fixpoint) with an explicit CONVERGENCE CERTIFICATE: the published
    ``converged`` column is true iff the final round removed nothing —
    then the result IS the exact k-core, not an upper bound. Peeling is
    monotone, so extra rounds after the fixpoint are no-ops and an
    early-stopped run publishes exactly what the fully-unrolled
    computation would (the oracle unrolls all rounds).

    Plan: per round, two broadcast-or-shuffled semi-joins of the
    (checkpointed) edge list against the shrinking alive set + one
    integer degree aggregate; the edge relation is materialized once
    and reused every round (the iterative-graph discipline shared with
    ``pagerank_fixed``/``triangle_counts``). Only per-round COUNTS come
    back to the driver.

    Output: ``(id, deg_in_core BIGINT, converged BOOLEAN)`` for every
    node of the final surviving set, where ``deg_in_core`` is the
    degree within the survivor-induced subgraph.

    An EMPTY result is always the exact k-core, regardless of
    ``max_iter`` (ADVICE r06): the certificate is per-row, so a
    fully-peeled graph carries no ``converged`` rows — but peeling is
    monotone (nodes never come back), so once the alive set is empty
    the exact k-core is empty too. Consumers must not treat
    empty-without-certificate as indeterminate.
    """
    if int(k) < 1:
        raise ValueError(f"kcore requires k >= 1, got {k}")
    if int(max_iter) < 1:
        raise ValueError(f"kcore requires max_iter >= 1, got {max_iter}")
    a, b = F.col(src_col), F.col(dst_col)
    ce = (
        edges.where(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
        .localCheckpoint()
    )
    alive = (
        ce.select(F.col("a").alias("id"))
        .unionByName(ce.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n_prev = alive.count()
    converged = False
    for _ in range(int(max_iter)):
        ea = ce.join(alive.withColumnRenamed("id", "a"), "a", "left_semi").join(
            alive.withColumnRenamed("id", "b"), "b", "left_semi"
        )
        deg = (
            ea.select(F.col("a").alias("id"))
            .unionByName(ea.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count("*").cast("long").alias("deg"))
        )
        # keep the degree beside the id (r13): at the fixpoint round the
        # surviving set equals the previous round's, so `deg` — computed
        # over edges within the PREVIOUS alive set — is already the
        # degree within the survivor-induced subgraph. Carrying it
        # through the checkpoint makes the final re-peel pass (two more
        # semi-joins + a degree aggregate) unnecessary on the converged
        # path; the extra long per row is noise next to the id.
        alive = deg.where(F.col("deg") >= int(k)).localCheckpoint()
        n_new = alive.count()
        if n_new == n_prev:
            converged = True
            break
        n_prev = n_new
    if converged:
        # alive == previous alive ⇒ its `deg` IS deg_in_core (see above)
        return alive.select(
            "id",
            F.col("deg").cast("long").alias("deg_in_core"),
            F.lit(True).alias("converged"),
        )
    ef = ce.join(alive.withColumnRenamed("id", "a"), "a", "left_semi").join(
        alive.withColumnRenamed("id", "b"), "b", "left_semi"
    )
    degf = (
        ef.select(F.col("a").alias("id"))
        .unionByName(ef.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("deg_in_core"))
    )
    return (
        alive.select("id").join(degf, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("deg_in_core"), F.lit(0)).cast("long").alias("deg_in_core"),
            F.lit(bool(converged)).alias("converged"),
        )
    )
