"""S1: exact batch cosine top-k similarity search.

The reference normalizes base-snapshot embeddings into an in-memory FAISS
``IndexFlatIP`` and scans it per query (``storage/storage_engine.py:83-110,
439-469``). Flat inner-product search over normalized vectors IS exact
brute-force cosine, so the Spark-native form is: broadcast the (small)
query batch against the ``kind='base'`` rows, compute the dot product as a
codegen'd higher-order-function fold, keep ``sim > 0``
(``storage/storage_engine.py:465``), and take per-query top-k.

Scale posture: the query side is broadcast (no shuffle for the join); the
scored pairs are pre-reduced with an Arrow-batched local top-k
(``mapInPandas``) before the final per-query window, so the shuffle moves
at most ``k`` rows per (query, input-partition) instead of the full
``|queries| × |bases|`` cross product. The index object disappears — "index
build" is just the (cacheable) normalized base projection. An approximate
LSH variant for 100 TB lives in ``operators/dedup.py`` patterns / MLlib
``BucketedRandomProjectionLSH``.

Semantics preserved (SURVEY.md §2.3 #8): search covers base snapshots only;
scores are cosine; results filtered to ``sim > 0``; ``k`` is naturally
capped by the number of candidates. Ties broken by (content_id, seq) for
determinism (the reference inherits FAISS insertion order — unspecified).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from temporal_vector_database_spark.functions.vector import cosine  # noqa: F401  (public re-export)


def _guarded_sim(a_emb: str, b_emb: str, a_nrm: str, b_nrm: str):
    """dot/(na·nb) with zero-norm guard, norms taken from precomputed
    columns — bit-identical to ``cosine()`` but one fold per pair."""
    from temporal_vector_database_spark.functions.vector import dot

    return (
        F.when(
            (F.col(a_nrm) > 0) & (F.col(b_nrm) > 0),
            dot(F.col(a_emb), F.col(b_emb)) / (F.col(a_nrm) * F.col(b_nrm)),
        ).otherwise(F.lit(0.0))
    )


def score_candidates(
    bases: DataFrame,
    queries: DataFrame,
    id_cols: tuple[str, ...] = ("content_id", "seq"),
    emb_col: str = "embedding",
) -> DataFrame:
    """Cross-score every query against every candidate: broadcast join +
    codegen'd cosine. ``queries`` needs (query_id, embedding[, k]).

    Norms are computed ONCE per input row before the join (|Q| + |C| folds)
    instead of inside the pair expression (3 folds × |Q|·|C|); the per-pair
    work is a single dot-product fold. Bit-identical to ``cosine()``:
    dot / (nq · nc), zero-norm guarded.
    """
    from temporal_vector_database_spark.functions.vector import dot, l2_norm

    q = queries.select(
        "query_id",
        F.col(emb_col).alias("_q_emb"),
        l2_norm(F.col(emb_col)).alias("_q_nrm"),
        *(["k"] if "k" in queries.columns else []),
    )
    c = bases.select(
        *id_cols,
        F.col(emb_col).alias("_c_emb"),
        l2_norm(F.col(emb_col)).alias("_c_nrm"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        *id_cols,
        *(["k"] if "k" in q.columns else []),
        F.when(
            (F.col("_q_nrm") > 0) & (F.col("_c_nrm") > 0),
            dot(F.col("_q_emb"), F.col("_c_emb")) / (F.col("_q_nrm") * F.col("_c_nrm")),
        )
        .otherwise(F.lit(0.0))
        .alias("sim"),
    )
    return scored


def score_candidates_pandas(
    bases: DataFrame,
    queries: DataFrame,
    id_cols: tuple[str, ...] = ("content_id", "seq"),
    emb_col: str = "embedding",
) -> DataFrame:
    """BLAS twin of `score_candidates`: the query batch is collected
    (a search batch is small by design — the reference searches one vector
    at a time) and broadcast; each candidate partition scores all queries
    with one float64 matrix product in a narrow ``mapInPandas`` — no
    cross-join, no interpreted higher-order-function fold (Spark evaluates
    HOF lambdas per element; that interpretation is the measured cost of
    the SQL form).

    Bit parity with `score_candidates`: on the engine's dyadic-grid
    embeddings every dot product is exactly representable, norms/divisions
    are computed in the same operand order, so the sims are identical
    (pinned in tests). On arbitrary floats the two may differ in the last
    ulp — use ``impl="sql"`` when oracle-exactness on non-grid data
    matters.
    """
    import numpy as np

    has_k = "k" in queries.columns
    qrows = queries.select(
        "query_id", emb_col, *(["k"] if has_k else [])
    ).collect()
    qids = [r["query_id"] for r in qrows]
    qks = [int(r["k"]) for r in qrows] if has_k else None
    if qrows:
        qm = np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in qrows])
        qn = np.sqrt((qm * qm).sum(axis=1))
    else:
        qm = np.zeros((0, 0))
        qn = np.zeros(0)
    sc = bases.sparkSession.sparkContext
    bc = sc.broadcast((qids, qm, qn, qks))

    id_cols = tuple(id_cols)

    def fn(batches):
        import pandas as pd

        qids_, qm_, qn_, qks_ = bc.value
        nq = len(qids_)
        for pdf in batches:
            nb = len(pdf)
            if nb == 0 or nq == 0:
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
            bn = np.sqrt((m * m).sum(axis=1))
            s = m @ qm_.T  # (nb, nq)
            denom = qn_[None, :] * bn[:, None]  # same order as nq·nc in SQL
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np.where((qn_[None, :] > 0) & (bn[:, None] > 0), s / denom, 0.0)
            qidx = np.tile(np.arange(nq), nb)
            bidx = np.repeat(np.arange(nb), nq)
            out = {"query_id": [qids_[i] for i in qidx]}
            for c in id_cols:
                out[c] = pdf[c].to_numpy()[bidx]
            if qks_ is not None:
                out["k"] = [qks_[i] for i in qidx]
            out["sim"] = sims[bidx, qidx]
            yield pd.DataFrame(out)

    qid_type = queries.schema["query_id"].dataType.simpleString()
    id_types = ", ".join(
        f"{c} {bases.schema[c].dataType.simpleString()}" for c in id_cols
    )
    schema = f"query_id {qid_type}, {id_types}"
    if has_k:
        schema += ", k int"
    schema += ", sim double"
    return bases.select(*id_cols, emb_col).mapInPandas(fn, schema=schema)


def _local_topk(id_cols: tuple[str, ...], max_k: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            pdf = pdf.sort_values(["query_id", "sim"], ascending=[True, False])
            yield pdf.groupby("query_id", sort=False).head(max_k)

    return fn


def topk_cosine(
    bases: DataFrame,
    queries: DataFrame,
    k: int | None = None,
    id_cols: tuple[str, ...] = ("content_id", "seq"),
    emb_col: str = "embedding",
    prereduce: bool = True,
    impl: str = "pandas",
) -> DataFrame:
    """Per-query top-k by cosine, ``sim > 0`` only.

    ``k`` defaults to the per-query ``k`` column (reference default 5,
    ``storage/storage_engine.py:441``). Output: query_id, id_cols…, sim,
    rank (1-based, ties broken by id_cols).

    ``impl="pandas"`` (default) scores with the BLAS twin
    (`score_candidates_pandas`); ``impl="sql"`` uses the broadcast-join +
    HOF-fold plan (`score_candidates`) — bit-equal on grid embeddings,
    cross-checked in tests.
    """
    score = score_candidates_pandas if impl == "pandas" else score_candidates
    scored = score(bases, queries, id_cols=id_cols, emb_col=emb_col)
    has_k_col = "k" in scored.columns
    if k is not None:
        scored = scored.withColumn("k", F.lit(int(k)))
    elif not has_k_col:
        scored = scored.withColumn("k", F.lit(5))
    scored = scored.where(F.col("sim") > 0)

    if prereduce and k is not None:
        # Arrow-batched partial top-k: map-side reduction before the
        # per-query shuffle — at most k survivors per (query, batch), so the
        # shuffle moves O(k · partitions) rows, not |queries| × |bases|.
        scored = scored.mapInPandas(_local_topk(id_cols, int(k)), schema=scored.schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), *[F.asc(c) for c in id_cols])
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= F.col("k"))
        .drop("k")
    )


def search_similar_snapshots(versions: DataFrame, queries: DataFrame, k: int | None = None) -> DataFrame:
    """Reference facade ``search_similar_content``
    (``storage/temporal_database.py:274-287``): search base snapshots only."""
    bases = versions.where(F.col("kind") == "base")
    return topk_cosine(bases, queries, k=k)


def ann_brute_force(embeddings: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Beyond-reference: brute-force cosine top-k over the driver's
    ``embeddings`` table (vec_id, embedding) — the exact baseline for ANN."""
    cands = embeddings.select(F.col("vec_id"), F.col("embedding"))
    return topk_cosine(cands, queries, k=k, id_cols=("vec_id",))


def mips_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Per-query top-k by MAXIMUM INNER PRODUCT (r09) — the retrieval
    scoring recommenders and learned-sparse/dense rankers actually use
    when vector NORM carries signal (popularity, confidence): unlike
    cosine, a longer vector legitimately outranks a better-aligned
    short one, so there is no norm division and no ``sim > 0`` floor
    (negative dots rank too — k is a hard count here).

    Output: ``(query_id, vec_id, dot, rank)`` — rank 1-based, ties by
    ``vec_id``; ``dot`` exact on the dyadic grid (integer-valued sums
    scaled by the grid step, bit-stable under any fold order at the
    fixture's magnitudes).

    Plan: broadcast the k-row query table over the corpus (one narrow
    pass, JVM HOF dot), Arrow map-side partial top-k before the
    per-query shuffle (the ``topk_cosine`` prereduce — the exchange
    carries O(k · partitions) rows, never the corpus), then the k-row
    window. MIPS-to-cosine reductions (augmenting with
    √(M²−‖x‖²) dims) are unnecessary here because the scan IS the
    baseline; an IVF-style pruned MIPS would layer on the same
    persisted layouts as the cosine ladder."""
    from temporal_vector_database_spark.functions.vector import dot

    q = queries.select("query_id", F.col(emb_col).alias("_q_emb"))
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col),
        dot(F.col(emb_col), F.col("_q_emb")).alias("sim"),
    )
    scored = scored.withColumn("k", F.lit(int(k)))

    def _partial(batches):
        # tie-aware partial top-k: sort includes the id tie-breaker so
        # a k-boundary tie keeps exactly the rows the final window will
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            pdf = pdf.sort_values(
                ["query_id", "sim", id_col], ascending=[True, False, True]
            )
            yield pdf.groupby("query_id", sort=False).head(int(k))

    scored = scored.mapInPandas(_partial, schema=scored.schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= F.col("k"))
        .select("query_id", id_col, F.col("sim").alias("dot"), "rank")
    )


def ivf_assign(
    embeddings: DataFrame,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    impl: str = "pandas",
    centroids: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: deterministic centroid seeding + nearest-centroid
    assignment.

    Centroids are the vectors with ``id % centroid_mod == centroid_rem`` —
    a training-free, engine-portable seeding (run ``kmeans_refine`` over
    these seeds for trained lists; the assignment/probe machinery below
    is identical either way). ``centroids`` overrides the seeding with an
    explicit (centroid_id, c_emb) table — how k-means-refined centroids
    feed back into this same assignment plan. Returns (centroids,
    assignment) where assignment maps every vector to its argmax-cosine
    centroid (ties → lowest centroid_id).

    ``impl="pandas"`` (default): centroids broadcast, one BLAS argmax per
    partition — the |vectors| × |centroids| interpreted HOF fold of the
    SQL form is the measured cost. ``impl="sql"``: broadcast cross-join +
    window. Bit-equal on grid embeddings (tests).
    """
    from pyspark.sql import Window

    from temporal_vector_database_spark.functions.vector import l2_norm

    e = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(emb_col).alias("emb"),
        l2_norm(F.col(emb_col)).alias("nrm"),
    )
    if centroids is not None:
        cents = centroids.select(
            "centroid_id",
            "c_emb",
            (
                F.col("c_nrm")
                if "c_nrm" in centroids.columns
                else l2_norm(F.col("c_emb")).alias("c_nrm")
            ),
        )
    else:
        cents = e.where(F.col("vid") % centroid_mod == centroid_rem).select(
            F.col("vid").alias("centroid_id"),
            F.col("emb").alias("c_emb"),
            F.col("nrm").alias("c_nrm"),
        )
    if impl == "pandas":
        import numpy as np

        # sorted by centroid_id so np.argmax's first-match tiebreak
        # reproduces the SQL (desc sim, asc centroid_id) ordering
        crows = cents.orderBy("centroid_id").collect()
        cids = [r["centroid_id"] for r in crows]
        cm = (
            np.stack([np.asarray(r["c_emb"], dtype=np.float64) for r in crows])
            if crows
            else np.zeros((0, 0))
        )
        cn = np.sqrt((cm * cm).sum(axis=1)) if crows else np.zeros(0)
        bc = embeddings.sparkSession.sparkContext.broadcast((cids, cm, cn))

        def fn(batches):
            import pandas as pd

            cids_, cm_, cn_ = bc.value
            for pdf in batches:
                if len(pdf) == 0 or not cids_:
                    continue
                m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])
                bn = np.sqrt((m * m).sum(axis=1))
                s = m @ cm_.T
                denom = bn[:, None] * cn_[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = np.where((bn[:, None] > 0) & (cn_[None, :] > 0), s / denom, 0.0)
                best = sims.argmax(axis=1)
                yield pd.DataFrame(
                    {
                        "vid": pdf["vid"].to_numpy(),
                        "emb": pdf["emb"],
                        "nrm": bn,
                        "centroid_id": [cids_[i] for i in best],
                    }
                )

        vid_t = e.schema["vid"].dataType.simpleString()
        emb_t = e.schema["emb"].dataType.simpleString()
        assign = e.select("vid", "emb").mapInPandas(
            fn, schema=f"vid {vid_t}, emb {emb_t}, nrm double, centroid_id {vid_t}"
        )
        return cents, assign
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vid", "emb", "nrm", "centroid_id", _guarded_sim("emb", "c_emb", "nrm", "c_nrm").alias("c_sim")
    )
    w = Window.partitionBy("vid").orderBy(F.desc("c_sim"), F.asc("centroid_id"))
    assign = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vid", "emb", "nrm", "centroid_id")
    )
    return cents, assign


def kmeans_step(
    embeddings: DataFrame,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """One Lloyd iteration in long form: nearest-centroid assignment
    (``ivf_assign``) followed by the per-cluster per-dimension mean —
    the update half of k-means, exposed as a gateable DataFrame.

    Output: (centroid_id, dim, centroid_r, n) — the refined centroid
    coordinates and cluster sizes. posexplode → avg is
    fully partial-aggregatable (map-side combine), so a giant cluster
    reduces map-side instead of funnelling through one task; on the
    quantized grid the sums are exact, making avg order-independent and
    the gate hash-stable.
    """
    _, assign = ivf_assign(
        embeddings, centroid_mod, centroid_rem, id_col, emb_col, centroids=centroids
    )
    return (
        assign.select("centroid_id", F.posexplode("emb").alias("dim", "x"))
        .groupBy("centroid_id", "dim")
        .agg(
            # unrounded: grid-exact sums make the quotient engine-identical;
            # round(·, 9) lands ON the half boundary for dyadic averages
            F.avg("x").alias("centroid_r"),
            F.count("*").cast("long").alias("n"),
        )
    )


def kmeans_refine(
    embeddings: DataFrame,
    n_iter: int = 3,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """``n_iter`` Lloyd iterations from the deterministic modulo seeds:
    assign → recompute means → reassign. Returns the final centroid
    table (centroid_id, c_emb) ready for ``ivf_assign(centroids=...)`` /
    ``ivf_topk``-style probing.

    The centroid table is k rows — driver-side materialization per
    iteration is the standard k-means shape (Spark MLlib does the same
    reduce-to-driver per step); the DATA never moves to the driver, each
    iteration is one broadcast-assignment pass + one partial-aggregated
    mean over the corpus. Clusters that lose all members keep their
    previous centroid (standard Lloyd convention).
    """
    spark = embeddings.sparkSession
    seeds, _ = ivf_assign(embeddings, centroid_mod, centroid_rem, id_col, emb_col)
    rows = {
        r["centroid_id"]: [float(x) for x in r["c_emb"]]
        for r in seeds.select("centroid_id", "c_emb").collect()
    }
    cents = spark.createDataFrame(
        sorted(rows.items()), "centroid_id bigint, c_emb array<double>"
    )
    for _ in range(max(n_iter, 0)):
        step = kmeans_step(
            embeddings, centroid_mod, centroid_rem, id_col, emb_col, centroids=cents
        )
        for r in (
            step.groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "centroid_r"))).alias("dims"))
            .collect()
        ):
            rows[r["centroid_id"]] = [d["centroid_r"] for d in r["dims"]]
        cents = spark.createDataFrame(
            sorted(rows.items()), "centroid_id bigint, c_emb array<double>"
        )
    return cents


def cluster_quality_dbi(
    embeddings: DataFrame,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    grid: int = 1024,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Per-cluster DAVIES-BOULDIN quality report (r08) — the evaluation
    closing the clustering loop (seed → ``kmeans_refine`` →
    ``ivf_assign`` → HOW GOOD are the lists?): for each cluster i,
    ``r_max = max_{j≠i} (s²_i + s²_j) / d²_ij`` — its worst
    scatter-to-separation ratio against any other cluster (lower is
    better; the classic index is the mean of these, left to the caller
    as a k-row client fold so every published number stays hash-exact).

    Exactness: the squared-distance variant of the index, computed on
    the ``1/grid`` dyadic lattice — member/centroid coordinates scale
    to exact BIGINTs, so scatter numerators ``s2num_i = Σ_members
    ‖x−c_i‖²`` and pair separations ``d²_ij`` are exact integer sums in
    ``grid⁻²`` units (partition-order-proof), and the two published
    doubles (``s2_mean``, ``r_max``) are single fixed IEEE divisions of
    sub-2^53 integers — bit-identical in any engine. Pairs with
    ``d²_ij = 0`` (duplicate centroids) are skipped; a cluster with no
    valid partner publishes NULL.

    Plan: one broadcast-assignment pass (shared ``ivf_assign``), one
    row-local ``zip_with``/``aggregate`` integer fold per member, one
    partial-aggregatable per-cluster sum; the r-matrix is a k×k join of
    two k-row model tables — never data-sized. Output: ``(cluster_id,
    n_members, s2num, s2_mean, worst_other, r_max)``.
    """
    from pyspark.sql import Window

    g = int(grid)
    cents, assign = ivf_assign(
        embeddings, centroid_mod, centroid_rem, id_col, emb_col,
        centroids=centroids,
    )

    def to_int(col):
        return F.transform(col, lambda x: F.round(x * g, 0).cast("long"))

    def dist2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    mem = (
        assign.join(F.broadcast(cents), "centroid_id")
        .select(
            "centroid_id",
            dist2(to_int(F.col("emb")), to_int(F.col("c_emb"))).alias("d2"),
        )
    )
    stats = mem.groupBy("centroid_id").agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum("d2").cast("long").alias("s2num"),
    )
    ca = cents.select(F.col("centroid_id").alias("i"), to_int(F.col("c_emb")).alias("ia"))
    cb = cents.select(F.col("centroid_id").alias("j"), to_int(F.col("c_emb")).alias("ib"))
    cd = (
        ca.join(F.broadcast(cb), F.col("i") != F.col("j"))
        .select("i", "j", dist2(F.col("ia"), F.col("ib")).alias("cd2"))
        .where(F.col("cd2") > 0)
    )
    si = stats.select(
        F.col("centroid_id").alias("i"),
        F.col("n_members").alias("n_i"),
        F.col("s2num").alias("s2_i"),
    )
    sj = stats.select(
        F.col("centroid_id").alias("j"),
        F.col("n_members").alias("n_j"),
        F.col("s2num").alias("s2_j"),
    )
    r = (
        cd.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .withColumn(
            "r",
            (F.col("s2_i") * F.col("n_j") + F.col("s2_j") * F.col("n_i")).cast(
                "double"
            )
            / (F.col("n_i") * F.col("n_j") * F.col("cd2")).cast("double"),
        )
    )
    w = Window.partitionBy("i").orderBy(F.desc("r"), F.asc("j"))
    best = (
        r.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("i", F.col("j").alias("worst_other"), F.col("r").alias("r_max"))
    )
    return (
        stats.join(best, stats["centroid_id"] == best["i"], "left")
        .select(
            F.col("centroid_id").alias("cluster_id"),
            "n_members",
            "s2num",
            (
                F.col("s2num").cast("double")
                / (F.col("n_members") * F.lit(g * g)).cast("double")
            ).alias("s2_mean"),
            "worst_other",
            "r_max",
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate top-k cosine via IVF: probe the ``nprobe`` nearest
    centroid lists only, then exact cosine + per-query top-k within them.

    Scale story: the exhaustive scan touches every vector per query; IVF
    touches ~(nprobe / n_centroids) of them. The centroid table is tiny →
    broadcast; the candidate join is an equi-join on centroid_id (shuffle
    bounded by the probed lists). Recall is the standard IVF tradeoff and
    is deterministic here (no RNG), so results are engine-reproducible.
    """
    from pyspark.sql import Window

    cands = _ivf_candidates(
        embeddings, queries, nprobe, centroid_mod, centroid_rem,
        id_col, emb_col, exclude_self,
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        cands.where(F.col("sim") > 0)
        .withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vid").alias(id_col), "sim")
    )


def _ivf_candidates(
    embeddings: DataFrame,
    queries: DataFrame,
    nprobe: int,
    centroid_mod: int,
    centroid_rem: int,
    id_col: str,
    emb_col: str,
    exclude_self: bool,
) -> DataFrame:
    """Shared IVF candidate generation: per query, the exact cosine of
    every vector in the ``nprobe`` nearest centroid lists — (query_id,
    vid, sim). ``ivf_topk`` ranks it; ``ivf_radius_search`` filters it."""
    from pyspark.sql import Window

    from temporal_vector_database_spark.functions.vector import l2_norm

    cents, assign = ivf_assign(embeddings, centroid_mod, centroid_rem, id_col, emb_col)
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
    cands = probes.join(assign, "centroid_id").select(
        "query_id", "vid", _guarded_sim("q_emb", "emb", "q_nrm", "nrm").alias("sim")
    )
    if exclude_self:
        # kNN-graph use: queries ARE the corpus; a vector is not its own
        # neighbor (drop BEFORE ranking so k real neighbors survive)
        cands = cands.where(F.col("vid") != F.col("query_id"))
    return cands


def ivf_radius_search(
    embeddings: DataFrame,
    queries: DataFrame,
    min_sim: float = 0.25,
    nprobe: int = 2,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Range (radius) search: ALL probed-list vectors with cosine
    ``sim >= min_sim`` per query — FAISS ``range_search`` semantics, the
    top-k complement for recall-oriented retrieval (dedup sweeps,
    contamination hunts) where the neighbor COUNT is unknown a priori.

    Plan: identical candidate generation to ``ivf_topk`` (broadcast
    centroids, probed-list equi-join) but the output is a plain filter —
    NO per-query ranking window, so there is no per-query sort and no
    possibility of a hot query skewing a window partition; result size
    is data-dependent by design. Threshold comparisons are safe
    cross-engine because sims are bit-identical on the quantized grid
    (same expression, same operand order both sides)."""
    cands = _ivf_candidates(
        embeddings, queries, nprobe, centroid_mod, centroid_rem,
        id_col, emb_col, exclude_self,
    )
    return cands.where(F.col("sim") >= float(min_sim)).select(
        "query_id", F.col("vid").alias(id_col), "sim"
    )


def build_search_index(
    versions: DataFrame,
    id_cols: tuple[str, ...] = ("content_id", "seq"),
    emb_col: str = "embedding",
    materialize: bool = True,
) -> DataFrame:
    """S1 index build: the base-snapshot projection with precomputed L2
    norms, materialized for repeated searches.

    The reference builds its FAISS index once at startup and appends per
    base insert (``storage/storage_engine.py:83-110``); the Spark analogue
    is this cached/checkpointed (id, embedding, norm) table — "index build"
    is just materializing it. Feed to ``topk_cosine_indexed``.
    """
    from temporal_vector_database_spark.functions.vector import l2_norm

    bases = versions.where(F.col("kind") == "base") if "kind" in versions.columns else versions
    idx = bases.select(
        *id_cols,
        F.col(emb_col).alias("_c_emb"),
        l2_norm(F.col(emb_col)).alias("_c_nrm"),
    )
    return idx.localCheckpoint(eager=True) if materialize else idx


def topk_cosine_indexed(
    index: DataFrame,
    queries: DataFrame,
    k: int | None = None,
    id_cols: tuple[str, ...] = ("content_id", "seq"),
) -> DataFrame:
    """Per-query top-k against a prebuilt ``build_search_index`` table —
    skips the per-call norm computation and base filtering; otherwise
    identical (bit-for-bit) to ``topk_cosine``."""
    from temporal_vector_database_spark.functions.vector import l2_norm

    q = queries.select(
        "query_id",
        F.col("embedding").alias("_q_emb"),
        l2_norm(F.col("embedding")).alias("_q_nrm"),
        *(["k"] if "k" in queries.columns else []),
    )
    scored = index.crossJoin(F.broadcast(q)).select(
        "query_id",
        *id_cols,
        *(["k"] if "k" in q.columns else []),
        _guarded_sim("_q_emb", "_c_emb", "_q_nrm", "_c_nrm").alias("sim"),
    )
    has_k_col = "k" in scored.columns
    if k is not None:
        scored = scored.withColumn("k", F.lit(int(k)))
    elif not has_k_col:
        scored = scored.withColumn("k", F.lit(5))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), *[F.asc(c) for c in id_cols])
    return (
        scored.where(F.col("sim") > 0)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= F.col("k"))
        .drop("k", "_q_emb", "_q_nrm")
    )


def mllib_lsh_neighbors(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Library-backed ANN path: MLlib ``BucketedRandomProjectionLSH``
    approximate top-k, third variant next to brute-force and IVF.

    Both sides are L2-normalized first, so euclidean distance is monotone
    in cosine (``d² = 2 − 2·cos``) and the returned ``sim`` is cosine.
    Deterministic for a fixed ``seed``, but NOT engine-portable (random
    hyperplanes come from Spark's RNG) — hence no DuckDB oracle; recall is
    test-pinned against brute force instead.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from temporal_vector_database_spark.functions.vector import normalize

    cand = embeddings.select(
        F.col(id_col).alias("vid"),
        array_to_vector(normalize(F.col(emb_col)).cast("array<double>")).alias("features"),
    )
    q = queries.select(
        "query_id",
        array_to_vector(normalize(F.col(emb_col)).cast("array<double>")).alias("features"),
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(cand)
    joined = model.approxSimilarityJoin(q, cand, threshold=2.0, distCol="dist")
    scored = joined.select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.vid").alias(id_col),
        (1.0 - F.col("dist") * F.col("dist") / 2.0).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.where(F.col("sim") > 0)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Persist the IVF index as a PARTITIONED table: one parquet partition
    per inverted list (``lists/centroid_id=<c>/``) plus the tiny centroid
    table. This is the batch-index-build half of the north-star approach —
    build once, serve many query batches, each reading only its probed
    lists via static partition pruning (``ivf_topk_persisted``).

    At 100 TB the layout IS the index: a probe touches ~nprobe/n_centroids
    of the files, and the scan's ``PartitionFilters`` (asserted in tests)
    is the proof the rest is never read.
    """
    import os

    cents, assign = ivf_assign(embeddings, centroid_mod, centroid_rem, id_col, emb_col)
    assign.write.mode("overwrite").partitionBy("centroid_id").parquet(
        os.path.join(path, "lists")
    )
    cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))


def ivf_topk_persisted(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine against a ``write_ivf_index`` layout.

    Probe routing happens driver-side: the distinct probed centroid ids
    (bounded by |queries| × nprobe — a handful of ints; this is a query
    router, not a data collect) become a literal ``IN`` filter on the
    partition column, so the lists scan prunes to the probed directories
    before any file is opened. Scoring and tie-breaks are identical to
    ``ivf_topk`` — results are bit-equal on the same data.
    """
    import os

    from temporal_vector_database_spark.functions.vector import l2_norm

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
    probe_ids = sorted(
        r["centroid_id"] for r in probes.select("centroid_id").distinct().collect()
    )
    cid_type = cents.schema["centroid_id"].dataType.simpleString()
    lists = (
        spark.read.parquet(os.path.join(path, "lists"))
        .where(F.col("centroid_id").isin(probe_ids))
        # partition-column type is re-inferred from directory names on
        # read; cast back so the probe join and output schema match the
        # in-memory path exactly
        .withColumn("centroid_id", F.col("centroid_id").cast(cid_type))
    )
    cands = probes.join(lists, "centroid_id").select(
        "query_id", "vid", _guarded_sim("q_emb", "emb", "q_nrm", "nrm").alias("sim")
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        cands.where(F.col("sim") > 0)
        .withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vid").alias(id_col), "sim")
    )


# --- product quantization (PQ / ADC) ---------------------------------------
#
# The third ANN tier for the 100 TB story: brute force (exact) → IVF
# (prune to nprobe lists) → PQ (compress vectors to m small codes and
# score against a per-query lookup table). A PQ codes table is m integers
# per vector instead of dim floats — at dim 768 / m 8 that's ~1.5% of the
# scan bytes — and scoring is m map lookups per pair via a BROADCAST LUT,
# so the big side never shuffles. Codebooks are data-seeded
# deterministically (rows with id % codeword_mod == codeword_rem), same
# convention as ivf_assign: k-means would converge on real data, but a
# deterministic seeding keeps every engine (and the DuckDB oracle)
# bit-reproducible.


def _sqdist(a, b):
    """||a-b||² decomposed as dot(a,a) - 2·dot(a,b) + dot(b,b) — three
    index-ordered folds combined left-to-right, so Spark and the oracle
    compute identical doubles."""
    from temporal_vector_database_spark.functions.vector import dot

    return dot(a, a) - 2 * dot(a, b) + dot(b, b)


def _subspaces(df: DataFrame, id_col: str, id_alias: str, emb_col: str, m: int) -> DataFrame:
    """(id, subspace, sub) — the m contiguous dim/m-wide slices of each
    embedding. Narrow (explode of a fixed-size sequence, no shuffle).

    Rejects rows whose dim is not divisible by m (raise_error inside the
    slice expression — dim is data, so the check can't happen at plan
    time): a silent floor would exclude the trailing dims from codes and
    ADC scores, an accuracy loss no gate would catch."""
    sub_len = (F.size(F.col("_e")) / m).cast("int")
    sliced = F.when(
        F.size(F.col("_e")) % m == 0,
        F.slice(F.col("_e"), F.col("subspace") * sub_len + 1, sub_len),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"PQ requires embedding dim divisible by m={m}; got dim="),
                F.size(F.col("_e")).cast("string"),
            )
        )
    )
    return df.select(
        F.col(id_col).alias(id_alias),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("subspace"),
        F.col(emb_col).alias("_e"),
    ).select(id_alias, "subspace", sliced.alias("sub"))


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    codeword_mod: int = 20,
    codeword_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(subspace, codeword_id, cw): the per-subspace codebook — subvectors
    of the deterministically seeded codeword rows. Tiny (m × n/mod rows):
    always broadcast."""
    seeds = embeddings.where((F.col(id_col) % codeword_mod) == codeword_rem).select(
        F.col(id_col), F.col(emb_col)
    )
    return _subspaces(seeds, id_col, "codeword_id", emb_col, m).select(
        "subspace", "codeword_id", F.col("sub").alias("cw")
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """PQ codes, wide: (vid, code_0..code_{m-1}) — per subspace the
    codeword minimizing L2 distance (ties → lowest codeword_id).

    Plan: broadcast-join the subvector stream against the codebook, then
    ONE hash aggregate per vid — ``min_by`` over the (d2, codeword_id)
    struct is the argmin (lexicographic struct order = distance then
    lowest id, exactly the window tiebreak) and partial-aggregates
    map-side, so the |vectors| × |codewords| scored stream reduces to m
    codes per vector before the only shuffle."""
    from temporal_vector_database_spark.functions.vector import dot

    # hoist the self-dots to each side pre-join: the |vectors|×|codewords|
    # pair stream pays ONE fold (dot(sub, cw)), not three — same doubles,
    # same scalar combination order as _sqdist
    vs = _subspaces(embeddings.select(id_col, emb_col), id_col, "vid", emb_col, m).withColumn(
        "sub_ss", dot(F.col("sub"), F.col("sub"))
    )
    cb2 = codebooks.withColumn("cw_ss", dot(F.col("cw"), F.col("cw")))
    scored = vs.join(F.broadcast(cb2), "subspace").select(
        "vid",
        "subspace",
        "codeword_id",
        (F.col("sub_ss") - 2 * dot(F.col("sub"), F.col("cw")) + F.col("cw_ss")).alias("d2"),
    )
    return scored.groupBy("vid").agg(
        *[
            F.min_by(
                F.when(F.col("subspace") == s, F.col("codeword_id")),
                F.when(
                    F.col("subspace") == s, F.struct(F.col("d2"), F.col("codeword_id"))
                ),
            ).alias(f"code_{s}")
            for s in range(m)
        ]
    )



def _pq_luts(queries: DataFrame, codebooks: DataFrame, m: int, emb_col: str) -> DataFrame:
    """Per-query ADC lookup tables: one map<codeword_id, dot(q_sub, cw)>
    per subspace, wide (lut_0..lut_{m-1}). |queries| rows — broadcast it."""
    from temporal_vector_database_spark.functions.vector import dot

    qs = _subspaces(queries.select("query_id", emb_col), "query_id", "query_id", emb_col, m)
    lut_long = qs.join(F.broadcast(codebooks), "subspace").select(
        "query_id",
        "subspace",
        "codeword_id",
        dot(F.col("sub"), F.col("cw")).alias("pdot"),
    )
    return lut_long.groupBy("query_id").agg(
        *[
            F.map_from_entries(
                F.collect_list(
                    F.when(F.col("subspace") == s, F.struct("codeword_id", "pdot"))
                )
            ).alias(f"lut_{s}")
            for s in range(m)
        ]
    )


def _adc_expr(m: int):
    """ADC score: m LUT lookups summed left-to-right (fixed order)."""
    adc = F.element_at(F.col("lut_0"), F.col("code_0"))
    for s in range(1, m):
        adc = adc + F.element_at(F.col(f"lut_{s}"), F.col(f"code_{s}"))
    return adc


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    codeword_mod: int = 20,
    codeword_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC): inner
    product estimated as the sum over subspaces of dot(q_sub, codeword of
    v's code) — m map lookups per (query, vector) against a broadcast
    per-query lookup table, summed in fixed subspace order (engine-exact).

    Output: (query_id, vec_id, adc_score, rank ≤ k). Scores are raw inner
    product estimates (not normalized cosine) — rank fidelity is what ADC
    is for; exact re-ranking of the shortlist composes with
    ``topk_cosine`` if true scores are needed."""
    cb = pq_codebooks(embeddings, m, codeword_mod, codeword_rem, id_col, emb_col)
    codes = pq_encode(embeddings, cb, m, id_col, emb_col)
    luts = _pq_luts(queries, cb, m, emb_col)
    scored = codes.crossJoin(F.broadcast(luts)).select(
        "query_id", "vid", _adc_expr(m).alias("adc_score")
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("adc_score"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vid").alias(id_col), "adc_score", "rank")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    m: int = 4,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    codeword_mod: int = 20,
    codeword_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the standard billion-scale composition — probe the nprobe
    nearest inverted lists (IVF pruning), then score ONLY those candidates
    by ADC against the broadcast lookup tables (PQ compression).

    At 100 TB this is the plan that works: the per-query work is
    ~(nprobe/n_centroids) of the codes table (m ints per vector), no
    embedding bytes move, and both the centroid table and the LUTs are
    broadcast. With nprobe = n_centroids the candidate set is everything
    and the result is bit-equal to ``pq_topk`` (pinned in tests).
    """
    from pyspark.sql import Window

    from temporal_vector_database_spark.functions.vector import l2_norm

    cents, assign = ivf_assign(embeddings, centroid_mod, centroid_rem, id_col, emb_col)
    cb = pq_codebooks(embeddings, m, codeword_mod, codeword_rem, id_col, emb_col)
    codes = pq_encode(embeddings, cb, m, id_col, emb_col)
    q = queries.select(
        F.col("query_id"),
        F.col(emb_col).alias("q_emb"),
        l2_norm(F.col(emb_col)).alias("q_nrm"),
    )
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "centroid_id",
        _guarded_sim("q_emb", "c_emb", "q_nrm", "c_nrm").alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("centroid_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id")
    )
    cands = probes.join(assign.select("vid", "centroid_id"), "centroid_id").select(
        "query_id", "vid"
    )
    luts = _pq_luts(queries, cb, m, emb_col)
    scored = cands.join(codes, "vid").join(F.broadcast(luts), "query_id").select(
        "query_id", "vid", _adc_expr(m).alias("adc_score")
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("adc_score"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vid").alias(id_col), "adc_score", "rank")
    )


def ivfpq_residual_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    m: int = 4,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    codeword_mod: int = 20,
    codeword_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Residual-encoded IVF-PQ — the FAISS ``IndexIVFPQ`` formulation:
    PQ codes are trained on and assigned to RESIDUALS ``x − c(x)`` after
    centroid subtraction, and the ADC score decomposes exactly as
    ``dot(q, x) ≈ dot(q, c) + Σ_s LUT_s[code_s]`` (inner product is
    linear, so the per-probe constant ``dot(q, c)`` absorbs the coarse
    term and the LUTs only carry the fine structure). Residuals are much
    smaller in magnitude than raw vectors, so the same m×codewords budget
    quantizes them with far less error — this is why every production
    IVF-PQ encodes residuals.

    Plan shape is identical to ``ivfpq_topk`` (probe pruning, broadcast
    codebooks/LUTs, m-int codes, zero embedding bytes at query time)
    plus one broadcast centroid join to form residuals at index-build
    time. On the quantized grid every subtraction/dot is exact, so the
    gate is hash-stable.
    """
    from pyspark.sql import Window

    from temporal_vector_database_spark.functions.vector import dot, l2_norm

    cents, assign = ivf_assign(embeddings, centroid_mod, centroid_rem, id_col, emb_col)
    res = assign.join(F.broadcast(cents), "centroid_id").select(
        "vid",
        "centroid_id",
        F.zip_with("emb", "c_emb", lambda x, c: x - c).alias("r_emb"),
    )
    cb = pq_codebooks(res, m, codeword_mod, codeword_rem, id_col="vid", emb_col="r_emb")
    codes = pq_encode(res, cb, m, id_col="vid", emb_col="r_emb").join(
        res.select("vid", "centroid_id"), "vid"
    )
    q = queries.select(
        F.col("query_id"),
        F.col(emb_col).alias("q_emb"),
        l2_norm(F.col(emb_col)).alias("q_nrm"),
    )
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "centroid_id",
        dot(F.col("q_emb"), F.col("c_emb")).alias("qc_dot"),
        _guarded_sim("q_emb", "c_emb", "q_nrm", "c_nrm").alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("centroid_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id", "qc_dot")
    )
    luts = _pq_luts(queries, cb, m, emb_col)
    scored = (
        probes.join(codes, "centroid_id")
        .join(F.broadcast(luts), "query_id")
        .select(
            "query_id", "vid", (F.col("qc_dot") + _adc_expr(m)).alias("adc_score")
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("adc_score"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vid").alias(id_col), "adc_score", "rank")
    )


def pq_topk_reranked(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    m: int = 4,
    codeword_mod: int = 20,
    codeword_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """PQ with exact re-ranking: ADC produces a ``shortlist`` of
    candidates per query; only those rows' true embeddings are fetched
    (semi-join against the corpus) and re-scored with the exact inner
    product; final top-k by true score.

    This is how PQ is deployed: the compressed scan bounds the candidate
    set, the expensive exact math touches ``shortlist`` rows per query.
    With shortlist >= |corpus| the result is the exact brute-force
    inner-product top-k (pinned in tests).
    """
    from pyspark.sql import Window

    from temporal_vector_database_spark.functions.vector import dot

    short = pq_topk(
        embeddings, queries, shortlist, m, codeword_mod, codeword_rem, id_col, emb_col
    ).select("query_id", id_col)
    exact = (
        short.join(embeddings.select(id_col, F.col(emb_col).alias("_v_emb")), id_col)
        .join(
            F.broadcast(queries.select("query_id", F.col(emb_col).alias("_q_emb"))),
            "query_id",
        )
        .select(
            "query_id",
            id_col,
            dot(F.col("_q_emb"), F.col("_v_emb")).alias("score"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        exact.withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def sq8_stats(
    embeddings: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> tuple[list, list]:
    """Per-dimension (min, scale) for int8 scalar quantization:
    scale_d = (max_d − min_d) / 255. One partial-aggregated posexplode
    pass; only DIM rows return to the driver (the k-means discipline)."""
    rows = (
        embeddings.select(F.posexplode(F.col(emb_col)).alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("d")
        .collect()
    )
    mins = [r["mn"] for r in rows]
    scales = [(r["mx"] - r["mn"]) / 255.0 for r in rows]
    return mins, scales


def sq8_encode(
    embeddings: DataFrame,
    mins: list,
    scales: list,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """int8 codes: code_d = floor((x_d − min_d)/scale_d + 0.5), clamped
    degenerate dims (max == min) to 0. ``floor(· + 0.5)`` instead of
    ``round`` because the two engines' round() half-rules differ
    (half-up vs half-even) and (x−min)/scale can land exactly on .5;
    floor(+0.5) is bit-identical everywhere. Zero shuffle — pure column
    math against literal per-dim arrays."""
    mn = F.array(*[F.lit(float(v)) for v in mins])
    sc = F.array(*[F.lit(float(v)) for v in scales])
    dim = len(mins)
    code = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.when(
            F.element_at(sc, d + 1) > 0,
            F.floor(
                (F.element_at(F.col(emb_col), d + 1) - F.element_at(mn, d + 1))
                / F.element_at(sc, d + 1)
                + F.lit(0.5)
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    return embeddings.select(F.col(id_col).alias("vid"), code.alias("codes"))


def sq8_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantized (SQ8) approximate top-k by inner product — the
    4-8× compression tier below PQ: ``dot(q, x̂) = dot(q, min) +
    Σ_d (q_d·scale_d)·code_d``, so per query only the precomputed
    ``q·scale`` vector and the constant ``dot(q, min)`` ride the
    broadcast, and the scan touches int codes, never floats. Same
    dequantization identity FAISS's ``IndexScalarQuantizer`` uses."""
    from pyspark.sql import Window

    from temporal_vector_database_spark.functions.vector import dot

    mins, scales = sq8_stats(embeddings, id_col, emb_col)
    codes = sq8_encode(embeddings, mins, scales, id_col, emb_col)
    mn = F.array(*[F.lit(float(v)) for v in mins])
    sc = F.array(*[F.lit(float(v)) for v in scales])
    q = queries.select(
        "query_id",
        dot(F.col(emb_col), mn).alias("q_min_dot"),
        F.zip_with(F.col(emb_col), sc, lambda x, s: x * s).alias("q_scaled"),
    )
    scored = codes.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vid",
        (
            F.col("q_min_dot")
            + F.aggregate(
                F.zip_with(
                    F.col("q_scaled"),
                    F.col("codes"),
                    lambda qsv, c: qsv * c.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vid").alias(id_col), "score", "rank")
    )


def bq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Binary-quantized (1-bit) approximate top-k: candidates are stored
    as sign bits only (32× compression at float32); scoring is
    ASYMMETRIC — the full-precision query against ±1 sign vectors,
    ``score = Σ_d q_d · sign(x_d)`` — which ranks identically to Hamming
    distance for normalized inputs but keeps the query's magnitudes (the
    modern binary-quantization recipe, cheapest tier of the 1-bit → int8
    (SQ8) → PQ ladder).

    Zero shuffle for scoring (query batch broadcast over the sign-code
    scan); one per-query top-k window. sign(0) := +1, pinned on both
    engines.
    """
    from pyspark.sql import Window

    signs = embeddings.select(
        F.col(id_col).alias("vid"),
        F.transform(
            F.col(emb_col),
            lambda x: F.when(x >= 0, F.lit(1)).otherwise(F.lit(-1)).cast("int"),
        ).alias("sgn"),
    )
    q = queries.select("query_id", F.col(emb_col).alias("q_emb"))
    scored = signs.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vid",
        F.aggregate(
            F.zip_with(F.col("q_emb"), F.col("sgn"), lambda x, s: x * s.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vid").alias(id_col), "score", "rank")
    )


def hard_negative_mine(
    embeddings: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 10,
    exclude_above: float | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    impl: str = "pandas",
) -> DataFrame:
    """Hard-negative mining for retrieval training (beyond-reference):
    per query, the ``k`` MOST-similar corpus vectors that are NOT the
    query's positives — the contrastive-training step that turns a
    curated corpus + relevance labels into (query, positive, hard
    negative) triples.

    ``positives``: (query_id, pos_id) pairs, removed by broadcast
    anti-join BEFORE ranking (labels are tiny next to the corpus).
    ``exclude_above``: optionally also drop candidates with sim >= the
    threshold — the standard guard against unlabeled near-duplicates of
    the positive becoming false negatives.

    Same scoring, tie-breaks, and plan shape as :func:`topk_cosine`:
    queries broadcast, Arrow local top-k pre-reduce on the map side, one
    per-query shuffle of O(k · partitions) survivors.
    """
    score = score_candidates_pandas if impl == "pandas" else score_candidates
    cands = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).alias("embedding")
    )
    scored = score(cands, queries, id_cols=("vec_id",), emb_col="embedding")
    scored = scored.select("query_id", "vec_id", "sim").where(F.col("sim") > 0)
    pos = positives.select(
        F.col("query_id").alias("_pq"), F.col("pos_id").alias("_pv")
    )
    scored = scored.join(
        F.broadcast(pos),
        (F.col("query_id") == F.col("_pq")) & (F.col("vec_id") == F.col("_pv")),
        "left_anti",
    )
    if exclude_above is not None:
        scored = scored.where(F.col("sim") < F.lit(float(exclude_above)))
    scored = scored.withColumn("k", F.lit(int(k)))
    scored = scored.mapInPandas(_local_topk(("vec_id",), int(k)), schema=scored.schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", F.col("vec_id").alias(id_col), "sim")
    )


def mrl_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prefix_dims: int = 16,
    shortlist: int = 50,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Matryoshka retrieval (beyond-reference; Kusupati et al. 2022,
    "Matryoshka Representation Learning"): rank a cheap per-query
    shortlist on the FIRST ``prefix_dims`` dimensions only, then
    re-score just those rows with the exact full-dimension cosine.

    This is the funnel modern MRL-trained embedding stacks deploy: the
    prefix scan touches ``prefix_dims/dim`` of the vector bytes (and at
    cluster scale reads a physically narrower column if prefixes are
    materialized), while exact math is confined to ``shortlist`` rows
    per query. With ``prefix_dims == dim`` the result is exactly
    :func:`topk_cosine` over sim>0 candidates.

    Plan shape: the shortlist stage is :func:`topk_cosine` (queries
    broadcast, Arrow local top-k pre-reduce, one per-query shuffle);
    the re-rank joins shortlist ids back to the corpus (semi-join-sized)
    and broadcasts the full-dim queries — same shape as
    :func:`pq_topk_reranked`.
    """
    from temporal_vector_database_spark.functions.vector import l2_norm

    pre_c = embeddings.select(
        F.col(id_col), F.slice(F.col(emb_col), 1, prefix_dims).alias(emb_col)
    )
    pre_q = queries.select(
        "query_id", F.slice(F.col(emb_col), 1, prefix_dims).alias(emb_col)
    )
    short = topk_cosine(pre_c, pre_q, k=shortlist, id_cols=(id_col,)).select(
        "query_id", id_col
    )
    exact = (
        short.join(
            embeddings.select(
                id_col,
                F.col(emb_col).alias("_v_emb"),
                l2_norm(emb_col).alias("_v_nrm"),
            ),
            id_col,
        )
        .join(
            F.broadcast(
                queries.select(
                    "query_id",
                    F.col(emb_col).alias("_q_emb"),
                    l2_norm(emb_col).alias("_q_nrm"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            id_col,
            _guarded_sim("_q_emb", "_v_emb", "_q_nrm", "_v_nrm").alias("sim"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        exact.withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "sim")
    )


def mmr_rerank(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    lam: float = 0.5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (beyond-reference; Carbonell
    & Goldstein 1998): per query, greedily select ``k`` results from the
    cosine top-``shortlist``, each step maximizing

        ``lam * sim(query, cand) - (1 - lam) * max_{s in selected} sim(cand, s)``

    (the penalty is 0 for the first pick; ties -> lowest id). The
    diversity knob RAG retrieval and dedup-aware eval sets need — pure
    relevance top-k returns near-duplicate clusters.

    Scale shape: the greedy loop is inherently sequential per query but
    BOUNDED — it runs inside ``applyInPandas`` on one (query,
    shortlist)-sized group (<= ``shortlist`` rows, never the corpus), so
    the cluster-side cost is the shortlist stage, not the rerank. All
    pairwise math on grid embeddings is exact (products/sums dyadic;
    sqrt/divide correctly rounded), so the selection is engine-portable
    — the DuckDB oracle replays the same greedy unrolled.
    """
    import numpy as np

    short = topk_cosine(embeddings, queries, k=shortlist, id_cols=(id_col,)).select(
        "query_id", id_col, "sim"
    )
    cand = short.join(
        embeddings.select(id_col, F.col(emb_col).alias("_v_emb")), id_col
    )
    lam = float(lam)

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        X = np.stack(pdf["_v_emb"].to_numpy())
        nrm = np.sqrt((X * X).sum(axis=1))
        G = X @ X.T
        denom = np.outer(nrm, nrm)
        with np.errstate(divide="ignore", invalid="ignore"):
            S = np.where(denom > 0, G / denom, 0.0)
        rel = pdf["sim"].to_numpy()
        ids = pdf[id_col].to_numpy()
        n = len(pdf)
        selected: list[int] = []
        out = []
        avail = np.ones(n, dtype=bool)
        for step in range(1, min(k, n) + 1):
            if selected:
                pen = S[:, selected].max(axis=1)
            else:
                pen = np.zeros(n)
            score = lam * rel - (1.0 - lam) * pen
            # argmax over available, ties -> lowest id (rows are id-sorted)
            masked = np.where(avail, score, -np.inf)
            pick = int(np.argmax(masked))
            avail[pick] = False
            selected.append(pick)
            out.append(
                (
                    pdf["query_id"].iloc[0],
                    step,
                    ids[pick],
                    float(rel[pick]),
                    float(score[pick]),
                )
            )
        return pd.DataFrame(
            out, columns=["query_id", "mmr_rank", id_col, "sim", "mmr_score"]
        )

    # schema follows the INPUT id/query types (no int() coercion in the
    # greedy loop either) — string or 64-bit ids pass through unharmed
    dt = dict(cand.dtypes)
    schema = (
        f"query_id {dt['query_id']}, mmr_rank int, {id_col} {dt[id_col]},"
        " sim double, mmr_score double"
    )
    return cand.groupBy("query_id").applyInPandas(_greedy, schema=schema)


def recall_at_k(
    result: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Retrieval evaluation (beyond-reference): per-query recall@k of a
    ranked ``result`` against a ranked ground-truth ``truth`` (both carry
    (query, id, rank)). The harness every ANN tier needs to be tuned
    against — nprobe / shortlist / quantization choices are recall
    decisions, not just latency ones.

    Output: (query_id, n_hit, n_true, recall). Queries absent from
    ``result`` still appear (n_hit=0) — a silently-empty tier reads as
    recall 0, not as missing data. Plan: two rank-filtered projections,
    one (query, id) equi-join, two tiny per-query aggregates — truth is
    k rows/query, so everything downstream of the inputs is k-bounded.
    """
    r = result.where(F.col("rank") <= k).select(query_col, id_col)
    t = truth.where(F.col("rank") <= k).select(query_col, id_col)
    hits = (
        r.join(t, [query_col, id_col])
        .groupBy(query_col)
        .agg(F.count("*").alias("n_hit"))
    )
    denom = t.groupBy(query_col).agg(F.count("*").alias("n_true"))
    return (
        denom.join(hits, query_col, "left")
        .select(
            query_col,
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.col("n_true").cast("long").alias("n_true"),
        )
        .withColumn("recall", F.col("n_hit").cast("double") / F.col("n_true"))
    )


def graph_beam_search(
    embeddings: DataFrame,
    graph: DataFrame,
    queries: DataFrame,
    k: int = 10,
    beam: int = 8,
    n_rounds: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """GREEDY BEAM SEARCH over a persisted kNN graph (r09) — the
    SERVING half of graph ANN (the HNSW/NSG query pattern at layer 0),
    completing the build half (:func:`knn_graph` / :func:`nn_descent`):
    start every query from a deterministic seed beam (the ``beam``
    globally-smallest ids), and for ``n_rounds`` synchronous rounds
    expand the beam by its graph out-neighbors, score all candidates by
    cosine, and keep the top-``beam`` (sim desc, id asc — fully
    deterministic). Output: the final beam's top-``k`` per query.

    Candidates per query per round are bounded by ``beam·(deg+1)`` —
    never the corpus; the corpus-sized joins are the candidate-id
    lookups against the embedding table (id-keyed equi-joins Catalyst
    can prune), and the query table rides a broadcast. Each round's
    surviving beam is checkpointed so round r+1's expansion never
    re-executes rounds 1..r (the ``label_propagation`` edge lesson).

    Output: ``(query_id, vec_id, sim, rank)``, rank 1..k.

    ``graph`` columns: ``(id, nbr)`` directed adjacency (a
    ``knn_graph`` output renamed, or ``nn_descent``'s refined edges;
    symmetrize for better reachability on low-degree graphs).

    ``seeds`` (r10): optional PER-QUERY entry points ``(query_id,
    cand)`` — the production config (HNSW enters at a point near the
    query, not a global one): pass ``ivf_topk``'s top-``beam`` per
    query so the walk starts inside the query's neighborhood instead
    of at the ``beam`` globally-smallest ids. Measured at sf0.1
    (SCALE.md graph-ANN ladder): IVF seeding lifts recall@5 where the
    fixed-seed walk's gradient is weakest, at zero extra rounds. When
    omitted, the deterministic fixed global seed beam is used.

    Seeded-path contracts (ADVICE r10): a query with ZERO rows in
    ``seeds`` (e.g. its probed IVF lists were empty) has no entry
    point and is ABSENT from the output — unlike the global-seed path,
    which always returns ``k`` rows per query; union a global fallback
    into ``seeds`` if full coverage is required (the oracle-gated
    `graph_beam_search_ivf` pins the drop semantics). Seeds are
    defensively capped at ``beam`` per query (by the seed table's own
    ``rank`` column when present, else id asc) so an over-wide table
    cannot inflate round-1 scoring."""
    from temporal_vector_database_spark.functions.vector import cosine

    if not (0 < int(k) <= int(beam)):
        raise ValueError(f"need 0 < k <= beam, got k={k}, beam={beam}")
    e = embeddings.select(
        F.col(id_col).alias("cand"), F.col(emb_col).alias("_c_emb")
    )
    q = queries.select("query_id", F.col(emb_col).alias("_q_emb"))
    g = graph.select(F.col("id").alias("cand"), "nbr")
    if seeds is None:
        global_seeds = (
            embeddings.select(F.col(id_col).alias("cand"))
            .orderBy("cand")
            .limit(int(beam))
        )
        frontier = q.select("query_id").crossJoin(F.broadcast(global_seeds))
    else:
        order = (
            F.asc("rank") if "rank" in seeds.columns else F.asc("cand")
        )
        sw = Window.partitionBy("query_id").orderBy(order)
        frontier = (
            seeds.withColumn("_srn", F.row_number().over(sw))
            .where(F.col("_srn") <= int(beam))
            .select("query_id", "cand")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand"))
    scored = None
    for _ in range(int(n_rounds)):
        nbrs = frontier.join(g, "cand").select(
            "query_id", F.col("nbr").alias("cand")
        )
        cands = frontier.unionByName(nbrs).distinct()
        scored = (
            cands.join(e, "cand")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id", "cand", cosine("_c_emb", "_q_emb").alias("sim")
            )
        )
        frontier = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(beam))
            .select("query_id", "cand")
            .localCheckpoint()
        )
    final = (
        frontier.join(e, "cand")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "cand", cosine("_c_emb", "_q_emb").alias("sim"))
    )
    return (
        final.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
        .select("query_id", F.col("cand").alias(id_col), "sim", "rank")
    )


def knn_graph(
    embeddings: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """kNN graph (beyond-reference): every corpus vector's ``k`` nearest
    cosine neighbors, self excluded — the primitive under graph-based
    clustering, kNN-graph dedup, and label propagation.

    Scale shape: exactly :func:`ivf_topk` with the corpus as its own
    query set — per-vector candidates are the nprobe probed lists, never
    the corpus, so the join is |corpus| x (probed-list size), not
    |corpus|^2. Deterministic (no RNG), oracle-replayable.
    """
    # query_id keeps the id column's own type — an int cast would
    # silently overflow 64-bit ids into colliding query ids
    queries = embeddings.select(F.col(id_col).alias("query_id"), emb_col)
    return ivf_topk(
        embeddings, queries, k, nprobe, centroid_mod, centroid_rem,
        id_col, emb_col, exclude_self=True,
    )


def knn_classify(
    labeled: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN classification (beyond-reference): predict each query's label
    as the MAJORITY label among its ``k`` nearest labeled neighbors —
    ties broken toward the smaller label, then the stronger total
    similarity never consulted (pure vote count keeps the decision
    integer-exact and engine-portable).

    Output: (query_id, predicted_label, n_votes, n_neighbors). Scale
    shape: one :func:`ivf_topk` (probed lists, broadcast queries), a
    broadcast-sized label join, and two k-bounded aggregates.
    """
    from pyspark.sql import Window

    nn = ivf_topk(
        labeled.select(id_col, emb_col), queries, k, nprobe,
        centroid_mod, centroid_rem, id_col, emb_col,
    )
    votes = (
        nn.join(labeled.select(id_col, label_col), id_col)
        .groupBy("query_id", label_col)
        .agg(F.count("*").cast("long").alias("n_votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc(label_col)
    )
    totals = nn.groupBy("query_id").agg(F.count("*").cast("long").alias("n_neighbors"))
    return (
        votes.withColumn("_rn", F.row_number().over(wv))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .withColumnRenamed(label_col, "predicted_label")
        .join(totals, "query_id")
        .select("query_id", "predicted_label", "n_votes", "n_neighbors")
    )


def semantic_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    max_cosine: float = 0.8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding-level decontamination (beyond-reference; the semantic
    twin of the word-n-gram ``decontaminate``): drop corpus rows whose
    max cosine to ANY eval embedding is >= ``max_cosine`` — the guard
    against paraphrased eval leakage that lexical n-gram overlap cannot
    see. Survivors carry ``max_eval_sim`` for audit.

    Scale shape: the eval set is benchmark-sized -> broadcast; the
    corpus is scanned ONCE (Arrow BLAS scoring), reduced to a per-row
    max, and filtered — no corpus shuffle keyed by anything eval-sized.
    Corpus rows with no positive eval similarity keep max_eval_sim 0.
    """
    cands = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).alias("embedding")
    )
    scored = score_candidates_pandas(cands, eval_set, id_cols=("vec_id",))
    mx = scored.groupBy("vec_id").agg(F.max("sim").alias("max_eval_sim"))
    return (
        corpus.join(mx.withColumnRenamed("vec_id", id_col), id_col, "left")
        .withColumn(
            "max_eval_sim", F.coalesce(F.col("max_eval_sim"), F.lit(0.0))
        )
        .where(F.col("max_eval_sim") < F.lit(float(max_cosine)))
    )


def rank_eval(
    result: DataFrame,
    relevance: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Ranking-quality evaluation with EXACT arithmetic (beyond-
    reference; completes the eval toolkit next to :func:`recall_at_k`):
    per query, the number of relevant items in the top-``k``
    (precision@k numerator), the rank of the first relevant hit, and the
    reciprocal rank — all integers plus one exact division, so the
    metric is engine-portable bit-for-bit (a log2-discounted nDCG is
    deliberately NOT gated: libm log2 is not guaranteed correctly
    rounded across engines).

    ``relevance``: (query_id, id) pairs. Queries with no relevant item
    in the top-k still appear (n_relevant_topk = 0, rr = 0.0) — empty
    rankings must not read as missing data.
    """
    r = result.where(F.col("rank") <= k).select(query_col, id_col, "rank")
    rel = relevance.select(query_col, id_col).withColumn("_rel", F.lit(1))
    hits = (
        r.join(rel, [query_col, id_col], "left")
        .groupBy(query_col)
        .agg(
            F.sum(F.coalesce(F.col("_rel"), F.lit(0)))
            .cast("long")
            .alias("n_relevant_topk"),
            F.min(F.when(F.col("_rel") == 1, F.col("rank"))).alias(
                "first_rel_rank"
            ),
        )
    )
    return hits.select(
        query_col,
        "n_relevant_topk",
        F.col("first_rel_rank").cast("int").alias("first_rel_rank"),
        F.when(
            F.col("first_rel_rank").isNotNull(),
            F.lit(1.0) / F.col("first_rel_rank").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("rr"),
    )


def write_mrl_index(
    embeddings: DataFrame,
    path: str,
    prefix_dims: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Materialize the Matryoshka layout: the corpus with an ADDITIONAL
    physical ``prefix_emb`` column (first ``prefix_dims`` dims). Parquet
    stores columns independently, so the shortlist stage of
    :func:`mrl_topk_persisted` scans ``prefix_dims/dim`` of the vector
    bytes — column pruning made physical (pinned on ReadSchema in
    tests)."""
    embeddings.select(
        id_col,
        F.col(emb_col).alias("embedding"),
        F.slice(F.col(emb_col), 1, prefix_dims).alias("prefix_emb"),
    ).write.mode("overwrite").parquet(path)


def mrl_topk_persisted(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    prefix_dims: int = 16,
    shortlist: int = 50,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """:func:`mrl_topk` against the persisted prefix layout: the
    shortlist scan touches ONLY (id, prefix_emb) — the full-dim column's
    bytes are read for shortlist rows alone at re-rank. Bit-identical
    results to the in-memory funnel (pinned)."""
    from temporal_vector_database_spark.functions.vector import l2_norm
    from pyspark.sql import Window

    idx = spark.read.parquet(path)
    pre_c = idx.select(id_col, F.col("prefix_emb").alias("embedding"))
    pre_q = queries.select(
        "query_id", F.slice(F.col(emb_col), 1, prefix_dims).alias("embedding")
    )
    short = topk_cosine(pre_c, pre_q, k=shortlist, id_cols=(id_col,)).select(
        "query_id", id_col
    )
    exact = (
        short.join(
            idx.select(
                id_col,
                F.col("embedding").alias("_v_emb"),
                l2_norm("embedding").alias("_v_nrm"),
            ),
            id_col,
        )
        .join(
            F.broadcast(
                queries.select(
                    "query_id",
                    F.col(emb_col).alias("_q_emb"),
                    l2_norm(emb_col).alias("_q_nrm"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            id_col,
            _guarded_sim("_q_emb", "_v_emb", "_q_nrm", "_v_nrm").alias("sim"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        exact.withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "sim")
    )


def write_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    m: int = 4,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    codeword_mod: int = 20,
    codeword_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Persist the full IVF-PQ index: PQ CODES partitioned by inverted
    list (``codes/centroid_id=<c>/`` — m small ints per vector, no
    embedding bytes), plus the tiny centroid and codebook tables. The
    encode (the |vectors| × |codewords| argmin that dominates the
    on-the-fly ``ivfpq_topk``) is paid ONCE at index build; serving
    reads only the probed lists' code rows via static partition
    pruning. At dim 64 / m 4 the codes table is ~6% of the embedding
    bytes — at 100 TB the probe scan is both pruned AND that much
    narrower at rest."""
    import os

    cents, assign = ivf_assign(
        embeddings, centroid_mod, centroid_rem, id_col, emb_col
    )
    cb = pq_codebooks(
        embeddings, m, codeword_mod, codeword_rem, id_col, emb_col
    )
    codes = pq_encode(embeddings, cb, m, id_col, emb_col)
    (
        codes.join(assign.select("vid", "centroid_id"), "vid")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(path, "codes"))
    )
    cents.select("centroid_id", "c_emb", "c_nrm").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "centroids"))
    cb.write.mode("overwrite").parquet(os.path.join(path, "codebooks"))


def ivfpq_topk_persisted(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    m: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ serving against a ``write_ivfpq_index`` layout — bit-equal
    to ``ivfpq_topk`` on the same data (same oracle gates both), but the
    corpus encode never runs at query time: probe routing happens
    driver-side (the distinct probed centroid ids — a query router, not
    a data collect — become a literal partition filter), the pruned
    codes scan carries m ints per vector, and scoring is the same
    broadcast-LUT ADC expression."""
    import os

    from pyspark.sql import Window

    from temporal_vector_database_spark.functions.vector import l2_norm

    cents = spark.read.parquet(os.path.join(path, "centroids"))
    cb = spark.read.parquet(os.path.join(path, "codebooks"))
    q = queries.select(
        F.col("query_id"),
        F.col(emb_col).alias("q_emb"),
        l2_norm(F.col(emb_col)).alias("q_nrm"),
    )
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "centroid_id",
        _guarded_sim("q_emb", "c_emb", "q_nrm", "c_nrm").alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("c_sim"), F.asc("centroid_id")
    )
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id")
    )
    probe_ids = sorted(
        r["centroid_id"]
        for r in probes.select("centroid_id").distinct().collect()
    )
    cid_type = cents.schema["centroid_id"].dataType.simpleString()
    codes = (
        spark.read.parquet(os.path.join(path, "codes"))
        .where(F.col("centroid_id").isin(probe_ids))
        # partition-column type is re-inferred from directory names on
        # read; cast back so the probe join and output schema match the
        # in-memory path exactly
        .withColumn("centroid_id", F.col("centroid_id").cast(cid_type))
    )
    cands = probes.join(codes, "centroid_id").drop("centroid_id")
    luts = _pq_luts(queries, cb, m, emb_col)
    scored = cands.join(F.broadcast(luts), "query_id").select(
        "query_id", "vid", _adc_expr(m).alias("adc_score")
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("vid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vid").alias(id_col), "adc_score", "rank")
    )


def pq_topk_persisted(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Flat-PQ ADC against a ``write_ivfpq_index`` layout (no list
    pruning — every codes row is scored, the exhaustive-but-compressed
    tier): bit-equal to ``pq_topk``, with the corpus encode paid at
    index build and the scan carrying m ints per vector instead of
    embedding bytes."""
    import os

    from pyspark.sql import Window

    cb = spark.read.parquet(os.path.join(path, "codebooks"))
    codes = spark.read.parquet(os.path.join(path, "codes")).drop("centroid_id")
    luts = _pq_luts(queries, cb, m, emb_col)
    scored = codes.crossJoin(F.broadcast(luts)).select(
        "query_id", "vid", _adc_expr(m).alias("adc_score")
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("adc_score"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vid").alias(id_col), "adc_score", "rank")
    )


def write_ivfpq_residual_index(
    embeddings: DataFrame,
    path: str,
    m: int = 4,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    codeword_mod: int = 20,
    codeword_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Persist the residual-encoded IVF-PQ index (FAISS ``IndexIVFPQ``):
    residual codes partitioned by inverted list, centroid table, and the
    RESIDUAL codebooks. The build pays centroid assignment + residual
    formation + the codes argmin once; serving adds only the per-probe
    ``dot(q, c)`` constant to the same broadcast-LUT ADC."""
    import os

    cents, assign = ivf_assign(
        embeddings, centroid_mod, centroid_rem, id_col, emb_col
    )
    res = assign.join(F.broadcast(cents), "centroid_id").select(
        "vid",
        "centroid_id",
        F.zip_with("emb", "c_emb", lambda x, c: x - c).alias("r_emb"),
    )
    cb = pq_codebooks(
        res, m, codeword_mod, codeword_rem, id_col="vid", emb_col="r_emb"
    )
    codes = pq_encode(res, cb, m, id_col="vid", emb_col="r_emb").join(
        res.select("vid", "centroid_id"), "vid"
    )
    codes.write.mode("overwrite").partitionBy("centroid_id").parquet(
        os.path.join(path, "codes")
    )
    cents.select("centroid_id", "c_emb", "c_nrm").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "centroids"))
    cb.write.mode("overwrite").parquet(os.path.join(path, "codebooks"))


def ivfpq_residual_topk_persisted(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    m: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Residual IVF-PQ serving from a ``write_ivfpq_residual_index``
    layout — bit-equal to ``ivfpq_residual_topk`` (same oracle):
    ADC = per-probe ``dot(q, c)`` constant + residual LUT sum over the
    pruned m-int codes scan; no embedding bytes, no encode at query
    time."""
    import os

    from pyspark.sql import Window

    from temporal_vector_database_spark.functions.vector import dot, l2_norm

    cents = spark.read.parquet(os.path.join(path, "centroids"))
    cb = spark.read.parquet(os.path.join(path, "codebooks"))
    q = queries.select(
        F.col("query_id"),
        F.col(emb_col).alias("q_emb"),
        l2_norm(F.col(emb_col)).alias("q_nrm"),
    )
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "centroid_id",
        dot(F.col("q_emb"), F.col("c_emb")).alias("qc_dot"),
        _guarded_sim("q_emb", "c_emb", "q_nrm", "c_nrm").alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("c_sim"), F.asc("centroid_id")
    )
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id", "qc_dot")
    )
    probe_ids = sorted(
        r["centroid_id"]
        for r in probes.select("centroid_id").distinct().collect()
    )
    cid_type = cents.schema["centroid_id"].dataType.simpleString()
    codes = (
        spark.read.parquet(os.path.join(path, "codes"))
        .where(F.col("centroid_id").isin(probe_ids))
        .withColumn("centroid_id", F.col("centroid_id").cast(cid_type))
    )
    luts = _pq_luts(queries, cb, m, emb_col)
    scored = (
        probes.join(codes, "centroid_id")
        .join(F.broadcast(luts), "query_id")
        .select(
            "query_id", "vid", (F.col("qc_dot") + _adc_expr(m)).alias("adc_score")
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("vid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vid").alias(id_col), "adc_score", "rank")
    )


def ivf_filtered_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    attr_col: str,
    filter_col: str,
    k: int = 10,
    nprobe: int = 2,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Per-query attribute-FILTERED approximate top-k — the filtered
    vector search every production store ships (pgvector + WHERE,
    Qdrant/Weaviate payload filters, FAISS IDSelector): each query row
    carries its own required attribute value in ``filter_col``, and only
    corpus vectors whose ``attr_col`` equals it are eligible neighbors.

    Strategy is SINGLE-STAGE filtering (filter DURING traversal, before
    ranking): the probed-list candidates join the corpus attribute and
    drop non-matching rows BEFORE the per-query top-k window, so the
    result still contains k *matching* neighbors (post-filtering would
    return fewer; pre-filtering the corpus would rebuild the index per
    distinct filter value). The mod-seeded IVF assignment is independent
    of the query set, so the same index serves every filter.

    Plan: candidate generation is the shared ``_ivf_candidates`` body
    (broadcast centroids, probed-list equi-join); the attribute join is
    an equi-join on vid bounded by the probed candidates; the per-query
    want-value table is broadcast (|queries| rows). In a persisted
    layout the attribute travels WITH the list entries (the
    ``write_ivf_index`` pattern), collapsing the vid join into the scan.
    """
    from pyspark.sql import Window

    cands = _ivf_candidates(
        embeddings,
        queries.select("query_id", emb_col),
        nprobe, centroid_mod, centroid_rem, id_col, emb_col, False,
    )
    attrs = embeddings.select(
        F.col(id_col).alias("vid"), F.col(attr_col).alias("_attr")
    )
    want = queries.select("query_id", F.col(filter_col).alias("_want"))
    eligible = (
        cands.join(attrs, "vid")
        .join(F.broadcast(want), "query_id")
        .where(F.col("_attr") == F.col("_want"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        eligible.where(F.col("sim") > 0)
        .withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vid").alias(id_col),
                F.col("_attr").alias(attr_col), "sim")
    )


def maxsim_rerank(
    embeddings: DataFrame,
    queries: DataFrame,
    shortlist: DataFrame,
    m: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Late-interaction (ColBERT MaxSim, Khattab & Zaharia 2020) rerank:
    vectors are treated as ``m`` token sub-vectors, and the query-doc
    score is Σ over query sub-vectors of the MAX cosine against any doc
    sub-vector — the fine-grained interaction a single-vector dot
    product collapses away. Serving shape mirrors ColBERT's: a cheap
    first stage produces ``shortlist`` (query_id, vid) pairs (brute
    cosine, IVF, anything), and MaxSim runs only on those pairs.

    Determinism: each per-subspace maximum is an order-free aggregate,
    and the final score sums the m maxima in a FIXED expression order
    (wide conditional-max columns, not a float SUM aggregate whose
    combine order varies) — bit-stable in any engine on the quantized
    grid.

    Plan: sub-vector expansion is row-local; the shortlist joins each
    side by its id (bounded by |shortlist|·m²); one (query_id, vid)
    aggregate; one per-query top-k window over k·|queries| rows.
    """
    from pyspark.sql import Window

    from temporal_vector_database_spark.functions.vector import l2_norm

    qs = _subspaces(
        queries.select("query_id", emb_col), "query_id", "query_id", emb_col, m
    ).select(
        F.col("query_id"), F.col("subspace").alias("qi"),
        F.col("sub").alias("q_sub"), l2_norm(F.col("sub")).alias("q_nrm"),
    )
    ds = _subspaces(
        embeddings.select(id_col, emb_col), id_col, "vid", emb_col, m
    ).select(
        F.col("vid"), F.col("subspace").alias("dj"),
        F.col("sub").alias("d_sub"), l2_norm(F.col("sub")).alias("d_nrm"),
    )
    sl = shortlist.select("query_id", F.col(id_col).alias("vid"))
    pairs = (
        sl.join(qs, "query_id")
        .join(ds, "vid")
        .select(
            "query_id", "vid", "qi",
            _guarded_sim("q_sub", "d_sub", "q_nrm", "d_nrm").alias("c"),
        )
    )
    wide = pairs.groupBy("query_id", "vid").agg(
        *[
            F.max(F.when(F.col("qi") == i, F.col("c"))).alias(f"mx_{i}")
            for i in range(m)
        ]
    )
    score = None
    for i in range(m):
        term = F.coalesce(F.col(f"mx_{i}"), F.lit(0.0))
        score = term if score is None else score + term
    scored = wide.withColumn("maxsim", score)
    wk = Window.partitionBy("query_id").orderBy(F.desc("maxsim"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(wk).cast("int"))
        .where(F.col("rank") <= int(k))
        .select("query_id", "rank", F.col("vid").alias(id_col), "maxsim")
    )


def nn_descent(
    embeddings: DataFrame,
    k: int = 5,
    rounds: int = 2,
    nprobe: int = 2,
    centroid_mod: int = 20,
    centroid_rem: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """NN-DESCENT kNN-graph refinement (Dong et al., WWW 2011) — the
    graph-ANN construction principle behind HNSW/NSG, in its
    Spark-native batch form: start from a cheap seed graph (here the
    IVF-probed :func:`knn_graph`, whose recall is bounded by probe
    coverage) and iteratively improve it on the premise that *a
    neighbor of a neighbor is likely a neighbor*: each round scores
    the 2-hop candidates of the SYMMETRIZED current graph and keeps
    every node's best ``k``.

    Scale posture: per round the candidate set is ≤ n·(2k)² rows of
    (id, id) pairs from two equi-joins — never an all-pairs pass —
    and only the NEW candidates (anti-join vs the current graph) carry
    embeddings through the scoring join. The graph (n·k rows) is
    checkpointed per round; rounds are bounded and each is one
    join+window stage. Deterministic end-to-end: the seed is
    deterministic, candidates are set-algebra over it, scores are
    exact dyadic dots, and ranking tie-breaks (sim desc, nbr asc) —
    the oracle replays every round relationally (the kcore/bpe
    unrolled-round discipline).

    Output: ``(query_id, rank, vec_id, sim)`` — same contract as
    :func:`knn_graph`, strictly-no-worse neighbors by construction
    (the union keeps current edges).
    """
    from pyspark.sql import Window

    seed = knn_graph(
        embeddings, k, nprobe, centroid_mod, centroid_rem, id_col, emb_col
    )
    en = (
        embeddings.select(F.col(id_col).alias("_id"), F.col(emb_col).alias("_emb"))
        .withColumn(
            "_nrm",
            F.sqrt(F.aggregate("_emb", F.lit(0.0), lambda a, x: a + x * x)),
        )
        .localCheckpoint()
    )
    g = seed.select(
        F.col("query_id").alias("id"), F.col("vec_id").alias("nbr"), "sim"
    ).localCheckpoint()
    w = Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("nbr"))
    for _ in range(int(rounds)):
        sym = (
            g.select("id", "nbr")
            .union(g.select(F.col("nbr").alias("id"), F.col("id").alias("nbr")))
            .distinct()
        )
        cand = (
            sym.alias("a")
            .join(sym.alias("b"), F.col("a.nbr") == F.col("b.id"))
            .where(F.col("a.id") != F.col("b.nbr"))
            .select(F.col("a.id").alias("id"), F.col("b.nbr").alias("nbr"))
            .distinct()
        )
        new = cand.join(g.select("id", "nbr"), ["id", "nbr"], "left_anti")
        scored = (
            new.join(
                en.select(
                    F.col("_id").alias("id"),
                    F.col("_emb").alias("e1"),
                    F.col("_nrm").alias("n1"),
                ),
                "id",
            )
            .join(
                en.select(
                    F.col("_id").alias("nbr"),
                    F.col("_emb").alias("e2"),
                    F.col("_nrm").alias("n2"),
                ),
                "nbr",
            )
            .withColumn(
                "sim",
                F.when(
                    (F.col("n1") > 0) & (F.col("n2") > 0),
                    F.aggregate(
                        F.zip_with("e1", "e2", lambda x, y: x * y),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                    / (F.col("n1") * F.col("n2")),
                ).otherwise(F.lit(0.0)),
            )
            .select("id", "nbr", "sim")
        )
        g = (
            g.unionByName(scored.where(F.col("sim") > 0))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= int(k))
            .drop("rn")
            .localCheckpoint()
        )
    return g.withColumn("rank", F.row_number().over(w).cast("int")).select(
        F.col("id").alias("query_id"), "rank", F.col("nbr").alias("vec_id"), "sim"
    )
