"""Fixed-point PageRank — convergence shape, mass conservation bound,
and brute-force parity on a hand-checked graph."""

from pyspark.sql import functions as F  # noqa: F401


def _brute_pr(edges, n_iter=3, scale=10**12, dn=85, dd=100):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    pr = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        base = scale * (dd - dn) // (dd * n)
        nxt = {v: base for v in nodes}
        for u, v in edges:
            nxt[v] += (pr[u] * dn) // (dd * deg[u])
        pr = nxt
    return pr, deg


def test_pagerank_fixed_brute_force_parity(spark):
    from temporal_vector_database_spark.operators.graph import pagerank_fixed

    # a hub (1) pointed at by 2,3,4; a 2-cycle (5,6); symmetrized star
    raw = [(2, 1), (3, 1), (4, 1), (1, 2), (1, 3), (1, 4), (5, 6), (6, 5)]
    df = spark.createDataFrame(raw, "src long, dst long")
    got = {r.id: (r.pr_units, r.deg)
           for r in pagerank_fixed(df, n_iter=3).collect()}
    pr, deg = _brute_pr(raw)
    assert {k: v[0] for k, v in got.items()} == pr
    assert {k: v[1] for k, v in got.items()} == {
        k: deg.get(k, 0) for k in got
    }
    # the hub out-ranks the leaves; cycle nodes are symmetric
    assert got[1][0] > got[2][0] == got[3][0] == got[4][0]
    assert got[5][0] == got[6][0]


def test_pagerank_fixed_mass_nearly_conserved(spark):
    """Floor divisions only ever LOSE mass: total stays within
    N*(avg_deg+1) units of SCALE, and never exceeds it."""
    import random

    from temporal_vector_database_spark.operators.graph import pagerank_fixed

    rng = random.Random(5)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(200)})
    edges = [(u, v) for u, v in edges if u != v]
    sym = edges + [(v, u) for u, v in edges]
    df = spark.createDataFrame(sym, "src long, dst long")
    rows = pagerank_fixed(df, n_iter=3).collect()
    total = sum(r.pr_units for r in rows)
    scale = 10**12
    assert total <= scale
    # 3 iterations, each loses < 1 unit per (edge + node)
    assert total > scale - 3 * (len(sym) + len(rows)) - len(rows)
