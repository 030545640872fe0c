"""Connected-components / dedup-cluster tests (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cumulus_etl_spark.operators.graph import connected_components, dedup_clusters


def test_connected_components_chain_and_isolates(spark):
    """A long chain (worst case for propagation) + isolated vertices."""
    verts = spark.createDataFrame([(i,) for i in range(12)], "id long")
    # chain 0-1-2-...-7 ; pair 9-10 ; isolates 8, 11
    chain = [(i, i + 1) for i in range(7)]
    edges = spark.createDataFrame(chain + [(9, 10)], "src long, dst long")
    got = {r["id"]: r["component"] for r in connected_components(verts, edges).collect()}
    assert all(got[i] == 0 for i in range(8))
    assert got[9] == got[10] == 9
    assert got[8] == 8 and got[11] == 11


def test_dedup_clusters_transitive(spark):
    """A~B and B~C but no A~C edge: all three must share one cluster —
    the case pairwise drop-the-greater gets wrong."""
    df = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z"), (4, "w")],
                               "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = dedup_clusters(df, pairs, "doc_id")
    rows = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out.collect()}
    assert rows[1] == (1, True)
    assert rows[2] == (1, False)
    assert rows[3] == (1, False)
    assert rows[4] == (4, True)


def test_connected_components_random_vs_union_find(spark):
    """Randomized graphs checked against a plain union-find oracle."""
    import random

    rng = random.Random(7)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id label per component
    expected = {}
    for v in range(n):
        root = find(v)
        expected.setdefault(root, []).append(v)
    want = {v: min(mem) for mem in expected.values() for v in mem}

    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    from cumulus_etl_spark.operators.graph import connected_components

    got = {r["id"]: r["component"] for r in connected_components(verts, edf).collect()}
    assert got == want


def test_connected_components_seeded_equals_explicit(spark):
    """vertices=None (edge-derived vertex set + shuffle-free seeded
    labels, r13 opt) must produce the identical labeling as the
    explicit-vertices path on every edge-incident vertex — randomized
    graphs including chains (multi-round convergence) and an
    empty-edge frame (the coalesce'd convergence guard)."""
    import random

    for seed in (3, 11):
        rng = random.Random(seed)
        n = 50
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(40)]
        edges += [(i, i + 1) for i in range(60, 70)]  # a chain tail
        edges = [(a, b) for a, b in edges if a != b]
        edf = spark.createDataFrame(edges, "src long, dst long")
        touched = sorted({v for e in edges for v in e})
        verts = spark.createDataFrame([(v,) for v in touched], "id long")
        explicit = {r["id"]: r["component"]
                    for r in connected_components(verts, edf).collect()}
        seeded = {r["id"]: r["component"]
                  for r in connected_components(None, edf).collect()}
        assert seeded == explicit

    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(None, empty).count() == 0


def test_connected_components_shuffled_path_equals_broadcast(spark):
    """The r13 size-guarded broadcast of the labels side must be a pure
    plan choice: with auto-broadcast disabled (the guard respects -1 and
    falls back to the shuffled joins — the 100 TB regime every test graph
    is otherwise too small to reach) the labeling must be identical."""
    import random

    rng = random.Random(7)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(50)]
    edges += [(i, i + 1) for i in range(70, 82)]  # chain: multi-round
    edges = [(a, b) for a, b in edges if a != b]
    edf = spark.createDataFrame(edges, "src long, dst long")

    bcast = {r["id"]: r["component"]
             for r in connected_components(None, edf).collect()}
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shuffled = {r["id"]: r["component"]
                    for r in connected_components(None, edf).collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    assert shuffled == bcast


def test_pagerank_mass_and_hub_dominance(spark):
    from cumulus_etl_spark.operators.graph import pagerank
    from pyspark.sql import functions as F

    # Star graph: 1..5 all point at 0, plus a 5<->6 cycle edge pair.
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(5, 6), (6, 5)],
        "src long, dst long",
    )
    ranks = pagerank(edges, damping=0.85, iters=12)
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    assert set(got) == set(range(7))
    # The hub receives contributions from five sources: it must dominate.
    assert got[0] == max(got.values())
    # Every rank at least the teleport floor.
    assert all(v >= (1 - 0.85) / 7 - 1e-12 for v in got.values())
    # Rank mass stays bounded by 1 (dangling loss only shrinks it).
    assert sum(got.values()) <= 1.0 + 1e-9
    # Deterministic across reruns.
    got2 = {r["id"]: r["rank"] for r in pagerank(edges, damping=0.85, iters=12).collect()}
    assert got == got2


def test_triangle_counts_k4_plus_tail(spark):
    """K4 (every node in C(3,2)=3 triangles) plus a dangling path that
    adds none; reversed/duplicate edges must canonicalize away."""
    from cumulus_etl_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = k4 + [(4, 5), (5, 6)] + [(2, 1), (3, 1), (1, 2)]  # dupes/reversed
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_total_matches_bruteforce(spark):
    """Random-ish deterministic graph: per-node counts sum to 3x the
    number of triangles found by brute-force enumeration."""
    from itertools import combinations

    from cumulus_etl_spark.operators.graph import triangle_counts

    nodes = list(range(20))
    edges = [
        (u, v)
        for u, v in combinations(nodes, 2)
        if (u * 7 + v * 13) % 5 < 2  # deterministic ~40% density
    ]
    eset = set(edges)
    tri = sum(
        1
        for x, y, z in combinations(nodes, 3)
        if (x, y) in eset and (y, z) in eset and (x, z) in eset
    )
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = triangle_counts(df).collect()
    assert sum(r["n_triangles"] for r in rows) == 3 * tri
    assert tri > 0


def test_kcore_peel_until_convergence_matches_bruteforce(spark):
    """K4 with a pendant path and a separate triangle: the 3-core is
    exactly the K4; the 2-core adds the triangle but never the path.
    Until-convergence must equal a Python fixed-point peel."""
    from cumulus_etl_spark.operators.graph import kcore_peel

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    path = [(4, 10), (10, 11), (11, 12)]
    tri = [(20, 21), (21, 22), (20, 22)]
    edges = k4 + path + tri

    def brute(es, k):
        es = {tuple(sorted(e)) for e in es}
        while True:
            deg = {}
            for u, v in es:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            keep = {n for n, d in deg.items() if d >= k}
            nxt = {(u, v) for u, v in es if u in keep and v in keep}
            if nxt == es:
                return deg if es else {}
            es = nxt

    df = spark.createDataFrame(edges, ["src", "dst"])
    for k in (2, 3):
        got = {r["id"]: r["deg"] for r in kcore_peel(df, k).collect()}
        assert got == brute(edges, k), k
    assert set(brute(edges, 3)) == {1, 2, 3, 4}


def test_kcore_bounded_rounds_prefix_of_convergence(spark):
    """rounds=1 performs exactly one peel (pendant leaves gone, the
    next layer still present); enough rounds equals the fixed point."""
    from cumulus_etl_spark.operators.graph import kcore_peel

    # chain into a triangle: peeling the chain takes one round per link
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    one = {r["id"] for r in kcore_peel(df, 2, rounds=1).collect()}
    assert one == {2, 3, 4, 5, 6}  # node 1 (degree 1) peeled, 2 not yet
    full = {r["id"] for r in kcore_peel(df, 2, rounds=10).collect()}
    assert full == {4, 5, 6}


def test_pagerank_integer_matches_sequential_reference(spark):
    """Exact-integer PageRank == a plain Python replay of the same
    truncated recurrence (the property that makes the DuckDB oracle
    possible), plus hub dominance and the teleport floor."""
    from cumulus_etl_spark.operators.graph import pagerank_integer

    edges_py = [(i, 0) for i in range(1, 6)] + [(0, 1), (5, 6), (6, 5)]
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    scale, rounds = 10**12, 5
    got = {
        r["id"]: r["rank_units"]
        for r in pagerank_integer(edges, rounds=rounds, scale=scale).collect()
    }

    # sequential reference of the identical integer recurrence
    verts = sorted({v for e in edges_py for v in e})
    n = len(verts)
    r0 = scale // n
    tele = (15 * r0) // 100
    outdeg: dict[int, int] = {}
    for s, _ in edges_py:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: r0 for v in verts}
    for _ in range(rounds):
        s: dict[int, int] = {}
        for u, v in edges_py:
            s[v] = s.get(v, 0) + rank[u] // outdeg[u]
        rank = {v: tele + (85 * s.get(v, 0)) // 100 for v in verts}
    assert got == rank
    assert got[0] == max(got.values())          # the hub dominates
    assert all(v >= tele for v in got.values())  # teleport floor
    assert sum(got.values()) <= scale            # truncation only loses


def test_pagerank_integer_zero_rounds_is_uniform(spark):
    from cumulus_etl_spark.operators.graph import pagerank_integer

    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    got = {r["id"]: r["rank_units"]
           for r in pagerank_integer(edges, rounds=0).collect()}
    assert got == {0: 10**12 // 2, 1: 10**12 // 2}
