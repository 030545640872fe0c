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
