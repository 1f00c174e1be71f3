"""Connected components pinned against a brute-force union-find, including
path-shaped graphs (worst case for label propagation: diameter rounds) and
the real MinHash-pairs input."""

import random

from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import clustering, dedup


def union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: every node -> min of its component
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    # find() path-compresses to the root, which is the min because unions
    # always point the larger root at the smaller one
    return comp


def check_graph(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.node: r.component for r in clustering.connected_components(df).collect()}
    want = union_find(edges)
    assert got == want


def test_cc_two_triangles_and_bridge(spark):
    check_graph(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (3, 10), (20, 21)])


def test_cc_long_path(spark):
    # path 0-1-2-...-15: diameter 15 exercises multi-round convergence
    check_graph(spark, [(i, i + 1) for i in range(15)])


def test_cc_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    edges = [(a, b) for a, b in edges if a != b]
    check_graph(spark, edges)


def test_duplicate_clusters_from_minhash(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    pairs = dedup.minhash_neardup_pairs(docs, jaccard_threshold=0.4)
    clusters = clustering.duplicate_clusters(pairs).collect()
    assert len(clusters) > 0
    by_comp = {r.component: r for r in clusters}
    # every component id is its own keep_id (min member), members >= 2
    for comp, row in by_comp.items():
        assert row.keep_id == comp
        assert row.n_members >= 2
    # total deduped members == distinct nodes in the pair list
    nodes = pairs.select(F.explode(F.array("id_a", "id_b")).alias("n")).distinct().count()
    assert sum(r.n_members for r in clusters) == nodes
