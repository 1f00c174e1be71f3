"""Graph pattern counting: triangle enumeration over an undirected edge
table — the clustering-coefficient / community-density primitive, joining
PageRank (`operators/pagerank.py`) and connected components
(`operators/clustering.py`) in the graph family.

Scale design: the classic two-join triangle enumeration over ORIENTED edges
(a < b everywhere) counts each triangle exactly once and avoids the
6× duplication of the naive undirected join. Both joins are equi-joins on
node keys — shuffle-partitioned by vertex, no cartesian anywhere. At true
web scale you orient edges by DEGREE (low→high) instead of by id, which
bounds each vertex's out-neighborhood by O(sqrt(|E|)) and keeps the
wedge-join skew-free (Suri & Vassilvitskii, WWW'11 "Counting triangles and
the curse of the last reducer"); id-orientation is used here because the
test graphs are small and the oracle must replay the exact same pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def triangles(edges: DataFrame, src: str = "a", dst: str = "b") -> DataFrame:
    """Enumerate triangles (a < b < c) of an undirected simple graph given
    as oriented distinct edges (src < dst per row). Returns (na, nb, nc)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z"))
    )
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    return (
        wedges.join(closing, ["x", "z"])
        .select(F.col("x").alias("na"), F.col("y").alias("nb"), F.col("z").alias("nc"))
    )
