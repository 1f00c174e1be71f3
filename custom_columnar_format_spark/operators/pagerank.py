"""PageRank over an edge DataFrame — the iterative-algorithm pattern on
DataFrames (same execution shape as operators/clustering.py's connected
components: a small per-node state table refined over a fixed number of
rounds, lineage cut per round).

Scale design:
- State is one (node, rank) row per node — never materialized per edge.
- Each round is ONE shuffle: contributions = ranks ⋈ edges on src (both
  sides hash-partitioned on the join key), then groupBy(dst) with map-side
  partial sums. Edge and degree tables are computed once and reused.
- ``localCheckpoint`` after each round truncates the growing lineage —
  without it, round k replans rounds 1..k-1 (exponential plan growth is the
  classic iterative-DataFrame trap).
- Undirected treatment (each edge contributes both ways) keeps every node's
  out-degree ≥ 1, so there are no dangling-mass corrections to distribute —
  the variant whose fixed-iteration unrolling a SQL oracle can replicate
  exactly.

The reference has no graph capability at all (SURVEY.md §2.2); this is
north-star surface alongside duplicate clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Ranks after ``iterations`` rounds of r ← (1−d)/N + d·Σ r(u)/deg(u)
    over the UNDIRECTED graph of ``edges`` (each edge walks both ways).
    Returns (node, rank). Deterministic for a fixed iteration count."""
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select("u")
    n = nodes.count()
    if n == 0:  # empty graph: no nodes, no ranks (not a 1/0 teleport term)
        return nodes.select(F.col("u").alias("node"), F.lit(0.0).alias("rank"))

    out_edges = und.join(deg, "u").localCheckpoint()  # (u, v, deg) — reused every round
    ranks = nodes.select("u", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contribs = (
            out_edges.join(ranks, "u")
            .select("v", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs.withColumnRenamed("v", "u"), "u", "left")
            .select(
                "u",
                (F.lit((1.0 - damping) / n) + F.lit(damping) * F.coalesce("s", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint()
        )
    return ranks.select(F.col("u").alias("node"), "rank")
