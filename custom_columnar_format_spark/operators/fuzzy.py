"""Fuzzy (approximate-string) matching via blocking + edit distance — the
record-linkage shape: never all-pairs, always block-then-verify.

Scale design: candidate pairs come from a blocking key (here: a cheap
deterministic feature of the string, e.g. its last token), expanded
in-bucket with the same ONE-shuffle collect-and-expand used by the LSH
dedup operators (``dedup._explode_pairs``) — no self-join, no re-evaluation
of the upstream pipeline per side. Blocks above ``max_block`` are EXCLUDED
(a degenerate blocking key would otherwise cost O(block²)); the exclusion is
part of the operator's contract — the registered query's oracle mirrors the
cap with the same HAVING bound, so a cap that starts biting shows up as a
row-count change on both sides, never as a silent engine/oracle divergence.
Callers with oversized blocks should pick a finer ``block_expr`` (the
record-linkage analogue of LSH's finer second pass). Verification is
``levenshtein`` on the pair — standard Wagner-Fischer in the JVM, identical
semantics in DuckDB, so the whole operator is oracle-checkable."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _explode_pairs


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    block_expr: F.Column,
    max_dist: int = 3,
    max_block: int = 5000,
) -> DataFrame:
    """(id_a, id_b, dist) for id_a < id_b whose names share a blocking key
    and are within ``max_dist`` edits. ``block_expr`` is the blocking key
    expression over the input columns (e.g. last word of the name)."""
    keyed = df.select(
        F.col(id_col).alias("id"), F.col(name_col).alias("name"), block_expr.alias("blk")
    )
    grouped = (
        keyed.groupBy("blk")
        .agg(F.array_sort(F.collect_list(F.struct("id", "name"))).alias("ms"))
        .filter((F.size("ms") >= 2) & (F.size("ms") <= max_block))
    )
    cand = (
        _explode_pairs(grouped, "ms")
        .select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            F.col("p.a.name").alias("name_a"),
            F.col("p.b.name").alias("name_b"),
        )
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )
