"""Skyline (Pareto-frontier) query: rows not strictly dominated on a
(minimize, maximize) objective pair — the classic "cheapest AND biggest"
multi-criteria shortlist.

Scale design: the textbook formulation is a quadratic NOT EXISTS self-join
(that IS the DuckDB oracle). The engine instead runs the sort-scan algorithm
as relational ops in O(n log n):

1. collapse to one row per distinct minimize-value with its best (max)
   maximize-value — a hash agg over the raw table, the only full shuffle;
2. a running max over the *distinct-value table* ordered by minimize-value
   tells each value whether any strictly-cheaper value already achieves an
   equal-or-better maximize — a window over |distinct| rows, orders of
   magnitude smaller than the input (at 100 TB with a pathological all-
   distinct key, swap step 2 for the range-partitioned two-pass prefix-max
   of ``operators/prefix_sum.py`` — same algebra, no single-partition
   window);
3. a semi-join of the surviving (value, best) pairs back to the raw table
   recovers the frontier rows, including exact duplicates (neither of two
   identical points strictly dominates the other, so both stay — matching
   the NOT-EXISTS oracle's semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def skyline_2d(df: DataFrame, minimize_col: str, maximize_col: str) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier for (minimize ``minimize_col``,
    maximize ``maximize_col``). A row survives iff no other row is ≤ on the
    minimize axis AND ≥ on the maximize axis with at least one strict."""
    g = df.groupBy(minimize_col).agg(F.max(maximize_col).alias("gbest"))
    w = Window.orderBy(minimize_col).rowsBetween(Window.unboundedPreceding, -1)
    frontier = (
        g.withColumn("prev_best", F.max("gbest").over(w))
        # survive iff no strictly-cheaper value reaches my best
        .filter(F.col("prev_best").isNull() | (F.col("prev_best") < F.col("gbest")))
        .select(minimize_col, F.col("gbest").alias(maximize_col))
    )
    # Within a surviving minimize-value, only rows achieving gbest are on the
    # frontier (same value + smaller maximize is strictly dominated).
    return df.join(frontier, [minimize_col, maximize_col], "left_semi")
