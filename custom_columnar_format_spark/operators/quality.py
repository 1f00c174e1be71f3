"""Declarative data-quality checks — the expectations layer a production
pipeline runs before publishing a dataset (Delta constraints / dbt tests
shape). Each rule compiles to a conditional aggregate, so ANY number of
rules costs ONE scan with no shuffle (a single global aggregate row), and
the uniqueness rule costs one extra aggregate on the key.

Rules (all pure Column expressions, JVM-side):
- not_null(col)
- in_range(col, lo, hi)          — inclusive bounds
- matches(col, regex)
- accepted_values(col, values)
- unique_key(cols...)            — duplicate groups counted separately
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class Rule:
    name: str
    violation: Optional[Column]  # row-level predicate: True == violating row
    unique_cols: Optional[Sequence[str]] = None


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"in_range_{col}",
        F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi),
    )


def matches(col: str, regex: str, name: str | None = None) -> Rule:
    return Rule(name or f"matches_{col}", ~F.coalesce(F.col(col).rlike(regex), F.lit(False)))


def accepted_values(col: str, values: Sequence) -> Rule:
    return Rule(
        f"accepted_values_{col}",
        F.col(col).isNull() | ~F.col(col).isin(*values),
    )


def unique_key(*cols: str) -> Rule:
    return Rule("unique_key_" + "_".join(cols), None, unique_cols=list(cols))


def check(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate all rules; returns (rule, violations) one row per rule.

    Row-level rules fold into a single conditional-sum aggregate (one scan);
    each unique_key rule adds one groupBy on its key counting surplus rows
    beyond the first per group."""
    row_rules = [r for r in rules if r.violation is not None]
    uniq_rules = [r for r in rules if r.unique_cols is not None]

    out = None
    if row_rules:
        agg = df.agg(
            *[
                F.sum(F.when(r.violation, 1).otherwise(0)).cast("long").alias(r.name)
                for r in row_rules
            ]
        )
        out = agg.unpivot([], [r.name for r in row_rules], "rule", "violations")
    for r in uniq_rules:
        dups = (
            df.groupBy(*r.unique_cols)
            .agg((F.count(F.lit(1)) - 1).alias("surplus"))
            .agg(F.coalesce(F.sum("surplus"), F.lit(0)).cast("long").alias("violations"))
            .select(F.lit(r.name).alias("rule"), "violations")
        )
        out = dups if out is None else out.unionByName(dups)
    if out is None:
        raise ValueError("no rules given")
    return out


def analyze_table(df, columns=None):
    """ANALYZE TABLE-style per-column statistics in ONE scan: row count,
    null count, exact distinct count, min/max (rendered as strings so mixed
    types share a schema), average length. All N columns' aggregates fold
    into a single hash aggregation — the driver-side cost of a CBO stats
    refresh is one job regardless of column count. For 100 TB refreshes swap
    ``count_distinct`` for ``approx_count_distinct`` (same plan shape, HLL
    sketch instead of exact dedup state).

    Returns one row per column: (column, n_rows, n_null, n_distinct,
    min_value, max_value, avg_len).
    """
    from pyspark.sql import functions as F

    cols = list(columns) if columns is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__null_{c}"),
            F.count_distinct(col).alias(f"__ndv_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
            F.avg(F.length(col.cast("string"))).alias(f"__len_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_null"),
            F.col(f"__ndv_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
            F.round(F.col(f"__len_{c}"), 4).alias("avg_len"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")
