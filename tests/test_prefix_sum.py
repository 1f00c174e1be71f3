"""Distributed prefix sum == single-partition window cumsum, at any slice
count, with and without a group restart."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from custom_columnar_format_spark.operators import prefix_sum
from custom_columnar_format_spark.queries.tables import load


def _naive(df, order_cols, value_col, partition_cols=()):
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("cum", F.sum(value_col).over(w))


@pytest.mark.parametrize("n_parts", [1, 4, 13])
def test_global_cumsum_matches_naive(spark, sf_small, n_parts):
    o = load(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    got = prefix_sum.cumulative_sum(
        o, ["o_orderkey"], "o_totalprice", n_partitions=n_parts
    )
    want = _naive(o, ["o_orderkey"], "o_totalprice")
    joined = got.alias("g").join(want.alias("w"), "o_orderkey")
    bad = joined.filter(F.abs(F.col("g.cum") - F.col("w.cum")) > 1e-6).count()
    assert bad == 0
    assert got.count() == o.count()


def test_grouped_cumsum_restarts_per_group(spark, sf_small):
    o = load(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    got = prefix_sum.cumulative_sum(
        o,
        ["o_orderkey"],
        "o_totalprice",
        partition_cols=["o_orderpriority"],
        n_partitions=7,
    )
    want = _naive(o, ["o_orderkey"], "o_totalprice", ["o_orderpriority"])
    joined = got.alias("g").join(want.alias("w"), "o_orderkey")
    bad = joined.filter(F.abs(F.col("g.cum") - F.col("w.cum")) > 1e-6).count()
    assert bad == 0


def test_no_single_global_window_partition(spark, sf_small):
    """The plan must not contain a window over an empty partition spec
    (the single-task global sort the operator exists to avoid)."""
    o = load(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    got = prefix_sum.cumulative_sum(o, ["o_orderkey"], "o_totalprice")
    plan = got._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__ps_pid" in line or "partitionBy" not in line
