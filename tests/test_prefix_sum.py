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


@pytest.mark.parametrize("aqe", ["true", "false"])
@pytest.mark.parametrize("n_parts", [3, 7])
def test_deterministic_in_dirtied_session(spark, sf_small, aqe, n_parts):
    """Regression guard for the r4 driver hash mismatch: the sliced+pid
    table used to be evaluated by TWO independent rangepartitioning
    Exchanges, each sampling its own boundaries (seeded from the RDD id,
    which shifts with session history) — so results could differ run to
    run. The operator must now be bit-identical across repeated runs in a
    session whose RDD-id counter keeps moving."""
    o = load(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    try:
        results = []
        for i in range(5):
            # Dirty the session: burn RDD ids so each construction of the
            # operator's plan starts from a different id counter.
            spark.sparkContext.parallelize(range(10 * (i + 1)), 2).count()
            got = prefix_sum.cumulative_sum(
                o,
                ["o_orderkey"],
                "o_totalprice",
                partition_cols=["o_orderpriority"],
                n_partitions=n_parts,
            )
            rows = sorted(
                (r["o_orderkey"], r["o_orderpriority"], round(r["cum"], 6))
                for r in got.collect()
            )
            results.append(rows)
        assert all(r == results[0] for r in results[1:])
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


@pytest.mark.parametrize("n_slices", [1, 4, 13])
def test_keyed_cumsum_matches_naive(spark, sf_small, n_slices):
    o = load(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    got = prefix_sum.cumulative_sum_keyed(
        o,
        "o_orderkey",
        "o_totalprice",
        partition_cols=["o_orderpriority"],
        n_slices=n_slices,
    )
    want = _naive(o, ["o_orderkey"], "o_totalprice", ["o_orderpriority"])
    joined = got.alias("g").join(want.alias("w"), "o_orderkey")
    bad = joined.filter(F.abs(F.col("g.cum") - F.col("w.cum")) > 1e-6).count()
    assert bad == 0
    assert got.count() == o.count()


def test_keyed_cumsum_global_no_groups(spark, sf_small):
    o = load(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    got = prefix_sum.cumulative_sum_keyed(o, "o_orderkey", "o_totalprice", n_slices=6)
    want = _naive(o, ["o_orderkey"], "o_totalprice")
    joined = got.alias("g").join(want.alias("w"), "o_orderkey")
    bad = joined.filter(F.abs(F.col("g.cum") - F.col("w.cum")) > 1e-6).count()
    assert bad == 0


def test_keyed_cumsum_null_keys_and_values(spark):
    """NULL order keys land in the last slice and sort last (DuckDB ASC
    NULLS LAST); NULL values are skipped by SUM in both engines."""
    rows = [
        (1, "a", 10.0),
        (2, "a", None),
        (None, "a", 5.0),
        (3, "b", 1.0),
        (None, "b", 2.0),
    ]
    df = spark.createDataFrame(rows, "k int, g string, v double")
    got = {
        (r["g"], r["k"]): r["cum"]
        for r in prefix_sum.cumulative_sum_keyed(
            df, "k", "v", partition_cols=["g"], n_slices=3
        ).collect()
    }
    assert got[("a", 1)] == 10.0
    assert got[("a", 2)] == 10.0  # NULL v: running sum carries forward
    assert got[("a", None)] == 15.0  # NULL key last
    assert got[("b", 3)] == 1.0
    assert got[("b", None)] == 3.0


@pytest.mark.parametrize("aqe", ["true", "false"])
def test_keyed_deterministic_in_dirtied_session(spark, sf_small, aqe):
    """The keyed variant has NO sampled boundaries at all — slice ids are a
    pure function of the key value — so repeated runs must be bit-identical
    regardless of session history, AQE, or shuffle.partitions. This is the
    round-6 replacement surface for the r4/r5 q_pack_sequences driver
    hash mismatch."""
    o = load(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    try:
        results = []
        for i, sp in enumerate([7, 32, 64, 200, 32]):
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            spark.sparkContext.parallelize(range(10 * (i + 1)), 2).count()
            got = prefix_sum.cumulative_sum_keyed(
                o,
                "o_orderkey",
                "o_totalprice",
                partition_cols=["o_orderpriority"],
                n_slices=13,
            )
            rows = sorted(
                (r["o_orderkey"], r["o_orderpriority"], round(r["cum"], 6))
                for r in got.collect()
            )
            results.append(rows)
        assert all(r == results[0] for r in results[1:])
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)


def test_no_single_global_window_partition(spark, sf_small):
    """The plan must not contain a window over an empty partition spec
    (the single-task global sort the operator exists to avoid)."""
    o = load(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    got = prefix_sum.cumulative_sum(o, ["o_orderkey"], "o_totalprice")
    plan = got._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__ps_pid" in line or "partitionBy" not in line


@pytest.mark.parametrize("fn_name", ["cumulative_sum", "cumulative_sum_keyed"])
def test_null_partition_key_group_is_kept(spark, fn_name):
    """SUM() OVER (PARTITION BY p ...) keeps a NULL p as its own group; the
    distributed variants' broadcast bounds/offsets joins must not drop
    those rows (r6 advisor: a plain equi-join never matches NULL keys)."""
    rows = [
        ("a", 1, 10), ("a", 2, 20), (None, 3, 5), (None, 4, 7), ("b", 5, 1),
    ]
    df = spark.createDataFrame(rows, "p: string, k: long, v: long")
    fn = getattr(prefix_sum, fn_name)
    got = fn(df, ["k"], "v", partition_cols=["p"]).orderBy("k")
    want = _naive(df, ["k"], "v", partition_cols=["p"]).orderBy("k")
    g = [(r["p"], r["k"], r["cum"]) for r in got.collect()]
    w = [(r["p"], r["k"], r["cum"]) for r in want.collect()]
    assert g == w
    assert (None, 3, 5) in [(a, b, c) for a, b, c in g]
    assert (None, 4, 12) in [(a, b, c) for a, b, c in g]
