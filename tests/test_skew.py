"""Salted aggregation/join: result-identical to the direct plans on skewed
data, and the salted agg really is two-stage in the physical plan."""

import pytest
from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import skew


@pytest.fixture(scope="module")
def skewed_df(spark):
    # 10k rows for key "hot", a few for everything else
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    cold = spark.range(50).select(
        F.concat(F.lit("c"), (F.col("id") % 10).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionAll(cold)


def test_salted_agg_matches_direct(spark, skewed_df):
    got = skew.salted_agg(
        skewed_df, ["k"], {"n": ("count", "*"), "total": ("sum", "v"), "mx": ("max", "v")}
    )
    expect = skewed_df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx")
    )
    assert sorted(got.collect()) == sorted(expect.collect())


def test_salted_agg_is_two_stage(spark, skewed_df):
    import contextlib
    import io

    got = skew.salted_agg(skewed_df, ["k"], {"n": ("count", "*")}, n_salts=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain()
    plan = buf.getvalue()
    # two shuffles: (k, salt) then (k)
    assert plan.count("hashpartitioning(k") >= 2


def test_salted_join_matches_direct(spark, skewed_df):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("c1", "C1"), ("c2", "C2"), ("missing", "M")], ["k", "label"]
    )
    got = skew.salted_join(skewed_df, dim, ["k"], n_salts=4)
    expect = skewed_df.join(dim, ["k"])
    assert got.count() == expect.count() == 10_000 + 10  # hot + c1 + c2 rows
    assert sorted(got.groupBy("k", "label").count().collect()) == sorted(
        expect.groupBy("k", "label").count().collect()
    )


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's runtime skew-join handling: with skew thresholds scaled to test
    data, the executed plan must mark the hot partition split (skew=true) —
    the knob a 100 TB deployment relies on when salting isn't in the query."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "4KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        hot = spark.range(200_000).select(
            (F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id"))).alias("k"),
            F.rand(7).alias("v"),
        )
        right = spark.range(100_000).select(
            (F.when(F.col("id") % 20 < 1, 1).otherwise(F.col("id"))).alias("k"),
            F.rand(11).alias("w"),
        )
        joined = hot.join(right, "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
        [row] = joined.collect()
        assert row.n > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE did not split the skewed partition:\n{plan[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_left_join_keeps_unmatched(spark, skewed_df):
    dim = spark.createDataFrame([("hot", "HOT")], ["k", "label"])
    got = skew.salted_join(skewed_df, dim, ["k"], n_salts=4, how="left")
    expect = skewed_df.join(dim, ["k"], "left")
    assert got.count() == expect.count()
    assert got.filter(F.col("label").isNull()).count() == 50
