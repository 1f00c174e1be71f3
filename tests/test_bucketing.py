"""Bucketed co-located join: the join over two same-bucketed tables must plan
with NO Exchange (the shuffle was paid at write time), and its result must
match the plain parquet join."""

import contextlib
import io

from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import bucketing
from custom_columnar_format_spark.queries.tables import load


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_small, tmp_path):
    db = bucketing.ensure_bucket_db(spark, str(tmp_path / "bdb"), db="scbf_buckets_test")
    bucketing.write_bucketed(load(spark, sf_small, "orders"), "orders_b", "o_orderkey", 4, db)
    bucketing.write_bucketed(load(spark, sf_small, "lineitem"), "lineitem_b", "l_orderkey", 4, db)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force would-be SMJ
    try:
        joined = bucketing.colocated_join(
            spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey", db
        )
        plan = plan_of(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan

        n_bucketed = joined.count()
        plain = load(spark, sf_small, "orders").join(
            load(spark, sf_small, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert n_bucketed == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP DATABASE scbf_buckets_test CASCADE")


def test_bucketed_scan_prunes_buckets(spark, sf_small, tmp_path):
    """An equality filter on the bucket key reads 1 of N buckets."""
    db = bucketing.ensure_bucket_db(spark, str(tmp_path / "bdb2"), db="scbf_buckets_test2")
    # for a filter-only plan Spark's auto-bucketed-scan turns bucketed reading
    # off (no join/agg to exploit it); force it on to exercise bucket pruning
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        bucketing.write_bucketed(load(spark, sf_small, "orders"), "orders_p", "o_orderkey", 4, db)
        df = spark.table(f"{db}.orders_p").filter(F.col("o_orderkey") == 7)
        plan = plan_of(df)
        assert "SelectedBucketsCount: 1 out of 4" in plan, plan
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
        spark.sql("DROP DATABASE scbf_buckets_test2 CASCADE")
