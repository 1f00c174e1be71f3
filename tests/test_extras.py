"""Pins for the oracle-exempt extras: approx_count_distinct accuracy, and a
plan shape check that the deterministic hash sample pushes its filter down."""

from pyspark.sql import functions as F

from custom_columnar_format_spark.queries.registry import all_queries


def test_approx_count_distinct_close_to_exact(spark, sf_small):
    """The registered query is the KMV/bottom-k sketch (oracle-replayable,
    r8); the HLL operator tier stays available and is pinned here too."""
    qd = all_queries()["q_approx_count_distinct"]
    approx = {r["l_returnflag"]: r for r in qd.fn(spark, sf_small).collect()}
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("parts"),
            F.count_distinct("l_suppkey").alias("supps"),
        )
        .collect()
    }
    hll = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("parts"),
            F.approx_count_distinct("l_suppkey").alias("supps"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, row in exact.items():
        for est, true in (
            (approx[flag]["approx_parts"], row["parts"]),
            (approx[flag]["approx_supps"], row["supps"]),
        ):
            # KMV k=1024: rsd ~ 3%; observed <= 1.5% at sf0.001/0.01
            assert abs(est - true) / true < 0.05, f"kmv {flag}: {est} vs {true}"
        for est, true in (
            (hll[flag]["parts"], row["parts"]),
            (hll[flag]["supps"], row["supps"]),
        ):
            assert abs(est - true) / true < 0.05, f"hll {flag}: {est} vs {true}"


def test_sample_filter_reaches_scan(spark, sf_small):
    qd = all_queries()["q_sample_deterministic"]
    plan = qd.fn(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
    # the md5-hash predicate must sit in a Filter directly over the scan (no
    # shuffle/sort before it), so at 100 TB only sampled rows leave the scan stage
    assert "Filter" in plan and "Scan parquet" in plan
    before_exchange = plan.split("Exchange")[-1]  # deepest (scan-side) fragment
    assert "md5" in before_exchange.lower()

def test_approx_percentiles_close_to_exact(spark, sf_small):
    """The registered query is the deterministic md5 1/16-sample quantile
    (oracle-replayable, r8); the percentile_approx sketch tier stays
    available as the operator path and keeps its tight pin."""
    qa = all_queries()["q_percentiles_approx"]
    qe = all_queries()["q_percentiles"]
    approx = {r["l_returnflag"]: r for r in qa.fn(spark, sf_small).collect()}
    exact = {r["l_returnflag"]: r for r in qe.fn(spark, sf_small).collect()}
    assert set(approx) == set(exact)
    for flag, row in exact.items():
        for col in ("p50", "p90", "p99"):
            est, true = approx[flag][col], row[col]
            # ~60-row/flag sample at sf0.001: worst observed error 8.6%
            assert abs(est - true) / true < 0.12, f"{flag}.{col}: {est} vs {true}"
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    sketch = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.round(
                    F.percentile_approx("l_extendedprice", F.lit(p), F.lit(10000)), 4
                ).alias(c)
                for p, c in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
            ]
        )
        .collect()
    }
    for flag, row in exact.items():
        for col in ("p50", "p90", "p99"):
            est, true = sketch[flag][col], row[col]
            # rank-error sketch: value error is tiny at this accuracy
            assert abs(est - true) / true < 0.01, f"sketch {flag}.{col}: {est} vs {true}"

def test_sql_surface_over_registered_views(spark, sf_small):
    from custom_columnar_format_spark.queries.tables import register_views

    register_views(spark, sf_small)
    got = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_cust
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_cust DESC, n_name LIMIT 5
        """
    ).collect()
    assert len(got) == 5 and got[0]["n_cust"] >= got[-1]["n_cust"]
    # events view must carry the ns→µs truncation (raw read would fail)
    assert spark.sql("SELECT MIN(ts) AS t FROM events").collect()[0]["t"] is not None
