"""Observation metrics: correct values, and no second job to produce them."""

from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import observe
from custom_columnar_format_spark.queries.tables import load


def test_observed_metrics_match_direct_aggregates(spark, sf_small):
    c = load(spark, sf_small, "customer")
    inst, obs = observe.observed(
        c,
        "cust_stage",
        **observe.standard_metrics("c_name", "c_acctbal"),
        neg_bal=F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)),
    )
    n = inst.count()  # the action the metrics ride on
    got = obs.get
    assert got["n_rows"] == n
    assert got["nulls_c_name"] == 0
    direct = c.filter(F.col("c_acctbal") < 0).count()
    assert got["neg_bal"] == direct


def test_metrics_ride_the_main_action_no_extra_job(spark, sf_small):
    """An observed count() must launch exactly as many jobs as a plain
    count() — the metrics fold into the action, they don't re-run lineage."""
    tracker = spark.sparkContext.statusTracker()

    def jobs():
        return len(tracker.getJobIdsForGroup(None) or [])

    c = load(spark, sf_small, "nation")
    c.count()  # warm file index + plan caches
    before = jobs()
    c.count()
    plain = jobs() - before

    inst, obs = observe.observed(c, "one_job", **observe.standard_metrics())
    before = jobs()
    inst.count()
    with_obs = jobs() - before
    assert obs.get["n_rows"] > 0
    assert with_obs == plain
