"""As-of / range join semantics vs hand-computed expectations and a naive
theta-join baseline."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts(10)), (2, "u1", ts(30)), (3, "u2", ts(5)), (4, "u3", ts(50))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(100, "u1", ts(8)), (101, "u1", ts(25)), (102, "u2", ts(7)), (103, "u1", ts(30))],
        ["click_id", "user_id", "ts"],
    )
    return left, right


def test_asof_backward(frames):
    from custom_columnar_format_spark.operators.asof import asof_join

    left, right = frames
    out = asof_join(
        left, right.withColumnRenamed("click_id", "prev_click"), on="user_id",
        left_ts="ts", right_ts="ts", right_cols=["prev_click"],
    )
    got = {r.event_id: r.prev_click for r in out.collect()}
    # event 1 (t=10): latest click ≤10 is 100 (t=8); event 2 (t=30): tie at 30 matches 103;
    # event 3 (t=5): no click ≤5 for u2 → null; event 4: u3 has no clicks → null.
    assert got == {1: 100, 2: 103, 3: None, 4: None}


def test_asof_forward(frames):
    from custom_columnar_format_spark.operators.asof import asof_join

    left, right = frames
    out = asof_join(
        left, right.withColumnRenamed("click_id", "next_click"), on="user_id",
        left_ts="ts", right_ts="ts", right_cols=["next_click"], direction="forward",
    )
    got = {r.event_id: r.next_click for r in out.collect()}
    assert got[1] == 101  # next click after t=10 for u1 is t=25
    assert got[3] == 102  # u2 click at t=7 ≥ t=5
    assert got[4] is None


def test_range_join_matches_theta(spark, frames):
    from custom_columnar_format_spark.operators.asof import range_join_buckets

    left, right = frames
    l = left.select("event_id", "user_id", F.col("ts").alias("l_ts"))
    r = right.select("click_id", "user_id", F.col("ts").alias("r_ts"))
    bucketed = {
        (x.event_id, x.click_id)
        for x in range_join_buckets(l, r, "l_ts", "r_ts", max_gap_seconds=10, extra_on=["user_id"]).collect()
    }
    theta = {
        (x.event_id, x.click_id)
        for x in l.join(r, "user_id")
        .filter((F.unix_timestamp("l_ts") - F.unix_timestamp("r_ts")).between(0, 10))
        .collect()
    }
    assert bucketed == theta and (1, 100) in bucketed
