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


def test_interval_point_join_skewed_auto_bucket(spark):
    """Skewed interval widths: 40 short (~10 s) + 3 long (~3600 s) windows.
    auto_bucket_seconds must land near the p90 of the SHORT mass (so the
    bulk explodes into <=2 buckets) instead of the long tail's width, and
    the join must match a naive theta-join exactly."""
    import datetime as _dt

    from custom_columnar_format_spark.operators.asof import (
        auto_bucket_seconds,
        interval_point_join,
    )

    t0 = _dt.datetime(2024, 1, 1)
    rows = []
    for i in range(40):  # short maintenance windows
        s = t0 + _dt.timedelta(seconds=100 * i)
        rows.append((i, f"u{i % 5}", s, s + _dt.timedelta(seconds=8 + i % 5)))
    for i in range(3):  # rare hour-long windows
        s = t0 + _dt.timedelta(seconds=5000 * i)
        rows.append((100 + i, f"u{i}", s, s + _dt.timedelta(seconds=3600)))
    iv = spark.createDataFrame(rows, ["win_id", "user_id", "start", "end"])

    b = auto_bucket_seconds(iv, "start", "end")
    assert 8 <= b <= 3600 and b < 100, f"auto bucket {b} should track the short mass"

    pts = spark.createDataFrame(
        [
            (j, f"u{j % 5}", t0 + _dt.timedelta(seconds=37 * j))
            for j in range(120)
        ],
        ["event_id", "user_id", "ts"],
    )
    got = {
        (x.win_id, x.event_id)
        for x in interval_point_join(
            iv, pts, "start", "end", "ts", extra_on=["user_id"]
        ).collect()
    }
    want = {
        (x.win_id, x.event_id)
        for x in iv.join(pts, "user_id")
        .filter(F.col("ts").between(F.col("start"), F.col("end")))
        .collect()
    }
    assert got == want and len(got) > 0


def test_interval_point_join_manual_knob_and_inverted(spark):
    """The manual bucket_seconds knob gives identical results, and inverted
    intervals (end < start) are dropped, not exploded backwards."""
    import datetime as _dt

    from custom_columnar_format_spark.operators.asof import interval_point_join

    t0 = _dt.datetime(2024, 1, 1)
    iv = spark.createDataFrame(
        [
            (1, t0, t0 + _dt.timedelta(seconds=30)),
            (2, t0 + _dt.timedelta(seconds=60), t0),  # inverted
        ],
        ["win_id", "start", "end"],
    )
    pts = spark.createDataFrame(
        [(j, t0 + _dt.timedelta(seconds=10 * j)) for j in range(10)],
        ["event_id", "ts"],
    )
    for bucket in (None, 7, 1000):
        got = {
            (x.win_id, x.event_id)
            for x in interval_point_join(
                iv, pts, "start", "end", "ts", bucket_seconds=bucket
            ).collect()
        }
        assert got == {(1, 0), (1, 1), (1, 2), (1, 3)}
