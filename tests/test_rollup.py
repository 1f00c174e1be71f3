"""Continuous aggregate: streamed micro-batch maintenance converges to the
batch answer, late data refreshes only its window, untouched files carry."""

import time

from pyspark.sql import functions as F

from custom_columnar_format_spark.queries.tables import load
from custom_columnar_format_spark.streaming import rollup


def _register(spark):
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)


def test_streamed_rollup_equals_batch_aggregate(spark, sf_small, tmp_path):
    _register(spark)
    ev = load(spark, sf_small, "events").select("ts", "event_type", "value")

    # backlog as 3 files → 3 micro-batches (maxFilesPerTrigger=1)
    src = tmp_path / "backlog"
    for i, part in enumerate((ev.filter(F.dayofmonth("ts") % 3 == r) for r in range(3))):
        part.coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))
        time.sleep(1.1)  # distinct mtimes → deterministic batch order

    target = str(tmp_path / "rollup_table")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = rollup.start_continuous_rollup(
        stream, target, str(tmp_path / "ck"), window_duration="6 hours"
    )
    q.awaitTermination()

    got = (
        spark.read.format("scbf")
        .load(target)
        .select("window_start", "event_type", "n_events", F.round("sum_value", 6).alias("s"))
    )
    want = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
            F.round("sum_value", 6).alias("s"),
        )
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_late_data_refreshes_single_window(spark, sf_small, tmp_path):
    _register(spark)
    ev = load(spark, sf_small, "events").select("ts", "event_type", "value")
    target = str(tmp_path / "late_rollup")

    rollup.apply_rollup_batch(spark, ev, target, window_duration="6 hours")
    before = {
        r["rollup_key"]: (r["n_events"], r["sum_value"])
        for r in spark.read.format("scbf").load(target).collect()
    }

    # one late event into the earliest window
    first = ev.orderBy("ts").first()
    late = spark.createDataFrame(
        [(first["ts"], first["event_type"], 10.0)], schema=ev.schema
    )
    rollup.apply_rollup_batch(spark, late, target, window_duration="6 hours")

    after = {
        r["rollup_key"]: (r["n_events"], r["sum_value"])
        for r in spark.read.format("scbf").load(target).collect()
    }
    assert set(after) == set(before)
    changed = [k for k in after if after[k] != before[k]]
    assert len(changed) == 1
    k = changed[0]
    assert after[k][0] == before[k][0] + 1
    assert abs(after[k][1] - (before[k][1] + 10.0)) < 1e-9
