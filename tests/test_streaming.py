"""Structured Streaming tests: stream-batch equivalence. Draining the events
backlog through the streaming plans (Trigger.AvailableNow) must reproduce the
batch answers for tumbling/sliding/session windows, and the custom stateful
sessionizer must match the batch lag+cumsum sessionization exactly."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from custom_columnar_format_spark.queries.tables import load
from custom_columnar_format_spark.streaming import events as ev


@pytest.fixture(scope="module")
def batch_events(spark, sf_small):
    return load(spark, sf_small, "events")


@pytest.fixture(scope="module")
def stream_events(spark, sf_small):
    return ev.read_events_stream(spark, sf_small)


def test_stream_tumbling_equals_batch(spark, batch_events, stream_events, tmp_path_factory):
    ck = str(tmp_path_factory.mktemp("ck_tumble"))
    got = ev.run_available_now(ev.tumbling_counts(stream_events), "t_tumble", ck)
    expect = (
        batch_events.groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    assert sorted(got.collect()) == sorted(expect.collect())


def test_stream_sliding_equals_batch(spark, batch_events, stream_events, tmp_path_factory):
    ck = str(tmp_path_factory.mktemp("ck_slide"))
    got = ev.run_available_now(ev.sliding_counts(stream_events), "t_slide", ck)
    expect = (
        batch_events.groupBy(F.window("ts", "5 minutes", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.approx_count_distinct("user_id").alias("n_users"))
        .select(F.col("w.start").alias("window_start"), "n_events", "n_users")
    )
    assert sorted(got.collect()) == sorted(expect.collect())


def test_stream_session_window_equals_batch(spark, batch_events, stream_events, tmp_path_factory):
    ck = str(tmp_path_factory.mktemp("ck_sess"))
    got = ev.run_available_now(ev.session_windows(stream_events), "t_sess", ck)
    expect = (
        batch_events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
    )
    assert sorted(got.collect()) == sorted(expect.collect())


def test_stateful_sessionize_matches_batch(spark, batch_events, stream_events, tmp_path_factory):
    ck = str(tmp_path_factory.mktemp("ck_state"))
    got = ev.run_available_now(
        ev.stateful_sessionize(stream_events), "t_state", ck, output_mode="update"
    )
    # Batch twin: gap-based sessionization via lag + cumulative sum.
    wo = Window.partitionBy("user_id").orderBy("ts")
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(wo)
    new_sess = F.when(prev.isNull() | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > 1800), 1).otherwise(0)
    expect = (
        batch_events.withColumn("session_id", F.sum(new_sess).over(wc).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("session_start"))
    )
    g = {(r.user_id, r.session_id): (r.n_events, r.session_start) for r in got.collect()}
    e = {(r.user_id, r.session_id): (r.n_events, r.session_start) for r in expect.collect()}
    assert g == e


def test_stream_sink_to_scbf(spark, batch_events, stream_events, tmp_path_factory):
    """writeStream into the custom SCBF format: drain the events backlog
    through a real streaming query into scbf files, read them back with the
    batch reader, and match the batch answer."""
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)
    out = str(tmp_path_factory.mktemp("scbf_sink") / "data")
    ck = str(tmp_path_factory.mktemp("scbf_sink_ck"))
    sel = stream_events.select(
        "event_id", "event_type", "value"
    ).withColumn("event_id", F.col("event_id").cast("int"))
    q = (
        sel.writeStream.format("scbf")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.format("scbf").load(out)
    assert back.count() == batch_events.count()
    got = back.agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n")).first()
    want = batch_events.agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n")).first()
    assert got.n == want.n and abs(got.s - want.s) < 1e-6
    # files are batch-tagged for idempotent epoch re-commits
    import glob as g, os as o
    assert g.glob(o.path.join(out, "part-b*.scbf"))


def test_stream_source_from_scbf(spark, tmp_path_factory):
    """readStream from an append-only SCBF directory: the first availableNow
    drain processes the backlog; after new files arrive, a second drain with
    the same checkpoint processes ONLY the new files (offset = position in
    the sorted name list)."""
    import pyarrow as pa

    from custom_columnar_format_spark.scbf import codec
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)
    d = str(tmp_path_factory.mktemp("scbf_src"))
    ck = str(tmp_path_factory.mktemp("scbf_src_ck"))

    def put(name, lo, hi):
        codec.write_arrow_table(
            os.path.join(d, name),
            pa.table({"id": pa.array(range(lo, hi), type=pa.int32()),
                      "v": pa.array([float(i) for i in range(lo, hi)])}),
        )

    sink_dir = str(tmp_path_factory.mktemp("scbf_src_out"))

    def drain():
        # parquet sink: supports checkpoint recovery (memory sink doesn't),
        # so the second drain resumes from the recorded SCBF offsets
        q = (
            spark.readStream.format("scbf").load(d)
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ck)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink_dir)

    put("part-000.scbf", 0, 30)
    put("part-001.scbf", 30, 50)
    assert drain().count() == 50

    put("part-002.scbf", 50, 60)
    got = {r.id for r in drain().collect()}
    # the second drain appended ONLY the new file's rows (no reprocessing:
    # total is 60, not 110)
    assert got == set(range(60))
    assert drain().count() == 60  # no new files → nothing appended


def test_stateful_funnel_matches_batch(spark, sf_small, tmp_path):
    """Drained streaming funnel == batch funnel (same per-stage counts)."""
    import __spark_entry__ as E
    from custom_columnar_format_spark.queries.streaming_queries import q_stream_funnel

    got = q_stream_funnel(spark, sf_small).collect()[0]
    want = E.queries()["q_funnel_3step"](spark, sf_small).collect()[0]
    assert (got.stage_view, got.stage_click, got.stage_purchase) == (
        want.stage_view, want.stage_click, want.stage_purchase,
    )


def test_stream_stream_join_matches_batch(spark, sf_small):
    from custom_columnar_format_spark.queries.streaming_queries import q_stream_stream_join

    got = {tuple(r) for r in q_stream_stream_join(spark, sf_small).collect()}
    ev_b = __import__("custom_columnar_format_spark.queries.tables", fromlist=["load"]).load(
        spark, sf_small, "events"
    )
    v = ev_b.filter(F.col("event_type") == "view").select("user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("vts"))
    c = ev_b.filter(F.col("event_type") == "click").select(F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts"))
    want = {
        tuple(r)
        for r in v.join(
            c,
            (F.col("user_id") == F.col("cu"))
            & (F.col("cts") > F.col("vts"))
            & (F.col("cts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")),
        ).select("user_id", "view_id", "click_id").collect()
    }
    assert got == want and len(got) > 0


def test_tws_lifetime_stats_matches_batch(spark, sf_small):
    """transformWithStateInPandas twin of the batch per-user totals —
    skipped where Spark's TWS state protocol deps (protobuf) are absent."""
    import tempfile

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf not installed (TWS state server needs it)")

    from custom_columnar_format_spark.queries.tables import load
    from custom_columnar_format_spark.streaming import events as ev

    stream = ev.read_events_stream(spark, sf_small)
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 4))
        for r in ev.run_available_now(
            ev.tws_user_lifetime_stats(stream), "tws_q", tempfile.mkdtemp(), output_mode="update"
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["t"], 4))
        for r in load(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == want


def test_aipws_lifetime_stats_matches_batch(spark, sf_small):
    """applyInPandasWithState twin of tws_user_lifetime_stats (same output
    contract, no protobuf): drained stream totals == batch groupBy. This
    plus the processor unit test below is the in-container coverage for
    the lifetime-stats stateful surface whose TWS e2e is env-gated."""
    import tempfile

    from custom_columnar_format_spark.queries.tables import load
    from custom_columnar_format_spark.streaming import events as ev

    stream = ev.read_events_stream(spark, sf_small)
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 4))
        for r in ev.run_available_now(
            ev.aipws_user_lifetime_stats(stream), "aipws_q", tempfile.mkdtemp(),
            output_mode="update",
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["t"], 4))
        for r in load(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == want


def test_tws_processor_fold_logic_with_fake_handle():
    """Unit test of LifetimeStatsProcessor against a fake handle/state —
    exercises OUR fold logic (init / exists / get / update / emission
    schema) without the TWS state server, whose protobuf wire protocol is
    absent in this container and not installable. The e2e twin
    (test_tws_lifetime_stats_matches_batch) stays env-gated; between the
    two, only Spark's own TWS plumbing goes untested here."""
    import pandas as pd

    from custom_columnar_format_spark.streaming.events import LifetimeStatsProcessor

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()

        def getValueState(self, name, schema):
            assert name == "totals"
            return self.state

    proc = LifetimeStatsProcessor()
    handle = FakeHandle()
    proc.init(handle)
    # micro-batch 1: two chunks for user 7
    out1 = list(
        proc.handleInputRows(
            (7,),
            iter([pd.DataFrame({"value": [1.0, 2.0]}), pd.DataFrame({"value": [3.5]})]),
            None,
        )
    )
    assert len(out1) == 1
    assert out1[0].to_dict("records") == [
        {"user_id": 7, "n_events": 3, "total_value": 6.5}
    ]
    # micro-batch 2: state survives and folds forward
    out2 = list(
        proc.handleInputRows((7,), iter([pd.DataFrame({"value": [0.5]})]), None)
    )
    assert out2[0].to_dict("records") == [
        {"user_id": 7, "n_events": 4, "total_value": 7.0}
    ]
    assert handle.state.get() == (4, 7.0)
    proc.close()


def test_tws_raises_clear_error_when_api_absent(monkeypatch):
    """r11 review #5: on pyspark<4 the module-level import leaves
    LifetimeStatsProcessor = None; calling the operator must raise an
    explanatory ImportError, not 'NoneType is not callable'."""
    import pytest

    from custom_columnar_format_spark.streaming import events as ev

    monkeypatch.setattr(ev, "LifetimeStatsProcessor", None)
    with pytest.raises(ImportError, match="pyspark>=4"):
        ev.tws_user_lifetime_stats(object())
