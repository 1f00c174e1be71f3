"""Continuous aggregate (incrementally-maintained rollup table).

The hypertable-rollup / materialized-view pattern: a stream of events keeps a
per-(time-window, key) aggregate table up to date — each micro-batch folds
ITS delta into the stored rollup instead of recomputing history. Compared
with a watermarked stateful window aggregate, the state lives in the TABLE,
so late data needs no watermark bound: a late row simply lands in its
window's delta and the next merge refreshes that one row.

Scale shape per batch: one partial+final aggregate over the batch (delta is
|windows x keys| rows, tiny), a join against only the CURRENT rollup rows for
touched keys (broadcast of the delta key set), and a file-level
copy-on-write MERGE — untouched rollup files are never rewritten
(operators/merge.py key-range pruning on the composite rollup key).

SCBF v2 has no timestamp type, so window starts are stored as epoch seconds
(int64); the composite merge key is ``"<window_start>|<key>"`` (utf8 —
key-range file stats work lexicographically).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import _target_files, merge_into

ROLLUP_KEY = "rollup_key"


def batch_delta(
    batch_df: DataFrame,
    window_duration: str,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """This batch's per-(window, keys) additive partials."""
    return (
        batch_df.groupBy(F.window(ts_col, window_duration).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("sum_value"))
        .select(
            F.concat_ws(
                "|", F.unix_timestamp(F.col("w.start")).cast("string"), *keys
            ).alias(ROLLUP_KEY),
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def apply_rollup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    target_path: str,
    window_duration: str = "1 hour",
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> None:
    """Fold one micro-batch into the rollup table at ``target_path``."""
    delta = batch_delta(batch_df, window_duration, keys, ts_col, value_col)
    if not _target_files(target_path):
        delta.write.format("scbf").option("version", "2").mode("overwrite").save(
            target_path
        )
        return
    cur = (
        spark.read.format("scbf")
        .load(target_path)
        .select(
            ROLLUP_KEY,
            F.col("n_events").alias("__cur_n"),
            F.col("sum_value").alias("__cur_s"),
        )
    )
    refreshed = (
        delta.join(cur, ROLLUP_KEY, "left")
        .withColumn("n_events", F.col("n_events") + F.coalesce("__cur_n", F.lit(0)))
        .withColumn("sum_value", F.col("sum_value") + F.coalesce("__cur_s", F.lit(0.0)))
        .drop("__cur_n", "__cur_s")
    )
    merge_into(spark, target_path, refreshed, ROLLUP_KEY)


def start_continuous_rollup(
    stream_df: DataFrame,
    target_path: str,
    checkpoint: str,
    window_duration: str = "1 hour",
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    available_now: bool = True,
):
    """Attach the rollup maintenance to a streaming DataFrame via
    foreachBatch (one transactional merge per micro-batch)."""

    def _fold(bdf: DataFrame, _bid: int) -> None:
        if bdf.isEmpty():
            return
        apply_rollup_batch(
            bdf.sparkSession,
            bdf,
            target_path,
            window_duration,
            keys,
            ts_col,
            value_col,
        )

    writer = stream_df.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
