"""K-step sequential funnel over an event stream — the generalized form of
the 3-step funnel in queries/llm_ops.py (and of the streaming CEP twin in
streaming/events.py): per user, stage k is the EARLIEST stage-k event within
``step_within`` of the user's stage-(k-1) time.

Scale design: one filtered min-aggregation per stage, each shuffled on
user_id — every stage reuses the same hash partitioning, so Catalyst plans
k-1 of the k exchanges away on co-partitioned joins; no windows, no
event-to-event self-joins (the naive MATCH_RECOGNIZE emulation). The final
summary row joins k single-row aggregates (1-row builds — allowlisted in
the plan lint)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_stage_times(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    step_within_hours: int = 24,
    persist: bool = True,
) -> list[DataFrame]:
    """Per-stage (user, t[, t_prev]) tables: t for stage 1 = the user's
    earliest steps[0] event; t for stage k = the earliest steps[k-1] event in
    (t_prev, t_prev + step], with t_prev = the user's stage-(k-1) time
    CARRIED THROUGH the aggregation — downstream lag computations need no
    re-join against the previous stage. Stage 1 has no t_prev column.

    ``persist`` (advisory, default on) caches the slim one-scan projection
    AND each stage table: stage k feeds both stage k+1 and the summary, so
    without the cache stage 1's aggregation re-executes inside every later
    stage's subtree — O(k²) recomputations of the heaviest input. Callers
    who cannot afford executor memory pass ``persist=False`` and pay the
    recompute (same trade as ``dedup.minhash_neardup_pairs``).

    Cache lifecycle is owned by the CALLER: the returned DataFrames are
    lazy, so this operator cannot unpersist without defeating the cache.
    Long-lived sessions running many queries should
    ``spark.catalog.clearCache()`` after materializing each result (the
    bench and oracle harnesses do)."""
    within = F.expr(f"INTERVAL {step_within_hours} HOURS")
    # ONE scan of the raw table: the k per-stage filters read a slim
    # projection (user, ts, type restricted to funnel steps) instead of
    # rescanning the 100 TB events table once per stage.
    slim = events.filter(F.col(type_col).isin(list(steps))).select(
        user_col, ts_col, type_col
    )
    if persist:
        slim = slim.persist()
    stages = []
    prev = None
    for step in steps:
        cur = slim.filter(F.col(type_col) == step)
        if prev is not None:
            cur = cur.join(prev, user_col).filter(
                (F.col(ts_col) > F.col("t_prev")) & (F.col(ts_col) <= F.col("t_prev") + within)
            )
            # t_prev is constant per user within the join; min() carries it
            cur = cur.groupBy(user_col).agg(
                F.min(ts_col).alias("t"), F.min("t_prev").alias("t_prev")
            )
        else:
            cur = cur.groupBy(user_col).agg(F.min(ts_col).alias("t"))
        if persist:
            cur = cur.persist()
        stages.append(cur)
        prev = cur.select(user_col, F.col("t").alias("t_prev"))
    return stages


def funnel_summary(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    step_within_hours: int = 24,
    persist: bool = True,
) -> DataFrame:
    """One row: per-stage user counts (stage_1..stage_k) and the average
    conversion lag in hours between consecutive stages (lag_h_k, rounded to
    6) — the product-analytics funnel report."""
    stages = funnel_stage_times(
        events, steps, ts_col, user_col, type_col, step_within_hours, persist
    )
    out = stages[0].agg(F.count(F.lit(1)).alias("stage_1"))
    for k in range(1, len(stages)):
        # events.ts may arrive as TIMESTAMP_NTZ (parquet nanos) — cast via
        # TIMESTAMP first (session tz is pinned to UTC) to reach epoch seconds
        lag_h = (
            F.col("t").cast("timestamp").cast("double")
            - F.col("t_prev").cast("timestamp").cast("double")
        ) / 3600.0
        piece = stages[k].agg(  # t_prev already rides the stage table
            F.count(F.lit(1)).alias(f"stage_{k + 1}"),
            F.round(F.avg(lag_h), 6).alias(f"lag_h_{k + 1}"),
        )
        out = out.join(piece)  # 1-row build side
    return out
