"""Time-series resampling: gap-filling a sparse event stream onto a dense
calendar spine, with forward-fill — the hypertable `time_bucket_gapfill` /
`locf` shape (TimescaleDB) re-expressed as DataFrame ops.

Scale design:
- The observed data is aggregated ONCE per (key, bucket) — the only shuffle
  of raw rows. At 100 TB the agg partial-combines map-side, so the exchange
  carries one row per (key, bucket) per input partition.
- The dense spine is GENERATED, not shuffled: a one-row global min/max agg
  (broadcast) cross-joined with the distinct key set and exploded via
  ``sequence()`` — |keys| × |buckets| rows materialize straight into the
  join stage, never touching the raw table again.
- Forward-fill is one window per key (``last(..., ignorenulls=True)``), which
  shuffles only the spine-sized table, partitioned by key — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _daily_cells_and_spine(
    df: DataFrame, ts_col: str, key_col: str, value_col: str, persist: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Shared resampling base: (cells, spine).

    ONE scan of the raw table: bounds and the key set derive from the
    aggregated cells (|keys|×|observed days| rows), not from re-reading the
    100 TB side. ``persist`` (advisory, default on) caches cells because it
    feeds three branches (bounds, keys, the spine join) — it is spine-sized,
    not corpus-sized. The spine is GENERATED: keys × a broadcast 1-row
    min/max bounds row, fanned out by ``sequence()`` + explode — no shuffle,
    no second scan."""
    cells = (
        df.select(
            F.col(key_col).alias("grp"),
            F.date_trunc("day", F.col(ts_col)).cast("date").alias("day"),
            F.col(value_col).alias("v"),
        )
        .groupBy("grp", "day")
        .agg(F.round(F.sum("v"), 6).alias("rev"))
    )
    if persist:
        cells = cells.persist()
    bounds = cells.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    keys = cells.select("grp").distinct()
    spine = keys.join(F.broadcast(bounds)).select(
        "grp", F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    return cells, spine


def gapfill_ffill(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Resample ``df`` to one row per (key, day) over the table's full
    [min_day, max_day] range, summing ``value_col`` per cell and
    forward-filling empty days from the key's last observed value.

    Returns (grp, day, revenue_filled, is_gap): ``revenue_filled`` is the
    day's sum, or the most recent earlier day's sum for gap days (null before
    a key's first observation — nothing to carry); ``is_gap`` marks the
    filled rows. Sums are rounded to 6 decimals BEFORE the fill so the
    carried value is exactly the value a reader saw on the source day.
    """
    cells, spine = _daily_cells_and_spine(df, ts_col, key_col, value_col)
    w = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(cells, ["grp", "day"], "left")
        .select(
            "grp",
            "day",
            F.last("rev", ignorenulls=True).over(w).alias("revenue_filled"),
            F.when(F.col("rev").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
        )
    )


def interpolate_linear(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Like :func:`gapfill_ffill` but gap days are LINEARLY interpolated
    between the key's previous and next observed days (ends stay null /
    carry nothing). Classic sensor-series resampling.

    Implementation: the filled spine carries, per row, the last observed
    (day, value) at-or-before it and the first observed (day, value)
    at-or-after it — four ``last/first(..., ignorenulls)`` windows over the
    same key partition (one shuffle total) — then the interpolation is plain
    arithmetic: v_prev + (v_next − v_prev) × elapsed/spanned.
    """
    cells, spine = _daily_cells_and_spine(df, ts_col, key_col, value_col)
    j = spine.join(cells, ["grp", "day"], "left")
    back = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    j = j.select(
        "grp",
        "day",
        "rev",
        F.last("rev", ignorenulls=True).over(back).alias("v_prev"),
        F.last(F.when(F.col("rev").isNotNull(), F.col("day")), ignorenulls=True)
        .over(back)
        .alias("d_prev"),
        F.first("rev", ignorenulls=True).over(fwd).alias("v_next"),
        F.first(F.when(F.col("rev").isNotNull(), F.col("day")), ignorenulls=True)
        .over(fwd)
        .alias("d_next"),
    )
    span = F.datediff("d_next", "d_prev")
    elapsed = F.datediff("day", "d_prev")
    interp = F.when(F.col("rev").isNotNull(), F.col("rev")).otherwise(
        F.col("v_prev") + (F.col("v_next") - F.col("v_prev")) * elapsed / span
    )
    return j.select(
        "grp",
        "day",
        F.round(interp, 6).alias("value_interp"),
        F.when(F.col("rev").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    window: int = 7,
) -> DataFrame:
    """Windowed exponentially-weighted moving average per key: over the last
    ``window`` rows (frame order = ``order_col``), weight of the i-th oldest
    value is ``(1-alpha)^(n-i)``, normalized by the weight sum — the standard
    finite-horizon EWMA smoother (an infinite-horizon EWMA is inherently
    sequential; the truncated form is what distributes, and the dropped tail
    mass is ``(1-alpha)^window`` ≈ 0.8% at the defaults).

    Shape: ONE window shuffle on the key to materialize the frame as an
    array (``collect_list`` over a rows frame — bounded at ``window``
    elements), then the weighted fold is codegen'd array math in frame
    order, bit-replayable by an ordered ``list_sum`` oracle. Adds column
    ``{value_col}_ewma``; frames shorter than ``window`` (series head)
    renormalize over what exists, pandas ``ewm(adjust=True)``-style."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    decay = float(1.0 - alpha)
    out = df.withColumn("_frame", F.collect_list(F.col(value_col).cast("double")).over(w))
    n = F.size("_frame")
    num = F.aggregate(
        F.zip_with(
            F.col("_frame"),
            F.sequence(F.lit(1), n),
            lambda x, i: x * F.pow(F.lit(decay), (n - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.pow(F.lit(decay), (n - i).cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return out.withColumn(f"{value_col}_ewma", num / den).drop("_frame")
