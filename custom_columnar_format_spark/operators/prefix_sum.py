"""Distributed cumulative (prefix) sum.

``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY collapses the whole input
into ONE window partition — a single task sorts and scans everything, which
is the classic 100 TB cliff. This operator computes the same result with the
two-pass scheme every large engine uses:

1. ``repartitionByRange`` on the order key → each range slice holds a
   contiguous run of the global order;
2. within-slice cumulative sum (a window keyed by the slice id — bounded by
   slice size, runs fully parallel);
3. cross-slice offsets from the per-slice totals — an aggregate with one row
   per (slice, group), cum-summed over slice id and broadcast-joined back.

The result is independent of where the range boundaries fall; with a
``partition_cols`` grouping the sum restarts per group and only the
within-group order matters. Order keys must be unique per group (any window
cumsum is ambiguous under ties).

Determinism: the sliced+pid table is materialized exactly ONCE
(``localCheckpoint``) before fanning out to the two consuming branches.
Without that, each branch plans its own ``rangepartitioning`` Exchange, and
Spark's RangePartitioner seeds its boundary-sampling reservoir from the RDD
id — which differs per exchange and per session history. Two exchanges can
therefore pick DIFFERENT boundaries, making a row's slice id in the
local-cumsum branch disagree with the slice the offsets aggregate counted it
in → silently wrong offsets (row count intact). The checkpoint pins one set
of boundaries for both branches; its blocks are freed by the ContextCleaner
when the RDD is garbage collected, so no explicit unpersist is needed.

The reference has no windowing at all (SURVEY.md §2.2 — storage-only);
this is part of the new engine's extended surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_PID = "__ps_pid"
_OFF = "__ps_off"


def cumulative_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    partition_cols: Sequence[str] = (),
    out_col: str = "cum",
    n_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running sum of ``value_col`` ordered by ``order_cols``
    (restarting per ``partition_cols`` group), computed without ever forming
    a single global window partition."""
    pcols = list(partition_cols)
    ocols = list(order_cols)
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism

    # Materialize ONCE: both branches below must see the SAME range
    # boundaries / slice ids (see module docstring). eager=False defers the
    # checkpoint to first use, so planning stays lazy.
    sliced = (
        df.repartitionByRange(n, *pcols, *ocols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    w_local = (
        Window.partitionBy(_PID, *pcols)
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sliced.withColumn(out_col, F.sum(value_col).over(w_local))

    # one row per (slice, group): prior-slice totals for this group
    w_off = (
        Window.partitionBy(*pcols)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        sliced.groupBy(_PID, *pcols)
        .agg(F.sum(value_col).alias("__ps_tot"))
        .withColumn(_OFF, F.coalesce(F.sum("__ps_tot").over(w_off), F.lit(0)))
        .drop("__ps_tot")
    )

    return (
        local.join(F.broadcast(offsets), [_PID, *pcols])
        .withColumn(out_col, F.col(out_col) + F.col(_OFF))
        .drop(_PID, _OFF)
    )
