"""Count-min sketch: fixed-size frequency summaries for heavy-hitter
detection over unbounded key domains.

Scale design (why a sketch at 100 TB):
- The sketch is a FIXED ``depth × width`` grid of counters regardless of
  corpus size. Each row hashes every item into one of ``width`` buckets;
  an item's estimate is the MIN of its ``depth`` counters — overestimates
  only, bounded by ε = e/width with probability 1 − (1/e)^depth.
- Per-partition partial aggregation collapses the explode to at most
  ``depth × width`` rows per map task before the exchange, so the shuffle is
  O(depth × width × partitions) — independent of row count. Merging two
  sketches is cell-wise SUM (the aggregation does it for free), which is
  what makes the sketch streamable and cluster-mergeable.
- Hashing is md5-prefix arithmetic (48-bit, exact in int64) rather than
  xxhash64 so any SQL engine can replay every counter — the DuckDB oracle
  value-checks the whole pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 256


def _bucket(item: F.Column, row: int, width: int, scheme: str = "md5") -> F.Column:
    """Row ``row``'s bucket for ``item``.

    - ``"md5"`` (default): first 12 hex chars of md5("<row>:" + item) parsed
      as a 48-bit int, mod width. Exact integer arithmetic — replayable in
      any engine with md5, which is what lets the driver value-check every
      counter.
    - ``"xxhash64"``: JVM-native seeded hash, ~3× cheaper per item (the 1M-doc
      stress spends most of its CMS time in md5+hex-parse). Same sketch
      guarantees, not replayable outside Spark — use when no oracle is needed.
    """
    if scheme == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(row), item), F.lit(width)).alias("bucket")
    h = F.md5(F.concat(F.lit(f"{row}:"), item))
    return (F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint") % width).alias("bucket")


def cms_cells(
    items: DataFrame,
    item_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    scheme: str = "md5",
) -> DataFrame:
    """(row, bucket) cell coordinates, one per input item per sketch row —
    the pre-aggregation projection. Streaming-safe (stateless explode), so a
    readStream can pipe it straight into a streaming groupBy: the micro-batch
    engine then maintains the merged sketch incrementally — cell-wise
    mergeability for free."""
    return items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _bucket(F.col(item_col), r, width, scheme).alias("bucket")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c")
    ).select(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    scheme: str = "md5",
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt) with one counter per non-empty
    cell. Each input item lands in exactly one bucket per row; the groupBy
    partial-aggregates map-side, so the exchange carries at most
    depth × width rows per partition whatever the input size."""
    return (
        cms_cells(items, item_col, depth, width, scheme)
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    scheme: str = "md5",
) -> DataFrame:
    """Point-query the sketch for each candidate item: est = min over rows of
    the item's cell counter. The candidate set is small by construction
    (heavy-hitter candidates), so its depth-fold expansion broadcasts into
    the join against the fixed-size sketch."""
    probes = candidates.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _bucket(F.col(item_col), r, width, scheme).alias("bucket")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(item_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    # LEFT join from the probes: a candidate whose cell is empty has counter
    # 0 (coalesce), so an unseen item estimates 0 when ANY of its depth
    # cells is empty, instead of being dropped; in a saturated sketch an
    # absent item can still draw a positive overestimate from hash
    # collisions — the standard CMS one-sided error, not avoidable here.
    return (
        # the sketch is bounded by design (≤ depth×width rows) — broadcast it
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .select(item_col, F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .groupBy(item_col)
        .agg(F.min("cnt").alias("est"))
    )


def cms_heavy_hitters(
    items: DataFrame,
    item_col: str,
    topk: int = 10,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    scheme: str = "md5",
) -> DataFrame:
    """Top-k items by CMS-estimated frequency, deterministic tiebreak on the
    item value. Candidates here are the distinct items (the test corpus has a
    small vocabulary); a production pipeline feeds a cheap pre-filter (e.g.
    items seen in a sample) so the candidate side stays broadcast-sized while
    the sketch absorbs the full stream."""
    sketch = cms_build(items, item_col, depth, width, scheme)
    est = cms_estimate(sketch, items.select(item_col).distinct(), item_col, depth, width, scheme)
    return est.orderBy(F.desc("est"), item_col).limit(topk)
