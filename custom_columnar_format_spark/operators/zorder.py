"""Z-order (Morton-curve) data clustering for stats-based file skipping.

A range-partitioned write clusters files tightly on ONE column: predicates on
that column skip files, predicates on any other column touch everything.
Interleaving the bits of several columns' normalized ranks gives every file a
tight min/max envelope on ALL the z-ordered columns at once, so a 2-D box
predicate (e.g. ``l_orderkey BETWEEN ... AND l_partkey BETWEEN ...``) skips
most files — the same layout trick Delta/Iceberg `OPTIMIZE ZORDER BY` applies
before their stats pruning, here feeding SCBF v2's footer min/max skipping
(sources/scbf_datasource.py pushFilters → codec_v2.file_may_match).

Everything is JVM-side expression work: global min/max from one aggregate
(broadcast back), 16-bit rank scaling, and a 16-round shift/or reduce for the
bit interleave. One range shuffle on the z-value, then the normal writer.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

BITS = 16


def zorder_value(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Append a ``_z`` column: bit-interleaved 16-bit ranks of ``cols``
    (min-max scaled with global bounds — one extra aggregate over the input).
    Supports numeric/date columns (anything castable to double)."""
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{c}") for c in cols],
    )
    out = df.join(F.broadcast(bounds))
    scale = float((1 << BITS) - 1)
    ranks = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        ranks.append(
            F.least(
                F.lit((1 << BITS) - 1),
                F.floor((F.col(c).cast("double") - mn) / span * scale).cast("long"),
            )
        )
    z = F.lit(0).cast("long")
    for bit in range(BITS):
        for j, r in enumerate(ranks):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(r, bit).bitwiseAND(F.lit(1)), bit * len(ranks) + j
                )
            )
    return out.withColumn("_z", z).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    fmt: str = "scbf",
    **options: str,
) -> None:
    """Write ``df`` clustered along the Z-curve of ``cols``: one range shuffle
    on the z-value (tight per-file envelopes on every z-ordered column), then
    a normal formatted write. For SCBF pass version=2 so footer stats are
    written and the DataSource can skip files on pushed predicates."""
    zdf = zorder_value(df, cols)
    (
        zdf.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.format(fmt)
        .options(**options)
        .mode("overwrite")
        .save(path)
    )
