"""Deterministic weighted sampling without replacement — the
Efraimidis-Spirakis A-ES scheme expressed as pure column arithmetic.

Each row gets priority u^(1/w), where u ∈ (0,1) is a deterministic
md5-derived uniform of the row's id and w its weight; the weighted sample
is the top-k rows by priority. Properties that matter at 100 TB:

- No RNG state, no driver participation: the same rows win at any cluster
  size, partitioning, or retry — reproducible corpus sampling (the same
  hash-uniform discipline as the deterministic/stratified samplers).
- One scan + ``TakeOrderedAndProject``: top-k never sorts the corpus.
- The uniform is md5-prefix arithmetic, so a SQL oracle replays every
  priority bit-for-bit (same policy as the km-md5 dedup tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_U_DENOM = float((1 << 48) + 1)


def ares_priority(id_col: F.Column, weight_col: F.Column, salt: str = "ws") -> F.Column:
    """A-ES key u^(1/w): u = (first 48 md5 bits of "<salt>:"+id, +1) / (2^48+1)
    — strictly inside (0,1), so pow never hits the 0/1 degeneracies."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 12), 16, 10
        ).cast("bigint")
        + F.lit(1).cast("double")
    ) / F.lit(_U_DENOM)
    return F.pow(u, F.lit(1.0) / weight_col)


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int, salt: str = "ws"
) -> DataFrame:
    """Top-k rows by A-ES priority (weight-proportional inclusion odds),
    deterministic tiebreak on id. Rows with non-positive weight are
    excluded (their 1/w key is undefined)."""
    pri = ares_priority(F.col(id_col), F.col(weight_col), salt)
    # Sort on the ROUNDED priority: pow() is not bit-identical across
    # engines/libms, and the oracle's ORDER BY binds to its rounded alias —
    # ranking on the 6-decimal value (ties broken by id in both engines)
    # keeps the selected set replayable anywhere.
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("priority", F.round(pri, 6))
        .orderBy(F.desc("priority"), id_col)
        .limit(k)
    )
