"""Deterministic weighted sampling without replacement — the
Efraimidis-Spirakis A-ES scheme expressed as pure column arithmetic.

Each row gets an exponential variate key ``-ln(u)/w`` where u ∈ (0,1) is a
deterministic md5-derived uniform of the row's id and w its weight; the
weighted sample is the BOTTOM-k rows by key. This is order-equivalent to the
textbook top-k by priority ``u^(1/w)`` (monotone transform), but numerically
far better behaved: with large weights u^(1/w) compresses toward 1.0 and
rounding collapses distinct priorities into ties (which then resolve by id,
skewing the sample toward low ids at corpus scale), while -ln(u)/w keeps
full relative spread. Properties that matter at 100 TB:

- No RNG state, no driver participation: the same rows win at any cluster
  size, partitioning, or retry — reproducible corpus sampling (the same
  hash-uniform discipline as the deterministic/stratified samplers).
- One scan + ``TakeOrderedAndProject``: bottom-k never sorts the corpus.
- The uniform is md5-prefix arithmetic, so a SQL oracle replays every key
  bit-for-bit (same policy as the km-md5 dedup tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_U_DENOM = float((1 << 48) + 1)
# Keys are ranked on their 12-decimal rounding: ln() agrees across engines
# to ~1 ulp (relative 1e-16), so at 1e-12 granularity both engines pick the
# same set, while keys for even the largest weights (1/w ~ 1e-6) keep
# several significant digits of spread — unlike the 6-decimal u^(1/w)
# rounding this replaced, which tied thousands of heavy rows together.
_KEY_DECIMALS = 12


def ares_key(id_col: F.Column, weight_col: F.Column, salt: str = "ws") -> F.Column:
    """A-ES exponential key -ln(u)/w: u = (first 48 md5 bits of
    "<salt>:"+id, +1) / (2^48+1) — strictly inside (0,1), so ln never hits
    the 0 degeneracy. Smallest key wins."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 12), 16, 10
        ).cast("bigint")
        + F.lit(1).cast("double")
    ) / F.lit(_U_DENOM)
    return -F.log(u) / weight_col


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int, salt: str = "ws"
) -> DataFrame:
    """Bottom-k rows by A-ES exponential key (weight-proportional inclusion
    odds), deterministic tiebreak on id. Rows with non-positive weight are
    excluded (their 1/w key is undefined)."""
    key = ares_key(F.col(id_col), F.col(weight_col), salt)
    # Rank on the ROUNDED key: ln() is not guaranteed bit-identical across
    # engines/libms, and the oracle's ORDER BY binds to its rounded alias —
    # ranking on the 12-decimal value (ties broken by id in both engines)
    # keeps the selected set replayable anywhere.
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("ares_key", F.round(key, _KEY_DECIMALS))
        .orderBy(F.asc("ares_key"), id_col)
        .limit(k)
    )
