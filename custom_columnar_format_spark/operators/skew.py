"""Skew-mitigation operators: salted aggregation and salted join.

At 100 TB a handful of hot keys (one viral user, one boilerplate document
hash) can pin an entire stage on one reducer. AQE's skew-join handling
(``spark.sql.adaptive.skewJoin``) splits oversized *partitions*; salting goes
further by splitting oversized *keys*:

- **Salted aggregation** — two-stage: aggregate on (key, salt) so a hot key's
  rows spread over ``n_salts`` reducers, then combine the partials on key.
  Valid for algebraic aggregates (sum/count/min/max — things with a combine
  step); the result is bit-identical to the direct groupBy.
- **Salted join** — the skewed (fact) side gets a random salt in [0, n);
  the other side is replicated n× with every salt value, so the join key
  becomes (key, salt) and the hot key's matches spread across n tasks.
  Row-multiplication on the replicated side is the price — use for
  moderate-size build sides that are too big to broadcast but cheap to
  replicate n×.

Salting uses a deterministic per-row hash (``pmod(xxhash64(cols...), n)``)
rather than ``rand()`` so plans stay reproducible and retries are safe.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import DataFrame, functions as F

_SALT = "__salt"

# partial-aggregate expression and its combiner, per supported aggregate
_COMBINERS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt_col(df: DataFrame, n_salts: int) -> F.Column:
    # hash every column → rows of a hot key still spread; deterministic.
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Dict[str, tuple],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation, result-identical to
    ``df.groupBy(keys).agg(...)`` for algebraic aggregates.

    ``aggs``: output name → (agg_kind, input column), e.g.
    ``{"n": ("count", "*"), "total": ("sum", "value")}``.
    """
    partials = []
    finals = []
    for out, (kind, col) in aggs.items():
        if kind not in _COMBINERS:
            raise ValueError(f"{kind}: salted_agg supports {sorted(_COMBINERS)} (algebraic only)")
        part_fn, comb_fn = _COMBINERS[kind]
        src = F.lit(1) if col == "*" else F.col(col)
        partials.append(part_fn(src).alias(f"__p_{out}"))
        finals.append(comb_fn(F.col(f"__p_{out}")).alias(out))
    stage1 = df.withColumn(_SALT, _salt_col(df, n_salts)).groupBy(*keys, _SALT).agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``n_salts``
    tasks by replicating ``other`` n×. Result-identical to
    ``skewed.join(other, on, how)`` for inner/left joins."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (replication breaks right/full outer)")
    s = skewed.withColumn(_SALT, _salt_col(skewed, n_salts))
    o = other.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.lit(n_salts - 1).cast("bigint"))),
    )
    return s.join(o, list(on) + [_SALT], how).drop(_SALT)
