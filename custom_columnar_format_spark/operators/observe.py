"""Pipeline observability: named metrics riding on a query's own action.

``df.observe(Observation, exprs...)`` attaches aggregate metrics to whatever
action the caller runs next — row counts, null counts, rule violations — with
NO second scan and no extra shuffle (metrics accumulate on the executors and
fold into the driver as part of the job). This is the production answer to
"count what you processed" at 100 TB; the anti-pattern it replaces is a
separate ``df.count()`` that re-runs the whole lineage.

The reference has no metrics of any kind (SURVEY.md §2.2); this extends the
data-quality surface in ``operators/quality.py`` — same rule vocabulary, but
measured as a side effect of the main write/collect instead of a dedicated
validation pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named metric expressions to ``df``. Returns the instrumented
    DataFrame and the Observation; read ``obs.get`` AFTER an action runs."""
    obs = Observation(name)
    return df.observe(obs, *[m.alias(k) for k, m in metrics.items()]), obs


def standard_metrics(*cols: str) -> dict[str, Column]:
    """Row count plus per-column null counts — the metrics every pipeline
    stage should ship."""
    out: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in cols:
        out[f"nulls_{c}"] = F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
    return out
