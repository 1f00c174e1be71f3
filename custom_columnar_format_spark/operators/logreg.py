"""Distributed logistic-regression training (full-batch gradient descent)
over an ``array<float>`` feature column — the "train a quality classifier on
the engine" primitive (FineWeb-Edu-style filters are exactly this: a linear
model over embeddings, trained once, applied corpus-wide).

Same scale design as ``operators.kmeans``:

- The MODEL (dim doubles) travels as plan literals; the driver receives one
  dim-sized gradient per iteration (the artifact, never data).
- The margin ``w . x`` is a fixed-order zip_with/aggregate fold against the
  literal weights — whole-stage codegen, no join, no UDF.
- The gradient is ONE hash aggregation on the dimension key after a
  posexplode: shuffle rows = dim x map partials, independent of corpus size
  (map-side partial avg).

Determinism: weights start at exactly 0.0 (sigmoid = 0.5 in every engine),
every fold is fixed-order, and outputs are floor-rounded — which is what
lets a SQL oracle replay the unrolled loop (``q_logreg_step2``).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import dot, lit_vector


def margin_expr(weights: Sequence[float], vec_col: str) -> F.Column:
    """w . x as a fixed-order fold against literal weights — the shared
    ``functions.vector.dot`` fold, the exact arithmetic the oracles replay."""
    return dot(F.col(vec_col), lit_vector(weights))


def sigmoid(col: F.Column) -> F.Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-col))


def gradient(
    df: DataFrame,
    weights: Sequence[float],
    vec_col: str,
    y_col: str,
) -> DataFrame:
    """(pos, grad) for the full-batch log-loss gradient at ``weights``:
    grad_j = avg((sigmoid(w.x) - y) * x_j). One narrow pass + one dim-keyed
    hash aggregation."""
    resid = (sigmoid(margin_expr(weights, vec_col)) - F.col(y_col)).alias("resid")
    exploded = df.select(resid, F.posexplode(F.col(vec_col)).alias("pos", "x"))
    return exploded.groupBy("pos").agg(
        F.avg(F.col("resid") * F.col("x").cast("double")).alias("grad")
    )


def logreg_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    y_col: str = "y",
    dim: int = 64,
    iters: int = 2,
    lr: float = 0.5,
) -> List[float]:
    """Full-batch GD from w = 0. Each iteration collects exactly ``dim``
    gradient rows (the model update), like the BPE trainer's 1-row argmax.
    Returns the final weight vector."""
    w = [0.0] * dim
    for _ in range(iters):
        rows = gradient(df, w, vec_col, y_col).collect()
        g = [0.0] * dim
        for r in rows:
            g[r["pos"]] = float(r["grad"])
        w = [wi - lr * gi for wi, gi in zip(w, g)]
    return w


def predictions(
    df: DataFrame, weights: Sequence[float], vec_col: str = "embedding"
) -> DataFrame:
    """Adds the model score p = sigmoid(w . x) — the corpus-wide apply pass
    (narrow, codegen, no join)."""
    return df.withColumn("p", sigmoid(margin_expr(weights, vec_col)))
