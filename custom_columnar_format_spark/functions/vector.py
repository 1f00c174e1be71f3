"""Vector math over ``array<float>`` embedding columns, expressed with
JVM-side higher-order functions (``zip_with`` / ``aggregate`` / ``transform``)
so the hot path stays inside whole-stage codegen — no Python per-row cost.

Used by the similarity-search and embedding-dedup operators. A Pandas-UDF
matrix path exists in ``operators.similarity`` for per-bucket batch scoring
where BLAS beats codegen (wide top-k), but these are the default."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length numeric arrays (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def lit_vector(values) -> Column:
    """A literal query vector as an array<double> column.

    Built as ONE ``F.expr`` SQL string (r11): a 64-dim vector as 64
    ``F.lit`` calls costs ~100 ms of py4j round-trips per build; the parsed
    tree is identical. ``repr(float)`` round-trips IEEE doubles exactly and
    the ``D`` suffix forces DoubleType (bare decimal literals parse as
    DECIMAL in Spark SQL)."""
    vals = [float(v) for v in values]
    if not vals:
        return F.array().cast("array<double>")
    return F.expr(f"array({', '.join(f'{v!r}D' for v in vals)})")
