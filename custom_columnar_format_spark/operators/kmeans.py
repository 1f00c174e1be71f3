"""Distributed k-means (Lloyd's algorithm) over an ``array<float>`` column.

The reference engine has no clustering surface; this is the Spark-native
path a training-data pipeline uses for corpus clustering (SemDeDup blocks,
IVF coarse quantizers, topic-balance audits). The driver-side
``_spherical_kmeans`` in ``operators.similarity`` trains on a bounded
sample; this module is the full-corpus variant where every row participates
in every iteration.

Design for 100 TB:

- The MODEL (k x dim doubles) is tiny and driver-resident — like the BPE
  merge table (``operators.tokenizer``), only the trained artifact is ever
  collected (k*dim doubles per iteration), never the data.
- ASSIGNMENT is a pure JVM expression: squared-L2 to each centroid is a
  ``zip_with``+``aggregate`` fold against a literal array, argmin is
  ``least()`` plus a first-match CASE (ties break to the smallest centroid
  id). Whole-stage-codegen'd — no UDF, no join, no shuffle.
- The UPDATE step is one hash aggregation on ``(cid, pos)`` after a
  ``posexplode`` — shuffle rows = k x dim x map partials, independent of
  corpus row count (map-side partial AVG/COUNT combine first).

Determinism: centroids are seeded from the k smallest ids (a deterministic
rule both an oracle and a re-run can replay — same policy as IVF's explicit
seed-vector centroids, ``similarity.py``), and every arithmetic step is a
fixed-order fold, so the whole iteration is value-reproducible under any
partitioning.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import lit_vector, vector_sql

Vector = Sequence[float]


def seed_centroids(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", k: int = 8
) -> List[List[float]]:
    """First-k-by-id seed centroids (deterministic; bounded k-row collect —
    the seed model, not data). TakeOrderedAndProject on the id column."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    return [[float(v) for v in r[vec_col]] for r in rows]


def _sq_dist_sql(vec: str, centroid: Vector) -> str:
    """SQL fragment: squared L2 of array column ``vec`` to a literal
    centroid — the same fixed-order fold as ``sq_dist``."""
    return (
        f"aggregate(zip_with({vec}, {vector_sql(centroid)},"
        f" (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),"
        f" 0.0D, (acc, x) -> acc + x)"
    )


def sq_dist(vec: F.Column, centroid: Vector) -> F.Column:
    """Squared L2 distance of an array column to a literal centroid, as a
    fixed-order JVM fold (index order — the same order DuckDB's
    ``list_sum(list_transform(...))`` folds, so oracles replay it exactly)."""
    diffs = F.zip_with(
        vec,
        lit_vector(centroid),
        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def assign_expr(centroids: Sequence[Vector], vec_col: str = "embedding") -> F.Column:
    """Argmin-centroid id as a single codegen expression: each of the k fold
    distances is evaluated ONCE into a (dist, cid) struct and ``array_min``
    picks the lexicographic minimum — exact-equality ties resolve to the
    smallest cid, i.e. the same answer as ``ORDER BY dist, cid`` (which is
    how oracles replay it).

    Built as ONE ``F.expr`` SQL string (r11): the k × dim fold forest cost
    ~100 py4j round-trips per build — and ``kmeans_fit`` builds it once per
    iteration. Identical parsed tree and results."""
    structs = ", ".join(
        f"struct({_sq_dist_sql(vec_col, c)} as d, {cid} as cid)"
        for cid, c in enumerate(centroids)
    )
    return F.expr(f"cast(array_min(array({structs})).cid as int)")


def lloyd_assign(
    df: DataFrame,
    centroids: Sequence[Vector],
    vec_col: str = "embedding",
    cid_col: str = "cid",
) -> DataFrame:
    """One assignment pass: adds ``cid_col``. Narrow (no shuffle)."""
    return df.withColumn(cid_col, assign_expr(centroids, vec_col))


def lloyd_update(
    assigned: DataFrame, vec_col: str = "embedding", cid_col: str = "cid"
) -> DataFrame:
    """Mean-update step: ``(cid, pos, centroid_val, n_points)`` rows via one
    posexplode + hash aggregation (k x dim groups; partial combine map-side)."""
    exploded = assigned.select(
        cid_col, F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    return exploded.groupBy(cid_col, "pos").agg(
        F.avg(F.col("v").cast("double")).alias("centroid_val"),
        F.count("*").cast("long").alias("n_points"),
    )


def lloyd_iteration(
    df: DataFrame,
    centroids: Sequence[Vector],
    vec_col: str = "embedding",
) -> DataFrame:
    """assign + update as one plan (scan -> narrow assign -> one shuffle)."""
    return lloyd_update(lloyd_assign(df, centroids, vec_col), vec_col)


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 4,
) -> Tuple[List[List[float]], DataFrame]:
    """Full Lloyd loop. Each iteration runs one corpus pass (narrow assign +
    one k*dim-group shuffle) and collects only the k x dim updated model —
    the per-iteration driver traffic is the model itself, like the BPE
    trainer's 1-row argmax (``tokenizer.py``). Empty clusters keep their
    previous centroid. Returns (centroids, final assignment DataFrame)."""
    centroids = seed_centroids(df, vec_col, id_col, k)
    if not centroids:
        # empty input would otherwise surface as an opaque analysis error
        # from array_min over an empty literal array inside the Lloyd loop
        raise ValueError("kmeans_fit: input DataFrame has no rows to seed from")
    dim = len(centroids[0]) if centroids else 0
    for _ in range(iters):
        rows = lloyd_iteration(df, centroids, vec_col).collect()
        nxt = [list(c) for c in centroids]
        for r in rows:
            nxt[r["cid"]][r["pos"]] = float(r["centroid_val"])
        centroids = nxt
        if dim == 0:
            break
    return centroids, lloyd_assign(df, centroids, vec_col)
