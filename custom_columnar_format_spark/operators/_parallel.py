"""Scan-width widening shared by the CPU-heavy text/hash operators.

The downstream per-row work (shingling, md5/KM hashing, signature folds) is
orders of magnitude heavier per byte than the text read, so a small corpus
(or a few large files at 128 MB/split) must not pin the whole pipeline to a
handful of cores; at production scale the input already has more splits
than cores and the widening is a no-op — no shuffle added.

PERF (r12, guide §7.3 driver-side work): the partition-count probe
(``df.rdd.getNumPartitions()``) re-plans the whole query each call — ~0.5 s
per probe on a deep plan, and the probe ran once per operator per query
build. The count is memoized ON the DataFrame handle: ``tables.load()``
returns session-memoized handles, so repeated query builds (bench pass 1/2,
every operator sharing a source) hit the stash instead of re-planning. A
fresh DataFrame still pays exactly one probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_NPARTS_ATTR = "_scbf_nparts"


def num_partitions(df: DataFrame) -> int:
    """Partition count of ``df``, memoized on the handle (plan reuse only —
    nothing about the data is cached)."""
    n = df.__dict__.get(_NPARTS_ATTR)
    if n is None:
        n = df.rdd.getNumPartitions()
        df.__dict__[_NPARTS_ATTR] = n
    return n


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Widen ``df`` to at least the cluster's default parallelism (see
    module docstring). Returns ``df`` unchanged when it is already wide
    enough — the production no-op path."""
    sc = df.sparkSession.sparkContext
    if num_partitions(df) < sc.defaultParallelism:
        out = df.repartition(sc.defaultParallelism)
        out.__dict__[_NPARTS_ATTR] = sc.defaultParallelism
        return out
    return df
