"""Test-corpus table loaders (TESTDATA.md: TPC-H-ish star schema + events/
documents/embeddings), shared by queries, tests, and bench."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """PERF (r11): the DataFrame HANDLE is memoized per session — building
    a fresh reader costs ~125 ms of file-listing + schema inference per
    call, and the suite calls load() 60-90× per bench pass. This is plan
    reuse, not result caching: every action on the memoized frame still
    scans the parquet files. The key carries the path's (mtime, size) so a
    rewritten directory (e.g. a freshly built scaled corpus) gets a fresh
    file index instead of a stale listing; the memo dies with the session
    object.

    Key fidelity (ADVICE r11): a plain FILE keys on its own (mtime, size) —
    any rewrite bumps it. A DIRECTORY dataset keys on a shallow listing
    digest (sorted child names with each child's (mtime, size)) instead of
    the directory inode's stat, because rewriting a part-file in place need
    not bump the directory entry. Deeper in-place edits (nested subdirs,
    e.g. hive-partitioned layouts) are still invisible — whole-directory
    rewrites (what Spark's overwrite mode does, including refreshing
    ``_SUCCESS``) are the supported invalidation."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        if os.path.isdir(path):
            listing = tuple(
                (e.name, e.stat().st_mtime_ns, e.stat().st_size)
                for e in sorted(os.scandir(path), key=lambda e: e.name)
            )
            key = (path, listing)
        else:
            key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = None
    memo = spark.__dict__.setdefault("_scbf_table_memo", {})
    if key is not None and key in memo:
        return memo[key]
    df = _load_fresh(spark, sf_dir, name)
    if key is not None:
        memo[key] = df
    return df


def _load_fresh(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Spark ≤4.0 needs
        # nanosAsLong=true (ts arrives as raw int64 nanos, truncate to µs —
        # exactly what DuckDB/Arrow do when narrowing ns → µs); Spark 4.1+
        # ignores that legacy conf and narrows to TIMESTAMP_NTZ natively.
        # Handle both by converting only when the column really is int64.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view so plain ``spark.sql``
    works — the SQL entry point for users who don't want the DataFrame API.
    Views are lazy: Catalyst still prunes/pushes into the parquet scans, so
    ``SELECT one_col FROM lineitem WHERE ...`` plans identically to the
    DataFrame form."""
    for t, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(t)
