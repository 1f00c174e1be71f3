"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query: lineitem → SCBF round-trip through the
custom DataSource V2 (the reference's core capability, projection-pruned
read) → pricing-summary aggregation.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2; validated against DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from custom_columnar_format_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sf0.001 lineitem → write scbf → pruned read → TPC-H-Q1-style agg."""
    import tempfile

    from pyspark.sql import functions as F

    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)
    sf_dir = "/root/testdata/sf0.001"
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    sub = li.select(
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
    )
    # per-run scratch dir: a fixed path would collide if two drivers run
    # entry() concurrently on one machine
    out = os.path.join(tempfile.mkdtemp(prefix="scbf_entry_"), "roundtrip")
    sub.write.format("scbf").mode("overwrite").save(out)
    back = spark.read.format("scbf").load(out)
    return (
        back.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.spark_queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_queries()
