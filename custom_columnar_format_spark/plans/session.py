"""SparkSession factory with scale-oriented defaults.

Tuned for the test harness (local[N], 32 threads) but every knob is the one
you'd set on a real cluster: AQE on (runtime re-planning, skew-join splitting,
partition coalescing), broadcast threshold sized for the TPC-H-ish dims,
Arrow enabled for the Pandas-UDF paths, shuffle partitions matched to
parallelism instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "custom-columnar-format-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """``extra_conf`` entries are applied LAST (they win over the defaults
    below) — used by tools/stress_scale.py to re-enable the UI so the REST
    API can report per-stage task-time distributions (straggler ratios).
    Static confs only take effect if no session exists yet."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    from ..sources.scbf_datasource import register

    register(spark)
    return spark
