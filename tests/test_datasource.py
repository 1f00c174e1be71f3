"""Spark DataSource V2 tests: scbf round-trip through the DataFrame API,
storage-level projection, overwrite semantics, partitioned layout, and
type-safety errors."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from custom_columnar_format_spark.scbf import codec
from custom_columnar_format_spark.sources.scbf_datasource import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _sample_df(spark, n=1000):
    return spark.range(n).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 0.5).alias("score"),
        F.concat(F.lit("name_"), F.col("id").cast("string")).alias("name"),
    )


def test_write_read_roundtrip(spark, tmp_path):
    out = str(tmp_path / "rt")
    df = _sample_df(spark)
    df.write.format("scbf").mode("overwrite").save(out)
    back = spark.read.format("scbf").load(out)
    assert back.schema.fieldNames() == ["id", "score", "name"]
    assert back.count() == 1000
    assert back.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]
    assert sorted(r.name for r in back.filter(F.col("id") < 3).collect()) == [
        "name_0",
        "name_1",
        "name_2",
    ]


def test_partitioned_layout(spark, tmp_path):
    out = str(tmp_path / "parts")
    _sample_df(spark).repartition(4).write.format("scbf").mode("overwrite").save(out)
    files = glob.glob(os.path.join(out, "part-*.scbf"))
    assert len(files) == 4  # one SCBF file per partition
    assert not glob.glob(os.path.join(out, ".tmp-*"))  # commit protocol cleaned up
    assert spark.read.format("scbf").load(out).count() == 1000


def test_single_file_reference_compat(spark, tmp_path):
    out = str(tmp_path / "single")
    _sample_df(spark, 50).coalesce(1).write.format("scbf").mode("overwrite").save(out)
    (f,) = glob.glob(os.path.join(out, "part-*.scbf"))
    names, rows = codec.read_all(f)  # plain-codec readable (single-file mode)
    assert names == ["id", "score", "name"] and len(rows) == 50


def test_projection_option_prunes_schema(spark, tmp_path):
    out = str(tmp_path / "proj")
    _sample_df(spark).write.format("scbf").mode("overwrite").save(out)
    pruned = spark.read.format("scbf").option("columns", "score").load(out)
    assert pruned.schema.fieldNames() == ["score"]
    assert abs(pruned.agg(F.sum("score")).first()[0] - sum(i * 0.5 for i in range(1000))) < 1e-6
    with pytest.raises(Exception):
        spark.read.format("scbf").option("columns", "nope").load(out).collect()


def test_overwrite_replaces(spark, tmp_path):
    out = str(tmp_path / "ow")
    _sample_df(spark, 100).write.format("scbf").mode("overwrite").save(out)
    _sample_df(spark, 7).coalesce(1).write.format("scbf").mode("overwrite").save(out)
    assert spark.read.format("scbf").load(out).count() == 7


def test_unsupported_type_rejected(spark, tmp_path):
    out = str(tmp_path / "bad")
    df = spark.range(3).select(F.col("id"))  # bigint — not SCBF v1 representable
    with pytest.raises(Exception, match="not representable|SCBF"):
        df.write.format("scbf").mode("overwrite").save(out)
