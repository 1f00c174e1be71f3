"""Vacuum: orphaned tmp files and staging dirs go, committed data and young
scratch stay."""

import os

import pytest
from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import vacuum


@pytest.fixture(autouse=True)
def _register_scbf(spark):
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)


def test_vacuum_removes_orphans_keeps_data(spark, sf_small, tmp_path):
    path = str(tmp_path / "ds")
    df = spark.read.parquet(f"{sf_small}/nation.parquet")
    df.coalesce(2).write.format("scbf").option("version", "2").mode("overwrite").save(path)
    n = spark.read.format("scbf").load(path).count()

    # plant orphans: a dead task's tmp file and a crashed merge's staging dirs
    open(os.path.join(path, ".tmp-deadbeef.scbf"), "wb").write(b"partial")
    os.makedirs(path + ".merge-tmp")
    os.makedirs(os.path.join(path, "sub.compact-old"))

    stats = vacuum.vacuum(path, older_than_seconds=0)
    assert stats == {"tmp_files": 1, "staging_dirs": 2}
    assert not os.path.exists(os.path.join(path, ".tmp-deadbeef.scbf"))
    assert not os.path.exists(path + ".merge-tmp")
    assert spark.read.format("scbf").load(path).count() == n


def test_vacuum_age_threshold_protects_live_scratch(spark, sf_small, tmp_path):
    path = str(tmp_path / "ds2")
    spark.read.parquet(f"{sf_small}/nation.parquet").coalesce(1).write.format("scbf").mode(
        "overwrite"
    ).save(path)
    open(os.path.join(path, ".tmp-live.scbf"), "wb").write(b"writing")
    stats = vacuum.vacuum(path, older_than_seconds=3600)
    assert stats == {"tmp_files": 0, "staging_dirs": 0}
    assert os.path.exists(os.path.join(path, ".tmp-live.scbf"))