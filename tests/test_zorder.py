"""Z-order clustering: a 2-D box predicate over a z-ordered SCBF v2 dataset
must skip strictly more files than over a linearly-sorted layout, and results
must be identical. File skipping is counted directly through the same
codec_v2.file_may_match the DataSource's pushFilters path uses."""

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

from custom_columnar_format_spark.operators import zorder
from custom_columnar_format_spark.scbf import codec_v2


@pytest.fixture(autouse=True)
def _register_scbf(spark):
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)


def _surviving_files(path: str, filters) -> tuple[int, int]:
    files = sorted(glob.glob(os.path.join(path, "*.scbf")))
    alive = sum(1 for p in files if codec_v2.file_may_match(codec_v2.read_meta(p), filters))
    return alive, len(files)


def _boxes(df):
    """Three box predicates (15% per dimension, ~2% of the 2-D area each) at
    different offsets, derived from actual ranges so the test holds at any
    scale factor. Summing survivors over several placements averages out
    Morton-boundary luck (a box straddling the 50% mark of every dimension
    touches all four top-level quadrants — the curve's worst case)."""
    r = df.agg(
        F.min("l_orderkey").alias("omn"),
        F.max("l_orderkey").alias("omx"),
        F.min("l_partkey").alias("pmn"),
        F.max("l_partkey").alias("pmx"),
    ).collect()[0]
    out = []
    for lo, hi in [(0.1, 0.25), (0.3, 0.45), (0.6, 0.75)]:
        olo = int(r.omn + lo * (r.omx - r.omn))
        ohi = int(r.omn + hi * (r.omx - r.omn))
        plo = int(r.pmn + lo * (r.pmx - r.pmn))
        phi = int(r.pmn + hi * (r.pmx - r.pmn))
        out.append(
            (
                [
                    GreaterThanOrEqual(("l_orderkey",), olo),
                    LessThanOrEqual(("l_orderkey",), ohi),
                    GreaterThanOrEqual(("l_partkey",), plo),
                    LessThanOrEqual(("l_partkey",), phi),
                ],
                (olo, ohi, plo, phi),
            )
        )
    return out


def test_zorder_skips_more_files_than_linear_sort(spark, sf_small, tmp_path):
    """At 64 files, 2-D boxes must touch fewer z-ordered files than linearly
    sorted ones (the linear layout only ever skips on its one sort column)."""
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    n_files = 64

    linear = str(tmp_path / "linear")
    (
        li.repartitionByRange(n_files, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.format("scbf")
        .option("version", "2")
        .mode("overwrite")
        .save(linear)
    )
    zpath = str(tmp_path / "zord")
    zorder.write_zordered(li, zpath, ["l_orderkey", "l_partkey"], n_files=n_files, version="2")

    lin_alive = z_alive = 0
    for box, _bounds in _boxes(li):
        la, lt = _surviving_files(linear, box)
        za, zt = _surviving_files(zpath, box)
        assert lt == zt == n_files
        lin_alive += la
        z_alive += za
    assert z_alive < lin_alive, f"z-order {z_alive} vs linear {lin_alive} surviving files"


def test_zorder_read_results_identical(spark, sf_small, tmp_path):
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath = str(tmp_path / "zord2")
    zorder.write_zordered(li, zpath, ["l_orderkey", "l_partkey"], n_files=8, version="2")

    _, (olo, ohi, plo, phi) = _boxes(li)[0]
    pred = (
        (F.col("l_orderkey") >= olo)
        & (F.col("l_orderkey") <= ohi)
        & (F.col("l_partkey") >= plo)
        & (F.col("l_partkey") <= phi)
    )
    got = (
        spark.read.format("scbf")
        .load(zpath)
        .filter(pred)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("q"),
        )
        .collect()[0]
    )
    want = li.filter(pred).agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    assert (got.n, got.q) == (want.n, want.q)
    assert got.n > 0