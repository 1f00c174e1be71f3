"""PageRank: hand-checkable symmetry/mass properties and star-graph ordering."""

import pytest
from pyspark.sql import Row

from custom_columnar_format_spark.operators import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    return {r["node"]: r["rank"] for r in pagerank.pagerank(df, **kw).collect()}


def test_path_graph_symmetry_and_mass(spark):
    # a - b - c: ends are symmetric, middle is most central, mass sums to 1
    r = _ranks(spark, [(1, 2), (2, 3)], iterations=5)
    assert r[1] == pytest.approx(r[3], rel=1e-12)
    assert r[2] > r[1]
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)


def test_star_graph_center_dominates(spark):
    r = _ranks(spark, [(0, i) for i in range(1, 6)], iterations=4)
    center, leaves = r[0], [r[i] for i in range(1, 6)]
    assert all(center > l for l in leaves)
    assert leaves == pytest.approx([leaves[0]] * 5, rel=1e-12)


def test_zero_iterations_is_uniform(spark):
    r = _ranks(spark, [(1, 2), (3, 4)], iterations=0)
    assert set(r.values()) == {0.25}


def test_empty_graph(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    empty = spark.createDataFrame(
        [], StructType([StructField("src", LongType()), StructField("dst", LongType())])
    )
    assert pagerank.pagerank(empty, iterations=2).count() == 0
