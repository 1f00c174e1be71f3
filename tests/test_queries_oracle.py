"""Registry-wide gate at sf0.001: every `queries()` entry runs and, where an
oracle exists, hash-matches DuckDB — the same comparison the driver makes at
sf0.01 (tools/check_oracle.py is the manual, bigger-scale version)."""

import duckdb
import pandas as pd
import pytest

from custom_columnar_format_spark.compare import strict_dtype_problems
from custom_columnar_format_spark.queries.registry import all_queries
from custom_columnar_format_spark.queries.tables import TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck(sf_small):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'")
    return con


QUERIES = sorted(all_queries().items())


@pytest.mark.parametrize("name,qd", QUERIES, ids=[n for n, _ in QUERIES])
def test_query_vs_oracle(spark, sf_small, duck, name, qd):
    sdf = qd.fn(spark, sf_small).toPandas()
    if qd.sql is None:
        assert len(sdf) >= 0  # rows-only check (driver does the same)
        return
    odf = duck.execute(qd.sql).fetchdf()
    # driver-faithful strict check on the RAW frames: the driver hashes raw
    # cell reprs, so an int64-vs-float64 column pair mismatches there even
    # when every value is equal (the r4-r6 HUGEINT red class) — this must
    # fail LOCALLY, before normalize() coerces ints to float64
    assert strict_dtype_problems(sdf, odf) == [], f"{name}: strict dtype"
    s, o = normalize(sdf), normalize(odf)
    assert list(s.columns) == list(o.columns), f"{name}: column mismatch"
    assert len(s) == len(o), f"{name}: row count {len(s)} != {len(o)}"
    pd.testing.assert_frame_equal(s, o, check_dtype=False, rtol=1e-6, atol=1e-6)
