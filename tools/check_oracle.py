"""Local stand-in for the driver's correctness gate: run every registry query
on Spark AND its DuckDB oracle at a given scale factor, compare row count,
column names, and order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
    python tools/check_oracle.py [sf_dir] --rotate <round> [k]

``--rotate`` (r8 verdict task #7): the driver's sampler redraws nearly the
same ~50 query names every round, so most of the catalog has never appeared
in a committed CORRECTNESS_r*.json. Rotation mode draws a DETERMINISTIC
round-keyed slice of k (default 50) queries, ordering the never-driver-
sampled blind spot first (membership read from the committed
CORRECTNESS_r*.json files), so each round's verification trail covers a
fresh slice of the blind spot. Record the output in COVERAGE.md §ROTATION.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from custom_columnar_format_spark.compare import strict_dtype_problems
from custom_columnar_format_spark.plans.session import get_spark
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
            df[c] = df[c].astype("float64")  # unify int widths / nullable ints
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def rotation_slice(round_no: int, k: int = 50) -> list[str]:
    """Deterministic round-keyed sample prioritizing the driver-sampler
    blind spot: queries absent from every committed CORRECTNESS_r*.json
    come first (shuffled by md5(round, name) — stable for a given round,
    different across rounds), then the already-sampled remainder."""
    import glob
    import hashlib
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sampled: set = set()
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            with open(p) as f:
                sampled |= set(json.load(f).keys())
        except Exception:
            pass
    names = sorted(all_queries().keys())

    def key(n: str) -> str:
        return hashlib.md5(f"r{round_no}:{n}".encode()).hexdigest()

    never = sorted((n for n in names if n not in sampled), key=key)
    seen = sorted((n for n in names if n in sampled), key=key)
    return (never + seen)[:k]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if len(sys.argv) > 2 and sys.argv[2] == "--rotate":
        round_no = int(sys.argv[3])
        k = int(sys.argv[4]) if len(sys.argv) > 4 else 50
        only = set(rotation_slice(round_no, k))
        print(f"ROTATION r{round_no}: {len(only)} queries "
              f"({sum(1 for _ in only)} drawn, blind-spot-first)")
    else:
        only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, qd in sorted(all_queries().items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir).toPandas()
            # operators persist() multi-branch intermediates; the harness
            # owns cache lifecycle across a 150+-query sweep
            spark.catalog.clearCache()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if qd.sql is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(qd.sql).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            continue
        strict = strict_dtype_problems(sdf, odf)
        if strict:
            failures.append(name)
            print(f"FAIL  {name}: strict dtype: {'; '.join(strict)}")
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(s)} oracle={len(o)}")
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6)
            print(f"OK    {name}: {len(s)} rows [{time.time()-t0:.1f}s]")
        except AssertionError as e:
            failures.append(name)
            diff = (s != o)
            bad_cols = [c for c in s.columns if diff[c].any()] if len(s) == len(o) else []
            print(f"FAIL  {name}: value mismatch in {bad_cols}: {str(e)[:200]}")

    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
