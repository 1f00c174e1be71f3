"""Driver-faithful result comparison helpers shared by the local oracle
gates (tools/check_oracle.py, tests/test_queries_oracle.py).

Why this exists: the driver compares Spark vs DuckDB by hashing RAW cell
values after sorting columns by name.  A representational divergence — an
int64 on one side materialized as float64 on the other ("2098" vs
"2098.0") — mismatches there even when every value is numerically equal.
The local gates' tolerant compare (ints coerced to float64, rtol=1e-6)
is blind to that class by construction: rounds 4-6 burned three rounds on
a driver red (q_pack_sequences) that 53 local repro attempts could not
reproduce, because the oracle's DuckDB ``SUM(BIGINT)`` returned HUGEINT
-> pandas float64 while Spark returned int64 (VERDICT r6 root cause).

Canonicalization contract (documented so failures are interpretable):

* Columns are matched by sorted name (the driver does the same).
* dtype FAMILIES are compared on the raw frames, before any coercion:
  an int-family column on one side paired with a float-family column on
  the other is a strict failure — that is precisely what the driver's
  raw value-hash sees.  Everything else (int32 vs int64, object vs
  string) hashes identically cell-by-cell and is allowed.
* Value comparison stays tolerant for floats (rtol) — both engines do
  IEEE double math in different operator orders, and the driver is
  observed green on float outputs that differ below 1e-6.
"""

from __future__ import annotations

import pandas as pd


def dtype_family(dtype: object) -> str:
    """Collapse a pandas dtype to the family the driver's value-hash
    distinguishes: 'int' vs 'float' vs everything-else."""
    kind = getattr(dtype, "kind", None)
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    # nullable pandas Int64/Float64 extension arrays expose .kind too via
    # .numpy_dtype on new pandas; fall back to the string name
    name = str(dtype)
    if name.startswith(("Int", "UInt")):
        return "int"
    if name.startswith("Float"):
        return "float"
    return "other"


def strict_dtype_problems(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Return violations where the raw Spark and oracle frames disagree
    int-family vs float-family on a shared column — the divergence class
    the driver's raw value-hash flags and a tolerant compare cannot see.

    Must be called on the RAW ``toPandas()`` / ``fetchdf()`` outputs,
    before any normalize() coercion.
    """
    problems: list[str] = []
    shared = sorted(set(sdf.columns) & set(odf.columns))
    for c in shared:
        fs, fo = dtype_family(sdf[c].dtype), dtype_family(odf[c].dtype)
        if {fs, fo} == {"int", "float"}:
            problems.append(
                f"column {c!r}: spark dtype {sdf[c].dtype} vs oracle dtype "
                f"{odf[c].dtype} — the driver's raw value-hash sees "
                f"'2098' vs '2098.0' here even when values are equal; "
                f"CAST the oracle output (or align the Spark type)"
            )
    return problems
