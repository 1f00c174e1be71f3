"""Schema inference for CSV → SCBF conversion.

Two modes:

- ``infer_compat``: byte-for-byte parity with the reference's semantics
  (reference writer.py:12-26,41-54) — per column, the FIRST non-empty value
  decides the type (int32 → float64 → utf8 fallback); an all-empty column is
  utf8. No promotion/widening: a column inferred int32 whose later values
  don't parse as int raises, exactly as the reference crashes.
- ``infer_full``: saner Spark-style inference scanning ALL values — a column
  is int32 only if every non-empty value parses as int32-range int, float64
  if every value parses as float, else utf8. Used by default in the CLI
  behind ``--infer=full``.
"""

from __future__ import annotations

from typing import List, Sequence

from .codec import INT32_MAX, INT32_MIN, TYPE_FLOAT64, TYPE_INT32, TYPE_UTF8, ScbfError


def infer_value_type(value: str) -> int:
    """Type of a single CSV cell: int wins over float wins over utf8."""
    try:
        int(value)
        return TYPE_INT32
    except ValueError:
        pass
    try:
        float(value)
        return TYPE_FLOAT64
    except ValueError:
        pass
    return TYPE_UTF8


def infer_compat(rows: Sequence[Sequence[str]], num_cols: int) -> List[int]:
    """First-non-empty-value inference (reference writer.py:41-54 semantics)."""
    types: List[int] = []
    for c in range(num_cols):
        code = TYPE_UTF8  # all-empty column defaults to utf8
        for row in rows:
            cell = row[c] if c < len(row) else ""
            if cell != "":
                code = infer_value_type(cell)
                break
        types.append(code)
    return types


def infer_full(rows: Sequence[Sequence[str]], num_cols: int) -> List[int]:
    """All-values inference with int32-range checking and float fallback."""
    types: List[int] = []
    for c in range(num_cols):
        saw_value = False
        is_int = True
        is_float = True
        for row in rows:
            cell = row[c] if c < len(row) else ""
            if cell == "":
                continue
            saw_value = True
            if is_int:
                try:
                    v = int(cell)
                    if not (INT32_MIN <= v <= INT32_MAX):
                        is_int = False
                except ValueError:
                    is_int = False
            if not is_int and is_float:
                try:
                    float(cell)
                except ValueError:
                    is_float = False
            if not is_int and not is_float:
                break
        if not saw_value:
            types.append(TYPE_UTF8)
        elif is_int:
            types.append(TYPE_INT32)
        elif is_float:
            types.append(TYPE_FLOAT64)
        else:
            types.append(TYPE_UTF8)
    return types


def parse_column(cells: Sequence[str], type_code: int):
    """Parse string cells to the inferred type; raises like the reference on
    unparseable cells (no nulls in SCBF v1 — empty numeric cell is an error,
    reference writer.py:84 ``int('')`` crash)."""
    if type_code == TYPE_INT32:
        try:
            return [int(c) for c in cells]
        except ValueError as e:
            raise ScbfError(f"cell not parseable as int32 (no nulls/promotion in SCBF v1): {e}")
    if type_code == TYPE_FLOAT64:
        try:
            return [float(c) for c in cells]
        except ValueError as e:
            raise ScbfError(f"cell not parseable as float64 (no nulls in SCBF v1): {e}")
    return list(cells)
