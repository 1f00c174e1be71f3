"""Generate QUERIES.md: one row per registry query — name, oracle status,
one-line description — so the full driver-facing surface is auditable
without reading the modules.

    python tools/query_catalog.py > QUERIES.md

Also the registry LINTER (``lint_registry``, run by tests/test_registry_
hygiene.py in the CI path): as the catalog grows past 200 entries the two
failure modes that stay silent until a driver round are (a) an oracle SQL
referencing a table the driver never registers as a view — the oracle
errors and the row goes red for a reason that has nothing to do with the
engine — and (b) an empty/one-word docstring that makes the judge's
coverage audit unreadable. Both are import-time-checkable, so check them.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from custom_columnar_format_spark.queries.registry import all_queries
from custom_columnar_format_spark.queries.tables import TABLES

_MIN_DOC_CHARS = 50  # "shorter than one sentence" guard

# identifier directly after FROM/JOIN that is not an opening paren (i.e. not
# a subquery) — a one-sided linter: it may miss comma-separated refs, but
# anything it DOES capture must be a known table or a CTE of the same query
_REF_RE = re.compile(r"\b(?:FROM|JOIN)\s+([A-Za-z_]\w*)\b(?!\s*\()", re.IGNORECASE)
# CTE heads: optional column list, optional [NOT] MATERIALIZED
_CTE_RE = re.compile(
    r"\b([A-Za-z_]\w*)\s*(?:\([^)]*\))?\s+AS\s+(?:NOT\s+MATERIALIZED\s*|MATERIALIZED\s*)?\(",
    re.IGNORECASE,
)
_COMMENT_RE = re.compile(r"--[^\n]*")


def _strip_noise(sql: str) -> str:
    """Remove line comments and EXTRACT/SUBSTRING(... FROM ...) call bodies,
    whose FROM keyword is not a table reference."""
    sql = _COMMENT_RE.sub("", sql)
    lower = sql.lower()
    out, i = [], 0
    while True:
        hits = [
            lower.find(kw, i) for kw in ("extract", "substring") if lower.find(kw, i) != -1
        ]
        if not hits:
            out.append(sql[i:])
            return "".join(out)
        j = min(hits)
        p = lower.find("(", j)
        if p == -1:
            out.append(sql[i:])
            return "".join(out)
        depth, k = 1, p + 1
        while k < len(sql) and depth:
            depth += sql[k] == "("
            depth -= sql[k] == ")"
            k += 1
        out.append(sql[i:j])
        i = k


def lint_registry(qs=None) -> list[str]:
    """Return a list of human-readable violations (empty = clean)."""
    qs = qs or all_queries()
    problems: list[str] = []
    for name in sorted(qs):
        qd = qs[name]
        doc = " ".join((qd.doc or "").split())
        if len(doc) < _MIN_DOC_CHARS:
            problems.append(
                f"{name}: docstring too short ({len(doc)} chars < {_MIN_DOC_CHARS})"
            )
        if qd.sql is None:
            continue
        sql = _strip_noise(qd.sql)
        ctes = {m.group(1).lower() for m in _CTE_RE.finditer(sql)}
        for m in _REF_RE.finditer(sql):
            ref = m.group(1).lower()
            if ref in ctes or ref in TABLES:
                continue
            # single-letter/short aliases of a preceding subquery ("FROM
            # (SELECT ...) t") never collide with table names; anything
            # else unknown is a genuine red flag
            problems.append(f"{name}: oracle SQL references unknown table {ref!r}")
    return problems


# DuckDB types pandas cannot round-trip as int64: the driver materializes
# them as float64, so a value-hash against Spark's int64 output mismatches
# even when every value is identical ("2098.0" vs "2098").  This exact
# artifact cost rounds 4-6 a persistent driver red on q_pack_sequences
# (root-caused in VERDICT r6: DuckDB SUM(BIGINT) -> HUGEINT).
_BANNED_DUCK_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT"}


def lint_oracle_schemas(qs=None, sf_dir: str = "/root/testdata/sf0.001") -> list[str]:
    """Bind every oracle SQL in DuckDB (schema resolution only — no rows are
    fetched) and flag any final output column whose type pandas would
    silently coerce to float64, breaking the driver's raw value-hash
    against Spark's int64.  Returns human-readable violations."""
    import duckdb

    qs = qs or all_queries()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    problems: list[str] = []
    for name in sorted(qs):
        sql = qs[name].sql
        if sql is None:
            continue
        try:
            rel = con.sql(sql)
            hits = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, (str(t) for t in rel.types))
                if t in _BANNED_DUCK_TYPES
            ]
        except Exception as e:  # noqa: BLE001 — binding error is itself a lint hit
            problems.append(f"{name}: oracle SQL failed to bind in DuckDB: {e}")
            continue
        if hits:
            problems.append(
                f"{name}: oracle final schema has pandas-unrepresentable int "
                f"column(s) {hits} — CAST(... AS BIGINT) the output"
            )
    con.close()
    return problems


def main() -> None:
    qs = all_queries()
    problems = lint_registry(qs) + lint_oracle_schemas(qs)
    if problems:
        for p in problems:
            print(f"LINT: {p}", file=sys.stderr)
        raise SystemExit(1)
    oracled = sum(1 for q in qs.values() if q.sql is not None)
    print("# QUERIES — the registered driver surface")
    print()
    print(f"{len(qs)} queries, {oracled} DuckDB-oracle-verified (★). Generated by")
    print("`tools/query_catalog.py`; descriptions are the registry docstrings.")
    print()
    print("| query | oracle | description |")
    print("|---|---|---|")
    for name in sorted(qs):
        qd = qs[name]
        mark = "★" if qd.sql is not None else "rows-only"
        doc = " ".join((qd.doc or "").split()).replace("|", "\\|")
        print(f"| `{name}` | {mark} | {doc} |")


if __name__ == "__main__":
    main()
