"""Registry metadata lint (no Spark session needed): every oracled SQL may
only reference driver-registered tables (an unknown ref errors in DuckDB at
driver time, going red for a non-engine reason), every docstring must be at
least a sentence, and duplicate names are already an import-time error in
the registry itself. Companion to tools/query_catalog.py, which refuses to
regenerate QUERIES.md while the lint fails."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import pytest  # noqa: E402
from query_catalog import _REF_RE, lint_oracle_schemas, lint_registry  # noqa: E402

from custom_columnar_format_spark.queries.registry import all_queries  # noqa: E402


def test_registry_lint_clean():
    assert lint_registry() == []


def test_lint_catches_unknown_table():
    from custom_columnar_format_spark.queries.registry import QueryDef

    bad = {
        "q_fake": QueryDef(
            fn=lambda spark, sf: None,
            sql="SELECT * FROM documents JOIN no_such_table USING (doc_id)",
            doc="x" * 60,
        )
    }
    problems = lint_registry(bad)
    assert any("no_such_table" in p for p in problems)


def test_lint_catches_short_doc():
    from custom_columnar_format_spark.queries.registry import QueryDef

    bad = {"q_terse": QueryDef(fn=lambda spark, sf: None, sql=None, doc="dedup")}
    problems = lint_registry(bad)
    assert any("docstring too short" in p for p in problems)


def test_ref_regex_skips_subqueries_and_functions():
    sql = """
    WITH a AS (SELECT 1), b AS (SELECT * FROM a)
    SELECT * FROM (SELECT * FROM b) t, unnest(range(1, 3)) AS u(i)
    JOIN documents USING (doc_id)
    """
    refs = {m.group(1).lower() for m in _REF_RE.finditer(sql)}
    assert "documents" in refs and "a" in refs and "b" in refs
    assert "unnest" not in refs and "select" not in refs


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"), reason="driver testdata absent"
)
def test_oracle_schemas_have_no_hugeint_finals():
    """The round-4..6 driver red class: DuckDB SUM(BIGINT) -> HUGEINT ->
    pandas float64 -> raw value-hash mismatch vs Spark int64.  Every
    oracle's bound final schema must be free of HUGEINT/UBIGINT/UHUGEINT."""
    assert lint_oracle_schemas() == []


def test_oracle_schema_lint_catches_uncast_sum():
    from custom_columnar_format_spark.queries.registry import QueryDef

    bad = {
        "q_uncast": QueryDef(
            fn=lambda spark, sf: None,
            sql="SELECT SUM(CAST(doc_id AS BIGINT)) AS s FROM documents",
            doc="x" * 60,
        ),
        "q_cast": QueryDef(
            fn=lambda spark, sf: None,
            sql="SELECT CAST(SUM(doc_id) AS BIGINT) AS s FROM documents",
            doc="x" * 60,
        ),
    }
    problems = lint_oracle_schemas(bad)
    assert any("q_uncast" in p and "HUGEINT" in p for p in problems)
    assert not any("q_cast" in p for p in problems)


def test_every_query_has_callable_and_distinct_name():
    qs = all_queries()
    assert len(qs) == len(set(qs))
    for name, qd in qs.items():
        assert callable(qd.fn), name
