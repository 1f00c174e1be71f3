"""Data-quality checker: rule counts match hand-computed violations, all
row-level rules share one aggregate (single scan), nulls count as violations
for range/accepted-values rules."""

import contextlib
import io

from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import quality as Q


def _counts(df):
    return {r.rule: r.violations for r in df.collect()}


def test_rule_counts(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, None, "B"),      # null qty → range violation
            (3, 99.0, "A"),      # out of range
            (None, 5.0, "A"),    # null key
            (1, 5.0, "C"),       # dup key (with row 1), bad flag
        ],
        "k int, qty double, flag string",
    )
    got = _counts(
        Q.check(
            df,
            [
                Q.not_null("k"),
                Q.in_range("qty", 1, 50),
                Q.accepted_values("flag", ["A", "B"]),
                Q.unique_key("k"),
            ],
        )
    )
    assert got == {
        "not_null_k": 1,
        "in_range_qty": 2,
        "accepted_values_flag": 1,
        "unique_key_k": 1,
    }


def test_matches_rule_counts_nulls_and_mismatches(spark):
    df = spark.createDataFrame([("a1",), ("b2",), (None,)], "s string")
    got = _counts(Q.check(df, [Q.matches("s", "^a")]))
    assert got == {"matches_s": 2}


def test_row_rules_share_one_scan(spark, sf_small):
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    df = Q.check(li, [Q.not_null("l_orderkey"), Q.in_range("l_quantity", 1, 45)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()  # simple mode: each node printed once
    plan = buf.getvalue()
    assert plan.count("FileScan parquet") == 1  # N row rules, one scan


def test_clean_data_has_zero_violations(spark, sf_small):
    # orders' primary key is genuinely unique in the corpus (lineitem's
    # (l_orderkey, l_linenumber) is NOT — the quality checker is how you
    # find that out)
    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    got = _counts(Q.check(o, [Q.not_null("o_orderkey"), Q.unique_key("o_orderkey")]))
    assert got == {"not_null_o_orderkey": 0, "unique_key_o_orderkey": 0}

def test_analyze_table_one_pass(spark):
    from pyspark.sql import Row

    from custom_columnar_format_spark.operators.quality import analyze_table

    df = spark.createDataFrame(
        [
            Row(id=1, name="aa"),
            Row(id=2, name=None),
            Row(id=2, name="bbbb"),
        ]
    )
    out = {r["column"]: r for r in analyze_table(df).collect()}
    assert out["id"]["n_rows"] == 3 and out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 2
    assert (out["id"]["min_value"], out["id"]["max_value"]) == ("1", "2")
    assert out["name"]["n_null"] == 1 and out["name"]["n_distinct"] == 2
    assert out["name"]["avg_len"] == 3.0  # (2 + 4) / 2 non-null values
