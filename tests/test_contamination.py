"""Decontamination: exact-copy docs fully contaminated, disjoint docs absent,
partial overlap counted over distinct grams."""

from pyspark.sql import Row

from custom_columnar_format_spark.operators import contamination


def test_contamination_report(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="the quick brown fox jumps over the lazy dog")]
    )
    corpus = spark.createDataFrame(
        [
            # exact copy of the benchmark doc: every 5-gram collides
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            # shares exactly one 5-gram window ("quick brown fox jumps over")
            Row(doc_id=2, text="she said quick brown fox jumps over and left"),
            # disjoint
            Row(doc_id=3, text="completely different words with no shared windows at all"),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in contamination.contamination_report(corpus, bench, gram_k=5).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_contaminated"] == out[1]["n_grams"]
    assert out[1]["contamination_ratio"] == 1.0
    assert out[2]["n_contaminated"] == 1
    assert 0 < out[2]["contamination_ratio"] < 1


def test_contamination_short_doc_single_gram(spark):
    """Docs shorter than the gram width become one whole-text gram (the
    shingle_table tail rule) — equality then counts as contamination."""
    bench = spark.createDataFrame([Row(doc_id=9, text="tiny doc")])
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="tiny doc"), Row(doc_id=2, text="other doc")]
    )
    out = contamination.contamination_report(corpus, bench, gram_k=5).collect()
    assert [(r["doc_id"], r["n_grams"], r["n_contaminated"]) for r in out] == [(1, 1, 1)]


def test_fuzzy_contamination_planted(spark):
    """A doc whose prefix is one word off a probe's prefix is caught; a
    same-lang unrelated doc and a near-identical doc in ANOTHER language
    are not (lang is the blocking equi-key)."""
    from custom_columnar_format_spark.operators.contamination import (
        fuzzy_contamination_pairs,
    )

    bench = "what is the capital of france paris"
    near = "what is the capital of spain paris"     # 1 word swapped
    rows = [
        (1, bench, "en"),
        (2, near, "en"),
        (3, "totally different words about unrelated topics here now", "en"),
        (4, near, "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    probes = spark.createDataFrame(
        [(100, "en", bench)], "probe_id: long, p_lang: string, probe_pfx: string"
    )
    got = {
        (r["doc_id"], r["probe_id"]): r["edit_dist"]
        for r in fuzzy_contamination_pairs(df, tau=8, probes=probes).collect()
    }
    assert (2, 100) in got and got[(2, 100)] <= 8
    assert (1, 100) in got and got[(1, 100)] == 0   # exact leak
    assert all(d != 3 for d, _ in got)               # unrelated doc filtered
    assert all(d != 4 for d, _ in got)               # other-language never compared


def test_fuzzy_contamination_plan_is_broadcast_hash(spark):
    """The probe join must plan as BroadcastHashJoin on the lang equi-key
    (never BNLJ/cartesian) — the 100 TB shape: corpus rows score their
    language's probes map-side."""
    from custom_columnar_format_spark.operators.contamination import (
        fuzzy_contamination_pairs,
    )

    rows = [(i, f"some words number {i} for testing plans", "en") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    plan = (
        fuzzy_contamination_pairs(df, tau=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
