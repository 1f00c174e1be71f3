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
