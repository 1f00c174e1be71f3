"""BPE trainer/encoder tests: the distributed loop must reproduce the
pure-python reference (Sennrich greedy merges, (count DESC, pair ASC)
tie-break) merge-for-merge, and token counts must match a reference encode."""

import pytest
from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import tokenizer

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "  "),  # dropped
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def _ref_word_counts(docs_df):
    rows = tokenizer.word_count_table(docs_df, "text").collect()
    return [(r["word"], r["n"]) for r in rows]


def test_bpe_train_matches_reference(docs):
    wc = _ref_word_counts(docs)
    want = tokenizer.bpe_reference(wc, n_merges=8)
    got = tokenizer.bpe_train(docs, "text", n_merges=8)
    assert got == want
    assert len(got) == 8
    # the classic example: 'newest' dominates, so early merges build its pieces
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in got)


def test_bpe_train_exhausts_gracefully(spark):
    # a one-word corpus runs out of pairs before n_merges; the loop must stop
    df = spark.createDataFrame([(1, "ab ab")], ["doc_id", "text"])
    merges = tokenizer.bpe_train(df, "text", n_merges=10)
    # 'a'+'b' -> 'ab', 'ab'+'</w>' -> 'ab</w>', then nothing mergeable
    assert merges == [("a", "b"), ("ab", "</w>")]


def test_bpe_token_counts_match_reference(docs):
    wc = _ref_word_counts(docs)
    merges = tokenizer.bpe_reference(wc, n_merges=6)

    def enc_len(word):
        t = list(word) + ["</w>"]
        for a, b in merges:
            t = tokenizer._apply_merge(t, a, b)
        return len(t)

    import collections

    want = collections.defaultdict(int)
    for doc_id, text in CORPUS:
        for w in text.split():
            want[doc_id] += enc_len(w)
    want = {k: v for k, v in want.items() if v}

    got = {
        r["id"]: r["n_tokens"]
        for r in tokenizer.bpe_token_counts(docs, merges, "text", "doc_id").collect()
    }
    assert got == want


def test_bpe_merges_shrink_token_counts(docs):
    none = tokenizer.bpe_token_counts(docs, [], "text", "doc_id")
    merges = tokenizer.bpe_train(docs, "text", n_merges=8)
    trained = tokenizer.bpe_token_counts(docs, merges, "text", "doc_id")
    n0 = none.agg(F.sum("n_tokens")).first()[0]
    n1 = trained.agg(F.sum("n_tokens")).first()[0]
    assert n1 < n0  # merges must compress


def test_bpe_train_distributed_path_matches_reference(docs):
    # r11: small vocabs short-circuit to the driver-side reference trainer,
    # so the DISTRIBUTED merge loop must keep its own reference-equality pin
    # (local_train_max_vocab=0 forces it regardless of vocab size)
    wc = _ref_word_counts(docs)
    want = tokenizer.bpe_reference(wc, n_merges=8)
    got = tokenizer.bpe_train(docs, "text", n_merges=8, local_train_max_vocab=0)
    assert got == want
