"""Dedup-operator semantics pinned against brute-force baselines on a
corpus with planted exact dups, near dups, and unrelated documents."""

import itertools

import pytest
from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
    (3, "completely different content about databases and distributed query engines"),
    (4, "spark catalyst optimizer rewrites logical plans into efficient physical plans"),
    (5, "The Quick Brown Fox jumps over the lazy dog near the river bank today!"),  # case/punct dup
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def brute_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        import re

        words = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", t.lower().strip())).split(" ")
        return {" ".join(words[i : i + k]) for i in range(max(len(words) - k + 1, 1))}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs, ["text"], "doc_id").collect()
    kept = sorted(r.doc_id for r in out)
    assert kept == [0, 2, 3, 4, 5]  # 1 collapses into 0


def test_exact_dedup_normalized(docs):
    out = dedup.exact_dedup_normalized(docs, "text", "doc_id")
    row = out.filter(F.col("n_dups") == 3).first()
    assert row is not None and row.keep_id == 0  # 0, 1, 5 share normalized content


def test_minhash_finds_near_dups_and_matches_bruteforce(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_neardup_pairs(docs, jaccard_threshold=0.4).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 5) in pairs and pairs[(0, 5)] == 1.0
    assert (0, 2) in pairs  # one-word change → high Jaccard
    for (a, b), j in pairs.items():
        assert abs(j - round(brute_jaccard(DOCS[a][1], DOCS[b][1]), 4)) < 1e-9
    assert all(3 not in p and 4 not in p for p in pairs)


def test_ngram_jaccard_exact_values(docs):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    expect = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        j = brute_jaccard(ta, tb)
        if j >= 0.3:
            expect[(ia, ib)] = round(j, 4)
    assert got == expect


def test_simhash_exact_dups_hamming_zero(docs):
    pairs = {
        (r.id_a, r.id_b): r.hamming for r in dedup.simhash_neardup_pairs(docs).collect()
    }
    assert pairs.get((0, 1)) == 0 and pairs.get((0, 5)) == 0 and pairs.get((1, 5)) == 0
    assert all(3 not in p and 4 not in p for p in pairs)


def test_simhash_table_deterministic(docs):
    a = {r.id: r.sim for r in dedup.simhash_table(docs).collect()}
    b = {r.id: r.sim for r in dedup.simhash_table(docs).collect()}
    assert a == b and len(a) == len(DOCS)


def test_incremental_dedup(spark):
    from pyspark.sql import Row

    hist = spark.createDataFrame(
        [Row(doc_id=1, text="known doc"), Row(doc_id=2, text="other known")]
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=10, text="Known  DOC"),   # dup of history (normalized)
            Row(doc_id=11, text="fresh content"),
            Row(doc_id=12, text="fresh content"),  # within-batch dup of 11
            Row(doc_id=13, text="also new"),
        ]
    )
    out = sorted(r["doc_id"] for r in dedup.incremental_dedup(new, hist).collect())
    assert out == [11, 13]


def test_chunk_table_shapes(spark):
    """Fixed-word chunking: exact multiples, ragged tails, short docs, and
    the keep_cols passthrough."""
    from custom_columnar_format_spark.operators.dedup import chunk_table

    rows = [
        (1, "a b c d e f", "s1"),        # 6 words / 3 -> 2 full chunks
        (2, "a b c d e f g", "s1"),      # 7 words -> 2 full + 1-word tail
        (3, "solo", "s2"),               # shorter than a chunk -> 1 chunk
        (4, "   ", "s2"),                # whitespace-only -> dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        r["id"]: (r["chunks"], r["source"])
        for r in chunk_table(df, "text", "doc_id", chunk_words=3, keep_cols=["source"]).collect()
    }
    assert got[1] == (["a b c", "d e f"], "s1")
    assert got[2] == (["a b c", "d e f", "g"], "s1")
    assert got[3] == (["solo"], "s2")
    assert 4 not in got


def test_containment_pairs(spark):
    """Rarest-gram blocking must find every true containment: planted
    substring docs (including one shorter than k words), no false pairs."""
    from custom_columnar_format_spark.operators.dedup import containment_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "XX alpha beta gamma delta epsilon zeta eta theta YY"),  # contains 1
        (3, "beta gamma delta"),                                     # < k words, inside 1 and 2
        (4, "totally unrelated words about something else entirely"),
        (5, "Alpha, BETA gamma; delta epsilon zeta eta THETA"),      # normalizes equal to 1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_inner"], r["id_outer"])
        for r in containment_pairs(df, "text", "doc_id", k=5).collect()
    }
    assert got == {(1, 2), (3, 1), (3, 2), (3, 5), (1, 5), (5, 1), (5, 2)}


def test_containment_heavy_gram_guard_exact(spark):
    """Force the boilerplate-skew guard with a tiny heavy_df_cap: a 6-word
    boilerplate passage shared by most docs (its grams go heavy), one doc
    that is PURE boilerplate (all-heavy — must route through the second
    pass), and unique-text docs. Results must equal brute force exactly,
    guard on or off."""
    from custom_columnar_format_spark.operators.dedup import containment_pairs, normalize_text

    boiler = "all rights reserved contact us today"
    rows = []
    for i in range(12):
        rows.append((i, f"unique text number {i} alpha beta gamma " + boiler))
    rows.append((100, boiler))  # pure boilerplate: every gram heavy
    rows.append((101, "totally different content here nothing shared at all"))
    rows.append((102, "unique text number 3 alpha beta gamma " + boiler))  # == doc 3
    df = spark.createDataFrame(rows, "doc_id: long, text: string")

    def brute(df):
        t = {r["doc_id"]: r["t"] for r in df.select("doc_id", normalize_text(F.col("text")).alias("t")).collect()}
        out = set()
        for a, ta in t.items():
            for b, tb in t.items():
                if a != b and f" {ta} " in f" {tb} ":
                    out.add((a, b))
        return out

    want = brute(df)
    # probe_modulus=1 + probe_min_docs=0: the probe samples EVERY doc and
    # runs regardless of corpus size, so the guard genuinely activates on
    # this 15-doc corpus (the r6 advisor found the original test's sampled
    # probe saw zero docs — xxhash64 of ids 0-102 never hit the 1/64
    # sample — so both invocations ran the identical unguarded plan)
    stats_guard: dict = {}
    got_guard = {
        (r["id_inner"], r["id_outer"])
        for r in containment_pairs(
            df, "text", "doc_id", k=5, heavy_df_cap=5,
            probe_modulus=1, probe_min_docs=0, guard_stats=stats_guard,
        ).collect()
    }
    assert stats_guard == {"probed": True, "use_guard": True,
                           "n_heavy": stats_guard["n_heavy"]}
    assert stats_guard["n_heavy"] >= 1
    stats_noguard: dict = {}
    got_noguard = {
        (r["id_inner"], r["id_outer"])
        for r in containment_pairs(
            df, "text", "doc_id", k=5, heavy_df_cap=10**9,
            probe_modulus=1, probe_min_docs=0, guard_stats=stats_noguard,
        ).collect()
    }
    assert stats_noguard["probed"] and not stats_noguard["use_guard"]
    assert got_guard == want
    assert got_noguard == want
    # the pure-boilerplate doc is contained in every boilerplate carrier —
    # with the guard proven active, only the all-heavy second pass can
    # have found those pairs
    assert sum(1 for (a, _b) in want if a == 100) >= 12


def test_containment_guard_exact_count_branch(spark):
    """heavy_df_cap < 2×probe_modulus routes the heavy-set detection through
    the EXACT per-gram df count (the sampled estimator cannot resolve caps
    below twice the modulus — the r6-advisor floor cliff); results must
    still equal the unguarded plan."""
    from custom_columnar_format_spark.operators.dedup import containment_pairs

    boiler = "terms of service apply everywhere always"
    rows = [(i, f"doc {i} body words here {boiler}") for i in range(10)]
    rows.append((50, "nothing shared with anyone at all truly"))
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    stats: dict = {}
    got = {
        (r["id_inner"], r["id_outer"])
        for r in containment_pairs(
            df, "text", "doc_id", k=5, heavy_df_cap=5,
            probe_modulus=64, probe_min_docs=0, guard_stats=stats,
        ).collect()
    }
    assert stats["probed"] and stats["use_guard"] and stats["n_heavy"] >= 1
    want = {
        (r["id_inner"], r["id_outer"])
        for r in containment_pairs(df, "text", "doc_id", k=5, heavy_df_cap=None).collect()
    }
    assert got == want


def test_containment_spill_dir_matches_persist(spark, tmp_path):
    """The disk-backed spill path (norm written once to a parquet temp table
    and re-read by every branch — the 100 TB alternative to executor cache)
    must produce identical pairs to the default persisted plan, and must
    actually write the temp table."""
    import os

    from custom_columnar_format_spark.operators.dedup import containment_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "XX alpha beta gamma delta epsilon zeta eta theta YY"),
        (3, "beta gamma delta"),
        (4, "totally unrelated words about something else entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    want = {
        (r["id_inner"], r["id_outer"])
        for r in containment_pairs(df, "text", "doc_id", k=5).collect()
    }
    got = {
        (r["id_inner"], r["id_outer"])
        for r in containment_pairs(
            df, "text", "doc_id", k=5, spill_dir=str(tmp_path)
        ).collect()
    }
    assert got == want
    assert os.path.isdir(os.path.join(str(tmp_path), "containment_norm"))


def test_containment_small_corpus_skips_probe(spark):
    """Below probe_min_docs (default cap × modulus) the probe must not run
    at all — the plain plan with zero added eager jobs (the round-7 bench
    fix: sub-threshold corpora pay only a column-pruned id count)."""
    from custom_columnar_format_spark.operators.dedup import containment_pairs

    rows = [(i, f"totally unique body number {i} with words") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    stats: dict = {}
    containment_pairs(
        df, "text", "doc_id", k=5, heavy_df_cap=1000, guard_stats=stats
    ).collect()
    assert stats == {"probed": False, "use_guard": False, "n_heavy": 0}
