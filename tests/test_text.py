"""Text-analysis operator tests: language ID on known-language samples,
token counting, quality signals, fingerprint stability/robustness."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import text

SAMPLES = [
    (0, "en", "the cat sat on the mat and the dog ran out of the house"),
    (1, "fr", "le chat est sur la table et le chien dort dans la maison"),
    (2, "de", "der hund und die katze spielen und der vogel singt"),
    (3, "es", "el perro corre y los gatos duermen porque el sol brilla"),
    (4, "und", "zzz qqq xxx 12345"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i, t) for i, _, t in SAMPLES], ["doc_id", "text"])


def test_lang_id(docs):
    got = {r.doc_id: r.lang for r in docs.select("doc_id", text.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {i: lang for i, lang, _ in SAMPLES}


def test_token_counts(docs):
    got = {
        r.doc_id: (r.tc, r.wc)
        for r in docs.select(
            "doc_id",
            text.token_count(F.col("text")).alias("tc"),
            text.whitespace_token_count(F.col("text")).alias("wc"),
        ).collect()
    }
    for i, _, t in SAMPLES:
        assert got[i][0] == len(re.findall(r"[A-Za-z0-9]+", t))
        assert got[i][1] == len(t.split())


def test_quality_columns(spark):
    df = spark.createDataFrame([(1, "Hello, world! This is fine.")], ["doc_id", "text"])
    q = text.quality_columns(F.col("text"))
    row = df.select(*[v.alias(k) for k, v in q.items()]).first()
    assert row.n_chars == 27
    assert row.n_tokens == 5
    assert 0 < row.alpha_ratio < 1 and 0 < row.punct_ratio < 0.2


def test_fingerprint_md5_matches_normalization(docs):
    got = docs.select("doc_id", text.fingerprint_md5(F.col("text")).alias("fp")).collect()
    for r in got:
        raw = dict((i, t) for i, _, t in SAMPLES)[r.doc_id]
        normalized = re.sub(r"\s+", " ", raw.lower().strip())
        assert r.fp == hashlib.md5(normalized.encode()).hexdigest()


def test_winnow_edit_robust_vs_md5(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    edited = base.replace("lazy", "hazy", 1)  # one local edit
    df = spark.createDataFrame([(0, base), (1, edited)], ["doc_id", "text"])
    wf = {r.doc_id: r.winnow_fp for r in text.winnow_table(df).collect()}
    md = {r.doc_id: r.fp for r in df.select("doc_id", text.fingerprint_md5(F.col("text")).alias("fp")).collect()}
    assert md[0] != md[1]  # md5 flips entirely
    # winnow: at least one of the banded min-hashes survives a local edit
    assert set(wf[0].split("-")) & set(wf[1].split("-"))
    # determinism
    wf2 = {r.doc_id: r.winnow_fp for r in text.winnow_table(df).collect()}
    assert wf == wf2


def test_unigram_logprob_quality(spark):
    """Hand-computable corpus: 'a a b' and 'a c' in one language.
    Totals: a=3, b=1, c=1, N=5 → p(a)=.6, p(b)=p(c)=.2."""
    import math

    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text="a a b"),
            Row(doc_id=2, lang="en", text="a c"),
        ]
    )
    out = {r["doc_id"]: r for r in text.unigram_logprob_quality(df).collect()}
    d1 = -(2 * math.log(0.6) + math.log(0.2)) / 3
    d2 = -(math.log(0.6) + math.log(0.2)) / 2
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["avg_neg_logprob"] - d1) < 1e-3
    assert out[2]["n_tokens"] == 2
    assert abs(out[2]["avg_neg_logprob"] - d2) < 1e-3
    # gibberish (rare tokens) scores HIGHER than repetitive text — the signal
    assert out[2]["avg_neg_logprob"] > out[1]["avg_neg_logprob"]


def test_repetition_signals(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            # 4 non-empty lines, 2 distinct → dup_line_frac 0.5;
            Row(doc_id=1, text="aa bb\naa bb\ncc dd\ncc dd"),
            # no repetition at all
            Row(doc_id=2, text="one two three four"),
            # 'ab ab ab ab': 3 overlapping 2-grams, all 'ab ab' → frac 2/3
            Row(doc_id=3, text="ab ab ab ab"),
        ]
    )
    out = {r["doc_id"]: r for r in text.repetition_signals(df).collect()}
    assert out[1]["n_lines"] == 4 and out[1]["dup_line_frac"] == 0.5
    assert out[2]["dup_line_frac"] == 0.0 and out[2]["dup_2gram_frac"] == 0.0
    assert abs(out[3]["dup_2gram_frac"] - round(2 / 3, 4)) < 1e-9


def test_pii_scan(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(source="a", text="mail me at jo@x.io or jo.b@y.org, see https://x.io/p"),
            Row(source="a", text="card 12345678 and 1234567890 here"),
            Row(source="b", text="nothing sensitive"),
        ]
    )
    out = {r["source"]: r for r in text.pii_scan(df).collect()}
    assert out["a"]["total_email"] == 2 and out["a"]["docs_with_email"] == 1
    assert out["a"]["total_url"] == 1
    assert out["a"]["total_long_digits"] == 2 and out["a"]["docs_with_long_digits"] == 1
    assert out["b"]["total_email"] == 0 and out["b"]["n_docs"] == 1


def test_mixing_weights(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(source="big", text="w " * 90),   # 90 tokens
            Row(source="small", text="w " * 10),  # 10 tokens
        ]
    )
    out = {r["source"]: r for r in text.mixing_weights(df, alpha=0.5).collect()}
    assert out["big"]["token_share"] == 0.9
    # alpha<1 upsamples the small domain: sqrt(.9)/(sqrt(.9)+sqrt(.1)) ≈ .75
    assert abs(out["big"]["mix_weight"] - 0.75) < 0.01
    assert abs(out["small"]["mix_weight"] - 0.25) < 0.01
    assert abs(out["big"]["mix_weight"] + out["small"]["mix_weight"] - 1.0) < 1e-6


def test_unigram_broadcast_knob(spark):
    """broadcast_vocab: 'auto' (small vocab) and True plan a
    BroadcastHashJoin for the token→frequency join; False keeps the shuffle
    join for vocabularies beyond broadcast limits; results are identical.

    The hint itself is asserted on the analyzed logical plan: at this toy
    scale BOTH Catalyst's own autoBroadcastJoinThreshold (the persisted
    vocab has exact size stats) and AQE would pick broadcast anyway, so the
    physical plan can't distinguish the knob. The knob matters at 100 TB
    where the vocab exceeds the 10 MB auto threshold but still fits in
    executor memory (hint forces broadcast), or is known-huge (False forces
    the shuffle join)."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en", text=f"alpha beta tok{i % 4}") for i in range(40)]
    )

    def hinted(**kw):
        q = text.unigram_logprob_quality(df, **kw)._jdf.queryExecution()
        return "ResolvedHint" in q.analyzed().toString()

    assert hinted(broadcast_vocab=True)
    assert hinted(broadcast_vocab="auto")
    # auto with a tiny cap plants no hint (Catalyst still decides from real
    # stats), and False never hints
    assert not hinted(broadcast_vocab="auto", auto_broadcast_max_vocab=1)
    assert not hinted(broadcast_vocab=False)

    rows = lambda kw: sorted(
        map(tuple, text.unigram_logprob_quality(df, **kw).collect())
    )
    assert rows({"broadcast_vocab": True}) == rows({"broadcast_vocab": False})


# ---------------------------------------------------------------------------
# Round-5b: bigram LM, sliding chunks
# ---------------------------------------------------------------------------


def _bigram_expected(rows, k=0.5):
    """Pure-Python add-k bigram LM replay (per-lang)."""
    import math
    from collections import Counter, defaultdict

    bi_by_doc, c12, c1, vocab = {}, Counter(), Counter(), defaultdict(set)
    for doc_id, lang, txt in rows:
        w = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9 \t\n]", "", txt.lower().strip())).split(" ")
        if len(w) < 2:
            continue
        bis = list(zip(w, w[1:]))
        bi_by_doc[doc_id] = (lang, bis)
        for a, b in bis:
            c12[(lang, a, b)] += 1
            c1[(lang, a)] += 1
            vocab[lang].update((a, b))
    out = {}
    for doc_id, (lang, bis) in bi_by_doc.items():
        v = len(vocab[lang])
        lps = [
            -math.log((c12[(lang, a, b)] + k) / (c1[(lang, a)] + k * v)) for a, b in bis
        ]
        out[doc_id] = (len(bis), round(sum(lps) / len(lps), 4))
    return out


def test_bigram_logprob_quality_pin(spark):
    rows = [
        (0, "en", "the cat sat on the mat"),
        (1, "en", "the cat sat on the mat"),  # duplicate: most-likely bigrams
        (2, "en", "mat the on sat cat the"),  # same words, broken order
        (3, "en", "one"),  # single token: no bigrams, excluded
        (4, "fr", "le chat dort le chat dort"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = {
        r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
        for r in text.bigram_logprob_quality(df).collect()
    }
    assert got == _bigram_expected(rows)
    # word salad must score strictly worse than the duplicated prose
    assert got[2][1] > got[0][1]
    assert 3 not in got


def test_bigram_broadcast_knob(spark):
    rows = [(i, "en", "alpha beta gamma alpha beta") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    a = {
        (r.doc_id, r.n_bigrams, r.avg_neg_logprob)
        for r in text.bigram_logprob_quality(df, broadcast_model=True).collect()
    }
    b = {
        (r.doc_id, r.n_bigrams, r.avg_neg_logprob)
        for r in text.bigram_logprob_quality(df, broadcast_model=False).collect()
    }
    assert a == b and len(a) == 6


def test_sliding_chunks_properties(spark):
    words = ["w%02d" % i for i in range(53)]
    df = spark.createDataFrame(
        [(0, " ".join(words)), (1, "short doc"), (2, "x")], ["doc_id", "text"]
    )
    ch = text.sliding_chunks(df, chunk_words=20, overlap_words=5).collect()
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r.id, []).append(r)
    # doc 0: starts advance by 15; ceil((53-5)/15) = 4 chunks
    c0 = sorted(by_doc[0], key=lambda r: r.chunk_idx)
    assert [r.chunk_idx for r in c0] == [0, 1, 2, 3]
    for i, r in enumerate(c0):
        expect = words[i * 15 : i * 15 + 20]
        assert r.chunk.split(" ") == expect and r.n_tokens == len(expect)
    # consecutive chunks share exactly the 5-token overlap
    for a, b in zip(c0, c0[1:]):
        assert a.chunk.split(" ")[-5:] == b.chunk.split(" ")[:5]
    # coverage: every token appears in some chunk
    seen = set()
    for r in c0:
        seen.update(r.chunk.split(" "))
    assert seen == set(words)
    # short docs emit exactly one whole-doc chunk
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk == "short doc"
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 1
    with pytest.raises(ValueError):
        text.sliding_chunks(df, chunk_words=10, overlap_words=10)


def test_hashing_trick_embed_matches_python_replay(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "hash join filter scan table"),
        (2, "Punct!!! and CASE folding??"),
        (3, "   "),  # empty after trim: excluded
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: list(r.vec) for r in text.hashing_trick_embed(df, dim=16).collect()}
    assert set(got) == {0, 1, 2}
    for doc_id, raw in rows[:3]:
        assert got[doc_id] == text.hash_embed_py(raw, 16), doc_id
    # a doc is most similar to its own text's query vector
    import math

    q = text.hash_embed_py("hash join filter scan table", 16)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    sims = {i: cos(v, q) for i, v in got.items()}
    assert max(sims, key=sims.get) == 1


def test_dsir_importance_hand_computed(spark):
    """Target = 'a a b'; raw docs: d1='a a' (target-like) and d2='c c'
    (target-disjoint). Model math with k=0.5 over union vocab {a,b,c}:
    the target-like doc must score strictly higher, and d2's tokens never
    appear in the target so its importance is negative."""
    import math

    target = spark.createDataFrame([(100, "a a b")], "doc_id: long, text: string")
    raw = spark.createDataFrame(
        [(1, "a a"), (2, "c c")], "doc_id: long, text: string"
    )
    got = {
        r["doc_id"]: r["importance"]
        for r in text.dsir_importance(raw, target, k_smooth=0.5).collect()
    }
    k, v = 0.5, 3
    n_t, n_r = 3, 4
    def lr(c_t, c_r):
        return math.log((c_t + k) / (n_t + k * v)) - math.log((c_r + k) / (n_r + k * v))
    exp1 = math.floor(lr(2, 2) * 1e4 + 0.5) / 1e4            # 'a' twice
    exp2 = math.floor(lr(0, 2) * 1e4 + 0.5) / 1e4            # 'c' twice
    assert got[1] == pytest.approx(exp1, abs=1e-9)
    assert got[2] == pytest.approx(exp2, abs=1e-9)
    assert got[1] > got[2] and got[2] < 0


def test_chunk_lm_filter_properties(spark):
    """n_chunks == ceil(words/chunk); a doc of corpus-rare tokens has a
    strictly worse (higher) max passage score than one of corpus-common
    tokens; n_bad_chunks is bounded by n_chunks."""
    rows = [(i, "en", "the common words appear here again and again ok yes") for i in range(8)]
    rows.append((100, "en", " ".join(f"rare{j}" for j in range(25))))
    df = spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")
    out = {r["doc_id"]: r for r in text.chunk_lm_filter(df, chunk_words=10, tau=3.0).collect()}
    assert out[100]["n_chunks"] == 3  # 25 words / 10
    assert out[0]["n_chunks"] == 1  # 10 words
    assert out[100]["max_chunk_neg_logprob"] > out[0]["max_chunk_neg_logprob"]
    for r in out.values():
        assert 0 <= r["n_bad_chunks"] <= r["n_chunks"]
    # rare-token doc: every passage is all-rare (each token appears once in
    # the corpus), so all 3 passages exceed tau=3.0 nats for this corpus size
    assert out[100]["n_bad_chunks"] == 3


def test_backoff_trigram_hand_computed(spark):
    """Reference = one doc 'a b c a b d'. Raw doc 'a b c x' has trigrams
    (a,b,c) seen → c3/c2, and (b,c,x) unseen with (c,x) unseen and x OOV →
    the alpha^2 smoothed-unigram floor. Hand-check both arms."""
    import math

    ref = spark.createDataFrame([(0, "a b c a b d")], "doc_id: long, text: string")
    raw = spark.createDataFrame([(1, "a b c x")], "doc_id: long, text: string")
    out = text.backoff_trigram_quality(raw, ref).collect()
    assert len(out) == 1 and out[0]["n_trigrams"] == 2
    # model: c3(a,b,c)=1; c2(a,b)=2,(b,c)=1,(c,a)=1,(b,d)=1; unigrams
    # a:2 b:2 c:1 d:1 -> N=6, V=4
    s1 = 1 / 2  # (a,b,c): c3=1 / c2(a,b)=2
    s2 = 0.4 * 0.4 * (0 + 0.5) / (6 + 0.5 * 4)  # (b,c,x): x OOV
    want = math.floor((-(math.log(s1) + math.log(s2)) / 2) * 1e4 + 0.5) / 1e4
    assert out[0]["avg_neg_logscore"] == pytest.approx(want, abs=1e-9)


def test_backoff_trigram_bigram_arm(spark):
    """Raw trigram (d, a, b): unseen as a trigram but (a, b) IS a reference
    bigram -> the middle backoff arm alpha * c23 / c1(w2)."""
    import math

    ref = spark.createDataFrame([(0, "a b c a b d")], "doc_id: long, text: string")
    raw = spark.createDataFrame([(1, "d a b")], "doc_id: long, text: string")
    out = text.backoff_trigram_quality(raw, ref).collect()
    s = 0.4 * 2 / 2  # c23(a,b)=2, c1(a)=2
    want = math.floor(-math.log(s) * 1e4 + 0.5) / 1e4
    assert out[0]["avg_neg_logscore"] == pytest.approx(want, abs=1e-9)


def test_repetition_stats_planted(spark):
    """Gopher repetition screens: a looping doc is caught by the top-bigram
    fraction, a copy-paste doc by the duplicate-5gram fraction, clean prose
    passes, and sub-gram-order docs score 0.0 (not the clamped 100%)."""
    from custom_columnar_format_spark.operators.text import repetition_stats

    loop = "buy now " * 20                       # one bigram dominates chars
    paste = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    clean = "the quick brown fox jumps over the lazy dog near a quiet river bank today"
    rows = [(1, loop), (2, paste), (3, clean), (4, "solo"), (5, "two words")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in repetition_stats(df, "text", "doc_id").collect()}
    assert got[1]["top_bigram_frac"] > 0.5 and not got[1]["keep"]
    assert got[2]["dup_5gram_frac"] > 0.3 and not got[2]["keep"]
    assert got[3]["keep"]
    assert got[4]["top_bigram_frac"] == 0.0 and got[4]["dup_5gram_frac"] == 0.0
    assert got[5]["dup_5gram_frac"] == 0.0  # 2 words: bigram scored, 5-gram not
