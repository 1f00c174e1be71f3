"""Property-based fuzz for the round-7 dedup operators: random small corpora
from a collision-prone alphabet, engine results vs pure-python references.
Few examples (each runs Spark jobs) but unconstrained shapes — the edge mesh
(empty docs, all-identical docs, sub-block docs, whitespace runs) that
hand-written cases miss.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from custom_columnar_format_spark.operators import dedup

# short words over a 3-letter alphabet + digits → heavy cross-doc collisions
_word = st.text(alphabet="abc12", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _norm(t: str) -> str:
    """Python twin of dedup.normalize_text (explicit [ \\t\\n] class)."""
    t = t.strip().lower()
    t = re.sub(r"[^a-z0-9 \t\n]", "", t)
    return re.sub(r"[ \t\n]+", " ", t)


def _brute_spans(texts: dict, k: int):
    blocks = {i: [t[j * k : (j + 1) * k] for j in range(len(t) // k)] for i, t in texts.items()}
    df: dict = {}
    for i, bs in blocks.items():
        for b in set(bs):
            df[b] = df.get(b, 0) + 1
    out = {}
    for i, bs in blocks.items():
        dup = [j for j, b in enumerate(bs) if df[b] >= 2]
        if not dup:
            continue
        spans, start, prev = [], dup[0], dup[0]
        for j in dup[1:]:
            if j == prev + 1:
                prev = j
            else:
                spans.append(prev - start + 1)
                start = prev = j
        spans.append(prev - start + 1)
        out[i] = (len(spans), sum(spans), max(spans) * k)
    return out


@settings(max_examples=8, deadline=None)
@given(_corpus)
def test_duplicate_block_spans_fuzz(spark, corpus):
    k = 5
    texts = {i: t for i, t in enumerate(corpus) if t.strip()}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id: long, text: string"
    )
    got = {
        r.id: (r.n_spans, r.dup_blocks, r.max_span_chars)
        for r in dedup.duplicate_block_spans(df, "text", "doc_id", block_chars=k).collect()
    }
    assert got == _brute_spans(texts, k)


def _brute_snm(texts: dict, window: int, threshold: float, prefix: int):
    rows = []
    for i, t in texts.items():
        n = _norm(t)
        if not n:
            continue
        rows.append((n[:prefix], n, i, set(n.split(" "))))
    pairs = {}
    # group by block, sort by (norm, id), compare to next `window` neighbors
    from collections import defaultdict

    blocks = defaultdict(list)
    for blk, n, i, ws in rows:
        blocks[blk].append((n, i, ws))
    for blk, members in blocks.items():
        members.sort(key=lambda x: (x[0], x[1]))
        for a in range(len(members)):
            for d in range(1, window + 1):
                b = a + d
                if b >= len(members):
                    break
                sa, sb = members[a][2], members[b][2]
                inter = len(sa & sb)
                j = inter / (len(sa) + len(sb) - inter)
                if j >= threshold:
                    import math

                    lo, hi = sorted((members[a][1], members[b][1]))
                    # engine's cross-engine rounding idiom, not banker's round
                    pairs[(lo, hi)] = math.floor(j * 10000 + 0.5) / 10000
    return pairs


@settings(max_examples=8, deadline=None)
@given(_corpus)
def test_sorted_neighborhood_fuzz(spark, corpus):
    texts = {i: t for i, t in enumerate(corpus)}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id: long, text: string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.sorted_neighborhood_pairs(
            df, "text", "doc_id", window=2, threshold=0.4, block_prefix_chars=2
        ).collect()
    }
    ref = _brute_snm(texts, window=2, threshold=0.4, prefix=2)
    assert set(got) == set(ref)
    for pair, j in got.items():
        assert abs(j - ref[pair]) < 1e-9


# ---------------------------------------------------------------------------
# round-8 CDC ExactSubstr: engine vs pure-python (hashlib) reference
# ---------------------------------------------------------------------------

# mixed ASCII + BMP unicode (multi-byte UTF-8, no combining marks): Spark
# substr/length count code points like Python, while md5 hashes the UTF-8
# bytes — the fuzz proves the two stay aligned
_uword = st.text(alphabet="ab1 é日", min_size=1, max_size=6)
_udoc = st.lists(_uword, min_size=0, max_size=10).map(" ".join)
_ucorpus = st.lists(_udoc, min_size=1, max_size=8)

_CDC_W = 4
_CDC_MINC = 4


def _py_cdc_chunks(t: str, w: int = _CDC_W) -> list[str]:
    """Python twin of dedup.cdc_chunks: interior anchor at 1-based position
    i in [w, n-1] iff md5(utf8 of the trailing w chars) ends in '0'."""
    import hashlib

    n = len(t)
    bounds = [0]
    if n > w:
        for i in range(w, n):  # positions w..n-1
            win = t[i - w : i]
            if hashlib.md5(win.encode("utf-8")).hexdigest()[-1] == "0":
                bounds.append(i)
    bounds.append(n)
    return [t[bounds[j] : bounds[j + 1]] for j in range(len(bounds) - 1)]


def _py_clean(texts: dict, w: int, minc: int):
    from collections import defaultdict

    chunks = {i: _py_cdc_chunks(t, w) for i, t in texts.items()}
    occ = defaultdict(list)
    for i, cs in chunks.items():
        for idx, c in enumerate(cs):
            if len(c) >= minc:
                occ[c].append((i, idx))
    dup = {c: min(v) for c, v in occ.items() if len({i for i, _ in v}) >= 2}
    out = {}
    for i, cs in chunks.items():
        cut = [c in dup and dup[c] != (i, idx) for idx, c in enumerate(cs)]
        out[i] = (
            "".join(c for c, x in zip(cs, cut) if not x),
            sum(len(c) for c, x in zip(cs, cut) if x),
        )
    return out


@settings(max_examples=8, deadline=None)
@given(_ucorpus)
def test_cdc_chunks_fuzz_matches_python_md5(spark, corpus):
    import hashlib

    texts = {i: t for i, t in enumerate(corpus) if t.strip()}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id: long, text: string"
    )
    got = {}
    for r in dedup.cdc_chunks(df, "text", "doc_id", window=_CDC_W, with_text=True).collect():
        got.setdefault(r.id, {})[r.chunk_idx] = (r.chunk, r.chunk_len, r.chunk_hash)
    ref = {
        i: {
            idx: (c, len(c), hashlib.md5(c.encode("utf-8")).hexdigest())
            for idx, c in enumerate(_py_cdc_chunks(t))
        }
        for i, t in texts.items()
    }
    assert got == ref


@settings(max_examples=8, deadline=None)
@given(_ucorpus)
def test_exactsubstr_clean_fuzz_matches_python(spark, corpus):
    texts = {i: t for i, t in enumerate(corpus) if t.strip()}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id: long, text: string"
    )
    got = {
        r.id: (r.clean_text, r.chars_removed)
        for r in dedup.exactsubstr_clean(
            df, "text", "doc_id", window=_CDC_W, min_chunk=_CDC_MINC
        ).collect()
    }
    assert got == _py_clean(texts, _CDC_W, _CDC_MINC)


# ---------------------------------------------------------------------------
# round-8 incremental operators: engine vs pure-python (hashlib) replays
# ---------------------------------------------------------------------------

_MASK48 = (1 << 48) - 1


def _py_km_sig(text: str, k: int = 3, num_hashes: int = 64) -> list[int] | None:
    """Pure-python replay of the km-md5 MinHash signature (gram_table +
    km_hash_table + minhash_signature_km), independent of Spark."""
    import hashlib

    w = _norm(text).split(" ")
    if not any(w):
        return None
    grams = sorted({" ".join(w[i : i + k]) for i in range(max(len(w) - k + 1, 1))})
    hs = []
    for g in grams:
        hx = hashlib.md5(g.encode("utf-8")).hexdigest()
        hs.append((int(hx[:12], 16), int(hx[12:24], 16) | 1))
    return [
        min((h1 + j * h2) & _MASK48 for h1, h2 in hs) for j in range(num_hashes)
    ]


def _py_history_matches(texts: dict, est_threshold: float = 0.5):
    """Replay of minhash_history_matches over a parity split: batch = even
    ids, history = odd ids; candidates on >= 1 equal 4-slice band."""
    sigs = {i: _py_km_sig(t) for i, t in texts.items()}
    sigs = {i: s for i, s in sigs.items() if s is not None}
    out = {}
    for i, si in sigs.items():
        if i % 2 != 0:
            continue
        for j, sj in sigs.items():
            if j % 2 == 0:
                continue
            if any(si[b * 4 : b * 4 + 4] == sj[b * 4 : b * 4 + 4] for b in range(16)):
                est = sum(a == b for a, b in zip(si, sj)) / 64.0
                import math

                est = math.floor(est * 1e4 + 0.5) / 1e4
                if est >= est_threshold:
                    out[(i, j)] = est
    return out


@settings(max_examples=6, deadline=None)
@given(_corpus)
def test_minhash_history_matches_fuzz_matches_python(spark, corpus):
    from pyspark.sql import functions as F

    texts = {i: t for i, t in enumerate(corpus)}
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id: long, text: string"
    )
    batch = df.filter(F.col("doc_id") % 2 == 0)
    hist = df.filter(F.col("doc_id") % 2 != 0)
    hist_sigs = dedup.minhash_signatures(hist, "text", "doc_id")
    got = {
        (r.id_new, r.id_hist): r.est_jaccard
        for r in dedup.minhash_history_matches(
            batch, hist_sigs, "text", "doc_id", est_threshold=0.5
        ).collect()
    }
    assert got == _py_history_matches(texts, 0.5)


def _py_clean_incremental(texts: dict, w: int, minc: int):
    """Replay of exactsubstr_clean_incremental over a parity split: history
    = odd ids (its qualifying chunk set), batch = even ids."""
    from collections import defaultdict

    hist_hashes = set()
    for i, t in texts.items():
        if i % 2 != 0 and t.strip():
            for c in _py_cdc_chunks(t, w):
                if len(c) >= minc:
                    hist_hashes.add(c)
    batch = {i: t for i, t in texts.items() if i % 2 == 0 and t.strip()}
    chunks = {i: _py_cdc_chunks(t, w) for i, t in batch.items()}
    occ = defaultdict(list)
    for i, cs in chunks.items():
        for idx, c in enumerate(cs):
            if len(c) >= minc:
                occ[c].append((i, idx))
    keeper = {c: min(v) for c, v in occ.items() if len({i for i, _ in v}) >= 2}
    out = {}
    for i, cs in chunks.items():
        cut = [
            len(c) >= minc
            and (c in hist_hashes or (c in keeper and keeper[c] != (i, idx)))
            for idx, c in enumerate(cs)
        ]
        out[i] = (
            "".join(c for c, x in zip(cs, cut) if not x),
            sum(len(c) for c, x in zip(cs, cut) if x),
        )
    return out


@settings(max_examples=6, deadline=None)
@given(_ucorpus)
def test_exactsubstr_clean_incremental_fuzz_matches_python(spark, corpus):
    from pyspark.sql import functions as F

    texts = {i: t for i, t in enumerate(corpus)}
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id: long, text: string"
    )
    batch = df.filter(F.col("doc_id") % 2 == 0)
    hist = df.filter(F.col("doc_id") % 2 != 0)
    hist_hashes = (
        dedup.cdc_chunks(hist, "text", "doc_id", window=_CDC_W)
        .filter(F.col("chunk_len") >= _CDC_MINC)
        .select("chunk_hash")
    )
    got = {
        r.id: (r.clean_text, r.chars_removed)
        for r in dedup.exactsubstr_clean_incremental(
            batch, hist_hashes, "text", "doc_id", window=_CDC_W, min_chunk=_CDC_MINC
        ).collect()
    }
    assert got == _py_clean_incremental(texts, _CDC_W, _CDC_MINC)
