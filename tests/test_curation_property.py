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
