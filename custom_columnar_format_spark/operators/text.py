"""Text-analysis operators for large-scale training-data pipelines:
language-ID (stopword-count heuristic), quality scoring, token counting,
and document fingerprinting.

All of these are expressed with built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd) — at 100 TB a per-row Python UDF here would be the
bottleneck, so there are none. Each returns Column expressions or a
DataFrame transform usable under any partitioning (no shuffles introduced)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._parallel import ensure_parallelism as _ensure_parallelism

# Tiny per-language stopword marker sets for the heuristic language ID.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "que"],
}

WORD_RE = "[A-Za-z0-9]+"


def occurrence_count(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring, computed by length differencing —
    identical semantics in any SQL engine (used for oracle parity)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(needle)
    ).cast("int")


def token_count(text: Column) -> Column:
    """Whitespace-insensitive word-token count (BPE-ish regex token proxy)."""
    return F.size(F.regexp_extract_all(text, F.lit(WORD_RE), 0)).cast("bigint")


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"[ \t\n]+")).cast("bigint")


def char_count(text: Column) -> Column:
    return F.length(text).cast("bigint")


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-scoring signals: length, token stats, punctuation/stopword
    ratios. Classic pre-training corpus filters (C4/Gopher-style rules)."""
    n_chars = F.length(text).cast("bigint")
    toks = F.regexp_extract_all(text, F.lit(WORD_RE), 0)
    n_tokens = F.size(toks).cast("bigint")
    alpha_chars = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("bigint")
    punct_chars = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("bigint")
    stop_hits = occurrence_count(F.concat(F.lit(" "), text, F.lit(" ")), " the ").cast("bigint")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.round(alpha_chars / F.greatest(n_tokens, F.lit(1)), 4),
        "alpha_ratio": F.round(alpha_chars / F.greatest(n_chars, F.lit(1)), 4),
        "punct_ratio": F.round(punct_chars / F.greatest(n_chars, F.lit(1)), 4),
        "stopword_ratio": F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 4),
    }


def quality_score(text: Column) -> Column:
    """Single scalar quality score in [0,1] combining the signals."""
    q = quality_columns(text)
    length_ok = F.when((q["n_tokens"] >= 5) & (q["n_tokens"] <= 100000), 1.0).otherwise(0.0)
    return F.round(
        0.4 * length_ok + 0.4 * q["alpha_ratio"] + 0.2 * F.least(q["stopword_ratio"] * 10, F.lit(1.0)),
        4,
    )


def lang_id(text: Column) -> Column:
    """Heuristic language ID: count per-language stopword-marker occurrences
    (space-padded, substring counting) and pick the argmax, 'und' on zero."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {
        lang: sum(
            (occurrence_count(padded, f" {m} ") for m in markers),
            start=F.lit(0),
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best_score = F.greatest(*scores.values())
    expr = F.lit("und")
    # Deterministic priority order on ties: en > fr > de > es (first match wins
    # via reversed fold so earlier langs take precedence).
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(scores[lang] == best_score, lang).otherwise(expr)
    return F.when(best_score > 0, expr).otherwise(F.lit("und"))


def fingerprint_md5(text: Column) -> Column:
    """Normalized-content fingerprint: md5 of lowercased, whitespace-collapsed
    text. Stable across engines (oracle uses the same normalization)."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"[ \t\n]+", " ")
    return F.md5(normalized.cast("binary"))


def fingerprint_winnow(text: Column, k: int = 8, num_bands: int = 4) -> Column:
    """Winnowing-style content fingerprint: per hash band, the minimum
    12-hex-char md5 prefix over character k-grams — robust to small edits
    (unlike a whole-document md5). Min is taken lexicographically on the
    fixed-width hex strings (== numeric order), which keeps the fingerprint
    byte-identical across engines: any SQL engine with ``md5`` can recompute
    it, so the driver oracle value-checks this op (xxhash64, the previous
    hash, exists in no other engine). Spark-native (sequence + transform +
    array_min), no Python in the loop."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"[ \t\n]+", " ")
    n = F.length(normalized)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: normalized.substr(i, F.lit(k)),
    )
    mins = [
        F.array_min(
            F.transform(grams, lambda g: F.substring(F.md5(F.concat(g, F.lit(f"#b{b}"))), 1, 12))
        )
        for b in range(num_bands)
    ]
    return F.concat_ws("-", *mins)


def winnow_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8, num_bands: int = 4
) -> DataFrame:
    """(id_col, winnow_fp) — same fingerprint as ``fingerprint_winnow`` but
    staged through materialized projections: the normalized text and the
    k-gram array each become real column attributes before a ``transform``
    lambda references them. In the single-expression form Spark re-evaluates
    the nested normalization inside every lambda element — O(chars²) per
    document (same pathology as ``dedup.shingle_table``, measured 26× there)."""
    nt = df.select(
        F.col(id_col), F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"[ \t\n]+", " ").alias("nt")
    )
    grams = nt.select(
        id_col,
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("nt") - (k - 1), F.lit(1))),
            lambda i: F.col("nt").substr(i, F.lit(k)),
        ).alias("grams"),
    )
    mins = [
        F.array_min(
            F.transform(
                F.col("grams"),
                lambda g: F.substring(F.md5(F.concat(g, F.lit(f"#b{b}"))), 1, 12),
            )
        )
        for b in range(num_bands)
    ]
    return grams.select(id_col, F.concat_ws("-", *mins).alias("winnow_fp"))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach all text-analysis columns to a documents DataFrame."""
    t = F.col(text_col)
    q = quality_columns(t)
    out = df
    for name, col in q.items():
        out = out.withColumn(name, col)
    return (
        out.withColumn("token_count", token_count(t))
        .withColumn("lang_pred", lang_id(t))
        .withColumn("quality", quality_score(t))
        .withColumn("fingerprint", fingerprint_md5(t))
    )


def unigram_logprob_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    broadcast_vocab="auto",
    auto_broadcast_max_vocab: int = 500_000,
) -> DataFrame:
    """Per-document language-model quality signal: average negative log
    probability of the doc's tokens under a per-language unigram LM estimated
    from the corpus itself (the cheap stand-in for a KenLM perplexity filter
    — high scores flag gibberish/outlier docs, low scores boilerplate).

    Scale shape: tokens shuffle once into the frequency aggregation; the
    unigram table is vocabulary-sized (≪ corpus). ``broadcast_vocab``
    controls the token→frequency join strategy:

    - ``True``  — broadcast the frequency table (the common case: even a
      100 TB corpus has a vocabulary of millions, far under executor memory,
      so the full token explosion never shuffles a second time);
    - ``False`` — shuffle join co-partitioned on (lang, token), for the
      pathological multilingual/ngram vocabularies that exceed broadcast
      limits;
    - ``"auto"`` (default) — the frequency table is persisted and counted
      (it must be fully computed for either join anyway, so the count is
      ~free), then hinted broadcast iff it has at most
      ``auto_broadcast_max_vocab`` rows. Above the cap no hint is planted,
      but the persisted table's EXACT size statistics remain visible to
      Catalyst, which still upgrades to broadcast when the vocab is under
      ``spark.sql.autoBroadcastJoinThreshold`` — auto means "let real sizes
      decide", with the hint covering the >10 MB-but-fits-in-memory band.
      Note "auto" triggers one eager Spark job at call time.

    Returns (id_col, lang, n_tokens, avg_neg_logprob), neg-logprob in nats,
    rounded to 4 (cross-engine float tolerance).
    """
    from .dedup import normalize_text

    toks = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col).alias("id"),
            F.col(lang_col).alias("lang"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    lang_totals = toks.groupBy("lang").agg(F.count(F.lit(1)).alias("lang_n"))
    freqs = (
        toks.groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("tok_n"))
        .join(lang_totals, "lang")
        .select("lang", "tok", (F.col("tok_n") / F.col("lang_n")).alias("p"))
    )
    if broadcast_vocab == "auto":
        freqs = freqs.persist()
        do_broadcast = freqs.count() <= auto_broadcast_max_vocab
    else:
        do_broadcast = bool(broadcast_vocab)
    return (
        toks.join(F.broadcast(freqs) if do_broadcast else freqs, ["lang", "tok"])
        .groupBy("id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log("p")), 4).alias("avg_neg_logprob"),
        )
        .select(F.col("id").alias(id_col), "lang", "n_tokens", "avg_neg_logprob")
    )


def repetition_signals(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style intra-document repetition signals: the fraction of
    duplicate lines and duplicate word 2-grams within each document
    (Rae et al. 2021 §A1.1 quality rules — boilerplate and template spam
    score high and get filtered).

    All per-row array arithmetic (no shuffle, no UDF): split → filter empty
    → distinct-count ratio. Returns (id, n_lines, dup_line_frac,
    dup_2gram_frac), fractions rounded to 4.
    """
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != F.lit("")
    )
    words = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"[ \t\n]+", " "), " ")
    # all (overlapping) word 2-grams, NOT deduped — the dup fraction needs
    # the multiset; hash pairs directly (no joined strings)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - 2, F.lit(0))),
        lambda i: F.xxhash64(F.try_element_at(words, i + 1), F.try_element_at(words, i + 2)),
    )
    nl, ng = F.size(lines), F.size(grams)
    return df.select(
        F.col(id_col),
        nl.alias("n_lines"),
        F.round(
            F.when(nl > 0, 1 - F.size(F.array_distinct(lines)) / nl).otherwise(0.0), 4
        ).alias("dup_line_frac"),
        F.round(1 - F.size(F.array_distinct(grams)) / ng, 4).alias("dup_2gram_frac"),
    )


#: cross-engine-safe PII-ish patterns (plain classes/quantifiers only — the
#: same regex text compiles identically under Java regex and DuckDB's RE2)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^ \t\n]+",
    "long_digits": r"[0-9]{7,}",
}


def pii_scan(df: DataFrame, text_col: str = "text", group_col: str = "source") -> DataFrame:
    """Per-group PII exposure report: document counts and total match counts
    for each pattern class — the planning stage before a redaction pass.
    One scan, one partial+final aggregate; regexp_count is codegen'd JVM."""
    counts = {k: F.regexp_count(F.col(text_col), F.lit(p)) for k, p in PII_PATTERNS.items()}
    aggs = []
    for k in PII_PATTERNS:
        aggs.append(F.sum(F.col(f"_c_{k}")).cast("bigint").alias(f"total_{k}"))
        aggs.append(
            F.sum(F.when(F.col(f"_c_{k}") > 0, 1).otherwise(0)).cast("bigint").alias(f"docs_with_{k}")
        )
    staged = df.select(
        F.col(group_col), *[c.alias(f"_c_{k}") for k, c in counts.items()]
    )
    return staged.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"), *aggs)


def mixing_weights(
    df: DataFrame, text_col: str = "text", group_col: str = "source", alpha: float = 0.7
) -> DataFrame:
    """Temperature-scaled domain mixing weights: per-group token share s_g,
    sampling weight ∝ s_g^alpha (alpha<1 upsamples small domains — the
    multilingual/multi-domain mixing rule from mT5/XLM-R). One aggregation
    plus a scalar normalizer broadcast back — group cardinality is tiny.
    Returns (group, n_docs, total_tokens, token_share, mix_weight)."""
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).cast("bigint").alias("total_tokens"),
    )
    w = Window.partitionBy()
    share = F.col("total_tokens") / F.sum("total_tokens").over(w)
    powed = F.pow(share, F.lit(alpha))
    return per.select(
        group_col,
        "n_docs",
        "total_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(powed / F.sum(powed).over(w), 6).alias("mix_weight"),
    )


def bigram_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """(id, lang, w1, w2) rows — one per adjacent normalized-token pair, one
    per occurrence (bag semantics). Explode-FIRST like ``dedup.
    gram_postings``: positions are exploded from a codegen-native
    ``sequence`` and each row reads its two tokens with ``element_at``, so
    Generate never re-evaluates a HOF-built array (the measured-160×
    pathology in SCALE.md). Docs with fewer than two tokens emit nothing."""
    from .dedup import normalize_text

    d = _ensure_parallelism(df).filter(F.trim(F.col(text_col)) != "")
    w = d.select(
        F.col(id_col).alias("id"),
        F.col(lang_col).alias("lang"),
        F.split(normalize_text(F.col(text_col)), " ").alias("w"),
    ).filter(F.size("w") >= 2)
    return w.select(
        "id",
        "lang",
        F.explode(F.sequence(F.lit(1), F.size("w") - 1)).alias("_i"),
        "w",
    ).select(
        "id",
        "lang",
        F.element_at("w", F.col("_i")).alias("w1"),
        F.element_at("w", F.col("_i") + 1).alias("w2"),
    )


def bigram_logprob_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    k_smooth: float = 0.5,
    broadcast_model="auto",
    auto_broadcast_max_vocab: int = 500_000,
    persist: bool = True,
) -> DataFrame:
    """Per-document BIGRAM language-model quality signal — the order-2
    upgrade of ``unigram_logprob_quality`` and the closer stand-in for the
    KenLM perplexity filters in CCNet/Dolma-style pipelines: average
    negative log P(w2 | w1) over the doc's adjacent token pairs, under a
    per-language add-k–smoothed conditional estimated from the corpus
    itself:

        P(w2 | w1) = (c(w1,w2) + k) / (c(w1·) + k·V_lang)

    with c(w1·) the count of w1 as a bigram LEFT context and V_lang the
    language's distinct-token vocabulary (so unseen continuations share
    k/(c+kV) mass). High scores flag gibberish / word-salad docs that a
    unigram model cannot distinguish from normal prose (same words, broken
    order); low scores flag templated boilerplate.

    Scale shape: ONE pass builds the posting stream (``bigram_postings``),
    which shuffles once into the (lang, w1, w2) count; context counts
    c(w1·) derive from the bigram table itself (vocab-sized input, not a
    second corpus pass) and V_lang from a distinct-aggregate over it. The
    scoring join follows the same stats-driven ``broadcast_model`` policy
    as the unigram operator: broadcast the vocab²-bounded model table when
    small ("auto" counts it — one eager job), shuffle co-partitioned on
    (lang, w1, w2) otherwise; the corpus-sized posting stream is never
    broadcast.

    Cache lifecycle (same contract as minhash/funnel): under
    ``broadcast_model="auto"`` the model table is persisted for the sizing
    count AND STAYS cached for the join — on the broadcast path too, since
    "re-reads the plan anyway" means re-DERIVING the model from the full
    posting stream unless the cache feeds the BroadcastExchange (measured:
    unpersisting after the count cost +130% end-to-end at sf0.1, round-6
    bench). The table is vocab-bounded — small by the same argument that
    makes it broadcastable. The CALLER owns the unpersist
    (``spark.catalog.clearCache()`` in the harness); ``persist=False``
    skips caching entirely at the cost of recomputing the model.

    Returns (id_col, lang, n_bigrams, avg_neg_logprob) in nats, rounded 4
    via the cross-engine floor(x*1e4+0.5)/1e4 idiom (engine-native ROUND
    half-cases differ between Spark and DuckDB).
    """
    bi = bigram_postings(df, text_col, id_col, lang_col)
    counts = bi.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = counts.groupBy("lang", "w1").agg(F.sum("c12").alias("c1"))
    # V_lang from the vocab²-bounded counts table, not the raw posting
    # stream (r12, guide §2.4): counts carries every distinct (lang,w1,w2),
    # so the distinct token set per lang is identical — and the corpus-wide
    # posting pass this branch used to make becomes a ReusedExchange of the
    # counts aggregation. r11 A/B'd this at sf0.1 and measured +10% (the
    # extra aggregation depth cost more than the saved pass at 5k docs);
    # re-A/B at x5 per r11 VERDICT #5 it wins where it matters: x5 warm
    # best-of-3 stash A/B in OPTIMIZATION_r12.md.
    vocab = (
        counts.select("lang", F.explode(F.array("w1", "w2")).alias("tok"))
        .groupBy("lang")
        .agg(F.countDistinct("tok").alias("v"))
    )
    model = (
        counts.join(ctx, ["lang", "w1"])
        .join(vocab, "lang")
        .select(
            "lang",
            "w1",
            "w2",
            ((F.col("c12") + F.lit(k_smooth)) / (F.col("c1") + F.lit(k_smooth) * F.col("v"))).alias("p"),
        )
    )
    if broadcast_model == "auto":
        if persist:
            model = model.persist()
        do_broadcast = model.count() <= auto_broadcast_max_vocab
    else:
        do_broadcast = bool(broadcast_model)
    return (
        bi.join(F.broadcast(model) if do_broadcast else model, ["lang", "w1", "w2"])
        .groupBy("id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.floor(F.avg(-F.log("p")) * 1e4 + 0.5) / 1e4).alias("avg_neg_logprob"),
        )
        .select(F.col("id").alias(id_col), "lang", "n_bigrams", "avg_neg_logprob")
    )


def sliding_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 40,
    overlap_words: int = 10,
    keep_cols=(),
) -> DataFrame:
    """RAG-style SLIDING-window chunker: normalized tokens re-joined into
    ``chunk_words``-token chunks whose starts advance by ``chunk_words −
    overlap_words`` (consecutive chunks share ``overlap_words`` tokens, so
    an answer spanning a boundary is wholly inside at least one chunk).
    The serving-side twin of ``dedup.chunk_postings`` (whose disjoint
    chunks feed dedup, not retrieval).

    Explode-first / codegen-native like the other chunkers: start indices
    come from one ``sequence`` per doc, each output row slices its own
    window — no HOF array under Generate, no shuffle at all (pure narrow
    map; at 100 TB this runs at scan speed and the chunk table partitions
    like its parent).

    Emits (id, [keep_cols...], chunk_idx, n_tokens, chunk); the final chunk
    may be shorter than ``chunk_words`` and a doc shorter than one window
    emits a single whole-doc chunk. ``overlap_words`` must be <
    ``chunk_words``."""
    from .dedup import normalize_text

    if not 0 <= overlap_words < chunk_words:
        raise ValueError("need 0 <= overlap_words < chunk_words")
    step = chunk_words - overlap_words
    d = df.filter(F.trim(F.col(text_col)) != "")
    w = d.select(
        F.col(id_col).alias("id"),
        *keep_cols,
        F.split(normalize_text(F.col(text_col)), " ").alias("w"),
    )
    # last start s satisfies s < size(w) - overlap (a chunk must add ≥1 new
    # token); equivalently n_chunks = ceil((size - overlap) / step)
    n_chunks = F.ceil((F.size("w") - F.lit(overlap_words)) / F.lit(step)).cast("bigint")
    return w.select(
        "id",
        *keep_cols,
        "w",
        F.explode(F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1)).alias("chunk_idx"),
    ).select(
        "id",
        *keep_cols,
        "chunk_idx",
        F.least(
            F.lit(chunk_words), F.size("w") - F.col("chunk_idx") * step
        ).alias("n_tokens"),
        F.concat_ws(" ", F.slice(F.col("w"), F.col("chunk_idx") * step + 1, chunk_words)).alias(
            "chunk"
        ),
    )


def hashing_trick_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 32,
) -> DataFrame:
    """Feature-hashing ("hashing trick") text embeddings — model-free
    ``dim``-dimensional document vectors: each normalized token is hashed
    to a bucket (first 48 md5 bits, mod dim) with a ±1 sign (13th hex
    digit's parity, the signed-hashing variance fix from Weinberger et al.
    2009), and a document's vector is the per-bucket signed token count.
    Deterministic on any engine (md5 arithmetic, no model weights), so
    text→vector→cosine retrieval becomes fully oracle-replayable.

    Scale shape: one explode-first token stream (no HOF under Generate),
    one shuffle into a per-doc aggregate of ``dim`` conditional sums (the
    SimHash pattern — partial aggregation combines map-side, so the
    shuffle carries one ``dim``-int row per doc per partition, never raw
    tokens). Returns (id_col, vec: array<double>).
    """
    from .dedup import normalize_text

    d = _ensure_parallelism(df).filter(F.trim(F.col(text_col)) != "")
    toks = (
        d.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    m = toks.select("id", F.md5("tok").alias("m"))
    h = m.select(
        "id",
        (F.conv(F.substring("m", 1, 12), 16, 10).cast("bigint") % dim).alias("b"),
        F.when(
            F.conv(F.substring("m", 13, 1), 16, 10).cast("int") % 2 == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0)).alias("s"),
    )
    agg = h.groupBy("id").agg(
        *[
            F.sum(F.when(F.col("b") == j, F.col("s")).otherwise(0.0)).alias(f"_v{j}")
            for j in range(dim)
        ]
    )
    return agg.select(
        F.col("id").alias(id_col), F.array(*[F.col(f"_v{j}") for j in range(dim)]).alias("vec")
    )


def hash_embed_py(text: str, dim: int = 32) -> list:
    """Driver-side replay of ``hashing_trick_embed`` for a literal query
    string — same normalization and md5 bucket/sign math, so a query vector
    computed here is bit-identical to what the engine would produce."""
    import hashlib
    import re as _re

    t = _re.sub(
        r"[ \t\n]+", " ", _re.sub(r"[^a-z0-9 \t\n]", "", text.lower().strip())
    )
    v = [0.0] * dim
    for tok in t.split(" "):
        if not tok:
            continue
        h = hashlib.md5(tok.encode()).hexdigest()
        b = int(h[:12], 16) % dim
        v[b] += 1.0 if int(h[12], 16) % 2 == 0 else -1.0
    return v


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_smooth: float = 0.5,
    broadcast_model="auto",
    auto_broadcast_max_vocab: int = 1_000_000,
    persist: bool = True,
) -> DataFrame:
    """DSIR-style importance scoring for domain-matched data selection
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling"): score every RAW-corpus document by how much more likely
    its tokens are under the TARGET domain's unigram model than under the
    raw corpus's own —

        importance(doc) = avg over tokens of
            ln P_target(tok) − ln P_raw(tok)

    with both models add-k smoothed over the UNION vocabulary (so a token
    seen only on one side still gets finite mass on the other). High
    scores = looks like the target domain; resampling raw data by these
    weights is the standard way to tilt a web crawl toward a
    quality/domain reference corpus.

    Scale shape: ONE posting pass over target ∪ raw feeds a single
    (tok → c_target, c_all) aggregate; the three model scalars (N_t, N_r,
    |V|) come from a 1-row collect on that vocab-bounded table and ride
    the plan as literals (no 1-row join for Catalyst to fold into a
    BNLJ). The scoring join follows the fleet's broadcast-the-model-iff-
    small policy; the corpus-sized posting stream is never broadcast.
    Cache lifecycle mirrors bigram_logprob_quality: with ``persist=True``
    the vocab-bounded counts table stays cached on EVERY path (eagerly
    unpersisting on the broadcast-wins path would force the lazy
    BroadcastExchange to recompute the whole posting aggregate at
    execution time — the exact +130% bug r6 fixed in the bigram scorer);
    the CALLER owns the unpersist/clearCache once the result is
    materialized.

    Returns (id_col, n_tokens, importance) over RAW docs, importance in
    nats rounded via the cross-engine floor(x*1e4+0.5)/1e4 idiom.
    """
    from .dedup import normalize_text

    def postings(df: DataFrame, flag: int) -> DataFrame:
        return (
            df.filter(F.trim(F.col(text_col)) != "")
            .select(
                F.col(id_col).alias("id"),
                F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
                F.lit(flag).alias("_t"),
            )
            .filter(F.col("tok") != "")
        )

    toks = postings(target, 1).unionByName(postings(raw, 0))
    counts = toks.groupBy("tok").agg(
        F.sum("_t").alias("c_t"), F.count(F.lit(1)).alias("c_all")
    )
    if persist:
        # stays cached through the scoring join (vocab-bounded; caller
        # owns the unpersist — see bigram_logprob_quality's lifecycle note)
        counts = counts.persist()
    row = counts.agg(
        F.sum("c_t").alias("n_t"),
        F.sum(F.col("c_all") - F.col("c_t")).alias("n_r"),
        F.count(F.lit(1)).alias("v"),
    ).first()
    n_t, n_r, v = (row["n_t"] or 0), (row["n_r"] or 0), (row["v"] or 0)
    if broadcast_model == "auto":
        do_broadcast = v <= auto_broadcast_max_vocab
    else:
        do_broadcast = bool(broadcast_model)
    k = float(k_smooth)
    logratio = F.log(
        (F.col("c_t") + F.lit(k)) / F.lit(n_t + k * v)
    ) - F.log((F.col("c_all") - F.col("c_t") + F.lit(k)) / F.lit(n_r + k * v))
    model = counts.select("tok", logratio.alias("lr"))
    return (
        postings(raw, 0)
        .join(F.broadcast(model) if do_broadcast else model, "tok")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.floor(F.avg("lr") * 1e4 + 0.5) / 1e4).alias("importance"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "importance")
    )


def chunk_lm_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    chunk_words: int = 10,
    tau: float = 7.0,
    broadcast_vocab="auto",
    auto_broadcast_max_vocab: int = 500_000,
    persist: bool = True,
) -> DataFrame:
    """CCNet-style PER-PASSAGE language-model filtering (Wenzek et al.
    2020 score paragraphs, not documents, so one spammy block can't sink —
    or hide inside — an otherwise good page): split each doc into disjoint
    ``chunk_words``-token passages, score every passage's average token
    negative logprob under the corpus per-language unigram LM, and roll up
    per document:

    - ``n_chunks``   — passages scored;
    - ``max_chunk_neg_logprob`` — the WORST passage (rounded 1e-4);
    - ``n_bad_chunks`` — passages whose floor-rounded score exceeds
      ``tau`` nats (integer-exact comparison on floor(s*1e4+0.5), so a
      passage sitting ulps from the threshold cannot flip between
      engines).

    Scale shape: chunking is the zero-shuffle narrow map of
    ``sliding_chunks`` (overlap 0); the token→frequency join follows the
    unigram operator's broadcast-iff-small policy; per-passage and
    per-doc rollups are partial+final hash aggregates keyed by (doc,
    chunk) then doc. Same cache lifecycle contract as the LM siblings.

    Returns (id_col, lang, n_chunks, max_chunk_neg_logprob, n_bad_chunks).
    """
    from .dedup import normalize_text

    chunks = sliding_chunks(
        df.withColumn("__lang", F.col(lang_col)),
        text_col,
        id_col,
        chunk_words=chunk_words,
        overlap_words=0,
        keep_cols=("__lang",),
    ).select("id", F.col("__lang").alias("lang"), "chunk_idx", "chunk")

    corpus_toks = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(lang_col).alias("lang"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    lang_totals = corpus_toks.groupBy("lang").agg(F.count(F.lit(1)).alias("lang_n"))
    freqs = (
        corpus_toks.groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("tok_n"))
        .join(lang_totals, "lang")
        .select("lang", "tok", (F.col("tok_n") / F.col("lang_n")).alias("p"))
    )
    if broadcast_vocab == "auto":
        if persist:
            # stays cached through the scoring join (vocab-bounded; caller
            # owns the unpersist — see bigram_logprob_quality's note)
            freqs = freqs.persist()
        do_broadcast = freqs.count() <= auto_broadcast_max_vocab
    else:
        do_broadcast = bool(broadcast_vocab)

    ctoks = chunks.select(
        "id", "lang", "chunk_idx", F.explode(F.split("chunk", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    per_chunk = (
        ctoks.join(F.broadcast(freqs) if do_broadcast else freqs, ["lang", "tok"])
        .groupBy("id", "lang", "chunk_idx")
        .agg(F.floor(F.avg(-F.log("p")) * 1e4 + 0.5).cast("long").alias("s4"))
    )
    return (
        per_chunk.groupBy("id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            (F.max("s4") / 1e4).alias("max_chunk_neg_logprob"),
            F.sum(F.when(F.col("s4") > F.lit(int(round(tau * 1e4))), 1).otherwise(0)).alias(
                "n_bad_chunks"
            ),
        )
        .select(
            F.col("id").alias(id_col),
            "lang",
            "n_chunks",
            "max_chunk_neg_logprob",
            "n_bad_chunks",
        )
    )


def backoff_trigram_quality(
    raw: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    k_smooth: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Cross-domain TRIGRAM perplexity filtering with stupid backoff
    (Brants et al. 2007) — the actual CCNet mechanism: an n-gram model
    trained on a small high-quality REFERENCE corpus (Wikipedia, in the
    paper) scores the raw crawl, and docs far from the reference
    distribution are binned away. Unlike the in-corpus unigram/bigram
    scorers (where every scored n-gram exists in the model by
    construction), here unseen trigrams are EXPECTED and the backoff chain
    does real work:

        S(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)          if seen
                      = alpha * c(w2 w3) / c(w2)          else if seen
                      = alpha^2 * (c(w3)+k) / (N + k*V)   else (smoothed
                        unigram floor — OOV tokens get k/(N+kV), never 0)

    Per-doc score = avg over trigram positions of −ln S, rounded via the
    floor(x*1e4+0.5)/1e4 idiom.

    Scale shape: the reference corpus is SMALL by definition (that is the
    CCNet design), so its trigram/bigram/unigram count tables broadcast;
    the raw posting stream is scored by four broadcast joins (c3 on the
    trigram, c23 on (w2,w3), c(w2), c(w3)) and never shuffles except into
    the final per-doc aggregate. N/V ride as literals from a 1-row
    collect. With ``broadcast_model=False`` every join falls back to
    co-partitioned shuffles for an oversized reference.

    Returns (id_col, n_trigrams, avg_neg_logscore) over raw docs with
    ≥ 3 tokens.
    """
    from .dedup import normalize_text

    def words(df: DataFrame, with_id: bool) -> DataFrame:
        cols = [F.col(id_col).alias("id")] if with_id else []
        return (
            df.filter(F.trim(F.col(text_col)) != "")
            .select(
                *cols,
                F.filter(
                    F.split(normalize_text(F.col(text_col)), " "),
                    lambda x: x != F.lit(""),
                ).alias("w"),
            )
        )

    def ngrams(df: DataFrame, n: int, with_id: bool) -> DataFrame:
        cols = (["id"] if with_id else []) + ["w"]
        base = df.select(
            *cols, F.explode(F.expr(f"sequence(1, size(w) - {n - 1})")).alias("i")
        ).filter(F.size("w") >= n)
        out = (["id"] if with_id else []) + [
            F.expr(f"w[i - 1 + {j}]").alias(f"w{j + 1}") for j in range(n)
        ]
        return base.select(*out)

    ref = words(reference, with_id=False)
    c3 = ngrams(ref, 3, False).groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c3"))
    c2 = ngrams(ref, 2, False).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = (
        ref.select(F.explode("w").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    row = c1.agg(F.sum("c1").alias("n"), F.count(F.lit(1)).alias("v")).first()
    n_tot, v = (row["n"] or 0), (row["v"] or 0)
    k, a = float(k_smooth), float(alpha)

    def mb(df):
        return F.broadcast(df) if broadcast_model else df

    tri = ngrams(words(raw, with_id=True), 3, True)
    c23 = c2.select(F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c2").alias("c23"))
    scored = (
        tri.join(mb(c3), ["w1", "w2", "w3"], "left")
        .join(mb(c2), ["w1", "w2"], "left")
        .join(mb(c23), ["w2", "w3"], "left")
        .join(mb(c1.select(F.col("w1").alias("w2"), F.col("c1").alias("c1_w2"))), ["w2"], "left")
        .join(mb(c1.select(F.col("w1").alias("w3"), F.col("c1").alias("c1_w3"))), ["w3"], "left")
    )
    s = (
        F.when(F.col("c3").isNotNull(), F.col("c3") / F.col("c2"))
        .when(F.col("c23").isNotNull(), F.lit(a) * F.col("c23") / F.col("c1_w2"))
        .otherwise(
            F.lit(a * a)
            * (F.coalesce(F.col("c1_w3"), F.lit(0)) + F.lit(k))
            / F.lit(n_tot + k * v)
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            (F.floor(F.avg(-F.log(s)) * 1e4 + 0.5) / 1e4).alias("avg_neg_logscore"),
        )
        .select(F.col("id").alias(id_col), "n_trigrams", "avg_neg_logscore")
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_max_frac: float = 0.20,
    dup_max_frac: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1: boilerplate
    and generation loops show up as one n-gram dominating the character
    mass, or as wholesale repeated passages):

    - ``top_bigram_frac`` — characters covered by the most frequent word
      bigram (count × gram length, clamped to 1.0 — overlapping
      occurrences can over-count) over the normalized doc length;
    - ``dup_5gram_frac`` — fraction of 5-gram OCCURRENCES that are
      repeats of an earlier occurrence, i.e. (n − distinct)/n;
    - ``keep`` — both fracs at-or-under their Gopher-style thresholds
      (0.20 / 0.30), compared on the floor-rounded 1e-4 values so an
      engine's ulp cannot flip the flag.

    Docs with fewer words than the gram order score 0.0 on that stat (the
    clamped whole-text gram would otherwise brand every one-word doc 100%
    repetitive). Scale shape: two explode-first posting passes
    (``gram_postings`` — no HOF-array Generate trap), per-doc partial+
    final aggregates, a doc-keyed window over the tiny per-(doc, bigram)
    count table, three doc-keyed joins; nothing corpus-scale is ever
    broadcast or windowed globally."""
    from .dedup import gram_postings, normalize_text

    norm = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("t")
    )
    meta = norm.select(
        "id",
        F.size(F.split(F.col("t"), " ")).alias("nw"),
        F.length("t").alias("chars"),
    )
    big = (
        gram_postings(df, text_col, id_col, k=2)
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("gram"))
    top = (
        big.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", F.col("gram").alias("top_gram"), F.col("cnt").alias("top_cnt"))
    )
    five = (
        gram_postings(df, text_col, id_col, k=5)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n5"), F.countDistinct("gram").alias("d5"))
    )
    top_frac = F.when(
        F.col("nw") >= 2,
        F.least(F.lit(1.0), F.col("top_cnt") * F.length("top_gram") / F.col("chars")),
    ).otherwise(F.lit(0.0))
    dup_frac = F.when(
        F.col("nw") >= 5,
        (F.col("n5") - F.col("d5")) / F.col("n5").cast("double"),
    ).otherwise(F.lit(0.0))
    r4 = lambda c: F.floor(c * 1e4 + 0.5) / 1e4  # noqa: E731
    return (
        meta.join(top, "id")
        .join(five, "id")
        .select(
            F.col("id").alias(id_col),
            r4(top_frac).alias("top_bigram_frac"),
            r4(dup_frac).alias("dup_5gram_frac"),
        )
        .withColumn(
            "keep",
            (F.col("top_bigram_frac") <= top_max_frac)
            & (F.col("dup_5gram_frac") <= dup_max_frac),
        )
    )
