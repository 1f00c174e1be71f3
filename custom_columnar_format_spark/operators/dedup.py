"""Deduplication operators for training-data pipelines, at six fidelities:

- exact (hash groupBy on raw or normalized content)
- MinHash + LSH banding (near-dup candidate pairs → verified Jaccard)
- SimHash (64-bit, Hamming-bucketed)
- n-gram Jaccard via shingle inverted index
- exact duplicated SUBSTRINGS via content-defined chunking (``cdc_chunks``
  / ``duplicate_chunk_spans`` — offset-invariant ExactSubstr spans — and
  ``exactsubstr_clean``, which cuts them and re-emits the corpus)
- embedding-cosine near-dup (see ``operators.similarity``)

Each tier also has an INCREMENTAL form for continuously-crawled corpora
(new batch vs stored history artifacts, bodies never re-read):
``incremental_dedup`` (content digests), ``exactsubstr_clean_incremental``
(chunk digests), ``minhash_history_matches`` (MinHash signatures).

Scale design (the point — these must work at 100 TB):
- Shingling/hashing is all JVM-side (``split``/``transform``/``xxhash64``/
  ``array_min``) — no Python in the per-row path.
- MinHash-LSH does NOT compare all pairs: docs are bucketed by per-band
  signature hash and only same-bucket pairs are joined — the standard
  sub-quadratic LSH join. The band table is (num_bands ×) bigger than the
  corpus but each row is (band_id, hash, doc_id) — tiny and shuffle-friendly.
- Candidate pairs are verified with exact Jaccard over shingle-hash arrays
  (``array_intersect``/``array_union`` on deduplicated shingle sets).
- Huge buckets (degenerate content, e.g. boilerplate) are capped via a
  bucket-size filter to bound the per-bucket quadratic blowup — at scale you
  route oversized buckets to a second, finer pass instead of joining them.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ._parallel import ensure_parallelism as _ensure_parallelism

DEFAULT_NUM_HASHES = 64
DEFAULT_NUM_BANDS = 16  # 16 bands × 4 rows — s-curve threshold ≈ (1/16)^(1/4) ≈ 0.5

#: 48-bit mask for the Kirsch-Mitzenmacher double-hash family (see
#: ``km_hash_table``): values stay < 2^54 pre-mask, so the arithmetic is
#: exact in int64 in every engine — no overflow, no bigint-vs-hugeint drift.
MASK48 = (1 << 48) - 1


def normalize_text(text: F.Column) -> F.Column:
    """Canonical form for content comparison: lowercase, collapse whitespace,
    strip non-alphanumerics (keeps spaces).

    The whitespace class is the EXPLICIT ``[ \\t\\n]`` — not ``\\s`` — so the
    Spark expression and the registry oracles' `_NORM_SQL` are the same
    character class on every input: Java's ``\\s`` also covers ``\\r \\f
    \\x0B``, which would tokenize "foo\\rbar" as two words here but one word
    in the oracle. With the explicit class, a stray carriage return is
    stripped (joining the words) identically in both engines."""
    t = F.lower(F.trim(text))
    t = F.regexp_replace(t, r"[^a-z0-9 \t\n]", "")
    return F.regexp_replace(t, r"[ \t\n]+", " ")


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep one representative (min id) per exact key — a hash groupBy, the
    cheapest dedup; shuffles once on the key hash."""
    return df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))


def exact_dedup_normalized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on an md5 of normalized content. Grouping by the 16-byte
    digest instead of the full text keeps shuffle rows small — at 100 TB you
    shuffle ~32 bytes/doc, not documents."""
    return (
        df.select(F.col(id_col), F.md5(normalize_text(F.col(text_col)).cast("binary")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def word_shingles(text: F.Column, k: int = 3) -> F.Column:
    """Distinct word k-shingle hashes (xxhash64) for a document — the
    MinHash/Jaccard item set. Each shingle is hashed directly from its k
    word columns (multi-arg xxhash64) — no joined string is ever built, and
    word boundaries can't alias (``concat_ws`` would hash "a b"+"c" and
    "a"+"b c" identically). Hashing to i64 immediately keeps downstream
    arrays fixed-width.

    PERF: only use this Column directly when ``text`` is already a plain
    column reference in a *materialized* projection. When the lambda inside
    ``transform`` references a compound expression (normalize+split), Spark
    re-evaluates that whole expression per lambda element — O(words²) per
    document (measured 26× slowdown at sf0.1). ``shingle_table`` below is the
    safe two-step form; all operators in this module go through it."""
    words = F.split(normalize_text(text), " ")
    n = F.size(words)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.xxhash64(*[F.try_element_at(words, i + 1 + j) for j in range(k)]),
        )
    )


def shingle_table(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, shingles) with distinct word-k-shingle xxhash64s per document.

    Two projections on purpose: the word array is materialized as a column
    attribute before the shingling ``transform`` references it, so the
    normalize+split work runs once per document instead of once per shingle
    (the single-expression form re-evaluates the nested expression inside
    every lambda iteration — quadratic in document length).

    Empty/whitespace-only documents are dropped HERE, with a cheap scan-level
    predicate on the raw text. Do NOT filter on ``size(shingles)`` downstream:
    Catalyst pushes such a predicate through both projections, substituting
    the whole nested shingle expression into the filter — which both doubles
    the work and resurrects the quadratic form (measured 30× at sf0.1). (It
    would also be vacuous: ``split("")`` yields ``[""]``, so the shingle
    array is never empty.)

    The scan is widened to at least the cluster's default parallelism before
    shingling: the downstream CPU (shingle + signature hashing) is orders of
    magnitude heavier per byte than the text read, and a small corpus (or a
    few large files at 128 MB/partition) would otherwise pin the whole
    pipeline to a handful of cores (measured 2.0 s → 0.1 s for the sf0.1
    signature pass). At real scale the input already has more partitions
    than cores and the branch is a no-op — no shuffle added."""
    df = _ensure_parallelism(df).filter(F.trim(F.col(text_col)) != "")
    w = df.select(
        F.col(id_col).alias("id"), F.split(normalize_text(F.col(text_col)), " ").alias("w")
    )
    # Multi-arg xxhash64 over the k word columns directly: ~40% faster than
    # building a joined string per shingle (measured at sf0.1), no per-shingle
    # string allocation at 100 TB, and no concat_ws boundary aliasing
    # ("a b"+"c" vs "a"+"b c"). Past-the-end element_at (docs shorter than k)
    # yields nulls via try_element_at (plain element_at throws under ANSI),
    # which xxhash64 skips — short docs hash their whole text,
    # the same one-gram-per-short-doc rule as before.
    slots = ", ".join(f"try_element_at(w, i + {1 + j})" for j in range(k))
    return w.select(
        "id",
        F.expr(
            f"array_distinct(transform(sequence(0, greatest(size(w) - {k}, 0)),"
            f" i -> xxhash64({slots})))"
        ).alias("shingles"),
    )


def gram_table(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, grams) with distinct word k-grams as SPACE-JOINED STRINGS per
    document — the cross-engine twin of ``shingle_table``.

    Keeping the gram as a string (instead of hashing to xxhash64 immediately)
    is what makes the whole MinHash/SimHash pipeline oracle-checkable: any SQL
    engine with ``md5`` can recompute every downstream hash bit-for-bit,
    whereas xxhash64 exists only in Spark. Joining with a space is injective
    here because the words come from a space-split of space-collapsed text,
    so no word contains the separator (the aliasing concern in
    ``shingle_table``'s multi-arg hashing does not apply).

    Same staging discipline as ``shingle_table`` (words materialized before
    the shingling ``transform`` references them — the lambda re-inlining
    pathology), same empty-doc scan filter, same parallelism widening."""
    df = _ensure_parallelism(df).filter(F.trim(F.col(text_col)) != "")
    w = df.select(
        F.col(id_col).alias("id"), F.split(normalize_text(F.col(text_col)), " ").alias("w")
    )
    # concat_ws skips the nulls try_element_at yields past the end, so docs
    # shorter than k produce one gram of their whole text — the same
    # one-gram-per-short-doc rule as shingle_table, and the same clamped
    # slice semantics as DuckDB's array_to_string(w[i:i+k-1], ' ').
    slots = ", ".join(f"try_element_at(w, i + {1 + j})" for j in range(k))
    return w.select(
        "id",
        F.expr(
            f"array_distinct(transform(sequence(0, greatest(size(w) - {k}, 0)),"
            f" i -> concat_ws(' ', {slots})))"
        ).alias("grams"),
    )


def chunk_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_words: int = 10,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """(id, [keep_cols...], chunks) with the normalized text split into
    consecutive fixed-``chunk_words``-word chunks (space-joined strings, the
    last chunk possibly shorter) — the unit for PARAGRAPH-level dedup
    (RefinedWeb-style: a doc's quality signal is what fraction of its
    passages also appear in other docs). Chunks keep their positions and are
    NOT deduplicated per doc: a doc repeating its own boilerplate contributes
    each occurrence to the fraction.

    Same staging discipline as ``gram_table`` (words materialized before the
    ``transform`` lambda references them — the re-inlining pathology), same
    empty-doc scan filter, same parallelism widening."""
    df = _ensure_parallelism(df).filter(F.trim(F.col(text_col)) != "")
    w = df.select(
        F.col(id_col).alias("id"),
        *keep_cols,
        F.split(normalize_text(F.col(text_col)), " ").alias("w"),
    )
    n = chunk_words
    return w.select(
        "id",
        *keep_cols,
        F.transform(
            F.sequence(F.lit(0), F.floor((F.size("w") - 1) / n).cast("bigint")),
            lambda i: F.concat_ws(" ", F.slice(F.col("w"), i * n + 1, n)),
        ).alias("chunks"),
    )


def gram_postings(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, gram) posting rows — the EXPLODED twin of ``gram_table``, built
    explode-FIRST: the gram start indices are exploded, then each row
    computes its own single gram (one ``concat_ws`` of k ``try_element_at``).

    Why not ``gram_table(...).select(explode("grams"))``: ``Generate`` over a
    higher-order-function-built array re-evaluates the whole array-building
    lambda per EMITTED element (HOFs are codegen-fallback inside the
    generate loop) — measured 160× (171 s vs 1 s for 1.1M grams at 20k
    synthetic docs). Plain ``split()`` arrays don't hit this (codegen
    evaluates them once); ``transform``-built arrays do. The other safe form
    is persisting the array table before exploding — right when the array
    table has multiple consumers (the MinHash pipeline), wasteful when the
    postings are consumed once (this helper's callers).

    Emits one row per gram OCCURRENCE (bag semantics, short docs = one
    whole-text gram, same clamped slices as ``gram_table``); doc-frequency
    consumers count ``countDistinct(id)``, set consumers dedupe the final
    (small) result instead of the posting stream."""
    df = _ensure_parallelism(df).filter(F.trim(F.col(text_col)) != "")
    w = df.select(
        F.col(id_col).alias("id"), F.split(normalize_text(F.col(text_col)), " ").alias("w")
    )
    return w.select(
        "id",
        "w",
        F.explode(F.sequence(F.lit(0), F.greatest(F.size("w") - k, F.lit(0)))).alias("_i"),
    ).select(
        "id",
        F.concat_ws(
            " ", *[F.try_element_at(F.col("w"), F.col("_i") + 1 + j) for j in range(k)]
        ).alias("gram"),
    )


def chunk_postings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_words: int = 10,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """(id, [keep_cols...], chunk) posting rows — the exploded twin of
    ``chunk_table``, explode-first for the same Generate-over-HOF-array
    reason as ``gram_postings`` (chunks are ``transform``-built). One row
    per chunk occurrence, positions preserved, NOT deduplicated per doc."""
    df = _ensure_parallelism(df).filter(F.trim(F.col(text_col)) != "")
    n = chunk_words
    w = df.select(
        F.col(id_col).alias("id"),
        *keep_cols,
        F.split(normalize_text(F.col(text_col)), " ").alias("w"),
    )
    return w.select(
        "id",
        *keep_cols,
        "w",
        F.explode(
            F.sequence(F.lit(0), F.floor((F.size("w") - 1) / n).cast("bigint"))
        ).alias("_i"),
    ).select(
        "id",
        *keep_cols,
        F.concat_ws(" ", F.slice(F.col("w"), F.col("_i") * n + 1, n)).alias("chunk"),
    )


def km_hash_table(grams_df: DataFrame, grams_col: str = "grams") -> DataFrame:
    """Attach Kirsch-Mitzenmacher base-hash arrays (h1, h2) to a gram table:
    ONE md5 per gram, split into two 48-bit halves (12 hex chars each,
    parsed with ``conv``), h2 forced odd. The j-th MinHash function is then
    ``(h1 + j*h2) & MASK48`` — 64 hash functions for the price of one md5
    plus fused integer multiply-adds (Kirsch & Mitzenmacher, "Less Hashing,
    Same Performance", ESA'06). This beats 64 per-seed md5 calls ~30× and is
    competitive with 64 xxhash64 rehashes, while staying recomputable in any
    engine that has md5.

    Each stage is its own projection so no ``transform`` lambda references a
    compound expression (the measured quadratic re-inlining pathology — see
    ``shingle_table``).

    Cost breakdown (signature pass, sf0.1, min of 5 warm runs via
    ``tools/exp_minhash_cost.py``): this scheme 1.09 s vs 0.54 s for the
    all-JVM xxhash64 path — the oracle-replayability tax. Rejected cuts:
    hashing each CORPUS-distinct gram once and joining back (1.68 s — the
    explode+distinct+join shuffles cost more than recomputing md5 per
    doc-gram occurrence); deriving h2 arithmetically from h1 (one conv
    parse, 0.98 s) or parsing h2 from 6 hex chars + odd-multiplier spread
    (0.98 s) — both only ~10%, under the 15% adoption bar, and not worth
    weakening h1/h2 independence or churning every replaying oracle."""
    from ..functions.vector import ident_sql

    gq = ident_sql(grams_col)
    m = grams_df.select(
        "id", grams_col, F.expr(f"transform({gq}, x -> md5(x))").alias("m")
    )
    return m.select(
        "id",
        grams_col,
        F.expr(
            "transform(m, x -> cast(conv(substring(x, 1, 12), 16, 10) as bigint))"
        ).alias("h1"),
        F.expr(
            "transform(m, x -> cast(conv(substring(x, 13, 12), 16, 10) as bigint) | 1)"
        ).alias("h2"),
    )


def minhash_signature_km(
    h1: "F.Column | str" = "h1",
    h2: "F.Column | str" = "h2",
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> F.Column:
    """Cross-engine MinHash signature from KM base-hash arrays: element j is
    ``min_g (h1[g] + j*h2[g]) & MASK48``. Exact int64 arithmetic (≤ 2^54
    pre-mask) — DuckDB replays it verbatim, which is what lets the driver
    hash-check the LSH pipeline end to end.

    PERF (r11): when given column NAMES the 64-expression array is built as
    ONE ``F.expr`` SQL string — 10 ms vs 2,130 ms for the per-term Python
    form (64 ``zip_with`` lambdas each paying py4j round-trips). The query
    result and the analyzed expression tree are identical; only the driver-
    side construction cost changes. Column inputs keep the old path for
    callers holding computed columns."""
    if isinstance(h1, str) and isinstance(h2, str):
        from ..functions.vector import ident_sql

        h1, h2 = ident_sql(h1), ident_sql(h2)
        terms = ", ".join(
            f"array_min(zip_with({h1}, {h2}, (a, b) -> (a + {j} * b) & {MASK48}))"
            for j in range(num_hashes)
        )
        return F.expr(f"array({terms})")
    return F.array(
        *[
            F.array_min(
                F.zip_with(h1, h2, lambda a, b: (a + F.lit(j) * b).bitwiseAND(F.lit(MASK48)))
            )
            for j in range(num_hashes)
        ]
    )


def minhash_signature(
    shingles: "F.Column | str", num_hashes: int = DEFAULT_NUM_HASHES
) -> F.Column:
    """MinHash signature: for seed j, min over shingle-hash rehashes. Each
    rehash is ``xxhash64(shingle_hash, seed_j)``.

    PERF NOTE (measured, sf0.1): this per-row HOF form (1.2 s) beats the
    explode + 64-min-aggregates rewrite (12.7 s) that works so well for
    simhash_table's 65 sums — 64 aggregate expressions exceed
    ``spark.sql.codegen.maxFields``, knocking the whole aggregation out of
    whole-stage codegen, and the interpreted agg path is far slower than
    interpreted array lambdas. Benchmark before 'optimizing' either form.
    String input builds the array as one ``F.expr`` (see
    ``minhash_signature_km`` — 100-200× cheaper driver-side construction,
    identical expression tree)."""
    if isinstance(shingles, str):
        from ..functions.vector import ident_sql

        shingles = ident_sql(shingles)
        terms = ", ".join(
            f"array_min(transform({shingles}, s -> xxhash64(s, {j})))"
            for j in range(num_hashes)
        )
        return F.expr(f"array({terms})")
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(j))))
            for j in range(num_hashes)
        ]
    )


def minhash_bands(sig: F.Column, num_bands: int = DEFAULT_NUM_BANDS) -> F.Column:
    """Split the signature into bands and hash each band → array of
    (band_id, band_hash) structs for LSH bucketing."""
    rows_per_band = DEFAULT_NUM_HASHES // num_bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                # multi-arg xxhash64 over the band's longs — no string
                # rendering/concat in the hot path
                F.xxhash64(*[
                    F.element_at(sig, b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ]).alias("band_hash"),
            )
            for b in range(num_bands)
        ]
    )


def _explode_pairs(df: DataFrame, arr_col: str) -> DataFrame:
    """All (i < j) element pairs of each row's sorted array, exploded to a
    single ``p: struct<a,b>`` column — the in-bucket candidate expansion
    shared by the LSH operators below.

    This replaces the textbook bucket *self-join*: collecting ids per bucket
    and expanding pairs from the array needs ONE shuffle (the groupBy) and
    evaluates the upstream pipeline once, where a self-join recomputes the
    entire signature pipeline per join side (measured 10.4 s → 2.9 s on the
    sf0.1 MinHash bench). Callers MUST cap bucket size first (emitted rows
    per bucket are O(n²)).

    Shape: TWO chained explodes — ``posexplode`` of the (attribute) array,
    then ``explode(slice(arr, i+2, n))``. NOT a flatten/transform HOF
    building the pair array in one expression: ``Generate`` re-evaluates a
    HOF-built generator expression per EMITTED element (see
    ``gram_postings``), which for a pair array means O(n²) struct builds per
    emitted pair — O(n⁴) per bucket. ``slice`` is codegen-native, so here
    each input row evaluates it once and streams its pairs."""
    return (
        df.select(F.posexplode(F.col(arr_col)).alias("_i", "_a"), F.col(arr_col).alias("_arr"))
        .select(
            "_a",
            F.explode(F.slice(F.col("_arr"), F.col("_i") + 2, F.size(F.col("_arr")))).alias("_b"),
        )
        .select(F.struct(F.col("_a").alias("a"), F.col("_b").alias("b")).alias("p"))
    )


def _explode_star(df: DataFrame, arr_col: str) -> DataFrame:
    """Star expansion of each row's sorted array — (min, x) for every other
    member, exploded to ``p: struct<a,b>`` — LINEAR in group size, and
    connectivity-equivalent to the quadratic all-pairs expansion for
    downstream connected components. Used by the oversized-bucket second
    pass, where full expansion is exactly the quadratic blowup the bucket
    cap exists to prevent. Same codegen-native slice-explode shape as
    ``_explode_pairs`` (no HOF generator re-evaluation)."""
    return (
        df.select(F.col(arr_col).alias("_arr"))
        .select(
            F.element_at(F.col("_arr"), 1).alias("_a"),
            F.explode(F.slice(F.col("_arr"), 2, F.size(F.col("_arr")))).alias("_b"),
        )
        .select(F.struct(F.col("_a").alias("a"), F.col("_b").alias("b")).alias("p"))
    )


def _sig_pipeline_from_base(base: DataFrame, num_hashes: int, scheme: str):
    """(base, sigs) from an already-built shingle table — split out so the
    signature projection can be re-bound onto a persisted base."""
    if scheme == "xxhash64":
        sigs = base.select("id", minhash_signature("shingles", num_hashes).alias("sig"))
    else:
        hashed = km_hash_table(base.select("id", F.col("shingles").alias("grams")))
        sigs = hashed.select(
            "id", minhash_signature_km("h1", "h2", num_hashes).alias("sig")
        )
    return base, sigs


def _sig_base_table(df: DataFrame, text_col: str, id_col: str, shingle_k: int, scheme: str):
    """The scheme's shingle base table — the ONE place the dispatch lives."""
    if scheme == "xxhash64":
        return shingle_table(df, text_col, id_col, shingle_k)
    return gram_table(df, text_col, id_col, shingle_k).withColumnRenamed(
        "grams", "shingles"
    )


def _sig_pipeline(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int,
    num_hashes: int,
    scheme: str,
):
    """(base shingle table, (id, sig) signature table) — the ONE place the
    MinHash signature derivation lives; minhash_neardup_pairs,
    minhash_signatures, and lsh_bucket_stats all build from here so the
    hash scheme can never silently fork between them."""
    base = _sig_base_table(df, text_col, id_col, shingle_k, scheme)
    return _sig_pipeline_from_base(base, num_hashes, scheme)


def minhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    num_bands: int = DEFAULT_NUM_BANDS,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 1000,
    persist: bool = True,
    scheme: str = "km-md5",
    with_estimate: bool = False,
    guard_stats: dict | None = None,
    handles: list | None = None,
) -> DataFrame:
    """Verified near-duplicate pairs via MinHash-LSH.

    ``guard_stats`` (pass a dict, same contract as ``containment_pairs``):
    filled EAGERLY with the bucket-cap audit — n_buckets, max_bucket_size,
    n_oversized, oversized_member_rows, capped_pairs_skipped (Σ C(n,2) over
    oversized buckets: the quadratic expansions the cap suppressed — an
    upper bound on candidate pairs that must be re-found by other bands or
    the full-signature star pass), full_sig_groups and star_edges (what the
    second pass actually emitted). This is how silent recall loss under
    band skew becomes MEASURABLE instead of invisible (r7 verdict #7);
    costs one extra pass over the bucket and star-group tables, only when
    requested (both are persisted for the run so the eager audit never
    recomputes work the main plan needs).

    ``handles`` (pass a list, same contract as ``duplicate_chunk_spans``):
    receives every DataFrame this call persisted (shingle/signature tables,
    plus the audit's bucket/star tables), for deterministic unpersist by
    library pipelines that cannot rely on ``spark.catalog.clearCache()``.

    ``with_estimate=True`` additionally emits ``est_jaccard`` — the
    signature-level estimate (matching MinHash positions / num_hashes) next
    to the exact verified Jaccard, the standard way to audit sketch quality
    on real data before trusting banding thresholds at corpus scale. Costs
    two extra signature-table joins (pinned ``shuffle_hash`` — the
    signature side is corpus-width).

    Pipeline: shingle → signature → band-bucket → in-bucket pair expansion →
    distinct candidate pairs → exact Jaccard verification on shingle sets.
    Returns (id_a, id_b, jaccard) with id_a < id_b.

    ``scheme`` picks the hash family:

    - ``"km-md5"`` (default): string grams, one md5 per gram split into two
      48-bit halves, 64 hash functions by Kirsch-Mitzenmacher double hashing
      (``km_hash_table``). Every value is recomputable in DuckDB, so the
      driver value-checks this pipeline end to end (the xxhash64 form could
      only ever get a rows-only check).
    - ``"xxhash64"``: the original all-JVM-hash form; slightly cheaper per
      gram, kept for pipelines that don't need cross-engine replay.

    Both schemes produce the same verified output on exact duplicates and
    the same exact-Jaccard values on any pair both recall (verification is
    Jaccard over the same gram sets — only banding recall near the s-curve
    boundary can differ).

    Oversized buckets (> ``max_bucket``, degenerate boilerplate) are NOT
    dropped: a second pass groups their members by FULL signature and
    star-expands each identical-signature group (min-id hub, linear in group
    size), so heavily-duplicated content — precisely what a training
    pipeline most needs to catch — still yields verified pairs without the
    quadratic in-bucket expansion. Residue stats via ``lsh_bucket_stats``.

    The shingle table feeds three plan branches (signatures + both sides of
    pair verification). ``persist`` caches it so shingling runs once instead
    of 3× (measured 6.2 s → 2.5 s at sf0.1) — the same move production
    MinHash pipelines make when they checkpoint signatures before the LSH
    join. At 100 TB, replace the cache with a checkpoint to a parquet temp
    table (same plan-cut, disk-backed); callers who cannot afford executor
    memory for the shingle table pass ``persist=False`` and pay the
    recompute.
    """
    def _track(cached: DataFrame) -> DataFrame:
        if handles is not None:
            handles.append(cached)
        return cached

    # build the shingle base alone, persist, THEN bind the signature
    # projection once — the old build-then-rebind order constructed the
    # 64-wide signature select twice and threw the first away (~0.3 s of
    # driver time per query, r11)
    base = _sig_base_table(df, text_col, id_col, shingle_k, scheme)
    if persist:
        # the signature projection below reads the CACHED shingles
        base = _track(base.persist())
    _, sigs = _sig_pipeline_from_base(base, num_hashes, scheme)
    # The signature table feeds the banding branch and (only when oversized
    # buckets exist) the full-signature second pass; it is tiny
    # (id + num_hashes longs) so always persist alongside the shingles.
    if persist:
        sigs = _track(sigs.persist())
    banded = band_table(sigs, num_hashes, num_bands)

    # Candidate pairs via ONE aggregation: collect ids per (band, band_hash)
    # bucket and expand pairs from the sorted id array. The signature
    # pipeline runs exactly once; the bucket self-join formulation
    # recomputed it per join side plus once more for the cap's broadcast.
    # Only ids travel through the shuffle — shingle sets are re-attached
    # once per verified pair below.
    grouped = (
        banded.groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if guard_stats is not None:
        # audit pass: bucket table feeds three consumers now (stats, the
        # capped expansion, the oversized tail) — persist it for the run
        grouped = _track(grouped.persist())
        n = F.size("ids")
        over = n > max_bucket
        b_row = grouped.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            # coalesce every aggregate: on a dedup-clean corpus `grouped`
            # is EMPTY and max/sum return NULL, which would break the
            # documented all-integers contract (int(v) in consumers)
            F.coalesce(F.max(n), F.lit(0)).alias("max_bucket_size"),
            F.coalesce(F.sum(F.when(over, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias("n_oversized"),
            F.coalesce(F.sum(F.when(over, n).otherwise(0)), F.lit(0))
            .cast("long")
            .alias("oversized_member_rows"),
            # C(n,2) in pure integer arithmetic (n*(n-1) is even; a double
            # division would round above 2^53 at billion-row buckets)
            F.coalesce(
                F.sum(
                    F.when(
                        over, F.shiftright(n.cast("long") * (n.cast("long") - 1), 1)
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("capped_pairs_skipped"),
        ).collect()[0]
        guard_stats.update(b_row.asDict())
    cand_ok = _explode_pairs(grouped.filter(F.size("ids") <= max_bucket), "ids")
    # Second pass for oversized buckets: their members are grouped by FULL
    # signature (64 longs rendered once — exact-signature equality is the
    # "finer" criterion: colliding on ALL bands ≈ near-identical content)
    # and each group is star-expanded around its min id. Linear cost, and
    # the stars still connect every true duplicate through verification +
    # connected components downstream.
    over_ids = (
        grouped.filter(F.size("ids") > max_bucket)
        .select(F.explode("ids").alias("id"))
        .distinct()
    )
    over_groups = (
        # shuffle_hash: over_ids is USUALLY tiny, but it is exactly the
        # degenerate-boilerplate tail — in the worst case a large fraction of
        # the corpus — so its size must never gate on a stats estimate; SHJ
        # builds it per-partition instead of broadcasting.
        sigs.join(over_ids.hint("shuffle_hash"), "id", "left_semi")
        .select("id", F.concat_ws(",", F.col("sig").cast("array<string>")).alias("full_sig"))
        .groupBy("full_sig")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select("ids")
    )
    if guard_stats is not None:
        # persist: the eager audit below and the cand_over expansion both
        # consume over_groups — without this the sigs-join/groupBy runs twice
        over_groups = _track(over_groups.persist())
        s_row = over_groups.agg(
            F.count(F.lit(1)).alias("full_sig_groups"),
            F.coalesce(F.sum(F.size("ids") - 1), F.lit(0))
            .cast("long")
            .alias("star_edges"),
        ).collect()[0]
        guard_stats.update(s_row.asDict())
        if not persist and handles is None:
            # persist=False promises a low-memory run (ADVICE r8): the two
            # audit caches exist only so the eager collects above don't
            # recompute work the main plan needs. With no handles list to
            # hand them to, release them here and let the downstream
            # expansion recompute — the documented persist=False trade —
            # instead of leaving caches only clearCache() could free.
            grouped.unpersist()
            over_groups.unpersist()
    cand_over = _explode_star(over_groups, "ids")
    cand = (
        cand_ok.unionByName(cand_over)
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # Verification re-attaches shingle sets to each candidate pair. The
    # shingle side is corpus-width by definition, so neither join may EVER
    # become a broadcast — but Catalyst's size estimates for this deep a
    # pipeline can be arbitrarily wrong (measured: a range()-synthesized 1M-doc
    # corpus estimates "small", plans three BroadcastExchanges, and OOMs the
    # driver building a GB-scale hash relation). The shuffle_hash hint pins
    # the strategy independent of stats: SHJ building the (smaller) pair side
    # per-partition, corpus side streamed.
    jac = (
        cand.hint("shuffle_hash")
        .join(base.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .hint("shuffle_hash")
        .join(base.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    verified = (
        jac.filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    if not with_estimate:
        return verified
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda z: z))
        / F.lit(float(num_hashes))
    )
    return (
        verified.hint("shuffle_hash")
        .join(sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .hint("shuffle_hash")
        .join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
        .withColumn("est_jaccard", F.floor(est * 1e4 + 0.5) / 1e4)
        .select("id_a", "id_b", "jaccard", "est_jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    scheme: str = "km-md5",
) -> DataFrame:
    """(id, sig) MinHash signature table — the STORED dedup artifact of a
    corpus batch (id + ``num_hashes`` longs per doc, ~0.5 KB; the thing a
    continuously-crawled pipeline persists so later batches can near-dup
    against history without re-reading bodies). Same hash schemes as
    ``minhash_neardup_pairs`` (both build on ``_sig_pipeline`` — the scheme
    cannot fork between them); one narrow pass, no shuffle."""
    _, sigs = _sig_pipeline(df, text_col, id_col, shingle_k, num_hashes, scheme)
    return sigs


def band_table(
    sigs: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    num_bands: int = DEFAULT_NUM_BANDS,
) -> DataFrame:
    """(band, band_hash, id) LSH band rows from an (id, sig) table — band
    key = the raw signature slice rendered as a string (no extra hash,
    identical text in any engine).

    PERF (r11): the 16-struct explode array is built as ONE ``F.expr`` SQL
    string — ~10 ms vs ~1,240 ms for the per-struct Python construction
    (py4j round-trips per element_at/cast/struct). Identical expression
    tree and results."""
    rows_per_band = num_hashes // num_bands
    structs = ", ".join(
        "struct({b} as band, concat_ws(',', {slots}) as band_hash)".format(
            b=b,
            slots=", ".join(
                f"cast(element_at(sig, {b * rows_per_band + r + 1}) as string)"
                for r in range(rows_per_band)
            ),
        )
        for b in range(num_bands)
    )
    return sigs.select("id", F.expr(f"explode(array({structs}))").alias("b")).select(
        F.col("b.band").alias("band"), F.col("b.band_hash").alias("band_hash"), "id"
    )


def minhash_history_matches(
    new_df: DataFrame,
    history_sigs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    num_bands: int = DEFAULT_NUM_BANDS,
    est_threshold: float = 0.5,
    scheme: str = "km-md5",
    handles: list | None = None,
    new_sigs: DataFrame | None = None,
) -> DataFrame:
    """Incremental NEAR-dup: match a new batch against the stored HISTORY
    signature table (``minhash_signatures`` of every prior batch) — the
    near-dup twin of ``incremental_dedup`` (exact) and
    ``exactsubstr_clean_incremental`` (substring). History bodies are gone
    by design, so verification is at the SIGNATURE level: est_jaccard =
    matching MinHash positions / num_hashes (unbiased for true Jaccard,
    rsd ~ 1/sqrt(num_hashes) ~ 12.5% at 64 — the standard trade for never
    re-reading a 100 TB corpus; within-batch pairs still get exact
    verification via ``minhash_neardup_pairs``).

    Returns (id_new, id_hist, est_jaccard) with est >= ``est_threshold``.

    Scale shape: candidates come from ONE (band, band_hash) equi-join of
    two banded tables (id-only rows); signatures re-attach to the distinct
    candidate pairs through shuffle_hash-pinned joins (the history side is
    corpus-scale by definition — stats must never broadcast it); the est
    filter is a zip_with fold, no Python anywhere.

    Cache contract (same as ``duplicate_chunk_spans``): the new batch's
    signature table is PERSISTED (it feeds banding and the est re-attach).
    Pass ``handles`` (a list) to receive it for deterministic unpersist;
    otherwise the caller owns ``spark.catalog.clearCache()``.

    ``new_sigs`` (r12, r11 VERDICT #8): a caller that already materialized
    the batch's (id, sig) table — the streaming curation loop signs each
    micro-batch once and matches it twice (within-batch + vs history) —
    passes it here so the gram+md5+KM pass doesn't run again per call. It
    must be the ``minhash_signatures`` output for the SAME (batch,
    shingle_k, num_hashes, scheme); the caller owns its persist/unpersist.
    """
    if new_sigs is None:
        new_sigs = minhash_signatures(
            new_df, text_col, id_col, shingle_k, num_hashes, scheme
        ).persist()
        if handles is not None:
            handles.append(new_sigs)
    hist_sigs = history_sigs.select(
        F.col(history_sigs.columns[0]).alias("id"),
        F.col(history_sigs.columns[1]).alias("sig"),
    )
    # Contract guard (ADVICE r8): a history store built with a DIFFERENT
    # num_hashes would silently deflate est_jaccard — zip_with pads the
    # shorter array with nulls and the match filter drops them, so a stale
    # signature store would quietly lose recall instead of erroring. Fail
    # loudly at execution time on the first wrong-length signature (the new
    # side is built by this call, so only history needs the check; a filter
    # on assert_true(...).isNull() cannot be pruned — it is the predicate).
    hist_sigs = hist_sigs.filter(
        F.assert_true(
            F.size("sig") == num_hashes,
            F.concat(
                F.lit("minhash_history_matches: history signature length "),
                F.size("sig").cast("string"),
                F.lit(
                    f" != num_hashes={num_hashes} — the signature store was"
                    " built with a different num_hashes; rebuild the store"
                    " or call with the matching num_hashes"
                ),
            ),
        ).isNull()
    )
    nb = band_table(new_sigs, num_hashes, num_bands).withColumnRenamed("id", "id_new")
    hb = band_table(hist_sigs, num_hashes, num_bands).withColumnRenamed("id", "id_hist")
    cand = (
        nb.hint("merge")
        .join(hb.hint("merge"), ["band", "band_hash"])
        .select("id_new", "id_hist")
        .dropDuplicates(["id_new", "id_hist"])
    )
    est = (
        F.size(F.filter(F.zip_with("sn", "sh", lambda x, y: x == y), lambda z: z))
        / F.lit(float(num_hashes))
    )
    return (
        cand.hint("shuffle_hash")
        .join(new_sigs.select(F.col("id").alias("id_new"), F.col("sig").alias("sn")), "id_new")
        .hint("shuffle_hash")
        .join(hist_sigs.select(F.col("id").alias("id_hist"), F.col("sig").alias("sh")), "id_hist")
        .withColumn("est_jaccard", F.floor(est * 1e4 + 0.5) / 1e4)
        .filter(F.col("est_jaccard") >= est_threshold)
        .select("id_new", "id_hist", "est_jaccard")
    )


def lsh_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    num_bands: int = DEFAULT_NUM_BANDS,
    max_bucket: int = 1000,
) -> DataFrame:
    """Bucket-population report for the MinHash LSH layer: one row with
    (n_buckets, n_pair_buckets, n_oversized, max_bucket_size,
    oversized_member_rows). Run alongside ``minhash_neardup_pairs`` to watch
    the oversized tail — a rising ``n_oversized`` means boilerplate is
    flooding buckets and the second pass (full-signature grouping) is doing
    more of the matching."""
    banded = band_table(
        minhash_signatures(df, text_col, id_col, shingle_k, num_hashes), num_hashes, num_bands
    )
    sizes = banded.groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("n"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)).cast("bigint").alias("n_pair_buckets"),
        F.sum(F.when(F.col("n") > max_bucket, 1).otherwise(0)).cast("bigint").alias("n_oversized"),
        F.max("n").alias("max_bucket_size"),
        F.sum(F.when(F.col("n") > max_bucket, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("oversized_member_rows"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_postings: int = 2000,
    persist: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via a shingle inverted index:
    explode shingles → in-bucket pair expansion per shingle → count common
    shingles → |A∩B| / (|A|+|B|−|A∩B|). Sub-quadratic when shingles are
    selective; ultra-common shingles (posting list > ``max_postings``) are
    dropped like stopwords — standard index pruning at scale. ``persist``
    caches the shingle table feeding the postings + two size lookups (see
    ``minhash_neardup_pairs`` for the scale trade-off)."""
    base = shingle_table(df, text_col, id_col, shingle_k)
    if persist:
        base = base.persist()
    sizes = base.select("id", F.size("shingles").alias("n_sh"))
    postings = base.select("id", F.explode("shingles").alias("sh"))
    # Inverted-index pair counting as one aggregation per shingle: collect
    # the (distinct-per-doc) posting list, drop ultra-common shingles with a
    # size() predicate — stopword pruning, previously a broadcast anti-join
    # that recomputed the postings — and count each pair's co-occurrences
    # across shingle buckets (= |A∩B|, since a doc contributes a shingle at
    # most once).
    pairs = (
        _explode_pairs(
            postings.groupBy("sh")
            .agg(F.array_sort(F.collect_list("id")).alias("ids"))
            .filter((F.size("ids") >= 2) & (F.size("ids") <= max_postings)),
            "ids",
        )
        .groupBy(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # sizes is corpus-width (one row per doc) — an explicit broadcast here
    # was a latent 100 TB bug (it only looked cheap because the test corpus
    # is small). SHJ with the pair side as build keeps both joins
    # shuffle-partitioned at any corpus size.
    return (
        pairs.hint("shuffle_hash")
        .join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .hint("shuffle_hash")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn("jaccard", F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
    scheme: str = "km-md5",
) -> DataFrame:
    """(id, sim) with a SimHash per document — 60-bit under the default
    ``"km-md5"`` scheme (first 15 hex chars of one md5 per gram, parsed with
    ``conv``; every bit recomputable in DuckDB → driver value-checks it),
    64-bit under the legacy ``"xxhash64"`` scheme.

    Shape chosen for scale: explode shingle hashes, then ONE groupBy(id) with
    60/64 conditional-sum aggregates (bit b's popcount) + a count. All sums
    partial-aggregate map-side, so the shuffle carries one ~65-int row per doc
    per partition — not the shingles. (A per-row higher-order-function
    formulation — 64 ``F.aggregate`` lambdas over the shingle array — is
    semantically equal but catastrophically slow: each lambda re-inlines the
    whole shingle expression tree into codegen; measured 135 s vs <2 s on
    sf0.01.) Documents with zero shingles are dropped (nothing to match).
    """
    nbits = _simhash_bits(scheme)
    # the shingle SET (array_distinct) is required — bag postings would skew
    # the majority vote — so the safe exploded form here is persist-then-
    # explode: Generate over a HOF-built array re-evaluates the building
    # lambda per emitted element (the gram_postings pathology, measured
    # 160×); from the cached array it is a plain fast explode. Caller /
    # harness owns cache lifecycle, same policy as minhash_neardup_pairs.
    if scheme == "xxhash64":
        base = shingle_table(df, text_col, id_col, shingle_k).persist()
        posts = base.select("id", F.explode("shingles").alias("h"))
    else:
        base = gram_table(df, text_col, id_col, shingle_k).persist()
        posts = base.select("id", F.explode("grams").alias("g")).select(
            "id",
            F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("bigint").alias("h"),
        )
    # Both wide expression lists are built as single F.expr SQL strings
    # (r11): ~60 per-term Python constructions cost seconds of driver-side
    # py4j round-trips per query; the parsed trees and results are identical.
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.expr(f"sum(cast(shiftright(h, {b}) & 1 as int))").alias(f"c{b}")
        for b in range(nbits)
    ]
    counts = posts.groupBy("id").agg(*aggs)
    # bit b set iff popcount_b*2 >= n  (majority of shingles have the bit)
    sim_sql = " | ".join(
        f"shiftleft(cast(case when c{b} * 2 >= n then 1 else 0 end as bigint), {b})"
        for b in range(nbits)
    )
    return counts.select("id", F.expr(sim_sql).alias("sim"))


def _simhash_bits(scheme: str) -> int:
    return 64 if scheme == "xxhash64" else 60


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 10_000,
    scheme: str = "km-md5",
) -> DataFrame:
    """SimHash near-dups: bucket by 4 bands (15-bit under km-md5, 16-bit
    under xxhash64 — any pair within Hamming distance ≤3 shares at least one
    exact band by pigeonhole), expand candidate pairs within buckets, verify
    true Hamming distance.

    Oversized buckets (> ``max_bucket``) go through a second pass instead of
    being dropped: members grouped by FULL simhash value (Hamming 0 —
    degenerate near-identical content) and star-expanded around the min id —
    linear cost, and the heavy boilerplate clusters that overflow buckets
    still produce their pairs."""
    nbits = _simhash_bits(scheme)
    band_bits = nbits // 4
    band_mask = (1 << band_bits) - 1
    sims = simhash_table(df, text_col, id_col, scheme=scheme)
    bands = sims.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("sim"), i * band_bits)
                        .bitwiseAND(F.lit(band_mask))
                        .alias("bh"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "sim", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    # Same one-aggregation candidate expansion as MinHash: a bucket
    # self-join would recompute the full SimHash aggregation per join side.
    # array_sort on structs orders by the first field (id), so a < b holds.
    grouped = (
        bands.groupBy("band", "bh")
        .agg(F.array_sort(F.collect_list(F.struct("id", "sim"))).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    cand_ok = _explode_pairs(grouped.filter(F.size("ms") <= max_bucket), "ms")
    # Second pass: oversized-bucket members regrouped by exact simhash value
    # (carried in the bucket rows — no recompute of the simhash aggregation),
    # star-expanded around the min id. Structs sort by (id, sim), so the hub
    # is the min id.
    cand_over = _explode_star(
        grouped.filter(F.size("ms") > max_bucket)
        .select(F.explode("ms").alias("m"))
        .select(F.col("m.id").alias("id"), F.col("m.sim").alias("sim"))
        .dropDuplicates(["id"])
        .groupBy("sim")
        .agg(F.array_sort(F.collect_list(F.struct("id", "sim"))).alias("ms"))
        .filter(F.size("ms") >= 2),
        "ms",
    )
    cand = (
        cand_ok.unionByName(cand_over)
        .select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            F.col("p.a.sim").alias("sim_a"),
            F.col("p.b.sim").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.withColumn("hamming", hamming.cast("int")).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def incremental_dedup(
    new_batch: DataFrame,
    history: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Production-shape dedup: a NEW ingest batch deduplicates (a) within
    itself and (b) against the historical corpus, without ever rereading
    history's documents — both sides reduce to 16-byte normalized-content
    digests, so at 100 TB the anti-join shuffles ~32 bytes/doc (and a real
    deployment keeps history as a pre-bucketed digest table, making the
    anti-join co-located: shuffle only the new batch).

    Returns the surviving new-batch rows as (id, content_hash). The shuffled
    key is ``unhex(md5(...))`` — 16 raw bytes, not md5's 32-char hex string,
    so the stated bytes-per-doc actually holds; callers wanting the hex form
    can ``hex(content_hash)`` on the way out."""
    digest = F.unhex(F.md5(normalize_text(F.col(text_col)).cast("binary")))
    new_d = new_batch.select(F.col(id_col), digest.alias("content_hash"))
    hist_d = history.select(digest.alias("content_hash")).distinct()
    survivors = (
        new_d.groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))  # within-batch: keep min id
        .join(hist_d, "content_hash", "left_anti")  # vs history
    )
    return survivors.select(id_col, "content_hash")


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    heavy_df_cap: int | None = 1000,
    max_heavy_grams: int = 100_000,
    probe_modulus: int = 64,
    probe_min_docs: int | None = None,
    guard_stats: dict | None = None,
    persist: bool = True,
    handles: list | None = None,
    spill_dir: str | None = None,
) -> DataFrame:
    """WORD-ALIGNED containment pairs: (id_inner, id_outer) where the inner
    doc's normalized word sequence occurs contiguously inside the outer
    doc's — the quote/mirror/page-of-site duplication exact dedup misses
    (texts differ) and MinHash underweights (Jaccard penalizes the length
    gap). Word alignment (verified as ``instr(' '+t_out+' ', ' '+t_in+' ')``
    over single-space-normalized text) is what makes gram blocking EXACT:
    a char-level substring can start mid-word, which no word-gram of the
    container would witness.

    Scale shape — never all-pairs, and no silent false negatives (the r3
    lesson):
    1. word ``k``-gram postings per doc (``gram_table``, distinct per doc)
       plus corpus-wide doc-frequency per gram (one partial+final agg);
    2. inner docs with ≥ ``k`` words block on their RAREST gram (min df,
       gram tiebreak): containment implies EVERY inner k-gram appears among
       the outer's k-grams, so the rarest-gram join is exhaustive while
       generating the fewest candidates any single-gram block can;
    3. inner docs with < ``k`` words (whose whole-text gram can never equal
       a k-gram) block on their FIRST WORD against unigram postings —
       exhaustive under word alignment, and the short-doc side is a
       vanishing fraction of a real corpus;
    4. the unioned candidates rejoin the normalized texts co-partitioned on
       doc id (``shuffle_hash``-pinned — the text sides are corpus-scale
       and must never broadcast on bad stats) and verify with one padded
       ``instr``.

    Equal-text docs are mutual containments and appear in both directions,
    matching the SQL definition.

    Boilerplate-skew guard (round 6; found by the planted-skew stress, a
    95× max/median task-time ratio at 250k docs with one passage in 20%
    of them): a gram shared by a large doc fraction floods its key's
    partition in every gram-keyed SMJ — millions of posting rows sorted
    in ONE task, then discarded unmatched, because a boilerplate gram is
    (almost) never anyone's rarest. The fix is EXACT, from the min-df
    argument: a doc's rarest gram is light whenever ANY of its grams is
    light, so grams with df > ``heavy_df_cap`` can be dropped from both
    the df-attach and candidate joins via a BROADCAST anti-join (the
    heavy set is tiny by construction — that is what "heavy" means), and
    the hot rows never enter a shuffle at all. Docs whose EVERY gram is
    heavy (pure-boilerplate inners) route through a second pass on the
    unpruned tables — their rarest gram is genuinely heavy and the big
    block is semantically unavoidable. Crucially, ANY heavy/light split
    is exact (misclassified grams only shift which pass blocks a doc),
    which licenses a SAMPLED detector: a deterministic ~1.6% doc sample
    (xxhash64 on the id — same classification on every engine and
    partitioning) counts per-gram hits, so a clean corpus discovers "no
    heavy grams" for ~1/64 of a posting pass and runs the plain plan
    unchanged, while a truly heavy gram (df ≥ cap means ≥ cap/64
    expected sampled docs) is caught with near-certainty. Only corpora
    where boilerplate actually exists pay the guard's extra plan — and
    there it buys back a straggler that grows linearly with the corpus
    (10^9 docs × 20% × ~20 grams ≈ 10^8+ rows sorted by ONE task at
    100 TB). The heavy set is bounded by the deterministic
    top-``max_heavy_grams``; ``heavy_df_cap=None`` removes the guard and
    its probe altogether.

    Probe cost control (round 7): the probe is an eager job, ~2 s cold at
    sf0.1/local[32] (mostly fixed scheduling/codegen latency — the sampled
    scan itself is ~1/64 of a 0.5 s posting pass).  That flat constant is
    invisible on a multi-minute corpus job but was 33% of a seconds-long
    bench entry, so corpora below ``probe_min_docs`` docs (default
    ``heavy_df_cap × probe_modulus``) skip probe AND guard: with df ≤
    n_docs, the worst possible unguarded block is a one-task sort of
    ≤ n_docs×k rows, cheaper than the probe job.  The gate costs one
    column-pruned id-count.  For ``heavy_df_cap < 2×probe_modulus`` the
    sampled estimator cannot resolve the cap (the r6-advisor floor cliff),
    so the heavy set is counted exactly instead — one full posting pass,
    only reachable when the caller prices aggressive guarding explicitly.
    ``probe_modulus`` (sampling rate 1/modulus) and ``probe_min_docs``
    exist so tests can force/observe each path; ``guard_stats`` (pass a
    dict) reports ``{probed, use_guard, n_heavy}``.

    Cache handoff: on guarded corpora two SMALL intermediates (the
    per-gram df table and the one-row-per-doc block table) are persisted
    because two plan branches consume each; this function does NOT
    unpersist them — the blocks live until the caller (or harness) calls
    ``unpersist``/``clearCache``, the same caller-owns-lifecycle contract
    as the MinHash signature table.

    PERF (r11, guide §2.4/§5): the normalized-text table feeds FOUR plan
    branches (long/short blocking + both verify sides) and the posting
    stream three more — unpersisted, that was 8 parquet scans, each
    re-normalizing the corpus (plan audit: 8× Scan parquet, 0 reuse).
    ``persist`` (default) caches ``norm`` once (explicit
    ``MEMORY_AND_DISK`` — the corpus must spill, never OOM, at 100 TB) and
    derives every branch — including both posting streams — from it.
    ``spill_dir`` is the promised disk-backed alternative for clusters
    where even spillable executor cache is unwanted: ``norm`` is written
    once to ``<spill_dir>/containment_norm`` as parquet and every branch
    reads that temp table (plan-cut identical to the cache; the caller
    owns the directory's lifecycle). ``handles`` receives persisted frames
    for deterministic unpersist by library callers.

    PERF (r12, guide §2.3 "aggregate before you shuffle" / §2.4): the
    k-gram posting stream used to cross three gram-keyed Exchanges (df
    aggregation, df-attach SMJ, candidate SMJ — each shuffling one row per
    gram OCCURRENCE). With the guard machinery bounding per-gram df, the
    stream is now aggregated ONCE into per-gram sorted distinct id arrays
    (``gagg``); doc frequency is ``size(ids)`` (free), the rarest-gram
    choice is a map-side-partial ``min(struct(df, gram))`` aggregation
    (replacing the Sort+Window), and the candidate join explodes the
    (already gram-partitioned) array table instead of re-shuffling
    postings. Candidates were always deduped downstream, so bag→set is
    result-identical. The unigram posting stream similarly explodes
    ``array_distinct(w)`` (map-side set, no shuffle added). Only the
    ``heavy_df_cap=None`` escape hatch keeps the old join plan: with no df
    bound a hot gram's id array could not be bounded, and SMJ spills where
    an aggregation buffer cannot."""
    import os as _os

    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    def _track(cached: DataFrame) -> DataFrame:
        if handles is not None:
            handles.append(cached)
        return cached

    src = _ensure_parallelism(df).filter(F.trim(F.col(text_col)) != "")
    norm = src.select(
        F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("t")
    )
    if spill_dir is not None:
        tmp = _os.path.join(spill_dir, "containment_norm")
        norm.write.mode("overwrite").parquet(tmp)
        norm = df.sparkSession.read.parquet(tmp)
    elif persist:
        norm = _track(norm.persist(StorageLevel.MEMORY_AND_DISK))
    words = norm.select("id", F.split(F.col("t"), " ").alias("w"))
    nwords = F.size(F.split(F.col("t"), " "))

    # explode-first postings (bag semantics — see gram_postings for why the
    # array-then-explode form is 160× slower): doc frequency therefore
    # counts DISTINCT docs, and candidate pairs are deduped at the (small)
    # candidate table, never on the posting stream. Built from the CACHED
    # norm table (identical expressions to gram_postings over the raw df —
    # split of the same normalized text), so the scan+normalize pass runs
    # once instead of 8×.
    # r12 (guide §2.3 "shuffle keys and metadata instead of payloads"):
    # postings carry xxhash64 OF the gram's word slots, not the gram
    # string — 8 bytes per row through every gram-keyed exchange instead
    # of ~30, and long compares in the aggregates. Exactness is unchanged:
    # equal grams always hash equal (fixed arity, same slots), so the
    # rarest-HASH block is still exhaustive for word-aligned containment;
    # a hash collision can only MERGE two grams' posting lists, i.e. add
    # candidates, and every candidate is verified with the exact padded
    # instr below. (The tiebreak order becomes (df, hash) instead of
    # (df, gram) — any single-gram block is exhaustive, so which gram
    # blocks a doc is free to change.)
    def _postings(src_words: DataFrame, kk: int) -> DataFrame:
        return src_words.select(
            "id",
            "w",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.size("w") - kk, F.lit(0)))
            ).alias("_i"),
        ).select(
            "id",
            F.xxhash64(
                *[F.try_element_at(F.col("w"), F.col("_i") + 1 + j) for j in range(kk)],
            ).alias("gram"),
        )

    # r12: the whole k-gram path is built from LONG docs only (≥ k words) —
    # a container of a ≥k-word inner doc necessarily has ≥ k words itself
    # (it contains k consecutive words), and a short doc's single clamp-gram
    # could never equal a true k-gram, so dropping short docs here removes
    # no true candidate (short INNERS block through the unigram path as
    # before). This replaces the old long_ids SHUFFLE_HASH SEMI-JOIN in the
    # blocking branch with a filter that rides the cached norm scan
    # (measured: the semi-join was ~0.9 s of the sf0.1 critical path).
    g = _postings(words.filter(F.size("w") >= k), k)
    gdf = g.groupBy("gram").agg(F.countDistinct("id").alias("df"))
    w = Window.partitionBy("id").orderBy("df", "gram")
    long_ids = norm.filter(nwords >= k).select("id")

    # Boilerplate-skew guard (see docstring). Detection is a DETERMINISTIC
    # ~1.6% sampled probe (docs whose xxhash64(id) % 64 == 0), so the
    # common clean-corpus case decides "no heavy grams" for ~1/64 of a
    # posting pass and runs the plain plan with zero added subtrees. A
    # gram at the cap shows ~cap/64 sampled docs, so the threshold below
    # over-catches mildly hot grams long before it could miss a truly
    # heavy one — and ANY heavy/light split is exact, so sampling can
    # never change results, only which pass blocks a doc. The heavy set
    # is collected (bounded by max_heavy_grams via the deterministic
    # top-N) and re-broadcast as a literal table.
    use_guard = False
    probed = False
    if heavy_df_cap is not None:
        # Small-corpus fast path (round 7): the guard prevents a single
        # task sorting ~df × grams-per-doc posting rows, and df ≤ n_docs —
        # below ``probe_min_docs`` (default cap × probe_modulus) even the
        # worst possible block is a bounded one-task sort cheaper than the
        # probe job itself, so the probe is skipped outright and the plain
        # plan runs with ZERO added jobs.  Any heavy/light split — including
        # "nothing is heavy" — is exact (see docstring), so this changes
        # plans, never results.  The count is a column-pruned scan of the
        # id column only, far cheaper than the posting-pass probe it
        # replaces on sub-threshold corpora.
        if probe_min_docs is None:
            probe_min_docs = heavy_df_cap * probe_modulus
        n_docs = df.select(F.col(id_col)).count()
        if n_docs >= probe_min_docs:
            probed = True
            if heavy_df_cap >= 2 * probe_modulus:
                # expected sampled hits for a df=cap gram is cap/modulus;
                # requiring that many catches df ≳ cap with near-certainty
                # for df ≥ 2×cap (E ≥ 2×threshold) while leaving
                # barely-over-cap grams — whose single-task sort is still
                # small — sometimes unguarded.  cap ≥ 2×modulus keeps the
                # threshold ≥ 2 WITHOUT flooring (the r6 advisor cliff: a
                # floored threshold of 2 flips the guarded plan on any gram
                # two sampled docs share).
                probe_hits = heavy_df_cap // probe_modulus
                heavy_rows = (
                    g.filter(F.pmod(F.xxhash64("id"), F.lit(probe_modulus)) == 0)
                    .groupBy("gram")
                    .agg(F.countDistinct("id").alias("h"))
                    .filter(F.col("h") >= probe_hits)
                    .orderBy(F.desc("h"), "gram")
                    .limit(max_heavy_grams)
                    .select("gram")
                    .collect()
                )
            else:
                # cap too small for the sampled estimator to resolve —
                # count exactly (one full posting pass; only reachable with
                # an unusually tight cap on a ≥ cap×modulus corpus, where
                # the caller has explicitly priced aggressive guarding)
                heavy_rows = (
                    gdf.filter(F.col("df") > heavy_df_cap)
                    .orderBy(F.desc("df"), "gram")
                    .limit(max_heavy_grams)
                    .select("gram")
                    .collect()
                )
            use_guard = len(heavy_rows) > 0
    if guard_stats is not None:
        guard_stats.update(
            {"probed": probed, "use_guard": use_guard,
             "n_heavy": len(heavy_rows) if use_guard else 0}
        )
    if use_guard:
        gdf = _track(gdf.persist())
        heavy = df.sparkSession.createDataFrame(heavy_rows, "gram: bigint")
        g_main = g.join(F.broadcast(heavy), "gram", "left_anti")
        gdf_main = gdf.join(F.broadcast(heavy), "gram", "left_anti")
    else:
        g_main, gdf_main = g, gdf

    # Every gram-keyed join below pairs two UNBOUNDED corpus-scale tables
    # (postings, df counts, block grams) — pinned sort-MERGE, not
    # shuffle_hash: SMJ spills, while SHJ must build one side's partition as
    # an in-memory hash map, which OOMed at 1M synthetic docs (56M postings
    # → ~200 MB build per partition × 32 concurrent tasks > the executor
    # memory fraction). shuffle_hash stays the pin only where one side is
    # bounded-but-never-broadcastable (the id semi-join, the candidate
    # verify joins); broadcast remains forbidden for all of them.
    def rarest_block(g_in, gdf_in):
        return (
            g_in.join(long_ids.hint("shuffle_hash"), "id", "left_semi")
            .hint("merge")
            .join(gdf_in.hint("merge"), "gram")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("id").alias("id_inner"), "gram")
        )

    if heavy_df_cap is not None:
        # r12 aggregated path (PERF r12 note in the docstring): the guard
        # machinery bounds per-gram df on this stream — heavy grams are
        # anti-joined out on guarded corpora, the probe over-catches hot
        # grams on probed-clean ones, and sub-probe corpora have df ≤
        # n_docs < probe_min_docs — so the per-gram id array is bounded
        # and the posting stream can be aggregated ONCE instead of
        # crossing three gram-keyed Exchanges. df = size(ids) (free); the
        # rarest-gram choice is min(struct(df, gram)) — identical to the
        # row_number-over-(df, gram) window but map-side partial and
        # sort-free; the candidate join explodes the (already gram-
        # partitioned) array table. Candidates are deduped downstream, so
        # the bag→set change cannot alter results.
        gagg = g_main.groupBy("gram").agg(
            F.array_sort(F.collect_set("id")).alias("ids")
        )
        if persist:
            # feeds the blocking branch AND the candidate join
            gagg = _track(gagg.persist(StorageLevel.MEMORY_AND_DISK))
        # every id in gagg is a long doc already (the posting stream is
        # long-only, see above) — no semi-join needed before the rarest
        # choice
        blk = (
            gagg.select(
                "gram", F.size("ids").alias("df"), F.explode("ids").alias("id")
            )
            .groupBy("id")
            .agg(F.min(F.struct("df", "gram")).alias("m"))
            .select(F.col("id").alias("id_inner"), F.col("m.gram").alias("gram"))
        )
        if use_guard:
            # blk (one row per blocked doc) is read by the candidate join
            # AND the all-heavy derivation below — persist (lazily) so the
            # blocking pass runs once.
            blk = _track(blk.persist())
        cand_long = (
            blk.hint("merge")
            .join(gagg.hint("merge"), "gram")
            .select("id_inner", F.explode("ids").alias("id_outer"))
            .filter(F.col("id_inner") != F.col("id_outer"))
            .select("id_inner", "id_outer")
        )
    else:
        # heavy_df_cap=None disables the guard AND the df bound — a hot
        # gram's id array would be unbounded, so keep the join plan (SMJ
        # spills; an aggregation buffer cannot).
        blk = rarest_block(g_main, gdf_main)
        if use_guard:
            blk = _track(blk.persist())
        cand_long = (
            blk.hint("merge")
            .join(
                g_main.select(F.col("id").alias("id_outer"), "gram").hint("merge"),
                "gram",
            )
            .filter(F.col("id_inner") != F.col("id_outer"))
            .select("id_inner", "id_outer")
        )

    if use_guard:
        # Second pass for all-heavy inner docs (every gram above the cap:
        # their rarest gram IS heavy, and only the unpruned tables can
        # block them). A doc with ANY light gram appears in blk, so the
        # all-heavy set is long_ids minus blk's ids — gated on a count
        # that reuses the cached blk (this branch only runs on corpora
        # where the probe already found real boilerplate, so the eager
        # materialization is paid exactly where the guard earns it).
        all_heavy_ids = long_ids.join(
            blk.select(F.col("id_inner").alias("id")).hint("shuffle_hash"),
            "id",
            "left_anti",
        )
        if all_heavy_ids.count() > 0:
            # broadcast the bounded id set; pure-boilerplate corpora where
            # it cannot broadcast have a doomed quadratic pass anyway
            blk_h = rarest_block(
                g.join(F.broadcast(all_heavy_ids), "id", "left_semi"), gdf
            )
            # blk_h is one row per all-heavy doc — a bounded set; broadcast
            # it so the full posting stream (hot keys included) is probed
            # map-side instead of shuffled into per-gram partitions.
            cand_heavy = (
                F.broadcast(blk_h)
                .join(g.select(F.col("id").alias("id_outer"), "gram"), "gram")
                .filter(F.col("id_inner") != F.col("id_outer"))
                .select("id_inner", "id_outer")
            )
            cand_long = cand_long.unionByName(cand_heavy)

    # one row per DISTINCT word per doc (r12): array_distinct runs map-side
    # on the plain split array (codegen-safe explode — not a HOF-built
    # array), shrinking the unigram stream entering the SMJ sort below;
    # candidates were always deduped downstream, so bag→set is free. The
    # block key is xxhash64 of the word (same candidate-superset argument
    # as the k-gram hashes above).
    uni = words.select(
        "id", F.explode(F.array_distinct("w")).alias("gram")
    ).select(F.col("id").alias("id_outer"), F.xxhash64("gram").alias("word"))
    short_blk = norm.filter(nwords < k).select(
        F.col("id").alias("id_inner"),
        F.xxhash64(F.element_at(F.split(F.col("t"), " "), 1)).alias("word"),
    )
    cand_short = (
        short_blk.hint("merge")
        .join(uni.hint("merge"), "word")
        .filter(F.col("id_inner") != F.col("id_outer"))
        .select("id_inner", "id_outer")
    )

    cand = cand_long.unionByName(cand_short).dropDuplicates(["id_inner", "id_outer"])
    pad = lambda c: F.concat(F.lit(" "), c, F.lit(" "))  # noqa: E731
    verified = (
        cand.hint("shuffle_hash")
        .join(norm.select(F.col("id").alias("id_inner"), F.col("t").alias("t_in")), "id_inner")
        .hint("shuffle_hash")
        .join(norm.select(F.col("id").alias("id_outer"), F.col("t").alias("t_out")), "id_outer")
        .filter(F.instr(pad(F.col("t_out")), pad(F.col("t_in"))) > 0)
    )
    return verified.select("id_inner", "id_outer")


def duplicate_block_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_chars: int = 30,
    min_df: int = 2,
    keep_cols: Sequence[str] = (),
    handles: list | None = None,
) -> DataFrame:
    """Exact duplicated-substring SPANS at K-char block granularity — the
    ExactSubstr pass of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), re-expressed for a shared-nothing engine: the
    paper builds one suffix array over the concatenated corpus (inherently
    single-address-space); here each doc is tiled into K-char blocks, block
    document-frequency is one corpus-wide hash aggregation, and ADJACENT
    duplicated blocks coalesce into maximal spans with a gaps-and-islands
    window (granularity K instead of the suffix array's byte-exact spans —
    every detected span IS an exact cross-doc duplicate; spans shorter than
    K are missed, and — the serious gap — a duplicate is detected ONLY when
    its start offsets in the two docs are congruent mod K: fixed tiles are
    PHASE-ALIGNMENT-BLIND, so an arbitrarily long shared substring at
    mismatched phase produces zero identical blocks. Use
    ``duplicate_chunk_spans`` (content-defined chunk boundaries, offset-
    invariant) as the ExactSubstr stand-in; this fixed-tile tier remains
    only as the cheaper same-phase scan, e.g. for re-checking known-aligned
    shards).

    Scale shape: blocks shuffle once on their text for the frequency count
    (map-side partial combine; at production scale key by a 16-byte digest
    like ``exact_dedup`` to shrink the shuffle), the posting stream rejoins
    co-partitioned on the same key (SMJ-pinned so stats can never broadcast
    a corpus side), and the islands window partitions per doc — bounded by
    len(doc)/K rows, never corpus-wide. Document bodies never travel.

    Returns per-doc span stats for docs with >= 1 duplicated span:
    (id, *keep_cols, n_chars, n_spans, dup_blocks, max_span_chars).

    Cache contract (same as the minhash shingle table / chunk_postings
    callers): the returned plan holds the block-posting table PERSISTED
    (it feeds both the frequency aggregate and the rejoin — without the
    persist the tile+substr pass runs twice). The CALLER owns the
    lifecycle: call ``spark.catalog.clearCache()`` (what the bench harness
    does) or unpersist after materializing downstream results; library
    pipelines that loop over corpora must not rely on GC.
    """
    docs = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("id"),
        *keep_cols,
        F.col(text_col).alias("_t"),
        F.length(text_col).cast("long").alias("n_chars"),
    )
    k = block_chars
    nblk = F.floor(F.col("n_chars") / k).cast("int")
    blocks = (
        docs.filter(F.col("n_chars") >= k)
        .select(
            "id",
            *keep_cols,
            "n_chars",
            "_t",
            F.explode(F.sequence(F.lit(0), nblk - 1)).alias("blk_idx"),
        )
        .select(
            "id",
            *keep_cols,
            "n_chars",
            "blk_idx",
            F.col("_t").substr(F.col("blk_idx") * k + 1, F.lit(k)).alias("block"),
        )
        # feeds BOTH the frequency aggregate and the rejoin stream — same
        # persist policy as chunk_postings' caller (q_paragraph_dedup).
        .persist()
    )
    if handles is not None:
        # deterministic lifecycle for library pipelines (ADVICE r7): the
        # caller unpersists each handle after materializing downstream
        # results instead of relying on spark.catalog.clearCache()
        handles.append(blocks)
    freq = (
        blocks.groupBy("block")
        .agg(F.countDistinct("id").alias("df"))
        .filter(F.col("df") >= min_df)
    )
    dup = blocks.hint("merge").join(freq.hint("merge"), "block").drop("df", "block")
    w = Window.partitionBy("id").orderBy("blk_idx")
    isl = dup.withColumn("island", F.col("blk_idx") - F.row_number().over(w))
    spans = isl.groupBy("id", "island").agg(
        *[F.max(c).alias(c) for c in (*keep_cols, "n_chars")],
        F.count("*").cast("long").alias("span_blocks"),
    )
    return spans.groupBy("id").agg(
        *[F.max(c).alias(c) for c in (*keep_cols, "n_chars")],
        F.count("*").cast("long").alias("n_spans"),
        F.sum("span_blocks").cast("long").alias("dup_blocks"),
        (F.max("span_blocks") * k).cast("long").alias("max_span_chars"),
    )


_GEAR_CACHE: dict = {}


def _gear_tables():
    """(gear table, base powers) for the ``scheme="gear"`` CDC tier —
    FastCDC-style gear table seeded deterministically: G[b] = first 8 bytes
    of md5(bytes([b])), so any language reproduces it; base = the 64-bit
    FNV prime. Built once per process (executor), cached."""
    if "G" not in _GEAR_CACHE:
        import hashlib

        import numpy as np

        G = np.array(
            [
                int.from_bytes(hashlib.md5(bytes([b])).digest()[:8], "little")
                for b in range(256)
            ],
            dtype=np.uint64,
        )
        pows = np.empty(64, dtype=np.uint64)
        pows[0] = 1
        with np.errstate(over="ignore"):
            for j in range(1, 64):
                pows[j] = pows[j - 1] * np.uint64(0x100000001B3)
        _GEAR_CACHE["G"] = G
        _GEAR_CACHE["POWS"] = pows
    return _GEAR_CACHE["G"], _GEAR_CACHE["POWS"]


def gear_boundaries_batch(texts, window: int = 8, modulus: int = 16):
    """Vectorized CDC boundary kernel for a BATCH of texts — the numpy body
    of the ``scheme="gear"`` tier, importable on its own so tests can replay
    it without Spark. Windowed polynomial rolling hash over a gear table
    (the rsync/LBFS/FastCDC anchoring family, all public designs):
    H(i) = sum_{j=0..w-1} G[code[i-j] & 255] * B^j  (uint64 wraparound),
    position i (1-based) is a boundary iff H(i) % modulus == 0. Depends
    only on the trailing ``window`` chars — the same offset-invariance
    argument as the md5/xxhash64 tiers, with the whole batch processed as
    ONE concatenated numpy pass (~8 vectorized multiply-adds per char, no
    per-position hashing): two orders of magnitude more chars/s/core than
    evaluating a hash expression per position in the JVM's interpreted
    higher-order ``filter``.

    Returns a list of int32 arrays: per text, the ascending 1-based
    interior anchor positions in w..len-1 (doc ends are the caller's job,
    matching the JVM tiers' ``bounds`` construction exactly).
    """
    import numpy as np

    G, POWS = _gear_tables()
    w = window
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    if len(lens) == 0 or lens.sum() == 0:
        return [np.empty(0, dtype=np.int32) for _ in texts]
    # utf-32-le => one uint32 CODEPOINT per char, so positions are char
    # positions (JVM substring/length are codepoint-based too — the tiers
    # agree on indexing even for non-BMP text)
    codes = np.frombuffer("".join(texts).encode("utf-32-le"), dtype="<u4")
    g = G[codes & 255]
    n = len(g)
    H = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(min(w, n)):  # n < w: nothing can anchor anyway
            H[j:] += g[: n - j] * POWS[j]
    pos = np.flatnonzero((H % np.uint64(modulus)) == 0)
    ends = np.cumsum(lens)
    starts = ends - lens
    doc = np.searchsorted(ends, pos, side="right")
    local = pos - starts[doc] + 1  # 1-based anchor (window ends at this char)
    # interior only: anchors < w would read the PREVIOUS doc's tail through
    # the batch concatenation; anchor == len duplicates the doc-end bound
    valid = (local >= w) & (local <= lens[doc] - 1)
    pos_v = local[valid].astype(np.int32)
    counts = np.bincount(doc[valid], minlength=len(texts))
    return np.split(pos_v, np.cumsum(counts)[:-1])


def cdc_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    boundary_hex: str = "0",
    keep_cols: Sequence[str] = (),
    with_text: bool = False,
    scheme: str = "md5",
) -> DataFrame:
    """Content-defined chunking (CDC): split each doc into variable-length
    chunks whose boundaries are derived from the TEXT, not from byte
    offsets — the fix for fixed-tile phase blindness. Position ``i``
    (1-based) ends a chunk iff the anchor hash of the trailing ``window``
    chars lands in a 1/16^len(boundary_hex) target set (plus the doc end);
    identical text therefore yields identical interior chunks at ANY offset
    in any doc, which is what makes cross-doc duplicate detection
    offset-invariant (the rolling-hash anchoring idea behind LBFS/rsync
    chunking and restic/borg dedup — all public designs). Expected chunk
    length = 16^len(boundary_hex) chars under either scheme.

    ``scheme`` picks the ANCHOR hash family (same split as
    ``minhash_neardup_pairs``'s km-md5/xxhash64 knob — the r8 verdict's
    lead ask):

    - ``"md5"`` (default): boundary iff the md5 hex of the window ends with
      ``boundary_hex``. Every value is recomputable in DuckDB, so the
      driver value-checks the whole chunker end to end. Cost: one md5 (and
      one 32-char hex string allocation) per character position.
    - ``"xxhash64"``: boundary iff ``xxhash64(window) % 16^len(
      boundary_hex) == 0`` — all-JVM mid tier. One non-cryptographic
      long-valued hash per position, no hex rendering, no string compare
      (~1.5x the md5 tier; the ceiling is Spark's interpreted higher-order
      ``filter``, not the hash).
    - ``"gear"``: the PRODUCTION tier — an Arrow-batched numpy rolling
      hash (``gear_boundaries_batch``: FastCDC-style gear table + windowed
      polynomial, public rsync/LBFS designs), one vectorized pass over the
      whole Arrow batch instead of one hash expression per position;
      measured >=2x the md5 tier end-to-end on the unaligned-duplicate
      stress corpus (SCALE.md). This is the one deliberate use of the
      Python path in the dedup family: the per-character scan is exactly
      the shape Catalyst's interpreted HOF lambdas do worst, and the UDF
      is pandas/Arrow-batched (never row-at-a-time) returning only an
      array of boundary ints per doc.

    Boundaries differ BETWEEN tiers (different anchor sets) but the
    offset-invariance argument and the chunk-length distribution are
    identical, so recall on planted unaligned duplicates is statistically
    equivalent (pinned by ``tests/test_curation.py``). The same tier must
    be used for a corpus and any incremental history built from it.

    The boundary set is one ``filter`` over ``sequence(window, n)`` — all
    JVM codegen either way; ``chunk_hash`` (the digest that travels into
    corpus-wide shuffles) stays md5-of-chunk-text under BOTH schemes: it is
    one md5 pass over the doc total (n/16 calls), 128-bit so digest
    equality is corpus-safe where a 64-bit chunk id would hit birthday
    collisions near ~2^32 distinct chunks, and it keeps the two tiers'
    outputs directly comparable. Chunk extraction is one ``transform`` over
    boundary pairs, and docs shorter than ``window`` become a single
    whole-doc chunk (so short exact dups still surface).

    Memory shape (ADVICE r8): the position scan materializes ONE int array
    of n_chars elements per document before filtering (``sequence(w,
    n-1)``) — ~4 bytes/char transiently, so a single tens-of-MB document
    allocates a proportionally large array inside one row. Linear and
    executor-local, but callers feeding raw crawl data should pre-split
    pathological multi-MB documents (or cap at ingest) rather than rely on
    headroom; the testdata and stress corpora are well under that.

    Returns one row per chunk: (id, *keep_cols, n_chars, chunk_idx,
    chunk_len, chunk_hash[, chunk]) — chunks partition the doc exactly
    (sum(chunk_len) == n_chars). Only the 16-byte ``chunk_hash`` travels
    into corpus-wide shuffles unless ``with_text`` is set (the clean/rebuild
    path needs the text; it stays co-partitioned per doc).
    """
    if scheme not in ("md5", "xxhash64", "gear"):
        raise ValueError(f"cdc_chunks: unknown scheme {scheme!r} (md5|xxhash64|gear)")
    w = window
    nh = len(boundary_hex)
    docs = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("id"),
        *keep_cols,
        F.col(text_col).alias("_t"),
        F.length(text_col).cast("long").alias("n_chars"),
    )
    t = F.col("_t")
    n_int = F.col("n_chars").cast("int")
    # interior anchor positions scan w..n-1 (the doc end n always closes the
    # last chunk, so an anchor AT n would only duplicate it — excluding it
    # keeps the boundary list strictly increasing with no distinct() needed,
    # which matters because DuckDB's list_distinct does not preserve order)
    if scheme == "gear":
        from pyspark.sql.functions import pandas_udf

        modulus = 16 ** nh

        @pandas_udf("array<int>")
        def _gear_bounds(s: pd.Series) -> pd.Series:
            texts = ["" if v is None else v for v in s]
            return pd.Series(gear_boundaries_batch(texts, window=w, modulus=modulus))

        interior = _gear_bounds(t)
    elif scheme == "xxhash64":
        modulus = 16 ** nh
        interior = F.filter(
            F.sequence(F.lit(w), n_int - 1),
            lambda i: F.pmod(F.xxhash64(t.substr(i - w + 1, F.lit(w))), F.lit(modulus))
            == 0,
        )
    else:
        interior = F.filter(
            F.sequence(F.lit(w), n_int - 1),
            lambda i: F.substring(
                F.md5(t.substr(i - w + 1, F.lit(w)).cast("binary")), 33 - nh, nh
            )
            == boundary_hex,
        )
    bounds = F.concat(
        F.array(F.lit(0)),
        F.when(n_int > w, interior).otherwise(F.array().cast("array<int>")),
        F.array(n_int),
    )
    b = F.col("_b")
    spans = F.transform(
        F.sequence(F.lit(1), F.size(b) - 1),
        lambda j: F.struct(
            F.element_at(b, j).alias("s"),
            (F.element_at(b, j + 1) - F.element_at(b, j)).alias("ln"),
        ),
    )
    chunk_txt = t.substr(F.col("c.s") + 1, F.col("c.ln"))
    out_cols = [
        "id",
        *keep_cols,
        "n_chars",
        "chunk_idx",
        F.col("c.ln").cast("long").alias("chunk_len"),
        F.md5(chunk_txt.cast("binary")).alias("chunk_hash"),
    ]
    if with_text:
        out_cols.append(chunk_txt.alias("chunk"))
    return (
        docs.withColumn("_b", bounds)
        .select(
            "id",
            *keep_cols,
            "n_chars",
            "_t",
            F.posexplode(spans).alias("chunk_idx", "c"),
        )
        .select(*out_cols)
    )


def duplicate_chunk_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    boundary_hex: str = "0",
    min_chunk: int = 20,
    min_df: int = 2,
    keep_cols: Sequence[str] = (),
    handles: list | None = None,
    scheme: str = "md5",
) -> DataFrame:
    """Exact duplicated-substring SPANS at content-defined-chunk granularity
    — the ExactSubstr pass of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better") re-expressed for a shared-nothing engine.
    The paper builds one suffix array over the concatenated corpus
    (single-address-space); here docs split into content-defined chunks
    (``cdc_chunks``: boundaries anchored by the md5 of the trailing w
    chars), chunk document-frequency is one corpus-wide hash aggregation on
    16-byte digests, and adjacent duplicated chunks coalesce into maximal
    spans with a gaps-and-islands window. Because boundaries are
    content-derived, a shared substring produces identical interior chunks
    at ANY pair of offsets — unlike fixed tiling (``duplicate_block_spans``)
    there is no phase-alignment blindness; what is still missed is only a
    duplicate none of whose interior chunks reaches ``min_chunk`` chars.
    That tail is quantifiable: chunk lengths are ~1+Geometric(1/16) at the
    default 1-hex anchor, so P(a chunk qualifies at min_chunk=20) =
    (15/16)^19 ~ 0.29 and a shared region of c chars misses with
    probability ~(1-0.29)^(c/16) — ~1e-3 at c=360, measured 0.9996 recall
    on 10k unaligned 360-char plants at the 1M-doc stress (8 misses, right
    on theory; SCALE.md). Every detected span IS an exact cross-doc
    duplicate — no false positives. Lee et al.'s suffix array is exact
    above its 50-token floor; this trades that last ~1e-3 of recall near
    the floor for a shared-nothing plan.

    Scale shape: chunk digests shuffle once for the frequency count
    (map-side partial combine), the posting stream rejoins co-partitioned on
    the digest (SMJ-pinned so stats can never broadcast a corpus side), and
    the islands window partitions per doc — bounded by len(doc)/16 rows,
    never corpus-wide. Document bodies never travel.

    Returns per-doc span stats for docs with >= 1 duplicated span:
    (id, *keep_cols, n_chars, n_spans, dup_chunks, dup_chars,
    max_span_chars).

    Cache contract: the chunk table is persisted (it feeds both the
    frequency aggregate and the rejoin). Pass ``handles`` (a list) to
    receive the persisted DataFrame for deterministic unpersist; otherwise
    the caller owns ``spark.catalog.clearCache()``.

    ``scheme`` selects the CDC anchor-hash tier (see ``cdc_chunks``):
    ``"md5"`` is the DuckDB-replayable oracle tier, ``"xxhash64"`` the
    all-JVM production tier (>=2x faster boundary scan, statistically
    equivalent recall — pinned by the planted-unaligned-duplicate test).
    """
    chunks = cdc_chunks(
        df, text_col, id_col, window=window, boundary_hex=boundary_hex,
        keep_cols=keep_cols, scheme=scheme,
    ).persist()
    if handles is not None:
        handles.append(chunks)
    q = chunks.filter(F.col("chunk_len") >= min_chunk)
    freq = (
        q.groupBy("chunk_hash")
        .agg(F.countDistinct("id").alias("df"))
        .filter(F.col("df") >= min_df)
    )
    dup = q.hint("merge").join(freq.hint("merge"), "chunk_hash").drop("df", "chunk_hash")
    w_ = Window.partitionBy("id").orderBy("chunk_idx")
    isl = dup.withColumn("island", F.col("chunk_idx") - F.row_number().over(w_))
    spans = isl.groupBy("id", "island").agg(
        *[F.max(c).alias(c) for c in (*keep_cols, "n_chars")],
        F.count("*").cast("long").alias("span_chunks"),
        F.sum("chunk_len").cast("long").alias("span_chars"),
    )
    return spans.groupBy("id").agg(
        *[F.max(c).alias(c) for c in (*keep_cols, "n_chars")],
        F.count("*").cast("long").alias("n_spans"),
        F.sum("span_chunks").cast("long").alias("dup_chunks"),
        F.sum("span_chars").cast("long").alias("dup_chars"),
        F.max("span_chars").cast("long").alias("max_span_chars"),
    )


def exactsubstr_clean(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    boundary_hex: str = "0",
    min_chunk: int = 20,
    min_df: int = 2,
    keep_cols: Sequence[str] = (),
    handles: list | None = None,
    scheme: str = "md5",
) -> DataFrame:
    """Duplicate-span REMOVAL — the second half of Lee et al.'s ExactSubstr
    (they don't just report duplicated spans, they cut them and keep one
    copy). Every content-defined chunk of length >= ``min_chunk`` that
    occurs in >= ``min_df`` distinct docs is removed from every doc EXCEPT
    its first occurrence corpus-wide (smallest (doc id, chunk idx) — a
    deterministic, coordination-free rule), and each doc's cleaned text is
    re-emitted as the concatenation of its kept chunks in order.

    Scale shape: the keeper election is one hash aggregation on chunk
    digests (min(struct(id, idx)) — map-side combinable); the mark join is
    digest-keyed and SMJ-pinned; the rebuild groups per doc, so the
    collect_list it holds is bounded by a single document's size — bodies
    shuffle exactly once, on their own doc id. Nothing is quadratic and
    nothing corpus-sized reaches the driver.

    Returns one row per input doc (empty-text docs excluded):
    (id, *keep_cols, n_chars, clean_text, chars_removed) — chars_removed ==
    n_chars - length(clean_text), and under the same boundary rule the
    cleaned corpus contains no cross-doc duplicate chunk except the elected
    keepers (property-tested).

    ``scheme`` selects the CDC anchor-hash tier (see ``cdc_chunks``):
    ``"md5"`` is the DuckDB-replayable oracle tier, ``"xxhash64"`` the
    all-JVM production tier (>=2x faster boundary scan, statistically
    equivalent recall — pinned by the planted-unaligned-duplicate test).
    """
    chunks = cdc_chunks(
        df, text_col, id_col, window=window, boundary_hex=boundary_hex,
        keep_cols=keep_cols, with_text=True, scheme=scheme,
    ).persist()
    if handles is not None:
        handles.append(chunks)
    q = chunks.filter(F.col("chunk_len") >= min_chunk)
    dupk = (
        q.groupBy("chunk_hash")
        .agg(
            F.countDistinct("id").alias("df"),
            F.min(F.struct(F.col("id"), F.col("chunk_idx"))).alias("keeper"),
        )
        .filter(F.col("df") >= min_df)
        .select("chunk_hash", "keeper")
    )
    # joining ALL chunks is safe: dupk holds only hashes of >=min_chunk
    # texts, and equal md5 implies equal text implies equal length
    marked = chunks.hint("merge").join(dupk.hint("merge"), "chunk_hash", "left")
    cut = F.col("keeper").isNotNull() & ~(
        (F.col("keeper.id") == F.col("id"))
        & (F.col("keeper.chunk_idx") == F.col("chunk_idx"))
    )
    marked = marked.withColumn("cut", cut)
    kept_arr = F.array_sort(
        F.collect_list(F.when(~F.col("cut"), F.struct("chunk_idx", "chunk")))
    )
    return marked.groupBy("id").agg(
        *[F.max(c).alias(c) for c in (*keep_cols, "n_chars")],
        F.array_join(
            F.transform(kept_arr, lambda x: x.getField("chunk")), ""
        ).alias("clean_text"),
        F.sum(F.when(F.col("cut"), F.col("chunk_len")).otherwise(F.lit(0)))
        .cast("long")
        .alias("chars_removed"),
    )


def exactsubstr_clean_incremental(
    new_df: DataFrame,
    history_hashes: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    boundary_hex: str = "0",
    min_chunk: int = 20,
    min_df: int = 2,
    keep_cols: Sequence[str] = (),
    handles: list | None = None,
    scheme: str = "md5",
) -> DataFrame:
    """Incremental ExactSubstr clean: scrub a NEW batch against corpus
    HISTORY — the shape every continuously-crawled pipeline actually runs
    (the full corpus is cleaned once; each new crawl then dedups against
    the accumulated digest table, never re-reading old bodies). Chunk-level
    twin of ``incremental_dedup``.

    ``history_hashes``: a DataFrame whose first column is the md5 chunk
    digest of every qualifying (>= min_chunk chars) chunk already in the
    corpus — i.e. ``cdc_chunks(history, ...).filter(chunk_len >=
    min_chunk).select("chunk_hash")`` persisted as a table by the previous
    run. Only 16-byte digests are stored and shuffled; history documents
    never travel.

    Cut rule: a qualifying chunk of a new doc is removed when its digest
    exists in HISTORY (the corpus already holds a copy — history always
    wins), or when it duplicates within the batch and this occurrence is
    not the batch keeper (smallest (id, chunk_idx) — same election as
    ``exactsubstr_clean``). Returns one row per new doc:
    (id, *keep_cols, n_chars, clean_text, chars_removed).

    Scale shape: both the history membership probe and the batch keeper
    election are digest-keyed joins/aggregations, SMJ-pinned (history is
    corpus-scale by definition — stats must never broadcast it); the
    rebuild groups per doc as in ``exactsubstr_clean``.

    Cache contract (same as ``exactsubstr_clean``): the batch's chunk table
    is PERSISTED (it feeds the keeper election and the rebuild). Pass
    ``handles`` (a list) to receive it for deterministic unpersist;
    otherwise the caller owns ``spark.catalog.clearCache()``. The history
    digest table must have been built under the SAME ``scheme``/``window``/
    ``boundary_hex`` as this call — different anchor sets chunk differently,
    so digests would simply never match (recall loss, not corruption).

    ``scheme`` selects the CDC anchor-hash tier (see ``cdc_chunks``):
    ``"md5"`` is the DuckDB-replayable oracle tier, ``"xxhash64"`` the
    all-JVM production tier (>=2x faster boundary scan, statistically
    equivalent recall — pinned by the planted-unaligned-duplicate test).
    """
    chunks = cdc_chunks(
        new_df, text_col, id_col, window=window, boundary_hex=boundary_hex,
        keep_cols=keep_cols, with_text=True, scheme=scheme,
    ).persist()
    if handles is not None:
        handles.append(chunks)
    q = chunks.filter(F.col("chunk_len") >= min_chunk)
    batch_dup = (
        q.groupBy("chunk_hash")
        .agg(
            F.countDistinct("id").alias("df"),
            F.min(F.struct(F.col("id"), F.col("chunk_idx"))).alias("keeper"),
        )
        .filter(F.col("df") >= min_df)
        .select("chunk_hash", "keeper")
    )
    hist = (
        history_hashes.select(F.col(history_hashes.columns[0]).alias("chunk_hash"))
        .distinct()
        .withColumn("in_hist", F.lit(True))
    )
    marked = (
        chunks.hint("merge")
        .join(batch_dup.hint("merge"), "chunk_hash", "left")
        .hint("merge")
        .join(hist.hint("merge"), "chunk_hash", "left")
    )
    qualifies = F.col("chunk_len") >= min_chunk
    cut = qualifies & (
        F.coalesce(F.col("in_hist"), F.lit(False))
        | (
            F.col("keeper").isNotNull()
            & ~(
                (F.col("keeper.id") == F.col("id"))
                & (F.col("keeper.chunk_idx") == F.col("chunk_idx"))
            )
        )
    )
    marked = marked.withColumn("cut", cut)
    kept_arr = F.array_sort(
        F.collect_list(F.when(~F.col("cut"), F.struct("chunk_idx", "chunk")))
    )
    return marked.groupBy("id").agg(
        *[F.max(c).alias(c) for c in (*keep_cols, "n_chars")],
        F.array_join(
            F.transform(kept_arr, lambda x: x.getField("chunk")), ""
        ).alias("clean_text"),
        F.sum(F.when(F.col("cut"), F.col("chunk_len")).otherwise(F.lit(0)))
        .cast("long")
        .alias("chars_removed"),
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 3,
    threshold: float = 0.5,
    block_prefix_chars: int = 2,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995): sort records
    on a key, compare each record only to its next ``window`` neighbors in
    sort order — the classic linear-comparison alternative to LSH blocking
    for record linkage. Blocking key = (*block_cols, first
    ``block_prefix_chars`` of the normalized text); sort key = (normalized
    text, id) within each block.

    Scale shape: ONE shuffle on the blocking key, then a window whose
    neighbor expansion is ``lead`` k=1..w — each row emits at most w
    candidate pairs, so comparisons are O(n*w), never quadratic. Window
    partitions are per-block: the blocking key is the knob that bounds
    partition size (at production scale use a longer prefix / more block
    columns so no block exceeds an executor task; skewed natural-language
    prefixes are exactly why the prefix length is a parameter). Similarity
    is exact Jaccard over distinct word sets carried THROUGH the window as
    arrays — no second join back to the corpus.

    Returns (id_a, id_b, jaccard) for neighbor pairs with Jaccard >=
    threshold; id_a < id_b.
    """
    norm = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col).alias("id"),
            *block_cols,
            normalize_text(F.col(text_col)).alias("t"),
        )
        # a doc of only punctuation normalizes to '' (wset=['']): two such
        # unrelated docs would pair at jaccard 1.0 — drop them, matching the
        # oracle's WHERE t <> '' (ADVICE r7)
        .filter(F.col("t") != "")
        .withColumn("wset", F.array_distinct(F.split(F.col("t"), " ")))
        .withColumn("blk", F.substring(F.col("t"), 1, block_prefix_chars))
    )
    w = Window.partitionBy(*block_cols, "blk").orderBy("t", "id")
    widened = norm.select(
        "id",
        "wset",
        *[
            c
            for i in range(1, window + 1)
            for c in (
                F.lead("id", i).over(w).alias(f"nid_{i}"),
                F.lead("wset", i).over(w).alias(f"nset_{i}"),
            )
        ],
    )
    pairs = widened.select(
        "id",
        "wset",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(f"nid_{i}").alias("nid"), F.col(f"nset_{i}").alias("nset")
                    )
                    for i in range(1, window + 1)
                ]
            )
        ).alias("nb"),
    ).filter(F.col("nb.nid").isNotNull())
    inter = F.size(F.array_intersect("wset", F.col("nb.nset")))
    union = F.size("wset") + F.size(F.col("nb.nset")) - inter
    out = pairs.select(
        F.least("id", F.col("nb.nid")).alias("id_a"),
        F.greatest("id", F.col("nb.nid")).alias("id_b"),
        (inter.cast("double") / union).alias("j"),
    ).filter(F.col("j") >= threshold)
    return out.select(
        "id_a", "id_b", (F.floor(F.col("j") * 10000 + 0.5) / 10000).alias("jaccard")
    )
