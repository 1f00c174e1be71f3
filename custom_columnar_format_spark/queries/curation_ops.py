"""Corpus-curation query catalog, round-7 additions: exact duplicated-
substring spans (block-granular ExactSubstr), full-corpus distributed
k-means, sorted-neighborhood record blocking, readability filtering, and
deterministic curriculum/epoch ordering.

Every query is DuckDB-oracled except ``q_kmeans_fit`` (the iterative Lloyd
loop — its single iteration IS oracled as ``q_kmeans_iter``, and the loop is
pinned iteration-for-iteration against a pure-NumPy reference in
``tests/test_curation.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, kmeans
from .llm_ops import _NORM_SQL, _docs_spread, _emb_spread
from .registry import query
from .tables import load

_BLOCK_CHARS = 30
_KMEANS_K = 8
_EMB_DIM = 64


@query(
    "q_exact_substring_spans",
    f"""
    WITH docs AS (
      SELECT doc_id, source, text, length(text) AS n
      FROM documents WHERE trim(text) <> ''
    ),
    w1 AS (
      SELECT doc_id, source, n, text,
             unnest(generate_series(0, n//{_BLOCK_CHARS} - 1)) AS blk_idx
      FROM docs WHERE n >= {_BLOCK_CHARS}
    ),
    b AS (
      SELECT doc_id, source, n, blk_idx,
             substr(text, blk_idx*{_BLOCK_CHARS}+1, {_BLOCK_CHARS}) AS block
      FROM w1
    ),
    freq AS (
      SELECT block FROM b GROUP BY block HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    dup AS (SELECT b.doc_id, b.source, b.n, b.blk_idx FROM b JOIN freq USING (block)),
    isl AS (
      SELECT doc_id, source, n, blk_idx,
             blk_idx - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY blk_idx) AS island
      FROM dup
    ),
    spans AS (
      SELECT doc_id, source, n, island, COUNT(*) AS span_blocks
      FROM isl GROUP BY 1, 2, 3, 4
    ),
    per_doc AS (
      SELECT doc_id, source, n, COUNT(*) AS n_spans,
             SUM(span_blocks) AS dup_blocks, MAX(span_blocks) AS max_blocks
      FROM spans GROUP BY 1, 2, 3
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_with_spans,
           CAST(SUM(n_spans) AS BIGINT) AS n_spans,
           CAST(MAX(max_blocks) * {_BLOCK_CHARS} AS BIGINT) AS max_span_chars,
           floor(AVG(CAST(dup_blocks * {_BLOCK_CHARS} AS DOUBLE) / n) * 10000 + 0.5) / 10000
             AS avg_dup_frac
    FROM per_doc GROUP BY source
    """,
    doc="exact duplicated-substring SPANS (Lee et al. 2022 ExactSubstr, "
    f"block-tiled at {_BLOCK_CHARS} chars): docs tile into K-char blocks, "
    "corpus-wide block document-frequency marks cross-doc duplicates, and "
    "adjacent duplicated blocks coalesce into maximal spans via a "
    "gaps-and-islands window. Per-source report of span counts, the longest "
    "span, and the mean duplicated-char fraction. Scale shape: one shuffle "
    "on block text for the frequency count (digest-keyable), SMJ-pinned "
    "co-partitioned rejoin, islands window bounded per doc (len/K rows) — "
    "the suffix array the paper builds is single-address-space; this is the "
    "shared-nothing equivalent at block granularity.",
)
def q_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = dedup.duplicate_block_spans(
        _docs_spread(spark, sf_dir),
        "text",
        "doc_id",
        block_chars=_BLOCK_CHARS,
        keep_cols=["source"],
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs_with_spans"),
        F.sum("n_spans").cast("long").alias("n_spans"),
        F.max("max_span_chars").cast("long").alias("max_span_chars"),
        (
            F.floor(
                F.avg(
                    (F.col("dup_blocks") * _BLOCK_CHARS).cast("double") / F.col("n_chars")
                )
                * 10000
                + 0.5
            )
            / 10000
        ).alias("avg_dup_frac"),
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


@query(
    "q_kmeans_fit",
    # rows-only: the Lloyd LOOP is iterative and data-dependent (each
    # iteration's assignment depends on the previous update) — not one SQL
    # statement. Its single iteration is fully oracled above
    # (q_kmeans_iter), and the loop is pinned iteration-for-iteration
    # against a pure-NumPy reference on the same rows in
    # tests/test_curation.py::test_kmeans_fit_matches_numpy.
    None,
    doc=f"full distributed k-means fit (k={_KMEANS_K}, 3 Lloyd iterations, "
    "deterministic first-k seeding): per iteration one corpus pass (narrow "
    "assign + k*dim-group shuffle) and a k*dim-double model collect — the "
    "trained artifact itself, like the BPE merge table. Returns the final "
    "centroid table (cid, pos, centroid_val) plus per-cluster sizes.",
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
