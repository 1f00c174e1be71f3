"""Advanced-analytics query catalog: time-series gap-filling/interpolation,
BM25 ranking, count-min-sketch heavy hitters, fuzzy record linkage, skyline
(Pareto) queries, and statistical outlier detection.

Every query here is DuckDB-oracled: hashes are md5-prefix arithmetic,
floating sums are fixed-order, dates are rendered as ISO strings, so the
driver value-checks each pipeline end to end (same policy as llm_ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import fuzzy, ranking, sketches, skyline, timeseries
from .registry import query
from .tables import load


# The oracle-critical hashing/normalization idioms are shared with the
# km-md5 dedup oracles — ONE definition, so a fix there can never leave
# these oracles silently divergent.
from .llm_ops import _NORM_SQL, _hexparse_sql  # noqa: E402


# ---------------------------------------------------------------------------
# Time-series gap-fill / interpolation
# ---------------------------------------------------------------------------

_GAPFILL_CTES = """
    WITH p AS (
      SELECT user_id % 20 AS grp, CAST(date_trunc('day', ts) AS DATE) AS day, value
      FROM events WHERE event_type = 'purchase'
    ),
    cells AS (SELECT grp, day, ROUND(SUM(value), 6) AS rev FROM p GROUP BY 1, 2),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM p),
    spine AS (
      SELECT g.grp, d.day
      FROM (SELECT DISTINCT grp FROM p) g
      CROSS JOIN (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds
      ) d
    ),
    j AS (SELECT s.grp, s.day, c.rev FROM spine s LEFT JOIN cells c USING (grp, day))
"""


@query(
    "q_gapfill_ffill",
    _GAPFILL_CTES
    + """
    SELECT grp, strftime(day, '%Y-%m-%d') AS day,
           last_value(rev IGNORE NULLS) OVER (
             PARTITION BY grp ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_filled,
           CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM j
    """,
    doc="time-series resample: daily purchase revenue per user-cohort on a "
    "generated dense calendar spine, gaps forward-filled (time_bucket_gapfill"
    "+locf shape; spine is generated, never shuffled).",
)
def q_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    ev = ev.withColumn("grp", F.col("user_id") % 20)
    out = timeseries.gapfill_ffill(ev, "ts", "grp", "value")
    return out.select(
        "grp", F.date_format("day", "yyyy-MM-dd").alias("day"), "revenue_filled", "is_gap"
    )


@query(
    "q_interpolate_linear",
    _GAPFILL_CTES
    + """
    , w AS (
      SELECT grp, day, rev,
             last_value(rev IGNORE NULLS) OVER (
               PARTITION BY grp ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_prev,
             last_value(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY grp ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d_prev,
             first_value(rev IGNORE NULLS) OVER (
               PARTITION BY grp ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_next,
             first_value(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS) OVER (
               PARTITION BY grp ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS d_next
      FROM j
    )
    SELECT grp, strftime(day, '%Y-%m-%d') AS day,
           ROUND(CASE WHEN rev IS NOT NULL THEN rev
                      ELSE v_prev + (v_next - v_prev)
                           * date_diff('day', d_prev, day) / date_diff('day', d_prev, d_next)
                 END, 6) AS value_interp,
           CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM w
    """,
    doc="time-series resample with LINEAR interpolation between a cohort's "
    "neighboring observed days (sensor-series shape; four ignorenulls windows "
    "over one key partition — a single shuffle of the spine-sized table).",
)
def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    ev = ev.withColumn("grp", F.col("user_id") % 20)
    out = timeseries.interpolate_linear(ev, "ts", "grp", "value")
    return out.select(
        "grp", F.date_format("day", "yyyy-MM-dd").alias("day"), "value_interp", "is_gap"
    )


# ---------------------------------------------------------------------------
# BM25 ranking
# ---------------------------------------------------------------------------

_BM25_TERMS = ["spark", "merge", "window", "scan"]
_BM25_K1, _BM25_B, _BM25_TOPK = 1.2, 0.75, 15


def _bm25_oracle_sql() -> str:
    tf_cols = ",\n             ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{i}" for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}" for i in range(len(_BM25_TERMS))
    )
    # Fixed-order sum, matching operators/ranking.py term for term: the
    # engine folds contributions left to right starting from 0.0, so the
    # oracle nests the additions the same way for bit-identical doubles.
    score = "0.0"
    for i in range(len(_BM25_TERMS)):
        idf = f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        denom = f"(tf_{i} + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * dl / avgdl))"
        score = f"({score} + {idf} * (tf_{i} * {_BM25_K1 + 1}) / {denom})"
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    tf AS (
      SELECT doc_id, len(w) AS dl,
             {tf_cols}
      FROM toks
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl, {df_cols} FROM tf)
    SELECT doc_id, score FROM (
      SELECT doc_id, ROUND({score}, 6) AS score FROM tf CROSS JOIN stats
    ) WHERE score > 0
    ORDER BY score DESC, doc_id LIMIT {_BM25_TOPK}
    """


@query(
    "q_bm25_search",
    _bm25_oracle_sql(),
    doc="BM25 top-k document ranking for a query-term set: per-row array-"
    "expression term frequencies (no explode/shuffle), one broadcast stats "
    "row, fixed-order float sum (bit-identical cross-engine), "
    "TakeOrderedAndProject top-k.",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ranking.bm25_topk(
        load(spark, sf_dir, "documents"),
        _BM25_TERMS,
        k1=_BM25_K1,
        b=_BM25_B,
        topk=_BM25_TOPK,
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

_CMS_DEPTH, _CMS_WIDTH, _CMS_TOPK = 4, 256, 10


def _cms_oracle_sql() -> str:
    bucket = (
        _hexparse_sql("md5(CAST(r.row AS VARCHAR) || ':' || tok)", 1, 12) + f" % {_CMS_WIDTH}"
    )
    rows_values = ", ".join(f"({r})" for r in range(_CMS_DEPTH))
    return f"""
    WITH toks AS (
      SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
    ),
    cells AS (
      SELECT r.row AS row, {bucket} AS bucket
      FROM toks CROSS JOIN (VALUES {rows_values}) r(row)
    ),
    sketch AS (SELECT row, bucket, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
    cand AS (SELECT DISTINCT tok FROM toks),
    probes AS (
      SELECT tok, r.row AS row, {bucket} AS bucket
      FROM cand CROSS JOIN (VALUES {rows_values}) r(row)
    ),
    est AS (
      SELECT tok, MIN(cnt) AS est
      FROM probes JOIN sketch USING (row, bucket) GROUP BY tok
    )
    SELECT tok, est FROM est ORDER BY est DESC, tok LIMIT {_CMS_TOPK}
    """


@query(
    "q_cms_heavy_hitters",
    _cms_oracle_sql(),
    doc="count-min sketch heavy hitters over document tokens: fixed 4×256 "
    "counter grid (shuffle size independent of corpus size, cell-wise-SUM "
    "mergeable), md5-prefix bucket hashing so the oracle replays every "
    "counter exactly.",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import normalize_text

    docs = load(spark, sf_dir, "documents")
    items = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok")
    )
    return sketches.cms_heavy_hitters(
        items, "tok", topk=_CMS_TOPK, depth=_CMS_DEPTH, width=_CMS_WIDTH
    )


# ---------------------------------------------------------------------------
# Fuzzy record linkage
# ---------------------------------------------------------------------------


@query(
    "q_fuzzy_match_parts",
    """
    WITH d AS (SELECT p_name, MIN(p_partkey) AS id FROM part GROUP BY p_name),
    ok AS (
      SELECT split_part(p_name, ' ', 2) AS blk
      FROM d GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 5000
    )
    SELECT a.id AS id_a, b.id AS id_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM d a JOIN d b
      ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
     AND a.id < b.id
    JOIN ok ON ok.blk = split_part(a.p_name, ' ', 2)
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    doc="fuzzy record linkage at the DICTIONARY level: distinct part names "
    "(linking rows directly is quadratic in duplicate names — the name "
    "dictionary is orders of magnitude smaller and row application is a "
    "broadcast join afterward), blocked on the noun token, in-block pairs "
    "via the one-shuffle collect-and-expand, verified with levenshtein ≤ 3.",
)
def q_fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("rep_id"))
    return fuzzy.fuzzy_name_pairs(
        names,
        "p_name",
        "rep_id",
        # coalesce to '': for single-token names Spark's element_at yields
        # NULL (rows would drop from the block join) while the oracle's
        # split_part yields '' — '' on both sides keeps the engines aligned
        F.coalesce(F.element_at(F.split(F.col("p_name"), " "), 2), F.lit("")),
        max_dist=3,
    )


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier
# ---------------------------------------------------------------------------


@query(
    "q_skyline_parts",
    """
    SELECT a.p_partkey, a.p_name, a.p_retailprice, a.p_size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
    doc="skyline query (Pareto frontier: minimize price, maximize size) via "
    "the O(n log n) sort-scan algorithm — distinct-value agg, running max "
    "over the group table, semi-join back; the oracle is the quadratic "
    "NOT EXISTS the engine refuses to run.",
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return skyline.skyline_2d(part, "p_retailprice", "p_size").select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    )


# ---------------------------------------------------------------------------
# Statistical outliers
# ---------------------------------------------------------------------------


@query(
    "q_outliers_zscore",
    """
    WITH stats AS (
      SELECT event_type, AVG(value) AS m, stddev_samp(value) AS s
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, ROUND((e.value - s.m) / s.s, 6) AS z
    FROM events e JOIN stats s USING (event_type)
    WHERE s.s > 0 AND abs((e.value - s.m) / s.s) > 3
    """,
    doc="per-group z-score outlier detection (data-quality monitoring): "
    "5-row stats table broadcast back onto the stream — the raw side never "
    "shuffles. Degenerate all-identical groups (stddev 0) are excluded "
    "explicitly: Spark's 0/0 yields NULL while DuckDB yields inf/NaN, so "
    "without the s > 0 guard the engines diverge.",
)
def q_outliers_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("s")
    )
    z = (F.col("value") - F.col("m")) / F.col("s")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter((F.col("s") > 0) & (F.abs(z) > 3))
        .select("event_id", "event_type", F.round(z, 6).alias("z"))
    )


# ---------------------------------------------------------------------------
# Graph pattern counting
# ---------------------------------------------------------------------------


@query(
    "q_triangle_count_nations",
    """
    WITH e AS MATERIALIZED (
      -- MATERIALIZED: e is referenced three times; inlining would replay the
      -- four-table join per reference (measured 118 s -> 0.1 s at sf0.1)
      SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS a,
                      greatest(c.c_nationkey, s.s_nationkey) AS b
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
    )
    SELECT e1.a AS na, e1.b AS nb, e2.b AS nc
    FROM e e1
    JOIN e e2 ON e1.b = e2.a
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    doc="triangle enumeration over the nation trade graph (nations linked "
    "when a customer buys from a supplier across them): oriented-edge "
    "two-join counting — each triangle exactly once, equi-joins only; at web "
    "scale orient by degree instead of id (Suri-Vassilvitskii) to kill "
    "last-reducer skew.",
)
def q_triangle_count_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .distinct()
        # the edge table feeds three join branches (e1, e2, closing) —
        # persist so the four-table join runs once, not three times; at most
        # |nations|² rows, so executor memory cost is nil
        .persist()
    )
    return graph.triangles(edges)


# ---------------------------------------------------------------------------
# Rolling exact median / deterministic weighted sampling
# ---------------------------------------------------------------------------


@query(
    "q_rolling_median_7d",
    """
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             ROUND(SUM(value), 6) AS rev
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           ROUND(median(CAST(rev AS DOUBLE)) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
    FROM d
    """,
    doc="7-day rolling EXACT median of daily revenue per event type: Spark "
    "has no percentile window function, so the bounded frame (≤7 values) is "
    "collected per row and the median read off the sorted array — O(frame) "
    "per row, fine for small frames; the same even-count midpoint-average "
    "convention as DuckDB's interpolating median.",
)
def q_rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    d = (
        ev.select(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "value",
        )
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("value"), 6).alias("rev"))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("rev").over(w))
    d = d.withColumn("a", arr).withColumn("n", F.size("a"))
    lo = F.element_at("a", F.floor((F.col("n") + 1) / 2).cast("int"))
    hi = F.element_at("a", F.floor(F.col("n") / 2).cast("int") + 1)
    med = F.when(F.col("n") % 2 == 1, lo).otherwise((lo + hi) / 2)
    return d.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(med, 6).alias("med7"),
    )


_WS_K = 20


@query(
    "q_weighted_sample_ares",
    f"""
    WITH pri AS (
      SELECT doc_id,
             ROUND(
               -ln(({_hexparse_sql("md5('ws:' || CAST(doc_id AS VARCHAR))", 1, 12)} + 1.0)
                     / {(1 << 48) + 1}.0)
                 / n_chars, 12) AS k12
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, ROUND(k12, 9) AS ares_key
    FROM pri ORDER BY k12, doc_id LIMIT {_WS_K}
    """,
    doc="weighted sampling without replacement (Efraimidis-Spirakis A-ES): "
    "exponential key -ln(u)/w with u a deterministic md5-derived uniform — "
    "order-equivalent to top-k by u^(1/w) but without the rounding-tie "
    "low-id skew at large weights; the same rows win at any cluster size or "
    "partitioning, no driver-side RNG state; bottom-k by key is "
    "TakeOrderedAndProject. Weight = document length.",
)
def q_weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sampling

    docs = load(spark, sf_dir, "documents")
    out = sampling.weighted_sample(docs, "doc_id", "n_chars", _WS_K)
    return out.select("doc_id", F.round("ares_key", 9).alias("ares_key"))


# ---------------------------------------------------------------------------
# Equi-depth binning / mutual information
# ---------------------------------------------------------------------------

_NBINS = 10
_DECILES = [i / _NBINS for i in range(1, _NBINS)]


def _equidepth_oracle_sql() -> str:
    qs = ", ".join(str(q) for q in _DECILES)
    cmp_sum = " + ".join(
        f"CASE WHEN l_extendedprice > b[{i + 1}] THEN 1 ELSE 0 END"
        for i in range(len(_DECILES))
    )
    return f"""
    WITH bounds AS (
      SELECT quantile_cont(l_extendedprice, [{qs}]) AS b FROM lineitem
    ),
    binned AS (
      SELECT 1 + {cmp_sum} AS bin, l_extendedprice AS x
      FROM lineitem CROSS JOIN bounds
    )
    SELECT bin, COUNT(*) AS n, ROUND(MIN(x), 4) AS lo, ROUND(MAX(x), 4) AS hi
    FROM binned GROUP BY bin
    """


@query(
    "q_equidepth_bins",
    _equidepth_oracle_sql(),
    doc="equi-depth feature binning WITHOUT a global-ordering window: decile "
    "boundaries from one exact-percentile aggregate (small row, broadcast), "
    "bin assignment is per-row comparison arithmetic — fully distributed, no "
    "single-partition ntile sort (the 100 TB cliff the naive formulation "
    "hits); per-bin count/lo/hi for monotonic-binning diagnostics.",
)
def q_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.percentile("l_extendedprice", F.array(*[F.lit(q) for q in _DECILES])).alias("b")
    )
    binned = li.join(F.broadcast(bounds)).select(  # 1-row build side
        (
            F.lit(1)
            + sum(
                F.when(F.col("l_extendedprice") > F.element_at("b", i + 1), 1).otherwise(0)
                for i in range(len(_DECILES))
            )
        ).alias("bin"),
        F.col("l_extendedprice").alias("x"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("x"), 4).alias("lo"),
        F.round(F.max("x"), 4).alias("hi"),
    )


@query(
    "q_mutual_info_lang_source",
    """
    WITH joint AS (
      SELECT lang, source, COUNT(*) AS nxy FROM documents GROUP BY 1, 2
    ),
    mx AS (SELECT lang, SUM(nxy) AS nx FROM joint GROUP BY lang),
    my AS (SELECT source, SUM(nxy) AS ny FROM joint GROUP BY source),
    tot AS (SELECT SUM(nxy) AS n FROM joint)
    SELECT ROUND(SUM(
             (CAST(nxy AS DOUBLE) / n) * ln((CAST(nxy AS DOUBLE) * n) / (CAST(nx AS DOUBLE) * ny))
           ), 6) AS mutual_info
    FROM joint JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN tot
    """,
    doc="mutual information between two categorical columns (feature-"
    "relevance / drift diagnostics): one (x,y) count aggregation, marginals "
    "derived FROM the joint table (no rescan), broadcast back — all counts "
    "exact integers, one rounded float at the very end.",
)
def q_mutual_info_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    joint = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("nxy"))
    mx = joint.groupBy("lang").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("source").agg(F.sum("nxy").alias("ny"))
    tot = joint.agg(F.sum("nxy").alias("n"))
    term = (F.col("nxy").cast("double") / F.col("n")) * F.log(
        (F.col("nxy").cast("double") * F.col("n")) / (F.col("nx").cast("double") * F.col("ny"))
    )
    return (
        joint.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .join(F.broadcast(tot))  # 1-row build side
        .agg(F.round(F.sum(term), 6).alias("mutual_info"))
    )


# ---------------------------------------------------------------------------
# K-step funnel with conversion lags
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ["view", "click", "signup", "purchase"]


def _funnel4_oracle_sql() -> str:
    ctes = ["s1 AS (SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1)"]
    for k in range(2, len(_FUNNEL_STEPS) + 1):
        step = _FUNNEL_STEPS[k - 1]
        ctes.append(
            f"s{k} AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            f"JOIN s{k - 1} p ON e.user_id = p.user_id "
            f"WHERE e.event_type = '{step}' AND e.ts > p.t "
            f"AND e.ts <= p.t + INTERVAL 24 HOURS GROUP BY 1)"
        )
    sels = ["(SELECT COUNT(*) FROM s1) AS stage_1"]
    for k in range(2, len(_FUNNEL_STEPS) + 1):
        sels.append(f"(SELECT COUNT(*) FROM s{k}) AS stage_{k}")
        sels.append(
            f"(SELECT ROUND(AVG((epoch(c.t) - epoch(p.t)) / 3600.0), 6) "
            f"FROM s{k} c JOIN s{k - 1} p ON c.user_id = p.user_id) AS lag_h_{k}"
        )
    return "WITH " + ",\n".join(ctes) + "\nSELECT " + ", ".join(sels)


@query(
    "q_funnel_4step_lags",
    _funnel4_oracle_sql(),
    doc="generalized K-step funnel (view→click→signup→purchase, 24h steps) "
    "with average conversion lag per transition: one filtered min-agg per "
    "stage, every stage shuffled on user_id so co-partitioned joins elide "
    "k-1 exchanges; summary row joins single-row aggregates.",
)
def q_funnel_4step_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import funnel

    return funnel.funnel_summary(load(spark, sf_dir, "events"), _FUNNEL_STEPS)


# ---------------------------------------------------------------------------
# Journey / path mining
# ---------------------------------------------------------------------------


@query(
    "q_user_paths_topk",
    """
    WITH p AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM events GROUP BY 1, 2
    )
    SELECT path, COUNT(*) AS n
    FROM p GROUP BY path ORDER BY n DESC, path LIMIT 10
    """,
    doc="journey mining: each user-day's chronologically ordered event-type "
    "sequence as a path string, top-10 most common journeys. One (user, day) "
    "aggregation collects the day's events (bounded by events-per-user-day, "
    "never corpus-wide), array_sort on (ts, event_id) structs makes the "
    "order deterministic under ties, and the path count is a second "
    "partial-combining agg; top-k is TakeOrderedAndProject.",
)
def q_user_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    paths = (
        ev.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.struct("ts", "event_id", "event_type").alias("s"),
        )
        .groupBy("user_id", "day")
        .agg(F.array_sort(F.collect_list("s")).alias("arr"))
        .select(
            F.concat_ws(">", F.transform("arr", lambda x: x["event_type"])).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@query(
    "q_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    c AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM c
    """,
    doc="first-order Markov transition estimation over the per-user event "
    "stream: lag window per user (deterministic under timestamp ties via the "
    "event_id tiebreak), one (prev, next) count aggregation, row-normalized "
    "into transition probabilities — the journey-model twin of "
    "q_user_paths_topk; exact integer counts, one rounded float.",
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
    c = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = Window.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(norm), 6).alias("p"),
    )


@query(
    "q_ewma_daily_revenue",
    """
    WITH cells AS (
      SELECT o_orderpriority AS prio, CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             FLOOR(SUM(o_totalprice) * 1e6 + 0.5) / 1e6 AS rev
      FROM orders GROUP BY 1, 2
    ),
    framed AS (
      SELECT prio, day, rev,
             list(rev) OVER (PARTITION BY prio ORDER BY day
                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS arr
      FROM cells
    )
    SELECT prio, strftime(day, '%Y-%m-%d') AS day,
           FLOOR(
             list_sum(list_transform(range(1, len(arr)+1), i -> arr[i] * power(0.5, len(arr)-i)))
             / list_sum(list_transform(range(1, len(arr)+1), i -> power(0.5, len(arr)-i))) * 1e6 + 0.5) / 1e6 AS rev_ewma
    FROM framed
    """,
    doc="7-day exponentially-weighted moving average of daily revenue per "
    "order priority (alpha=0.5) — the standard monitoring smoother, as the "
    "distributable finite-horizon EWMA: one shuffle for the daily rollup, "
    "one bounded-frame window per key, then a codegen'd weighted fold over "
    "the ≤7-element frame in frame order (bit-replayable by the oracle's "
    "ordered list_sum). Daily cells are rounded BEFORE smoothing so both "
    "engines fold identical inputs.",
)
def q_ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cells = (
        orders.groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("d"),
        )
        .agg((F.floor(F.sum("o_totalprice") * 1e6 + 0.5) / 1e6).alias("rev"))
    )
    sm = timeseries.ewma(cells, "prio", "d", "rev", alpha=0.5, window=7)
    return sm.select(
        "prio",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        (F.floor(F.col("rev_ewma") * 1e6 + 0.5) / 1e6).alias("rev_ewma"),
    )


@query(
    "q_cumulative_new_users",
    """
    WITH acts AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
    ),
    first_day AS (SELECT user_id, MIN(day) AS d0 FROM acts GROUP BY 1),
    news AS (SELECT d0 AS day, COUNT(*) AS new_users FROM first_day GROUP BY 1),
    spine AS (SELECT DISTINCT day FROM acts)
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(n.new_users, 0) AS new_users,
           CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
    FROM spine s LEFT JOIN news n ON s.day = n.day
    """,
    doc="daily new-user counts and the cumulative distinct-user curve — "
    "exact cumulative COUNT(DISTINCT) made distributable by the first-seen "
    "reduction: distinct users collapse to their first activity day "
    "(groupBy min), so the running sum is over the AGGREGATED day series "
    "(thousands of rows at any corpus size), not the event stream; the "
    "single-partition window is over that tiny series only.",
)
def q_cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    acts = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    news = (
        acts.groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    spine = acts.select("day").distinct()
    j = spine.join(news, "day", "left").select(
        "day", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


@query(
    "q_mad_outliers",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, floor(SUM(value) * 1e6 + 0.5) / 1e6 AS rev
      FROM events GROUP BY 1
    ),
    med AS (SELECT median(rev) AS m FROM daily),
    mad AS (SELECT median(abs(rev - med.m)) AS md FROM daily, med)
    SELECT strftime(d, '%Y-%m-%d') AS day, rev,
           floor(abs(rev - med.m) / (1.4826 * mad.md) * 10000 + 0.5) / 10000 AS robust_z
    FROM daily, med, mad
    WHERE mad.md > 0 AND abs(rev - med.m) / (1.4826 * mad.md) > 2.5
    """,
    doc="robust outlier detection via median absolute deviation (Hampel "
    "identifier, 1.4826 consistency constant): days whose total event value "
    "deviates > 2.5 robust sigmas from the median day — the z-score variant "
    "that a single whale day cannot mask (mean/stddev are themselves "
    "dragged by the outlier; medians are not). Scale shape: events shuffle "
    "once into the bounded DAILY table; both medians aggregate that table "
    "(date-bounded rows) into 1-row builds broadcast back — the raw stream "
    "never shuffles twice. Daily sums are floor-rounded at 1e-6 before the "
    "medians so both engines take medians of identical doubles.",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        (F.floor(F.sum("value") * 1e6 + 0.5) / 1e6).alias("rev")
    )
    med = daily.agg(F.median("rev").alias("m"))
    with_m = daily.join(F.broadcast(med))
    mad = with_m.agg(F.median(F.abs(F.col("rev") - F.col("m"))).alias("md"))
    rz = F.abs(F.col("rev") - F.col("m")) / (F.lit(1.4826) * F.col("md"))
    return (
        with_m.join(F.broadcast(mad))
        .filter((F.col("md") > 0) & (rz > 2.5))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "rev",
            (F.floor(rz * 10000 + 0.5) / 10000).alias("robust_z"),
        )
    )


@query(
    "q_freq_pairs_lift",
    """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
    item_n AS (SELECT l_partkey, COUNT(*) AS cnt FROM items GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    )
    SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
           floor(CAST(support AS DOUBLE) / ia.cnt * 10000 + 0.5) / 10000 AS confidence,
           floor(CAST(support AS DOUBLE) * n_orders.n / (ia.cnt * ib.cnt) * 10000 + 0.5) / 10000 AS lift
    FROM pairs
    JOIN item_n ia ON pairs.part_a = ia.l_partkey
    JOIN item_n ib ON pairs.part_b = ib.l_partkey
    CROSS JOIN n_orders
    """,
    doc="market-basket frequent-pair mining with association strength: "
    "co-occurring part pairs within an order (support >= 3) scored by "
    "confidence P(b|a) and lift. Scale shape: the pair self-join is an "
    "EQUI-join on the order key — co-partitioned single shuffle with "
    "basket-size-bounded expansion (the A-Priori candidate step, never "
    "item-cross-item); item counts are a dimension-bounded table joined "
    "back stats-driven, and the order total is a 1-row broadcast build.",
)
def q_freq_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.agg(F.countDistinct("l_orderkey").alias("n"))
    item_n = items.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= 3)
    )
    ia = item_n.select(F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a"))
    ib = item_n.select(F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b"))
    out = (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .join(F.broadcast(n_orders))
    )
    return out.select(
        "part_a",
        "part_b",
        "support",
        (
            F.floor(F.col("support").cast("double") / F.col("cnt_a") * 10000 + 0.5)
            / 10000
        ).alias("confidence"),
        (
            F.floor(
                F.col("support").cast("double")
                * F.col("n")
                / (F.col("cnt_a") * F.col("cnt_b"))
                * 10000
                + 0.5
            )
            / 10000
        ).alias("lift"),
    )


@query(
    "q_acf_daily_revenue",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, floor(SUM(value) * 1e6 + 0.5) / 1e6 AS rev
      FROM events GROUP BY 1
    ),
    shifted AS (
      SELECT lag, d + CAST(lag || ' days' AS INTERVAL) AS d2, rev AS rev_base
      FROM daily, unnest([1, 2, 3, 4, 5, 6, 7]) AS t(lag)
    )
    SELECT lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           floor(corr(rev_base, daily.rev) * 10000 + 0.5) / 10000 AS acf
    FROM shifted JOIN daily ON shifted.d2 = daily.d
    GROUP BY lag
    """,
    doc="autocorrelation of the daily event-revenue series at lags 1..7 "
    "(seasonality / burst diagnostics for a streaming corpus): instead of a "
    "single-partition global-order window, each daily row emits 7 "
    "(lag, date+lag) probes that EQUI-join back to the daily table — "
    "co-partitioned shuffle on the date key, missing days drop out of the "
    "pair set identically in both engines. corr's n-normalization cancels "
    "in the ratio, so sample-vs-population conventions cannot diverge. The "
    "daily table is date-bounded, so every stage after the one corpus "
    "shuffle is small at any corpus size.",
)
def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        (F.floor(F.sum("value") * 1e6 + 0.5) / 1e6).alias("rev")
    )
    shifted = daily.select(
        F.explode(F.array(*[F.lit(k) for k in range(1, 8)])).alias("lag"),
        F.col("d"),
        F.col("rev").alias("rev_base"),
    ).select("lag", F.expr("date_add(d, lag)").alias("d2"), "rev_base")
    joined = shifted.join(daily.select(F.col("d").alias("d2"), "rev"), "d2")
    return joined.groupBy("lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        (F.floor(F.corr("rev_base", "rev") * 10000 + 0.5) / 10000).alias("acf"),
    )


@query(
    "q_session_features",
    """
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, event_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g
    )
    SELECT event_id,
           user_id,
           CAST(session_id AS BIGINT) AS session_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS BIGINT)
             AS pos_in_session,
           CAST(floor(epoch(ts)) - floor(epoch(MIN(ts) OVER (PARTITION BY user_id, session_id))) AS BIGINT)
             AS secs_since_start
    FROM s
    """,
    doc="per-EVENT session features for behavioral training data: gap-based "
    "session id (30-min inactivity), 1-based position within the session, "
    "and seconds since session start — the feature-extraction pass that "
    "turns a raw event log into sequence-model rows (q_sessionize is its "
    "per-SESSION rollup twin). Deterministic total order via the "
    "(ts, event_id) tiebreak. Scale shape: every window partitions by "
    "user (or user+session) — bounded by one user's history, shuffled "
    "once; no global window, no join.",
)
def q_session_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(wo)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 1800),
        1,
    ).otherwise(0)
    s = ev.select("event_id", "user_id", "ts", new_sess.alias("new_sess")).withColumn(
        "session_id", F.sum("new_sess").over(wc).cast("long")
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    wsa = Window.partitionBy("user_id", "session_id")
    return s.select(
        "event_id",
        "user_id",
        "session_id",
        F.row_number().over(ws).cast("long").alias("pos_in_session"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.min("ts").over(wsa)))
        .cast("long")
        .alias("secs_since_start"),
    )
