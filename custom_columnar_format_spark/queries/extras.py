"""Relational primitives beyond the TPC-H shapes: pivot/unpivot, explode
(lateral view / UNNEST), UNION DISTINCT, INTERSECT ALL / EXCEPT ALL, cross
join, deterministic hash sampling, regexp functions, approximate distinct
counts, and ranking-window variants.

All absent from the reference (SURVEY.md §2.2 — storage-only); each oracle is
plain ANSI SQL DuckDB runs on the same parquet, with every computed column
aliased identically on both sides (driver hash-compare contract).

Scale notes:
- pivot uses an explicit value list (no extra distinct-values job, and the
  plan is a single hash aggregate with conditional sums);
- explode fans out tokens *after* projecting only (doc_id, text) — column
  pruning keeps the scan narrow;
- the deterministic sample filters on md5(key) — pushes to the scan, needs
  no sort, and picks the same rows on any cluster size (unlike TABLESAMPLE);
- approximate distinct counts: the REGISTERED query is a KMV/bottom-k
  sketch over md5 order statistics (r8) — mergeable, integer-exact, so the
  DuckDB oracle replays it verbatim; the HLL `approx_count_distinct`
  operator remains the cheapest 100 TB path and keeps its error-bound pin
  in tests/test_extras.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .llm_ops import _hexparse_sql
from .registry import query
from .tables import load


@query(
    "q_pivot_returnflag_status",
    """
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_f,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="pivot with explicit value list → one hash aggregate of conditional sums "
    "(no distinct-values pre-job, no shuffle beyond the group-by).",
)
def q_pivot_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_returnflag",
            F.coalesce("F", F.lit(0.0)).alias("qty_f"),
            F.coalesce("O", F.lit(0.0)).alias("qty_o"),
        )
    )


@query(
    "q_unpivot_nation_counts",
    """
    WITH per_nation AS (
      SELECT n_nationkey,
             (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust,
             (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey) AS n_supp
      FROM nation)
    SELECT n_nationkey, 'n_cust' AS kind, n_cust AS cnt FROM per_nation
    UNION ALL
    SELECT n_nationkey, 'n_supp' AS kind, n_supp AS cnt FROM per_nation
    """,
    doc="unpivot (wide→long melt) of per-nation customer/supplier counts.",
)
def q_unpivot_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    wide = (
        n.join(F.broadcast(c), n.n_nationkey == F.col("ck"), "left")
        .join(F.broadcast(s), n.n_nationkey == F.col("sk"), "left")
        .select(
            "n_nationkey",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )
    return wide.unpivot("n_nationkey", ["n_cust", "n_supp"], "kind", "cnt")


@query(
    "q_explode_tokens",
    """
    SELECT token, COUNT(*) AS cnt
    FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents) t
    WHERE token <> ''
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 50
    """,
    doc="explode / lateral view (UNNEST): whitespace token fan-out over "
    "documents, top-50 tokens; scan projects only the text column.",
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("text")
    return (
        docs.select(F.explode(F.split("text", " ", -1)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(50)
    )


@query(
    "q_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    doc="UNION (distinct) — dedup across both inputs, vs the existing UNION ALL query.",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "q_intersect_all",
    """
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    """,
    doc="INTERSECT ALL (multiset semantics — duplicate rows kept up to the min multiplicity).",
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("suppkey"))
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("suppkey"))
    return r.intersectAll(a)


@query(
    "q_except_all",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT ALL (multiset difference — multiplicities subtract, not vanish).",
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    done = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return open_.exceptAll(done)


@query(
    "q_cross_join_segments",
    """
    SELECT r_name, seg
    FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s
    """,
    doc="cross join of two tiny inputs (5 regions × 5 segments = 25 rows; "
    "broadcast NL join — never do this with two large sides).",
)
def q_cross_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").select("r_name")
    seg = load(spark, sf_dir, "customer").select(F.col("c_mktsegment").alias("seg")).distinct()
    return r.crossJoin(F.broadcast(seg))


@query(
    "q_sample_deterministic",
    """
    SELECT COUNT(*) AS n_sampled, ROUND(SUM(o_totalprice), 2) AS sampled_total
    FROM orders
    WHERE SUBSTRING(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
    doc="deterministic ~12.5% hash sample (md5 of the key): same rows on any "
    "engine/cluster size, filter pushes to the scan — unlike TABLESAMPLE, "
    "which is nondeterministic and per-partition.",
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
    ).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.sum("o_totalprice"), 2).alias("sampled_total"),
    )


@query(
    "q_regexp_funcs",
    """
    SELECT c_custkey,
           CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS cust_num,
           regexp_replace(c_name, '0+', '-', 'g') AS squeezed
    FROM customer
    WHERE regexp_matches(c_name, '[13579]$')
    """,
    doc="regexp surface: extract (with capture group), replace, and match-filter.",
)
def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_name").rlike("[13579]$"))
        .select(
            "c_custkey",
            F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("bigint").alias("cust_num"),
            F.regexp_replace("c_name", "0+", "-").alias("squeezed"),
        )
    )


_KMV_K = 1024
_HEX12 = 1 << 48  # 16^12: first-12-hex-digit hash space


def _kmv_sql(col: str, alias: str) -> str:
    return f"""
    {alias}_d AS (
      SELECT DISTINCT l_returnflag, md5(CAST({col} AS VARCHAR)) AS h FROM lineitem
    ),
    {alias}_r AS (
      SELECT l_returnflag, h,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
      FROM {alias}_d
    ),
    {alias}_a AS (
      SELECT l_returnflag, COUNT(*) AS nd,
             MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS hk
      FROM {alias}_r WHERE rn <= {_KMV_K} GROUP BY l_returnflag
    ),
    {alias}_e AS (
      SELECT l_returnflag,
             CASE WHEN nd < {_KMV_K} THEN CAST(nd AS BIGINT)
                  ELSE CAST({(_KMV_K - 1) * _HEX12} AS BIGINT)
                       // greatest({_hexparse_sql('hk', 1, 12)}, 1)
             END AS {alias}
      FROM {alias}_a
    )"""


@query(
    "q_approx_count_distinct",
    f"""
    WITH {_kmv_sql('l_partkey', 'approx_parts')},
    {_kmv_sql('l_suppkey', 'approx_supps')}
    SELECT p.l_returnflag, p.approx_parts, s.approx_supps
    FROM approx_parts_e p JOIN approx_supps_e s USING (l_returnflag)
    """,
    doc=f"approximate distinct counts via a KMV / bottom-k sketch (k="
    f"{_KMV_K}) over md5 order statistics: per group, keep the k smallest "
    "hashes of the distinct values; if fewer than k distinct exist the "
    "count is exact, else the estimate is (k-1)/h_k with h_k = the k-th "
    "smallest hash as a fraction of the 48-bit hash space — integer "
    "arithmetic end-to-end, so DuckDB replays it EXACTLY (this replaced "
    "the engine-specific HLL registered through r7, a standing "
    "driver-red-by-construction; HLL stays available as the operator tier, "
    "pinned by error-bound tests). KMV is mergeable (union = keep the k "
    "smallest of the union), rsd ~ 1/sqrt(k-2) ~ 3%. Scale shape: one "
    "distinct-projection shuffle on (group, 16-byte hash), then a "
    "bottom-k per group — the window sorts only hashes, never rows, and "
    "at 100 TB the same sketch is computed per-partition and merged.",
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")

    def kmv(col: str, alias: str) -> DataFrame:
        d = li.select(
            "l_returnflag",
            F.md5(F.col(col).cast("string").cast("binary")).alias("h"),
        ).distinct()
        w = Window.partitionBy("l_returnflag").orderBy("h")
        r = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _KMV_K)
        agg = r.groupBy("l_returnflag").agg(
            F.count("*").alias("nd"),
            F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("hk"),
        )
        # exact BIGINT division (Spark DIV == DuckDB // on positive longs);
        # the numerator is ~2.9e17 > 2^53, so double arithmetic would round
        est = F.when(F.col("nd") < _KMV_K, F.col("nd").cast("long")).otherwise(
            F.expr(
                f"CAST({(_KMV_K - 1) * _HEX12} AS BIGINT) DIV "
                "greatest(CAST(conv(substring(hk, 1, 12), 16, 10) AS BIGINT), 1L)"
            )
        )
        return agg.select("l_returnflag", est.cast("long").alias(alias))

    return kmv("l_partkey", "approx_parts").join(
        kmv("l_suppkey", "approx_supps"), "l_returnflag"
    )


@query(
    "q_bucketed_colocated_join",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
    doc="fact-fact join over tables bucketed on the join key: the shuffle is "
    "paid once at write time, the join itself plans with no Exchange "
    "(asserted in tests/test_bucketing.py) — the 100 TB pattern for a join "
    "that runs repeatedly on the same key.",
)
def q_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from custom_columnar_format_spark.operators import bucketing

    # one bucketed copy per (sf_dir, Spark application): the app id keeps a
    # fresh session from colliding with a previous session's managed-table
    # directory (the dir outlives the in-memory catalog entry)
    app = spark.sparkContext.applicationId.replace("-", "_")
    tag = hashlib.md5(f"{sf_dir}|{app}".encode()).hexdigest()[:8]
    loc = os.path.join(tempfile.gettempdir(), f"scbf_bucket_db_{tag}")
    db = bucketing.ensure_bucket_db(spark, loc, db=f"scbf_buckets_{tag}")
    if not spark.catalog.tableExists(f"{db}.orders_b"):
        bucketing.write_bucketed(load(spark, sf_dir, "orders"), "orders_b", "o_orderkey", 8, db)
        bucketing.write_bucketed(
            load(spark, sf_dir, "lineitem"), "lineitem_b", "l_orderkey", 8, db
        )
    joined = bucketing.colocated_join(spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey", db)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


@query(
    "q_scbf_merge_upsert",
    """
    WITH src AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             ROUND(o_totalprice * 1.1, 2) AS o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
             ROUND(o_totalprice, 2), o_orderpriority
      FROM orders WHERE o_orderkey % 631 = 0
    ), merged AS (
      SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS o_totalprice
      FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM src
    )
    SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM merged GROUP BY o_orderstatus
    """,
    doc="MERGE upsert into an SCBF v2 dataset (operators/merge.py): updates "
    "bump matched keys' price, inserts add new keys; file-level copy-on-write "
    "carries over files whose footer key range provably misses the source. "
    "Oracle expresses the same merge as anti-join + union.",
)
def q_scbf_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from custom_columnar_format_spark.operators import merge as merge_op
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)
    app = spark.sparkContext.applicationId.replace("-", "_")
    tag = hashlib.md5(f"{sf_dir}|{app}|m".encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"scbf_merge_{tag}")
    target, out = os.path.join(base, "target"), os.path.join(base, "merged")

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"), "o_orderpriority",
    )
    if not os.path.isdir(out):
        (
            o.repartitionByRange(8, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
            .write.format("scbf").option("version", "2").mode("overwrite").save(target)
        )
        updates = o.filter(F.col("o_orderkey") % 97 == 0).withColumn(
            "o_totalprice", F.round(F.col("o_totalprice") * 1.1, 2)
        )
        inserts = o.filter(F.col("o_orderkey") % 631 == 0).withColumn(
            "o_orderkey", F.col("o_orderkey") + 10_000_000
        )
        merge_op.merge_into(
            spark, target, updates.unionByName(inserts), "o_orderkey", out_path=out
        )
    return (
        spark.read.format("scbf")
        .load(out)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "q_scbf_zordered_agg",
    """
    SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    WHERE l_orderkey BETWEEN 200 AND 900 AND l_partkey BETWEEN 20 AND 120
    GROUP BY l_returnflag
    """,
    doc="SCBF v2 dataset z-ordered on (l_orderkey, l_partkey): the 2-D box "
    "predicate skips most files via footer min/max stats (Morton clustering "
    "gives every file a tight envelope on BOTH columns; see operators/"
    "zorder.py and tests/test_zorder.py for the skip-count proof).",
)
def q_scbf_zordered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from custom_columnar_format_spark.operators import zorder
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)
    app = spark.sparkContext.applicationId.replace("-", "_")
    tag = hashlib.md5(f"{sf_dir}|{app}|z".encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"scbf_zorder_{tag}")
    if not os.path.isdir(path):
        li = load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_returnflag", "l_extendedprice"
        )
        zorder.write_zordered(li, path, ["l_orderkey", "l_partkey"], n_files=16, version="2")
    return (
        spark.read.format("scbf")
        .load(path)
        .filter(
            F.col("l_orderkey").between(200, 900) & F.col("l_partkey").between(20, 120)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@query(
    "q_window_ranks",
    """
    SELECT o_orderkey, o_orderpriority,
           ROUND(o_totalprice, 2) AS totalprice,
           DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS drnk,
           NTILE(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
           FLOOR(PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) * 1e6 + 0.5) / 1e6 AS prank
    FROM orders
    WHERE o_totalprice > 400000
    """,
    doc="ranking-window variants (dense_rank / ntile / percent_rank) with a "
    "deterministic compound ordering.",
)
def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        # floor(x*1e6+0.5)/1e6, not ROUND: Spark and DuckDB disagree on
        # round-half double cases; this is bit-identical in both engines
        (F.floor(F.percent_rank().over(w) * 1e6 + 0.5) / 1e6).alias("prank"),
    )


@query(
    "q_data_quality_checks",
    """
    SELECT 'not_null_l_orderkey' AS rule,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
    FROM lineitem
    UNION ALL
    SELECT 'in_range_l_quantity',
           CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 45
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'accepted_values_l_returnflag',
           CAST(SUM(CASE WHEN l_returnflag IS NULL OR l_returnflag NOT IN ('A', 'N')
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'unique_key_l_orderkey_l_linenumber',
           (SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) FROM (
              SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber) g)
    FROM (SELECT 1)
    """,
    doc="declarative data-quality checks (operators/quality.py): N row-level "
    "rules fold into ONE conditional-sum scan; the uniqueness rule adds one "
    "keyed aggregate — the pre-publish expectations gate (range rule is "
    "deliberately violated by the data so counts are non-zero).",
)
def q_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from custom_columnar_format_spark.operators import quality as Q

    li = load(spark, sf_dir, "lineitem")
    return Q.check(
        li,
        [
            Q.not_null("l_orderkey"),
            Q.in_range("l_quantity", 1, 45),
            Q.accepted_values("l_returnflag", ["A", "N"]),
            Q.unique_key("l_orderkey", "l_linenumber"),
        ],
    )


@query(
    "q_csv_roundtrip_agg",
    """
    SELECT n_name, COUNT(*) AS n_nations_region
    FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    """,
    doc="CSV source/sink round-trip: dims written to headered CSV, read back "
    "with explicit schemas (no inference job), joined and aggregated — "
    "values must equal the parquet-direct oracle.",
)
def q_csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    base = os.path.join(tempfile.gettempdir(), "scbf_csv_rt")
    n_src, r_src = load(spark, sf_dir, "nation"), load(spark, sf_dir, "region")
    n_src.write.mode("overwrite").option("header", True).csv(os.path.join(base, "nation"))
    r_src.write.mode("overwrite").option("header", True).csv(os.path.join(base, "region"))
    n = spark.read.schema(n_src.schema).option("header", True).csv(os.path.join(base, "nation"))
    r = spark.read.schema(r_src.schema).option("header", True).csv(os.path.join(base, "region"))
    return (
        n.join(F.broadcast(r.filter(F.col("r_name").isin("ASIA", "EUROPE"))),
               n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_nations_region"))
    )


@query(
    "q_json_roundtrip_agg",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
    doc="JSON lines source/sink round-trip: filtered orders written as JSONL, "
    "read back with an explicit schema, aggregated — timestamps survive via "
    "ISO-8601; values must equal the parquet-direct oracle.",
)
def q_json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "scbf_json_rt", "orders")
    o_src = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    o_src.write.mode("overwrite").json(path)
    o = spark.read.schema(o_src.schema).json(path)
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "q_orc_roundtrip_agg",
    """
    SELECT l_linestatus, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_linestatus
    """,
    doc="ORC source/sink round-trip (Spark's second native columnar format "
    "beside parquet — vectorized reader, predicate pushdown): filtered "
    "lineitem written as ORC, read back, aggregated; values must equal the "
    "parquet-direct oracle.",
)
def q_orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "scbf_orc_rt", "lineitem")
    src = load(spark, sf_dir, "lineitem").select(
        "l_linenumber", "l_quantity", "l_extendedprice", "l_linestatus"
    )
    src.write.mode("overwrite").orc(path)
    li = spark.read.orc(path).filter(F.col("l_quantity") >= 30)
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@query(
    "q_udtf_token_positions",
    """
    SELECT doc_id, u.token AS token, u.pos AS pos FROM (
      SELECT doc_id,
             UNNEST(list_transform(string_split(text, ' '),
                                   (s, i) -> {'token': s, 'pos': i - 1})) AS u
      FROM documents) t
    WHERE u.token <> ''
    """,
    doc="Python UDTF (table function): one (token, position) row per word via "
    "LATERAL join — the API surface for fan-out transforms a scalar UDF "
    "can't express. Arrow-optimized; positions index the original split.",
)
def q_udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int", useArrow=True)
    class TokenPos:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                if tok:
                    yield tok, i

    spark.udtf.register("token_pos", TokenPos)
    load(spark, sf_dir, "documents").select("doc_id", "text").createOrReplaceTempView(
        "docs_udtf"
    )
    return spark.sql(
        "SELECT doc_id, t.token, t.pos FROM docs_udtf, LATERAL token_pos(text) t"
    )


@query(
    "q_pandas_udaf_harmonic",
    """
    SELECT o_orderpriority,
           FLOOR(COUNT(*) / SUM(1.0 / o_totalprice) * 10000 + 0.5) / 10000 AS harmonic_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Pandas grouped-aggregate UDF (UDAF): harmonic mean per group — "
    "Arrow-batched, one scalar out per group; the pattern for custom "
    "aggregations pyspark.sql.functions lacks.",
)
def q_pandas_udaf_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: this module has `from __future__ import
    # annotations`, which stringifies signatures and defeats inference
    def _hm(v):
        return float(len(v) / (1.0 / v).sum())

    harmonic_mean = pandas_udf(_hm, "double", functionType=PandasUDFType.GROUPED_AGG)

    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        (F.floor(harmonic_mean("o_totalprice") * 10000 + 0.5) / 10000).alias(
            "harmonic_price"
        )
    )


@query(
    "q_window_range_frame",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM orders
    WHERE o_custkey < 200
    """,
    doc="RANGE window frame: per-customer trailing-30-day spend — value-based "
    "frame bounds (ties are peers), vs the ROWS frames elsewhere.",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@query(
    "q_null_handling",
    """
    SELECT seg, COUNT(*) AS n, ROUND(AVG(bal), 4) AS avg_pos_bal
    FROM (
      SELECT COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
             CASE WHEN c_acctbal > 0 THEN c_acctbal END AS bal
      FROM customer
    ) t
    GROUP BY seg
    """,
    doc="null-handling surface: NULLIF/COALESCE rewrite plus NULL-skipping AVG "
    "(CASE with no ELSE yields NULLs the aggregate must ignore).",
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias("seg"),
            F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")).alias("bal"),
        )
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("bal"), 4).alias("avg_pos_bal"))
    )


@query(
    "q_minmax_by",
    """
    SELECT o_orderpriority,
           arg_max(o_orderkey,
                   CAST(FLOOR(o_totalprice*100+0.5) AS BIGINT)*10000000 + o_orderkey)
             AS top_order,
           arg_min(o_orderkey,
                   CAST(FLOOR(o_totalprice*100+0.5) AS BIGINT)*10000000 + o_orderkey)
             AS bottom_order,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="max_by / min_by (argmax aggregates): priciest and cheapest order key "
    "per priority in ONE hash aggregate — no window sort, no self-join; the "
    "100 TB shape for 'row achieving the extreme'. Both engines' argmax is "
    "tie-nondeterministic, so the ordering value is made unique: price cents "
    "(floor(x*100+0.5), exact in both engines) composed with the orderkey.",
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    key = (
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long") * F.lit(10000000)
        + F.col("o_orderkey")
    )
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("top_order"),
        F.min_by("o_orderkey", key).alias("bottom_order"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_corr_regr",
    """
    SELECT l_returnflag,
           FLOOR(corr(l_extendedprice, l_quantity)*1e4+0.5)/1e4 AS corr_price_qty,
           FLOOR(covar_samp(l_extendedprice, l_quantity)*1e2+0.5)/1e2 AS covar_price_qty,
           FLOOR(regr_slope(l_extendedprice, l_quantity)*1e4+0.5)/1e4 AS slope,
           FLOOR(regr_intercept(l_extendedprice, l_quantity)*1e2+0.5)/1e2 AS intercept,
           FLOOR(regr_r2(l_extendedprice, l_quantity)*1e4+0.5)/1e4 AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="bivariate statistical aggregates (corr / covar_samp / regr_slope / "
    "regr_intercept / regr_r2): single-pass co-moment accumulators in both "
    "engines — one partial+final hash aggregate, no second scan; "
    "floor-rounding absorbs the ~1e-12 accumulation-order difference.",
)
def q_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p, q = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        (F.floor(F.corr(p, q) * 1e4 + 0.5) / 1e4).alias("corr_price_qty"),
        (F.floor(F.covar_samp(p, q) * 1e2 + 0.5) / 1e2).alias("covar_price_qty"),
        (F.floor(F.regr_slope(p, q) * 1e4 + 0.5) / 1e4).alias("slope"),
        (F.floor(F.regr_intercept(p, q) * 1e2 + 0.5) / 1e2).alias("intercept"),
        (F.floor(F.regr_r2(p, q) * 1e4 + 0.5) / 1e4).alias("r2"),
    )


@query(
    "q_histogram_bins",
    """
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY bin
    """,
    doc="fixed-width numeric histogram (the profiling primitive behind "
    "width_bucket): bin id is a scan-side expression, so the whole histogram "
    "is one partial+final aggregate over ~a dozen groups — at 100 TB the "
    "map-side combine reduces each partition to its bin counts before any "
    "shuffle.",
)
def q_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("bin", F.floor(F.col("o_totalprice") / 50000).cast("long"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "q_window_first_last",
    """
    SELECT o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_k,
           LAST_VALUE(o_orderkey) OVER (
             PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_k,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_k
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="frame-navigation window functions (first_value / last_value / "
    "nth_value) with explicit ROWS frames — the growing frame for first/nth, "
    "the full-partition frame for last (the default frame would silently "
    "return the CURRENT row); unique compound ordering keeps both engines "
    "bit-identical.",
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    grow = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        F.first("o_orderkey").over(grow).alias("first_k"),
        F.last("o_orderkey").over(full).alias("last_k"),
        F.nth_value("o_orderkey", 2).over(grow).alias("second_k"),
    )


@query(
    "q_collect_set_agg",
    """
    SELECT l_orderkey,
           array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags,
           CAST(len(list(DISTINCT l_returnflag)) AS INT) AS n_flags
    FROM lineitem GROUP BY l_orderkey
    """,
    doc="set-valued aggregation (collect_set == DuckDB list(DISTINCT)): "
    "per-key distinct value sets, sorted then serialized so the unordered "
    "set hashes identically cross-engine; one partial+final hash aggregate.",
)
def q_collect_set_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.array_sort(F.collect_set("l_returnflag")), ",").alias("flags"),
        F.size(F.collect_set("l_returnflag")).alias("n_flags"),
    )


@query(
    "q_posexplode_positions",
    """
    SELECT t.tok AS token, COUNT(*) AS cnt,
           FLOOR(AVG(t.pos)*1e4+0.5)/1e4 AS avg_pos
    FROM (
      SELECT UNNEST(list_transform(string_split(text, ' '),
                    (s, i) -> struct_pack(tok := s, pos := i - 1))) AS t
      FROM documents
    ) u
    WHERE t.tok <> ''
    GROUP BY t.tok
    ORDER BY cnt DESC, token
    LIMIT 50
    """,
    doc="positional explode (posexplode / UNNEST WITH ORDINALITY): token with "
    "its 0-based position in one JVM generator — mean position of the top-50 "
    "tokens. DuckDB 1.x lacks WITH ORDINALITY, so the oracle builds "
    "(token, pos) structs via the two-arg list_transform lambda; positions "
    "are exact integers, so only their MEAN needs the floor-rounding idiom.",
)
def q_posexplode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("text")
    tok = docs.select(
        F.posexplode(F.split("text", " ", -1)).alias("pos", "token")
    ).filter(F.col("token") != "")
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.floor(F.avg("pos") * 1e4 + 0.5) / 1e4).alias("avg_pos"),
        )
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(50)
    )


@query(
    "q_scbf_snapshot_agg",
    """
    SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey % 2 = 0
    GROUP BY o_orderpriority
    """,
    doc="SCBF snapshot time travel: write batch 1 (even orderkeys), snapshot, "
    "append batch 2 (odd) — then aggregate a read PINNED to snapshot 1. The "
    "oracle sees only batch 1, proving the manifest isolates the later "
    "append (operators/snapshot.py; metadata-only, no data copied).",
)
def q_scbf_snapshot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from custom_columnar_format_spark.operators import snapshot as snap_op
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)
    app = spark.sparkContext.applicationId.replace("-", "_")
    tag = hashlib.md5(f"{sf_dir}|{app}|snap".encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"scbf_snap_{tag}")

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    if not os.path.isdir(path):
        (
            o.filter(F.col("o_orderkey") % 2 == 0)
            .coalesce(2)
            .write.format("scbf").option("version", "2").mode("overwrite").save(path)
        )
        snap_op.create_snapshot(path, tag="batch1")
        (
            o.filter(F.col("o_orderkey") % 2 == 1)
            .coalesce(2)
            .write.format("scbf").option("version", "2").mode("append").save(path)
        )
    return (
        snap_op.read_snapshot(spark, path, "batch1")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "q_scbf_bloom_point_agg",
    """
    SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_custkey IN (371, 746)
    GROUP BY o_orderpriority
    """,
    doc="SCBF v2 per-file Bloom filters (.option('bloom_filters', ...)): the "
    "dataset is hash-distributed on o_custkey so every file's min/max range "
    "covers the probe keys and stats prune NOTHING — the footer blooms "
    "prove absence per file and the IN probe skips almost all of them "
    "(Parquet column-bloom semantics, SPARK-34562).",
)
def q_scbf_bloom_point_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)
    app = spark.sparkContext.applicationId.replace("-", "_")
    tag = hashlib.md5(f"{sf_dir}|{app}|bloom".encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"scbf_bloom_{tag}")

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    if not os.path.isdir(path):
        (
            o.repartition(16, "o_orderkey")  # every file spans the custkey range
            .write.format("scbf")
            .option("version", "2")
            .option("bloom_filters", "o_custkey")
            .mode("overwrite")
            .save(path)
        )
    return (
        spark.read.format("scbf")
        .load(path)
        .filter(F.col("o_custkey").isin(371, 746))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "q_scbf_compact_agg",
    """
    SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem WHERE l_orderkey <= 2000
    GROUP BY l_returnflag
    """,
    doc="compaction end-to-end: 24 small streaming-sized files rewritten to "
    "<=4 sorted ones (operators/compact.py, staged write + swap), values "
    "bit-identical — the small-files maintenance every streaming sink needs.",
)
def q_scbf_compact_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from custom_columnar_format_spark.operators import compact as compact_op
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)
    app = spark.sparkContext.applicationId.replace("-", "_")
    tag = hashlib.md5(f"{sf_dir}|{app}|cmp".encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"scbf_cmp_{tag}")

    if not os.path.isdir(path):
        li = (
            load(spark, sf_dir, "lineitem")
            .filter(F.col("l_orderkey") <= 2000)
            .select("l_orderkey", "l_returnflag", "l_quantity")
        )
        li.repartition(24).write.format("scbf").option("version", "2").mode(
            "overwrite"
        ).save(path)
        compact_op.compact(spark, path, target_files=4, sort_by=["l_orderkey"])
    return (
        spark.read.format("scbf")
        .load(path)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "q_corr_matrix",
    " UNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, ROUND(corr({a}, {b}), 6) AS r FROM lineitem"
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ),
    doc="pairwise Pearson correlation matrix (upper triangle) of the four "
    "lineitem numeric measures — ONE aggregation computing all six "
    "coefficients in a single scan (each corr is a handful of partial-"
    "aggregatable moments, so the shuffle carries 6×5 running sums per "
    "partition regardless of row count), then a 6-element explode to the "
    "tidy (col_a, col_b, r) form.",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pairs = [(a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]]
    agg = li.agg(
        *[F.round(F.corr(a, b), 6).alias(f"r_{i}") for i, (a, b) in enumerate(pairs)]
    )
    items = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"), F.lit(b).alias("col_b"), F.col(f"r_{i}").alias("r")
            )
            for i, (a, b) in enumerate(pairs)
        ]
    )
    return agg.select(F.explode(items).alias("e")).select("e.col_a", "e.col_b", "e.r")


@query(
    "q_profile_numeric",
    " UNION ALL ".join(
        f"SELECT '{c}' AS col, COUNT({c}) AS n, COUNT(*) - COUNT({c}) AS n_null, "
        f"COUNT(DISTINCT {c}) AS ndv, ROUND(MIN({c}), 6) AS min_v, "
        f"ROUND(MAX({c}), 6) AS max_v, ROUND(AVG({c}), 6) AS avg_v FROM lineitem"
        for c in _CORR_COLS
    ),
    doc="single-pass numeric column profiler over lineitem: per column the "
    "non-null count, null count, exact NDV, min/max/avg — the data-quality "
    "summary a pipeline records before training. All four columns profile "
    "in ONE aggregation (Spark plans multi-distinct via Expand: 4 "
    "distinct-streams in one shuffle round, no per-column scans); at "
    "extreme NDV swap the exact count for approx_count_distinct — the "
    "sketch tier covers that path. Output is the tidy per-column form via "
    "a 4-element explode.",
)
def q_profile_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    aggs = []
    for i, c in enumerate(_CORR_COLS):
        aggs += [
            F.count(c).alias(f"n_{i}"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"nn_{i}"),
            F.countDistinct(c).alias(f"ndv_{i}"),
            F.round(F.min(c), 6).alias(f"mn_{i}"),
            F.round(F.max(c), 6).alias(f"mx_{i}"),
            F.round(F.avg(c), 6).alias(f"av_{i}"),
        ]
    agg = li.agg(*aggs)
    items = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"n_{i}").alias("n"),
                F.col(f"nn_{i}").alias("n_null"),
                F.col(f"ndv_{i}").alias("ndv"),
                F.col(f"mn_{i}").cast("double").alias("min_v"),
                F.col(f"mx_{i}").cast("double").alias("max_v"),
                F.col(f"av_{i}").alias("avg_v"),
            )
            for i, c in enumerate(_CORR_COLS)
        ]
    )
    return agg.select(F.explode(items).alias("e")).select(
        "e.col", "e.n", "e.n_null", "e.ndv", "e.min_v", "e.max_v", "e.avg_v"
    )


@query(
    "q_scbf_changes_agg",
    """
    SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey % 2 = 1
    GROUP BY o_orderpriority
    """,
    doc="SCBF incremental change feed (read_changes): write batch 1 (even "
    "orderkeys), snapshot, append batch 2 (odd), snapshot — then aggregate "
    "ONLY the rows appended between the two snapshots. The oracle sees "
    "exactly batch 2, proving the delta read pins the appended files and "
    "never rescans history (operators/snapshot.py:read_changes — the "
    "downstream-consumer primitive at 100 TB: process the delta, not the "
    "table).",
)
def q_scbf_changes_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from custom_columnar_format_spark.operators import snapshot as snap_op
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)
    app = spark.sparkContext.applicationId.replace("-", "_")
    tag = hashlib.md5(f"{sf_dir}|{app}|chg".encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"scbf_chg_{tag}")

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    if not os.path.isdir(path):
        # build under a scratch name, publish atomically last (see
        # q_scbf_delete_agg): a mid-setup crash must not leave a dir the
        # isdir() guard would trust with only the base snapshot written
        import shutil

        build = path + ".build"
        shutil.rmtree(build, ignore_errors=True)
        (
            o.filter(F.col("o_orderkey") % 2 == 0)
            .coalesce(2)
            .write.format("scbf").option("version", "2").mode("overwrite").save(build)
        )
        snap_op.create_snapshot(build, tag="base")
        (
            o.filter(F.col("o_orderkey") % 2 == 1)
            .coalesce(2)
            .write.format("scbf").option("version", "2").mode("append").save(build)
        )
        snap_op.create_snapshot(build, tag="plus_batch2")
        os.rename(build, path)
    return (
        snap_op.read_changes(spark, path, "base", "plus_batch2")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "q_scbf_delete_agg",
    """
    SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey NOT BETWEEN 100 AND 160
    GROUP BY o_orderpriority
    """,
    doc="SCBF DELETE-by-key (merge.delete_keys): write the dataset range-"
    "partitioned on the key, delete keys 100-160 copy-on-write, aggregate "
    "what remains. The oracle computes the complement directly; the "
    "key-range footer stats mean only the files whose envelope covers "
    "100-160 were read and rewritten — the right-to-be-forgotten / "
    "retention-purge primitive at 100 TB.",
)
def q_scbf_delete_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from custom_columnar_format_spark.operators import merge as merge_op
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)
    app = spark.sparkContext.applicationId.replace("-", "_")
    tag = hashlib.md5(f"{sf_dir}|{app}|del".encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"scbf_del_{tag}")

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    if not os.path.isdir(path):
        # build under a scratch name, publish with an atomic rename LAST: a
        # crash mid-setup can never leave a half-built dataset that a later
        # invocation's isdir() guard would silently trust (pre-delete rows)
        import shutil

        build = path + ".build"
        shutil.rmtree(build, ignore_errors=True)
        (
            o.repartitionByRange(8, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
            .write.format("scbf").option("version", "2").mode("overwrite").save(build)
        )
        doomed = o.filter(F.col("o_orderkey").between(100, 160)).select("o_orderkey")
        merge_op.delete_keys(spark, build, doomed, "o_orderkey")
        os.rename(build, path)
    return (
        spark.read.format("scbf").load(path)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )
