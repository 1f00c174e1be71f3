"""Streaming queries for the driver registry: each drains the events backlog
through a real Structured Streaming plan (file source → watermark → stateful
op → memory sink, Trigger.AvailableNow) and returns the resulting table.

Because the streams are deterministic over a finite backlog, the tumbling /
session-window entries carry full DuckDB oracles — the driver hash-verifies
that STREAMING execution produces the batch answer. The custom stateful
sessionizer (applyInPandasWithState) is pinned against the batch
lag+cumsum twin in tests and registered with an oracle too (session ids are
assigned in time order per user, identical to the SQL formulation)."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..streaming import events as ev
from .registry import query
from .scratch import scratch_dir


def _drain(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    name = f"stream_q_{uuid.uuid4().hex[:10]}"
    ck = scratch_dir(prefix=f"ck_{name}_")
    return ev.run_available_now(stream_df, name, ck, output_mode=output_mode)


@query(
    "q_stream_tumbling",
    """
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
           event_type, COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
    doc="STREAMING tumbling 1h window counts (file stream → watermark → memory "
    "sink, Trigger.AvailableNow) — oracle-verified equal to the batch answer.",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    out = _drain(ev.tumbling_counts(stream, width="1 hour", watermark="2 hours"))
    return out.select(
        F.unix_timestamp("window_start").alias("window_start"), "event_type", "n_events"
    )


@query(
    "q_stream_session_window",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))) > 1800
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g
    )
    SELECT user_id, COUNT(*) AS n_events,
           CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_s
    FROM s GROUP BY user_id, sid
    """,
    doc="STREAMING session windows (30-min gap) via F.session_window — "
    "oracle: batch gap-sessionization groups, matched on (user, start, count).",
)
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    out = _drain(ev.session_windows(stream, gap="30 minutes", watermark="4 hours"))
    return out.select(
        "user_id",
        "n_events",
        F.unix_timestamp("session_start").alias("session_start_s"),
    )


@query(
    "q_stream_sliding",
    """
    WITH w AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start FROM events
      UNION ALL
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) - 3600 AS window_start FROM events
    )
    SELECT window_start, COUNT(*) AS n_events
    FROM w GROUP BY 1
    """,
    doc="STREAMING sliding window (2h width / 1h slide) counts — every event "
    "lands in exactly two hour-aligned windows; oracle: union of two shifted "
    "tumblings.",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    out = _drain(ev.sliding_counts(stream, width="2 hours", slide="1 hour", watermark="2 hours"))
    # n_users is approx_count_distinct (exact DISTINCT is unsupported in
    # streaming aggs) — excluded from the hash-compared projection.
    return out.select(F.unix_timestamp("window_start").alias("window_start"), "n_events")


@query(
    "q_stream_static_join",
    """
    SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    """,
    doc="STREAMING stream-static join: event stream enriched with the "
    "broadcast customer dim, aggregated per (segment, event_type) — "
    "oracle-verified equal to the batch join.",
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .tables import load

    stream = ev.read_events_stream(spark, sf_dir)
    customer = load(spark, sf_dir, "customer")
    out = _drain(ev.stream_static_enrich(stream, customer))
    return out.select(
        "c_mktsegment",
        "event_type",
        "n_events",
        F.round("raw_value", 2).alias("total_value"),
    )


@query(
    "q_stream_dedup",
    "SELECT DISTINCT user_id, event_type FROM events",
    doc="STREAMING dedup: first event per (user_id, event_type) via "
    "dropDuplicates with watermark-bounded state; key-set output is "
    "deterministic and oracle-verified.",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    return _drain(ev.stream_dedup_keys(stream), output_mode="append")


@query(
    "q_stream_stateful_sessionize",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))) > 1800
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
           CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_s
    FROM s GROUP BY user_id, session_id
    """,
    doc="STREAMING custom stateful sessionizer (applyInPandasWithState, one "
    "4-int state tuple per user) — oracle: batch lag+cumsum sessionization.",
)
def q_stream_stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    out = _drain(ev.stateful_sessionize(stream), output_mode="update")
    return out.select(
        "user_id",
        "session_id",
        "n_events",
        F.unix_timestamp("session_start").alias("session_start_s"),
    )


@query(
    "q_stream_rollup_upsert",
    """
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
           event_type, COUNT(*) AS n_events,
           FLOOR(SUM(value)*1e4+0.5)/1e4 AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="continuous aggregate (streaming/rollup.py): each micro-batch MERGEs "
    "its per-(hour, type) delta into a persistent SCBF rollup table — the "
    "hypertable-rollup / incremental-materialized-view pattern; state lives "
    "in the table so late data needs no watermark, and untouched rollup "
    "files are never rewritten (key-range copy-on-write). Oracle: the batch "
    "windowed aggregate the maintained table must converge to.",
)
def q_stream_rollup_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.scbf_datasource import register
    from ..streaming import rollup

    register(spark)
    stream = ev.read_events_stream(spark, sf_dir).select("ts", "event_type", "value")
    target = scratch_dir(prefix="rollup_tbl_")
    ck = scratch_dir(prefix="rollup_ck_")
    q = rollup.start_continuous_rollup(stream, target, ck, window_duration="1 hour")
    q.awaitTermination()
    return (
        spark.read.format("scbf")
        .load(target)
        .select(
            "window_start",
            "event_type",
            "n_events",
            (F.floor(F.col("sum_value") * 1e4 + 0.5) / 1e4).alias("sum_value"),
        )
    )


def _stream_curation_oracle_sql(est_threshold: float, num_hashes: int = 64) -> str:
    """ONE-batch replay of the drained multi-batch curation loop: all
    unordered doc pairs with >= 1 matching LSH band and signature agreement
    >= est_threshold (batch partitioning cancels out — a pair is found
    within its batch or when its later member arrives, exactly once)."""
    from .llm_ops import _band_eq_sql, _minhash_sig_ctes

    est = (
        f"floor(list_sum(list_transform(range(1, {num_hashes} + 1), "
        f"i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) "
        f"/ {float(num_hashes)} * 10000 + 0.5) / 10000"
    )
    return f"""
    WITH {_minhash_sig_ctes()},
    pm AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, {est} AS est_jaccard
      FROM sig a JOIN sig b
        ON a.doc_id < b.doc_id AND ({_band_eq_sql('a', 'b')})
    )
    SELECT id_a, id_b, est_jaccard FROM pm WHERE est_jaccard >= {est_threshold}
    """


@query(
    "q_stream_curation",
    _stream_curation_oracle_sql(0.5),
    doc="STREAMING incremental curation loop (r8 verdict task #3, promoted "
    "from test-only): documents arrive as micro-batches (file stream, one "
    "file per trigger); each batch is near-dup'd within itself and against "
    "the ACCUMULATING SCBF signature store via foreachBatch + "
    "minhash_history_matches, matches append to an SCBF table, and the "
    "batch's signatures MERGE into the store (copy-on-write upsert by id). "
    "History bodies are never re-read — the store holds id + 64 longs per "
    "doc. The drained multi-batch result is batch-partition-independent "
    "(within-batch pairs found immediately, cross-batch pairs exactly once "
    "when the later member arrives), so the oracle replays it as ONE batch "
    "computation over all documents — the q_stream_rollup_upsert "
    "equivalence pattern.",
)
def q_stream_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.scbf_datasource import register
    from ..streaming import curation
    from .llm_ops import _docs_spread

    register(spark)
    docs = _docs_spread(spark, sf_dir).select("doc_id", "text")
    src = scratch_dir(prefix="curation_src_")
    n_batches = 3
    for i in range(n_batches):
        # one parquet file per crawl batch → one micro-batch per trigger
        docs.filter(F.col("doc_id") % n_batches == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sig_store = scratch_dir(prefix="curation_sigs_")
    matches_store = scratch_dir(prefix="curation_matches_")
    ck = scratch_dir(prefix="curation_ck_")
    q = curation.start_curation_loop(
        stream, sig_store, matches_store, ck, est_threshold=0.5
    )
    q.awaitTermination()
    return (
        spark.read.format("scbf")
        .load(matches_store)
        .select("id_a", "id_b", "est_jaccard")
        .orderBy("id_a", "id_b")
    )


def _stream_curation_clusters_oracle_sql(
    est_threshold: float, num_hashes: int = 64
) -> str:
    """Recursive-CTE closure over the one-batch pair set — the ground truth
    the STREAM-MAINTAINED cluster table must converge to."""
    from .llm_ops import _band_eq_sql, _minhash_sig_ctes

    est = (
        f"floor(list_sum(list_transform(range(1, {num_hashes} + 1), "
        f"i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) "
        f"/ {float(num_hashes)} * 10000 + 0.5) / 10000"
    )
    return f"""
    WITH RECURSIVE {_minhash_sig_ctes()},
    pm AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sig a JOIN sig b
        ON a.doc_id < b.doc_id AND ({_band_eq_sql('a', 'b')})
      WHERE {est} >= {est_threshold}
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM pm UNION SELECT id_b, id_a FROM pm),
    nodes AS (SELECT DISTINCT u FROM edges),
    reach AS (
      SELECT u, u AS v FROM nodes
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ), comp AS (SELECT u AS node, MIN(v) AS component FROM reach GROUP BY u)
    SELECT component, COUNT(*) AS n_members, MIN(node) AS keep_id
    FROM comp GROUP BY component
    """


@query(
    "q_stream_curation_clusters",
    _stream_curation_clusters_oracle_sql(0.5),
    doc="STREAM-MAINTAINED duplicate-cluster table: the curation loop "
    "additionally folds each micro-batch's match edges into a persistent "
    "(node, label) SCBF cluster table via incremental_components"
    "(delta_only=True) + merge_into — the O(batch) closure over "
    "star-rewritten edges with only changed/new rows upserted (id-range "
    "copy-on-write), never a full-state rewrite or a closure over history. "
    "Oracle: the from-scratch recursive-CTE closure over the one-batch "
    "pair set the maintained table must converge to, rolled up as "
    "(component, n_members, keep_id).",
)
def q_stream_curation_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.scbf_datasource import register
    from ..streaming import curation
    from .llm_ops import _docs_spread

    register(spark)
    docs = _docs_spread(spark, sf_dir).select("doc_id", "text")
    src = scratch_dir(prefix="curcl_src_")
    n_batches = 3
    for i in range(n_batches):
        docs.filter(F.col("doc_id") % n_batches == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sig_store = scratch_dir(prefix="curcl_sigs_")
    matches_store = scratch_dir(prefix="curcl_matches_")
    clusters_store = scratch_dir(prefix="curcl_state_")
    ck = scratch_dir(prefix="curcl_ck_")
    q = curation.start_curation_loop(
        stream, sig_store, matches_store, ck,
        est_threshold=0.5, clusters_store=clusters_store,
    )
    q.awaitTermination()
    state = spark.read.format("scbf").load(clusters_store)
    return (
        state.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_members"), F.min("node").alias("keep_id"))
        .select(F.col("label").alias("component"), "n_members", "keep_id")
        .orderBy("component")
    )


@query(
    "q_stream_funnel",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          JOIN v ON e.user_id = v.user_id
            AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 24 HOUR
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
          JOIN c ON e.user_id = c.user_id
            AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 24 HOUR
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS stage_view,
           (SELECT COUNT(*) FROM c) AS stage_click,
           (SELECT COUNT(*) FROM p) AS stage_purchase
    """,
    doc="STREAMING funnel / CEP sequence detection (applyInPandasWithState): "
    "per-user view→click→purchase chain with 24h step windows, three "
    "timestamps of state per user — the MATCH_RECOGNIZE shape; drained "
    "backlog must reproduce the batch funnel exactly (same oracle as "
    "q_funnel_3step).",
)
def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    stages = _drain(ev.stateful_funnel(stream), output_mode="update")
    # The update-mode memory sink holds one row per user per micro-batch in
    # which that user had events; reduce to each user's FINAL emission
    # (max rev) before counting — a multi-batch drain would otherwise count
    # users once per batch, and the chain can be revised downward by
    # out-of-order batches, so max(stage) would also be wrong.
    final = stages.groupBy("user_id").agg(F.max_by("stage", "rev").alias("stage"))
    return final.agg(
        F.sum((F.col("stage") >= 1).cast("long")).alias("stage_view"),
        F.sum((F.col("stage") >= 2).cast("long")).alias("stage_click"),
        F.sum((F.col("stage") >= 3).cast("long")).alias("stage_purchase"),
    )


@query(
    "q_stream_stream_join",
    """
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
    """,
    doc="STREAM-STREAM inner join (click attribution): watermarks on both "
    "sides + a time-bounded join condition keep buffered state evictable — "
    "the third Structured Streaming join type alongside stream-static and "
    "windowed aggregation; drained backlog equals the batch join.",
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s1 = ev.read_events_stream(spark, sf_dir).filter(F.col("event_type") == "view")
    s2 = ev.read_events_stream(spark, sf_dir).filter(F.col("event_type") == "click")
    return _drain(
        ev.stream_stream_click_attribution(s1, s2), output_mode="append"
    )


def _cms_users_oracle_sql() -> str:
    """Batch CMS replay over event user ids: same md5-prefix bucket hashing
    as operators/sketches.py, 4×256 grid, top-10 by estimate then uid."""
    from .analytics import _hexparse_sql

    bucket = _hexparse_sql("md5(CAST(r.row AS VARCHAR) || ':' || uid)", 1, 12) + " % 256"
    rows_values = ", ".join(f"({r})" for r in range(4))
    return f"""
    WITH toks AS (SELECT CAST(user_id AS VARCHAR) AS uid FROM events),
    cells AS (
      SELECT r.row AS row, {bucket} AS bucket
      FROM toks CROSS JOIN (VALUES {rows_values}) r(row)
    ),
    sketch AS (SELECT row, bucket, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
    cand AS (SELECT DISTINCT uid FROM toks),
    probes AS (
      SELECT uid, r.row AS row, {bucket} AS bucket
      FROM cand CROSS JOIN (VALUES {rows_values}) r(row)
    )
    SELECT uid, MIN(cnt) AS est
    FROM probes JOIN sketch USING (row, bucket) GROUP BY uid
    ORDER BY est DESC, uid LIMIT 10
    """


@query(
    "q_stream_cms_users",
    _cms_users_oracle_sql(),
    doc="STREAMING count-min sketch: the 4×256 counter grid is maintained "
    "incrementally by a streaming groupBy over the stateless cell projection "
    "— cell-wise mergeability is exactly what makes the sketch streamable; "
    "the drained sketch is probed batch-side for top-10 heavy-hitter users. "
    "Oracle: the batch CMS over the same backlog (merged micro-batch "
    "sketches == one-shot sketch).",
)
def q_stream_cms_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sketches
    from .tables import load

    stream = ev.read_events_stream(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("uid")
    )
    sketch = _drain(
        sketches.cms_cells(stream, "uid")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt")),
        output_mode="complete",
    )
    cand = (
        load(spark, sf_dir, "events").select(F.col("user_id").cast("string").alias("uid")).distinct()
    )
    est = sketches.cms_estimate(sketch, cand, "uid")
    return est.orderBy(F.desc("est"), "uid").limit(10)


@query(
    "q_stream_stream_left_join",
    """
    WITH m AS (
      SELECT least(
        (SELECT MAX(ts) FROM events WHERE event_type = 'view'),
        (SELECT MAX(ts) FROM events WHERE event_type = 'click')) AS mx
    ),
    v AS (SELECT * FROM events WHERE event_type = 'view'),
    c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
    FROM v LEFT JOIN c
      ON v.user_id = c.user_id
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
    CROSS JOIN m
    WHERE v.ts <= m.mx - INTERVAL 4 HOURS
    """,
    doc="STREAM-STREAM **left outer** join: unmatched views emit null "
    "click_id once the watermark proves no match can arrive. Outer emission "
    "lags the watermark — and the global watermark is the MIN over both "
    "streams' (max event time − delay), so a drained backlog flushes "
    "unmatched rows only up to min(max_view, max_click) − watermark − "
    "window. Query and oracle both evaluate to a 4h horizon below that min, "
    "safely inside the flushed region, where streaming == batch left join "
    "exactly (boundary-eviction timing cancels out).",
)
def q_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .tables import load

    s1 = ev.read_events_stream(spark, sf_dir).filter(F.col("event_type") == "view")
    s2 = ev.read_events_stream(spark, sf_dir).filter(F.col("event_type") == "click")
    out = _drain(
        ev.stream_stream_click_attribution_outer(s1, s2), output_mode="append"
    )
    evb = load(spark, sf_dir, "events")
    mx = (
        evb.filter(F.col("event_type") == "view")
        .agg(F.max("ts").alias("mxv"))
        .join(evb.filter(F.col("event_type") == "click").agg(F.max("ts").alias("mxc")))
        .select(F.least("mxv", "mxc").alias("mx"))
    )
    return (
        out.join(F.broadcast(mx))  # 1-row horizon build
        .filter(F.col("view_ts") <= F.col("mx") - F.expr("INTERVAL 4 HOURS"))
        .select("user_id", "view_id", "click_id")
    )


def _emb_batch_stream(spark: SparkSession, sf_dir: str, prefix: str, n_batches: int = 3):
    """Shared scaffolding for the streaming-IVF queries: materialize the
    embeddings table as n_batches parquet files (one micro-batch per
    trigger via maxFilesPerTrigger=1), and return (stream, store_path,
    checkpoint_path) with the store path NOT yet created (ivf_add_batch
    creates the layout itself)."""
    import shutil

    from .llm_ops import _emb_spread

    base = _emb_spread(spark, sf_dir).select("vec_id", "embedding")
    src = scratch_dir(prefix=f"{prefix}_src_")
    for i in range(n_batches):
        base.filter(F.col("vec_id") % n_batches == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(base.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    store = scratch_dir(prefix=f"{prefix}_store_")
    shutil.rmtree(store)
    ck = scratch_dir(prefix=f"{prefix}_ck_")
    return stream, store, ck


from .llm_ops import _ivf_oracle_sql as _llm_ops_ivf_oracle_sql  # noqa: E402 — no cycle: llm_ops imports nothing from this module


@query(
    "q_stream_ivf_ingest",
    # frozen quantizer ⇒ the drained multi-batch store must answer exactly
    # like an index built from scratch — the same replay as q_sim_ivf_topk
    _llm_ops_ivf_oracle_sql(),
    doc="STREAMING ANN-index maintenance: embeddings arrive as micro-batches "
    "(file stream, one file per trigger) and fold into the IVF serving "
    "store via foreachBatch + ivf_add_batch — assigned against the FROZEN "
    "stored quantizer, appended per-list, O(batch) per trigger — with "
    "ivf_compact_store every 2 batches bounding the small-file count while "
    "the stream runs. The drained store is searched with partition-pruned "
    "ivf_topk_partitioned. With a frozen quantizer assignment is per-row "
    "and order-free, so the oracle replays the whole stream as ONE "
    "from-scratch IVF build over all vectors (the q_stream_curation "
    "equivalence pattern); streaming-side twin of q_sim_ivf_incremental.",
)
def q_stream_ivf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.vectors import start_vector_ingest_loop
    from .llm_ops import _emb_spread, _seed_centroids

    cent, qv = _seed_centroids(_emb_spread(spark, sf_dir))
    stream, store, ck = _emb_batch_stream(spark, sf_dir, "ivf_ingest")
    q = start_vector_ingest_loop(stream, store, cent, ck, compact_every=2)
    q.awaitTermination()

    from ..operators import similarity

    return similarity.ivf_topk_partitioned(spark, store, qv, cent, k=10, nprobe=4)


def _stream_semantic_oracle_sql(threshold: float = 0.25, nlist: int = 16) -> str:
    """One-batch replay of the streaming semantic curation loop: all
    unordered pairs assigned to the same inverted list with floor-rounded
    cosine >= threshold — valid for ANY micro-batch split because
    co-assignment blocking is symmetric (see semantic_match_batch)."""
    from .llm_ops import _cos_sql

    return f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {nlist}),
    a AS (
      SELECT e.vec_id, e.embedding, c.cid,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
      FROM embeddings e CROSS JOIN cent c
    ),
    lists AS (SELECT vec_id, embedding, cid FROM a WHERE rn = 1),
    m AS (
      SELECT u.vec_id AS id_a, v.vec_id AS id_b,
             floor({_cos_sql('u.embedding', 'v.embedding')} * 1e4 + 0.5) / 1e4 AS cos_sim
      FROM lists u JOIN lists v ON u.cid = v.cid AND u.vec_id < v.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM m WHERE cos_sim >= {threshold}
    """


@query(
    "q_stream_semantic_curation",
    _stream_semantic_oracle_sql(),
    doc="STREAMING semantic curation: embedding micro-batches (file stream, "
    "one file per trigger) flow through the vector ingest loop with a "
    "matches store attached — each batch near-dups within itself and "
    "against the ACCUMULATED IVF store (co-assignment/SemDeDup blocking, "
    "cosine >= 0.25) before folding into the index, the embedding-modality "
    "twin of q_stream_curation's MinHash loop. Co-assignment blocking is "
    "symmetric, so the drained multi-batch match set is batch-split-"
    "INDEPENDENT and the oracle replays it as one batch computation over "
    "all vectors (same-list pairs above threshold). Scale shape per "
    "batch: batch side broadcast, store joins on its partition column "
    "(directory-pruned to the batch's lists), matches append-only.",
)
def q_stream_semantic_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..streaming.vectors import start_vector_ingest_loop
    from .llm_ops import _emb_spread, _seed_centroids

    cent, _ = _seed_centroids(_emb_spread(spark, sf_dir))
    stream, store, ck = _emb_batch_stream(spark, sf_dir, "semcur")
    matches = scratch_dir(prefix="semcur_matches_")
    shutil.rmtree(matches)
    q = start_vector_ingest_loop(
        stream, store, cent, ck, matches_store=matches, threshold=0.25
    )
    q.awaitTermination()
    return spark.read.parquet(matches).select("id_a", "id_b", "cos_sim")


def _stream_intersect_oracle_sql(
    threshold: float = 0.25, nlist: int = 16, nprobe: int = 2
) -> str:
    """One-batch replay of the SYMMETRIC MULTIPROBE streaming tier: every
    vector's nprobe nearest lists (cos DESC, cid tiebreak — the engine's
    stable argsort), a pair is a match iff the probe SETS intersect and the
    floor-rounded cosine clears the threshold. The engine emits each pair
    once via its min-witness filter; the replay dedupes the multi-witness
    join with GROUP BY — same set either way. Valid for ANY micro-batch
    split because set intersection is symmetric."""
    from .llm_ops import _cos_sql

    return f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {nlist}),
    pr AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn <= {nprobe}
    ),
    cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM pr a JOIN pr b ON a.cid = b.cid AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ),
    m AS (
      SELECT c.id_a, c.id_b,
             floor({_cos_sql('u.embedding', 'v.embedding')} * 1e4 + 0.5) / 1e4 AS cos_sim
      FROM cand c
      JOIN embeddings u ON u.vec_id = c.id_a
      JOIN embeddings v ON v.vec_id = c.id_b
    )
    SELECT id_a, id_b, cos_sim FROM m WHERE cos_sim >= {threshold}
    """


@query(
    "q_stream_semantic_intersect",
    _stream_intersect_oracle_sql(),
    doc="STREAMING semantic curation on the SYMMETRIC MULTIPROBE tier (r9 "
    "VERDICT #4): same micro-batch loop as q_stream_semantic_curation, but "
    "blocking='intersect' — every vector probes its 2 nearest lists and a "
    "pair is considered iff the probe SETS intersect. Set intersection is "
    "symmetric, so the drained match set stays batch-split-independent "
    "(the oracle replays ONE batch over all vectors) while recovering the "
    "boundary-pair recall co-assignment drops (measured 0.940 → 0.996 on "
    "planted near-dups — SCALE.md round-10). Each pair emits once via a "
    "min-witness filter (joined list == min of the probe-set "
    "intersection), no dropDuplicates shuffle; the loop persists "
    "ivf_probes into the store so stored rows match through their full "
    "sets, and the store's cross scan prunes to directories via the "
    "hidden (ivf_list, probe) adjacency table (≤ nlist² rows — "
    "candidate partitions = batch's probed lists ∪ lists that probe into "
    "them; full-scan fallback when unrecorded). The single-list tier "
    "remains the default.",
)
def q_stream_semantic_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..streaming.vectors import start_vector_ingest_loop
    from .llm_ops import _emb_spread, _seed_centroids

    cent, _ = _seed_centroids(_emb_spread(spark, sf_dir))
    stream, store, ck = _emb_batch_stream(spark, sf_dir, "semint")
    matches = scratch_dir(prefix="semint_matches_")
    shutil.rmtree(matches)
    q = start_vector_ingest_loop(
        stream, store, cent, ck, matches_store=matches, threshold=0.25,
        blocking="intersect", nprobe=2,
    )
    q.awaitTermination()
    return spark.read.parquet(matches).select("id_a", "id_b", "cos_sim")


@query(
    "q_stream_lifetime_stats",
    """
    SELECT user_id, COUNT(*) AS n_events,
           FLOOR(SUM(value) * 1e4 + 0.5) / 1e4 AS total_value
    FROM events GROUP BY 1
    """,
    doc="STREAMING per-user lifetime aggregates via applyInPandasWithState "
    "(the protobuf-free twin of the Spark-4 transformWithStateInPandas "
    "processor, same output contract — streaming/events.py): one (n, total) "
    "state tuple per user, O(users) never O(events); each micro-batch folds "
    "in and emits the user's running totals, and the LAST emission per user "
    "over the drained backlog equals the batch groupBy — the oracle. The "
    "update-mode sink keeps every emission, so the query takes each user's "
    "max-n row (the fold is strictly increasing in n_events).",
)
def q_stream_lifetime_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ev.read_events_stream(spark, sf_dir)
    drained = _drain(ev.aipws_user_lifetime_stats(stream), output_mode="update")
    return drained.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        (F.floor(F.max_by("total_value", "n_events") * 1e4 + 0.5) / 1e4).alias(
            "total_value"
        ),
    )
