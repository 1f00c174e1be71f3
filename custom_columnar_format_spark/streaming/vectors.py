"""Streaming embedding ingest + semantic curation: a vector stream folded
into the IVF serving store micro-batch by micro-batch — the similarity-side
twin of the document curation loop (streaming/curation.py). A 100 TB
embedding store is never built once; it accumulates from the same crawl
cadence as the text corpus, and the ANN index stays queryable between
maintenance passes (``ivf_compact_store`` itself is stop-the-world for
readers: its directory swap leaves the plain-parquet layout partial for the
duration of the rename window — a real cluster hides that behind a
table-format commit or a versioned store directory + atomic pointer; see
operators/similarity.py ivf_compact_store). With a ``matches_store``
attached, each batch additionally near-dups within itself and against the
accumulated store (``semantic_match_batch``) before folding in, so semantic
duplicates are flagged at ingest time.

Each micro-batch (foreachBatch):

1. ``semantic_match_batch`` (optional): the batch's near-dup pairs within
   itself and against the stored corpus land in a ``batch=<id>``-partitioned
   matches table;
2. ``ivf_add_batch``: assign the batch against the FROZEN stored coarse
   quantizer and append into the per-list directories — O(batch), never
   O(store) — after an id anti-join against the touched lists' stored ids
   (partition-pruned, id-only read) so an at-least-once REPLAY of the batch
   (foreachBatch ran, checkpoint commit didn't) folds in as a no-op instead
   of appending duplicates (r9 ADVICE);
3. every ``compact_every`` batches, ``ivf_compact_store``: purge tombstones
   and rewrite each inverted list to one file, so the small-file count (and
   scan planning cost) stays bounded no matter how long the stream runs —
   the same lifecycle contract as ``maintain_sig_store``.

Determinism: with a frozen quantizer, assignment (and the nprobe probe set)
is per-row and order-free, so the drained multi-batch store answers any IVF
query identically to an index built from scratch over the union — that
equivalence is what the DuckDB oracle of ``q_stream_ivf_ingest`` replays
(the ``q_stream_curation`` pattern).

Quantizer staleness is NOT handled here by design — retraining centroids
mid-stream would silently move prior assignments and break the
probe→directory contract. Run ``ivf_drift_stats`` on a cadence and rebuild
deliberately with ``ivf_rebuild_store`` when it trips
(operators/similarity.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..operators import similarity


def semantic_match_batch(
    batch_df: DataFrame,
    store_df: DataFrame | None,
    centroids: np.ndarray,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocking: str = "assign",
    nprobe: int = 2,
) -> DataFrame:
    """ONE micro-batch's semantic near-dup matches — within the batch and
    against the stored corpus — as (id_a, id_b, cos_sim), id_a < id_b.

    Two SYMMETRIC blocking tiers (both replay-deterministic: the drained
    multi-batch match set equals ONE batch computation over the union
    regardless of how vectors were split into micro-batches — within-batch
    pairs surface immediately, cross-batch pairs exactly once when the
    later member arrives):

    - ``blocking="assign"`` (default, classic SemDeDup co-assignment): a
      pair is considered iff both vectors assign to the same inverted
      list. Cheapest; drops boundary pairs whose members straddle a
      cluster boundary.
    - ``blocking="intersect"`` (r9 VERDICT #4): BOTH sides probe their
      ``nprobe`` nearest lists and a pair is considered iff the probe SETS
      intersect. Set intersection is symmetric — unlike the asymmetric
      query-probes-nprobe/corpus-keeps-one tier of ``ivf_threshold_join``
      — so it stays order-independent while recovering most of the
      boundary-pair recall single-list blocking drops (recall comparison
      recorded in SCALE.md). Each candidate pair is emitted ONCE: the
      joined list must equal the MINIMUM of the two probe sets'
      intersection (a deterministic witness — no dropDuplicates shuffle).

    One assignment pass: if ``batch_df`` already carries ``ivf_list`` (and
    ``ivf_probes`` for the intersect tier) the assignment UDF is skipped —
    the ingest loop assigns once and reuses it for both join sides AND the
    store write. Store rows match through their PERSISTED probe sets
    (``ivf_probes``, written by the ingest loop when intersect blocking is
    on); legacy rows without the column fall back to their assigned list
    alone. Scale shape: the batch side is broadcast (batch-sized by
    contract); under "assign" the store joins on its PARTITION column so
    the scan prunes to the batch's lists; under "intersect" the store side
    explodes a narrow (probes, id, vec) projection — this function matches
    whatever ``store_df`` it is handed, and the ingest loop hands it a
    DIRECTORY-PRUNED store view via the (ivf_list, probe) adjacency table
    (``ivf_record_probe_adjacency``: candidate partitions = the batch's
    probed lists ∪ lists that probe into them; full-scan fallback when no
    adjacency was ever recorded).

    Replay guard: store rows whose id appears IN the batch are excluded
    wholesale (anti-join on the batch's id set, not a per-row id
    inequality) — after an at-least-once replay the store already contains
    the batch's own rows, and matching against them would emit every
    within-batch pair a second and third time (r9 ADVICE)."""
    from ..functions.vector import cosine

    if blocking not in ("assign", "intersect"):
        raise ValueError(f"unknown blocking tier: {blocking!r}")

    b = batch_df
    if blocking == "intersect" and "ivf_probes" not in b.columns:
        b = b.withColumn(
            "ivf_probes", similarity.ivf_probe_lists(centroids, nprobe, vec_col)
        )
    if "ivf_list" not in b.columns:
        b = b.withColumn(
            "ivf_list",
            F.element_at("ivf_probes", 1)
            if blocking == "intersect"
            else similarity.ivf_assign(centroids, vec_col),
        )
    keep = ["ivf_list", F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")]
    if blocking == "intersect":
        keep.append(F.col("ivf_probes").alias("_pb"))
    b = b.select(*keep)
    f4cos = lambda u, v: F.floor(cosine(u, v) * 1e4 + 0.5) / 1e4  # noqa: E731

    if blocking == "assign":
        lhs = b.select("ivf_list", F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
        within = (
            lhs.join(
                F.broadcast(
                    b.select(
                        "ivf_list", F.col("_id").alias("id_b"), F.col("_v").alias("_vb")
                    )
                ),
                "ivf_list",
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", f4cos(F.col("_va"), F.col("_vb")).alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
        )
    else:
        bx = b.withColumn("_p", F.explode("_pb"))
        lhs = bx.select(
            "_p", F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
            F.col("_pb").alias("_pa"),
        )
        rhs = bx.select(
            "_p", F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
            F.col("_pb").alias("_pbb"),
        )
        within = (
            lhs.join(F.broadcast(rhs), "_p")
            .filter(F.col("id_a") < F.col("id_b"))
            # min-witness: emit on exactly one shared probe list
            .filter(F.col("_p") == F.array_min(F.array_intersect("_pa", "_pbb")))
            .select("id_a", "id_b", f4cos(F.col("_va"), F.col("_vb")).alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
        )
    if store_df is None:
        return within

    # replay guard: exclude EVERY stored copy of the batch's own ids (see
    # docstring) — batch-sized build side, safe to broadcast
    batch_ids = b.select(F.col("_id").alias(id_col)).distinct()
    s = store_df.join(F.broadcast(batch_ids), id_col, "left_anti")

    if blocking == "assign":
        cross = (
            s.join(F.broadcast(b), "ivf_list")
            .select(
                F.least(F.col(id_col), F.col("_id")).alias("id_a"),
                F.greatest(F.col(id_col), F.col("_id")).alias("id_b"),
                f4cos(F.col(vec_col), F.col("_v")).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= threshold)
        )
    else:
        # persisted probe sets; legacy single-list rows fall back to their
        # assigned list (their probe set degenerates to {ivf_list})
        sp = (
            F.col("ivf_probes")
            if "ivf_probes" in s.columns
            else F.array(F.col("ivf_list"))
        )
        sx = s.select(
            F.col(id_col).alias("_sid"), F.col(vec_col).alias("_sv"),
            F.coalesce(sp, F.array(F.col("ivf_list"))).alias("_sp"),
        ).withColumn("_p", F.explode("_sp"))
        bx = b.withColumn("_p", F.explode("_pb"))
        cross = (
            sx.join(F.broadcast(bx), "_p")
            .filter(F.col("_p") == F.array_min(F.array_intersect("_sp", "_pb")))
            .select(
                F.least(F.col("_sid"), F.col("_id")).alias("id_a"),
                F.greatest(F.col("_sid"), F.col("_id")).alias("id_b"),
                f4cos(F.col("_sv"), F.col("_v")).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= threshold)
        )
    return within.unionByName(cross)


def start_vector_ingest_loop(
    stream_df: DataFrame,
    store: str,
    centroids: np.ndarray,
    checkpoint: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    compact_every: int | None = None,
    available_now: bool = True,
    matches_store: str | None = None,
    threshold: float = 0.9,
    blocking: str = "assign",
    nprobe: int = 2,
    replay_guard: str = "touched",
    vacuum_keep: int = 1,
):
    """Attach the IVF ingest loop to an embedding stream via foreachBatch.

    With ``matches_store``, the loop is the SEMANTIC curation twin of
    ``curation.start_curation_loop``: before each batch folds into the
    index, its near-dup matches — within itself and against the
    accumulated store — land in ``matches_store`` (parquet, one
    ``batch=<id>`` partition per trigger, overwritten on replay so
    at-least-once re-execution stays idempotent). Within-batch pairs
    surface immediately; cross-batch pairs exactly once, when the later
    member arrives and joins the stored one's list; tombstoned store rows
    are excluded (logical deletes honored between compactions).
    ``blocking="intersect"`` switches matching to the symmetric
    multiprobe tier (see ``semantic_match_batch``) and persists each row's
    ``ivf_probes`` into the store so stored rows match through their FULL
    probe sets.

    Replay idempotence (r9 ADVICE): both store-mutating steps tolerate an
    at-least-once re-execution of a micro-batch —

    - the index add anti-joins the batch against the ids already stored in
      its touched lists (partition-pruned, id-only read), so a replayed
      batch appends nothing and the drained store stays row-identical to a
      from-scratch build (``ivf_compact_store`` never dedupes by id, so
      appended duplicates would be permanent);
    - the matches write recomputes against a store view that EXCLUDES the
      batch's own ids (``semantic_match_batch``'s anti-join guard), so the
      ``batch=<id>`` overwrite reproduces the original partition exactly.

    A consequence of the id anti-join: a TOMBSTONED id stays dead until
    compaction physically purges it — re-ingesting the same id revives it
    only after ``ivf_compact_store`` has run.

    **Id-immutability contract** (``replay_guard="touched"``, default):
    the replay anti-join prunes the stored-id read to the batch's touched
    lists, which is only exact when an id's embedding never changes — a
    re-crawled id with a CHANGED vector can assign to a different list,
    evade the guard, and append a permanent duplicate id (and an
    unchanged-list re-crawl is silently dropped). Under this contract ids
    are immutable once ingested; updating one means tombstone + compact +
    re-ingest. ``replay_guard="full"`` drops the contract: the anti-join
    reads the store's FULL id set (id-only, column-pruned — one narrow
    column scan per batch instead of a pruned one), deterministically
    rejecting every re-ingested id regardless of which list its new
    vector lands in. Pick "full" when upstream can re-emit ids with new
    embeddings (r10 ADVICE #4).

    The store may be generational (``similarity.ivf_init_generational``);
    each batch resolves the pointer once and folds into that generation.
    Every compaction then commits a NEW generation, so the loop vacuums
    superseded ones down to ``vacuum_keep`` (default 1 — the grace window
    for a reader that resolved the pointer just before the flip) right
    after each compaction; otherwise a long-running stream would retain
    every generation it ever compacted.
    """
    if replay_guard not in ("touched", "full"):
        raise ValueError(f"replay_guard must be 'touched' or 'full', got {replay_guard!r}")
    import os

    spark = stream_df.sparkSession

    def _fold(bdf: DataFrame, bid: int) -> None:
        if bdf.isEmpty():
            return
        # assign ONCE per batch; the matches joins and the store write all
        # reuse the column(s) instead of re-running the centroid matmul UDF
        if blocking == "intersect":
            assigned = bdf.withColumn(
                "ivf_probes", similarity.ivf_probe_lists(centroids, nprobe, vec_col)
            ).withColumn("ivf_list", F.element_at("ivf_probes", 1))
        else:
            assigned = bdf.withColumn(
                "ivf_list", similarity.ivf_assign(centroids, vec_col)
            )
        # the batch is reused by the matches joins, the touched-list scan,
        # the replay anti-join, and the store write — cache it so the
        # centroid-matmul UDF runs once per batch, not once per consumer
        assigned = assigned.persist()
        try:
            _fold_batch(assigned, bid)
        finally:
            assigned.unpersist()

    def _fold_batch(assigned: DataFrame, bid: int) -> None:
        # one pointer resolution per batch: every read below (data,
        # tombstones, adjacency, replay guard) targets the same snapshot
        # directory — identity on flat stores
        cur = similarity._resolve_store(store)
        has_store = os.path.isdir(cur) and any(
            e.startswith("ivf_list=") for e in os.listdir(cur)
        )

        def _read_store() -> DataFrame:
            # a store that started probeless (assign tier) and later
            # switched to intersect mixes files with and without the
            # ivf_probes column; without mergeSchema Spark may infer from
            # a probeless file and silently degrade EVERY stored row to
            # single-list fallback (r10 ADVICE #5). _load_store is the
            # SAME reader the maintenance paths (compact/rebuild) use, so
            # the two can't drift apart.
            if blocking == "intersect":
                return similarity._load_store(spark, cur, "parquet")
            return spark.read.parquet(cur)

        if matches_store is not None:
            store_df = None
            if has_store:
                store_df = _read_store()
                if blocking == "intersect":
                    # directory pruning for the cross scan: a store row can
                    # witness an intersection only on one of its OWN probes,
                    # so candidate partitions = the batch's probed lists P
                    # (identity: every row's assigned list is in its probe
                    # set) ∪ assigned lists that probe INTO P per the
                    # store's adjacency table (≤ nlist² rows, exact —
                    # maintained by ivf_add_batch / compaction / rebuild).
                    # Both collects are nlist-bounded.
                    P = {
                        r[0]
                        for r in assigned.select(
                            F.explode("ivf_probes").alias("p")
                        ).distinct().collect()
                    }
                    cand = set(P)
                    adj = similarity.ivf_probe_adjacency(spark, cur)
                    if adj is not None:
                        cand |= {
                            r[0]
                            for r in adj.filter(F.col("probe").isin(list(P)))
                            .select("ivf_list")
                            .distinct()
                            .collect()
                        }
                        store_df = store_df.filter(
                            F.col("ivf_list").isin(sorted(cand))
                        )
                    # no adjacency recorded (store predates the intersect
                    # loop): full scan — pruning must never lose a witness
                # honor logical deletes: a tombstoned vector must not keep
                # generating matches between deletion and the next compaction
                dead = similarity.ivf_tombstones(spark, cur, id_col)
                if dead is not None:
                    store_df = store_df.join(F.broadcast(dead), id_col, "left_anti")
            m = semantic_match_batch(
                assigned, store_df, centroids, threshold, id_col, vec_col,
                blocking=blocking, nprobe=nprobe,
            )
            # batchId-scoped overwrite: an at-least-once replay of this
            # batch rewrites its own partition instead of appending dupes
            m.write.mode("overwrite").parquet(
                os.path.join(matches_store, f"batch={bid}")
            )
        fresh = assigned
        if has_store:
            if replay_guard == "full":
                # exact by construction at the cost of an id-only scan of
                # the whole store (one narrow column): rejects a re-crawled
                # id even when its new vector assigns to a different list
                stored_ids = _read_store().select(id_col)
            else:
                # "touched": drop rows whose id the store already holds in
                # the batch's touched lists (bounded by nlist; the id-only
                # read is partition-pruned to those directories). Exact
                # ONLY under the id-immutability contract — see docstring.
                touched = [
                    r[0] for r in assigned.select("ivf_list").distinct().collect()
                ]
                stored_ids = (
                    _read_store()
                    .filter(F.col("ivf_list").isin(touched))
                    .select(id_col)
                )
            fresh = assigned.join(stored_ids, id_col, "left_anti")
        similarity.ivf_add_batch(fresh, cur, centroids, vec_col=vec_col)
        if compact_every and (bid + 1) % compact_every == 0:
            similarity.ivf_compact_store(spark, store, id_col=id_col)
            # a generational store flips to a new generation on every
            # compaction; without retention the superseded ones accumulate
            # for the life of the stream. keep=1 leaves exactly one prior
            # generation as the grace window for readers that resolved the
            # pointer just before the flip (no query on this deployment
            # outlives a full compaction cycle) — ivf_vacuum_generations
            # is a no-op on flat stores.
            similarity.ivf_vacuum_generations(store, keep=vacuum_keep)

    writer = stream_df.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
