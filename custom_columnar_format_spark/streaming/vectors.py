"""Streaming embedding ingest + semantic curation: a vector stream folded
into the IVF serving store micro-batch by micro-batch — the similarity-side
twin of the document curation loop (streaming/curation.py). A 100 TB
embedding store is never built once; it accumulates from the same crawl
cadence as the text corpus, and the ANN index has to stay queryable
THROUGHOUT. With a ``matches_store`` attached, each batch additionally
near-dups within itself and against the accumulated store
(``semantic_match_batch`` — SemDeDup co-assignment blocking) before
folding in, so semantic duplicates are flagged at ingest time.

Each micro-batch (foreachBatch):

1. ``ivf_add_batch``: assign the batch against the FROZEN stored coarse
   quantizer and append into the per-list directories — O(batch), never
   O(store), and the store stays partition-prunable for queries running
   concurrently;
2. every ``compact_every`` batches, ``ivf_compact_store``: purge any
   tombstones and rewrite each inverted list to one file, so the
   small-file count (and scan planning cost) stays bounded no matter how
   long the stream runs — the same lifecycle contract as
   ``maintain_sig_store``.

Determinism: with a frozen quantizer, assignment is per-row and
order-free, so the drained multi-batch store answers any IVF query
identically to an index built from scratch over the union — that
equivalence is what the DuckDB oracle of ``q_stream_ivf_ingest`` replays
(the ``q_stream_curation`` pattern).

Quantizer staleness is NOT handled here by design — retraining centroids
mid-stream would silently move prior assignments and break the
probe→directory contract. Run ``ivf_drift_stats`` on a cadence and rebuild
deliberately when it trips (operators/similarity.py).
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
) -> DataFrame:
    """ONE micro-batch's semantic near-dup matches — within the batch and
    against the stored corpus — as (id_a, id_b, cos_sim), id_a < id_b.

    Blocking is CO-ASSIGNMENT (classic SemDeDup: a pair is considered iff
    both vectors assign to the same inverted list). Chosen for the
    streaming loop deliberately: cluster equality is symmetric, so the
    drained multi-batch match set equals ONE batch computation over the
    union regardless of how vectors were split into micro-batches (the
    ``q_stream_curation`` replay property) — within-batch pairs surface
    immediately, cross-batch pairs exactly once when the later member
    arrives and joins the stored one's list. The asymmetric nprobe>1 tier
    (higher boundary recall, order-dependent) stays available as the batch
    operator gated by q_embedding_neardup_incremental.

    One assignment pass: if ``batch_df`` already carries ``ivf_list`` the
    UDF is skipped (the ingest loop assigns once and reuses it for both
    join sides AND the store write). The store side keeps its partition
    column, so the cross join prunes to the batch's assigned directories.
    A stored row with the SAME id as a batch row (an at-least-once replay
    or a re-crawl) is excluded — a vector is not its own duplicate."""
    from ..functions.vector import cosine

    b = batch_df
    if "ivf_list" not in b.columns:
        b = b.withColumn("ivf_list", similarity.ivf_assign(centroids, vec_col))
    b = b.select("ivf_list", F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    f4cos = lambda u, v: F.floor(cosine(u, v) * 1e4 + 0.5) / 1e4  # noqa: E731

    lhs = b.select("ivf_list", F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    within = (
        lhs.join(
            F.broadcast(
                b.select("ivf_list", F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
            ),
            "ivf_list",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", f4cos(F.col("_va"), F.col("_vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    if store_df is None:
        return within
    cross = (
        store_df.join(F.broadcast(b), "ivf_list")
        .filter(F.col(id_col) != F.col("_id"))  # replay/re-crawl self-guard
        .select(
            F.least(F.col(id_col), F.col("_id")).alias("id_a"),
            F.greatest(F.col(id_col), F.col("_id")).alias("id_b"),
            f4cos(F.col(vec_col), F.col("_v")).alias("cos_sim"),
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
    are excluded (logical deletes honored between compactions)."""
    import os

    spark = stream_df.sparkSession

    def _fold(bdf: DataFrame, bid: int) -> None:
        if bdf.isEmpty():
            return
        # assign ONCE per batch; the matches joins and the store write all
        # reuse the column instead of re-running the centroid matmul UDF
        assigned = bdf.withColumn(
            "ivf_list", similarity.ivf_assign(centroids, vec_col)
        )
        if matches_store is not None:
            store_df = None
            if os.path.isdir(store) and any(
                e.startswith("ivf_list=") for e in os.listdir(store)
            ):
                store_df = spark.read.parquet(store)
                # honor logical deletes: a tombstoned vector must not keep
                # generating matches between deletion and the next compaction
                dead = similarity.ivf_tombstones(spark, store, id_col)
                if dead is not None:
                    store_df = store_df.join(F.broadcast(dead), id_col, "left_anti")
            m = semantic_match_batch(
                assigned, store_df, centroids, threshold, id_col, vec_col
            )
            # batchId-scoped overwrite: an at-least-once replay of this
            # batch rewrites its own partition instead of appending dupes
            m.write.mode("overwrite").parquet(
                os.path.join(matches_store, f"batch={bid}")
            )
        similarity.ivf_add_batch(assigned, store, centroids, vec_col=vec_col)
        if compact_every and (bid + 1) % compact_every == 0:
            similarity.ivf_compact_store(spark, store, id_col=id_col)

    writer = stream_df.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
