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
    both vectors assign to the same inverted list — ``ivf_threshold_join``
    with nprobe=1, whose single probed list IS the assignment). Chosen for
    the streaming loop deliberately: cluster equality is symmetric, so the
    drained multi-batch match set equals ONE batch computation over the
    union regardless of how vectors were split into micro-batches (the
    ``q_stream_curation`` replay property) — within-batch pairs surface
    immediately, cross-batch pairs exactly once when the later member
    arrives and joins the stored one's list. The asymmetric nprobe>1 tier
    (higher boundary recall, order-dependent) stays available as the batch
    operator gated by q_embedding_neardup_incremental. The store side
    keeps its ``ivf_list`` column, so the cross join prunes to the batch's
    assigned directories."""
    q = batch_df.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias(vec_col))
    # co-assignment is symmetric: the directed join emits both orientations
    # of every pair, so keeping q_id < id_col retains each exactly once
    within = (
        similarity.ivf_threshold_join(
            q, batch_df, centroids, threshold, 1, "q_id", id_col, vec_col
        )
        .filter(F.col("q_id") < F.col(id_col))
        .select(F.col("q_id").alias("id_a"), F.col(id_col).alias("id_b"), "cos_sim")
    )
    if store_df is None:
        return within
    cross = similarity.ivf_threshold_join(
        q, store_df, centroids, threshold, 1, "q_id", id_col, vec_col
    ).select(
        F.least("q_id", F.col(id_col)).alias("id_a"),
        F.greatest("q_id", F.col(id_col)).alias("id_b"),
        "cos_sim",
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
    accumulated store — append to ``matches_store`` (parquet). Within-
    batch pairs surface immediately; cross-batch pairs exactly once, when
    the later member arrives and probes the stored one's list."""
    import os

    spark = stream_df.sparkSession

    def _fold(bdf: DataFrame, bid: int) -> None:
        if bdf.isEmpty():
            return
        if matches_store is not None:
            store_df = None
            if os.path.isdir(store) and any(
                e.startswith("ivf_list=") for e in os.listdir(store)
            ):
                store_df = spark.read.parquet(store)
            m = semantic_match_batch(
                bdf, store_df, centroids, threshold, id_col, vec_col
            )
            m.write.mode("append").parquet(matches_store)
        similarity.ivf_add_batch(bdf, store, centroids, vec_col=vec_col)
        if compact_every and (bid + 1) % compact_every == 0:
            similarity.ivf_compact_store(spark, store, id_col=id_col)

    writer = stream_df.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
