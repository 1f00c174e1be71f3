"""Streaming embedding ingest: a vector stream folded into the IVF
serving store micro-batch by micro-batch — the similarity-side twin of the
document curation loop (streaming/curation.py). A 100 TB embedding store
is never built once; it accumulates from the same crawl cadence as the
text corpus, and the ANN index has to stay queryable THROUGHOUT.

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
from pyspark.sql import DataFrame

from ..operators import similarity


def start_vector_ingest_loop(
    stream_df: DataFrame,
    store: str,
    centroids: np.ndarray,
    checkpoint: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    compact_every: int | None = None,
    available_now: bool = True,
):
    """Attach the IVF ingest loop to an embedding stream via foreachBatch."""
    spark = stream_df.sparkSession

    def _fold(bdf: DataFrame, bid: int) -> None:
        if bdf.isEmpty():
            return
        similarity.ivf_add_batch(bdf, store, centroids, vec_col=vec_col)
        if compact_every and (bid + 1) % compact_every == 0:
            similarity.ivf_compact_store(spark, store, id_col=id_col)

    writer = stream_df.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
