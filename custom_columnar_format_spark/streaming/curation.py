"""Streaming incremental curation: a document stream near-dup'd against the
ACCUMULATING signature store — the steady-state loop of a continuously
crawled 100 TB pipeline, promoted from test-only (r8 commit c75cc98) to a
registered, driver-gated query per the r8 verdict.

Each micro-batch (foreachBatch):
1. signature-level near-dup WITHIN the batch (band equi-join of the batch
   against its own signature table, ``id_new < id_hist`` so each unordered
   pair emits once);
2. ``minhash_history_matches`` against the stored history signatures
   (bodies of prior batches are gone by design — matching is est-level);
3. append the normalized matches to the SCBF matches table;
4. MERGE the batch's signatures into the SCBF signature store
   (``operators/merge.py`` copy-on-write — a re-crawled id upserts instead
   of duplicating).

Determinism: the union of within-batch and cross-batch matches is exactly
"all unordered pairs with >= 1 matching LSH band and signature agreement
>= est_threshold", INDEPENDENT of how docs are split into micro-batches —
a pair lands in step 1 if same batch, in step 2 (exactly once, when its
later member arrives) otherwise. That is what makes the drained multi-batch
result replayable as ONE batch computation by the DuckDB oracle (the
``q_stream_rollup_upsert`` equivalence pattern).

Scale shape per batch: the store is read as id+signature rows only (never
bodies); candidates come from a band equi-join; the only corpus-growing
artifacts are the signature store (~0.5 KB/doc) and the matches table.

SCBF v2 is scalar-typed, so the 64-long signature is stored as a CSV utf8
column and parsed back losslessly (same encoding as the incremental-loop
tests); est_jaccard is stored at the operator's own 1e-4 floor rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup
from ..operators.merge import _target_files, merge_into

_SIG_CSV = "sig_csv"


def write_sig_store(sigs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist an (id, sig) table as SCBF v2 (signature → CSV utf8)."""
    sigs.select(
        "id", F.concat_ws(",", F.col("sig").cast("array<string>")).alias(_SIG_CSV)
    ).write.format("scbf").option("version", "2").mode(mode).save(path)


def read_sig_store(spark: SparkSession, path: str) -> DataFrame:
    """(id, sig) back from an SCBF signature store."""
    return (
        spark.read.format("scbf")
        .load(path)
        .select("id", F.split(_SIG_CSV, ",").cast("array<bigint>").alias("sig"))
    )


def curate_batch(
    batch_df: DataFrame,
    sig_store: str,
    matches_store: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    est_threshold: float = 0.5,
    clusters_store: str | None = None,
) -> None:
    """Fold ONE micro-batch into the stores (steps 1-4 above). With
    ``clusters_store``, additionally maintain a persistent (node, label)
    duplicate-cluster table: the batch's match edges fold into the stored
    labels through ``clustering.incremental_components(delta_only=True)``
    — O(batch) closure work — and ONLY the changed/new rows upsert via
    ``merge_into`` (id-range copy-on-write), so per-batch maintenance cost
    never scales with the corpus."""
    spark = batch_df.sparkSession
    handles: list = []
    batch_sigs = dedup.minhash_signatures(batch_df, text_col, id_col).persist()
    handles.append(batch_sigs)
    # 1) within-batch, signature-level: batch vs its own signature table;
    #    id_new < id_hist keeps each unordered pair exactly once
    # the batch's signature table is computed ONCE (batch_sigs above) and
    # passed into both match calls (r12): each call used to re-run the full
    # gram+md5+KM signature pass over the batch — 3 signature computations
    # per micro-batch where one suffices
    within = (
        dedup.minhash_history_matches(
            batch_df, batch_sigs, text_col, id_col,
            est_threshold=est_threshold, handles=handles, new_sigs=batch_sigs,
        )
        .filter(F.col("id_new") < F.col("id_hist"))
        .select(
            F.col("id_new").alias("id_a"),
            F.col("id_hist").alias("id_b"),
            "est_jaccard",
        )
    )
    matches = within
    # 2) cross-batch: only once history exists (first batch bootstraps)
    if _target_files(sig_store):
        hist = read_sig_store(spark, sig_store)
        cross = (
            dedup.minhash_history_matches(
                batch_df, hist, text_col, id_col,
                est_threshold=est_threshold, handles=handles, new_sigs=batch_sigs,
            )
            .select(
                F.least("id_new", "id_hist").alias("id_a"),
                F.greatest("id_new", "id_hist").alias("id_b"),
                "est_jaccard",
            )
        )
        matches = matches.unionByName(cross)
    # 3) append this batch's matches (persisted: they also feed the
    #    cluster-state fold below)
    matches = matches.persist()
    handles.append(matches)
    mode = "append" if _target_files(matches_store) else "overwrite"
    matches.write.format("scbf").option("version", "2").mode(mode).save(matches_store)
    if clusters_store is not None:
        from ..operators import clustering

        edges = matches.select("id_a", "id_b")
        if _target_files(clusters_store):
            state = spark.read.format("scbf").load(clusters_store)
            delta = clustering.incremental_components(
                state, edges, delta_only=True
            ).withColumnRenamed("component", "label")
            merge_into(spark, clusters_store, delta, "node")
        else:
            clustering.connected_components(edges).withColumnRenamed(
                "component", "label"
            ).write.format("scbf").option("version", "2").mode("overwrite").save(
                clusters_store
            )
    # 4) fold signatures into the store (upsert by id — a re-crawled doc
    #    replaces its signature instead of duplicating)
    if _target_files(sig_store):
        sig_rows = batch_sigs.select(
            "id", F.concat_ws(",", F.col("sig").cast("array<string>")).alias(_SIG_CSV)
        )
        merge_into(spark, sig_store, sig_rows, "id")
    else:
        write_sig_store(batch_sigs, sig_store)
    for h in handles:
        h.unpersist()


def maintain_sig_store(
    spark: SparkSession,
    sig_store: str,
    max_files: int = 8,
    deleted_ids: DataFrame | None = None,
    keep_snapshots: int = 2,
) -> dict:
    """Signature-store LIFECYCLE maintenance (r8 verdict task #4): the
    curation loop appends one small file set per micro-batch forever —
    without periodic maintenance the store's file count (and scan/merge
    planning cost) grows without bound, and signatures of docs purged from
    the corpus keep matching future batches.

    One maintenance pass:

    1. snapshot the current committed file set (metadata-only) so the
       pre-maintenance state stays auditable/time-travelable until expired;
    2. expire signatures of deleted docs via ``merge.delete_keys``
       (file-level copy-on-write: id-range stats carry untouched files over
       byte-identical — the retention-purge primitive);
    3. compact the per-batch small files to <= ``max_files``, id-sorted so
       footer min/max envelopes stay tight and the NEXT batch's
       ``merge_into`` rewrites only the id-range it actually touches;
    4. expire old snapshots (keep ``keep_snapshots``) and vacuum scratch.

    Returns the combined stats dict ({deleted_rows, files_before,
    files_after, snapshots_expired}). Recall is untouched by construction —
    compaction moves rows between files, never changes them — and pinned by
    ``tests/test_incremental_curation.py``.
    """
    from ..operators import compact as _compact
    from ..operators import snapshot as _snapshot
    from ..operators import vacuum as _vacuum
    from ..operators.merge import delete_keys

    stats: dict = {}
    _snapshot.create_snapshot(sig_store, tag="pre-maintenance")
    if deleted_ids is not None:
        ids = deleted_ids.select(F.col(deleted_ids.columns[0]).alias("id"))
        d = delete_keys(spark, sig_store, ids, "id")
        stats["deleted_rows"] = d["rows_deleted"]
    c = _compact.compact(spark, sig_store, target_files=max_files, sort_by=["id"])
    stats["files_before"] = c["files_before"]
    stats["files_after"] = c["files_after"]
    stats["snapshots_expired"] = _snapshot.expire_snapshots(
        sig_store, keep_last=keep_snapshots
    )
    _vacuum.vacuum(sig_store, older_than_seconds=0.0)
    return stats


def start_curation_loop(
    stream_df: DataFrame,
    sig_store: str,
    matches_store: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    est_threshold: float = 0.5,
    available_now: bool = True,
    clusters_store: str | None = None,
):
    """Attach the curation loop to a document stream via foreachBatch."""

    def _fold(bdf: DataFrame, _bid: int) -> None:
        if bdf.isEmpty():
            return
        curate_batch(
            bdf, sig_store, matches_store, text_col, id_col, est_threshold,
            clusters_store=clusters_store,
        )

    writer = stream_df.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
