"""IVF index-store lifecycle: incremental growth (ivf_add_batch), logical
deletes + physical purge (ivf_delete_ids / ivf_compact_store), and the
quantizer-drift monitor (ivf_drift_stats) — the similarity-side twin of the
dedup signature-store lifecycle (tests/test_incremental_curation.py).
Reference has no similarity search at all (SURVEY.md §2.2)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from custom_columnar_format_spark.operators import similarity as S

NLIST = 8


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/embeddings.parquet")


@pytest.fixture(scope="module")
def cent(emb):
    return S.ivf_centroids(emb, nlist=NLIST)


def _rows(df):
    return [r.asDict() for r in df.collect()]


def _data_files(path):
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        out += [
            os.path.join(root, f)
            for f in files
            if not f.startswith(("_", ".")) and not f.endswith(".crc")
        ]
    return out


def test_add_batch_equals_full_rebuild(spark, emb, cent, tmp_path):
    """Growing the store incrementally against the frozen quantizer must be
    indistinguishable from rebuilding it from scratch — and the probe must
    still prune partitions afterwards."""
    grown = str(tmp_path / "grown")
    rebuilt = str(tmp_path / "rebuilt")
    hist = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    S.ivf_write_partitioned(hist, grown, cent)
    S.ivf_add_batch(batch, grown, cent)
    S.ivf_write_partitioned(emb, rebuilt, cent)

    qv = list(emb.orderBy("vec_id").first()["embedding"])
    got = S.ivf_topk_partitioned(spark, grown, qv, cent, k=5, nprobe=3)
    want = S.ivf_topk_partitioned(spark, rebuilt, qv, cent, k=5, nprobe=3)
    assert _rows(got) == _rows(want)

    # append kept the layout partition-prunable
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    assert re.search(r"PartitionFilters: \[ivf_list#\d+ IN \(", buf.getvalue())

    # and the append was O(batch): history files are untouched (same set,
    # plus the batch's new files)
    n_hist_files = len(_data_files(rebuilt))
    assert len(_data_files(grown)) > 0
    assert len(_data_files(grown)) >= n_hist_files  # appended, never rewrote


def test_tombstones_are_hidden_and_honored(spark, emb, cent, tmp_path):
    path = str(tmp_path / "store")
    S.ivf_write_partitioned(emb, path, cent)
    n_total = emb.count()
    dead = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    n_dead = dead.count()
    assert n_dead > 0
    S.ivf_delete_ids(dead, path)

    # _tombstones is invisible to the plain corpus scan
    assert spark.read.parquet(path).count() == n_total

    qv = list(emb.orderBy("vec_id").first()["embedding"])
    served = S.ivf_topk_partitioned(
        spark, path, qv, cent, k=n_total, nprobe=NLIST, honor_tombstones=True
    )
    served_ids = {r["vec_id"] for r in served.collect()}
    assert all(i % 7 != 3 for i in served_ids)
    # without the flag the logically-deleted rows still serve (reader opt-in)
    raw = S.ivf_topk_partitioned(spark, path, qv, cent, k=n_total, nprobe=NLIST)
    assert any(i % 7 == 3 for i in (r["vec_id"] for r in raw.collect()))


def test_compact_purges_tombstones_and_bounds_files(spark, emb, cent, tmp_path):
    """Many small appends + a delete set → one maintenance pass leaves ≤ 1
    file per inverted list, the deleted rows physically gone, the tombstone
    set cleared, and search results unchanged."""
    path = str(tmp_path / "store")
    S.ivf_write_partitioned(emb.filter(F.col("vec_id") % 4 == 0), path, cent)
    for m in (1, 2, 3):
        S.ivf_add_batch(emb.filter(F.col("vec_id") % 4 == m), path, cent)
    dead = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    S.ivf_delete_ids(dead, path)

    qv = list(emb.orderBy("vec_id").first()["embedding"])
    before = _rows(
        S.ivf_topk_partitioned(spark, path, qv, cent, k=10, nprobe=3, honor_tombstones=True)
    )
    files_grown = len(_data_files(path))

    stats = S.ivf_compact_store(spark, path)
    assert stats["files_before"] == files_grown
    assert stats["files_after"] <= NLIST  # one file per surviving list
    assert stats["files_after"] < files_grown
    assert stats["rows_deleted"] == dead.count()
    assert stats["tombstones_cleared"] == 1
    assert not os.path.isdir(os.path.join(path, "_tombstones"))

    # physically gone: the plain scan (no anti-join) no longer sees them
    left = spark.read.parquet(path)
    assert left.filter(F.col("vec_id") % 7 == 3).count() == 0
    assert left.count() == emb.count() - stats["rows_deleted"]

    # search identical to the pre-compaction logical-delete view
    after = _rows(
        S.ivf_topk_partitioned(spark, path, qv, cent, k=10, nprobe=3, honor_tombstones=True)
    )
    assert after == before


def test_compact_without_tombstones_is_pure_rewrite(spark, emb, cent, tmp_path):
    path = str(tmp_path / "store")
    S.ivf_write_partitioned(emb.filter(F.col("vec_id") % 2 == 0), path, cent)
    S.ivf_add_batch(emb.filter(F.col("vec_id") % 2 == 1), path, cent)
    n = spark.read.parquet(path).count()
    stats = S.ivf_compact_store(spark, path)
    assert stats["rows_deleted"] == 0 and stats["tombstones_cleared"] == 0
    assert spark.read.parquet(path).count() == n


def test_drift_stats_flags_planted_skew(spark):
    """Orthogonal 4-centroid quantizer; history spread uniformly, batch
    massed on centroid 0 → exactly cid 0 is drifted, counts exact."""
    dim = 8
    cent = np.zeros((4, dim))
    for i in range(4):
        cent[i, i] = 1.0

    def vec(c, eps):
        v = cent[c].copy()
        v[4 + c] = eps  # stay nearest to centroid c
        return [float(x) for x in v / np.linalg.norm(v)]

    hist = [(i, vec(i % 4, 0.1)) for i in range(40)]  # 10 per list
    batch = [(100 + i, vec(0, 0.2)) for i in range(12)]  # all on list 0
    sch = "vec_id int, embedding array<double>"
    out = S.ivf_drift_stats(
        spark.createDataFrame(hist, sch), spark.createDataFrame(batch, sch), cent
    )
    rows = {r["cid"]: r.asDict() for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert all(rows[c]["n_hist"] == 10 for c in range(4))
    assert rows[0]["n_batch"] == 12 and all(rows[c]["n_batch"] == 0 for c in (1, 2, 3))
    # batch share 1.0 vs hist share 0.25 → 4x > 2x threshold
    assert rows[0]["drifted"] is True
    assert all(rows[c]["drifted"] is False for c in (1, 2, 3))
    assert rows[0]["share_batch"] == 1.0 and rows[0]["share_hist"] == 0.25
    # empty-batch lists report NULL batch quality, not 0 (no fake signal)
    assert rows[1]["avg_cos_batch"] is None
    assert rows[1]["avg_cos_hist"] is not None


def test_drift_empty_history_list_is_drifted(spark):
    """A list with zero historical mass that receives batch mass must trip
    the flag (0 · anything < any positive mass — the integer form's edge)."""
    dim = 4
    cent = np.eye(2, dim)
    sch = "vec_id int, embedding array<double>"
    hist = spark.createDataFrame([(1, [1.0, 0.0, 0.0, 0.0])], sch)
    batch = spark.createDataFrame([(2, [0.0, 1.0, 0.0, 0.0])], sch)
    rows = {r["cid"]: r.asDict() for r in S.ivf_drift_stats(hist, batch, cent).collect()}
    assert rows[1]["n_hist"] == 0 and rows[1]["n_batch"] == 1
    assert rows[1]["drifted"] is True
    assert rows[0]["drifted"] is False


def test_stream_ingest_bounds_files_and_equals_rebuild(spark, emb, cent, tmp_path):
    """4 micro-batches through the streaming ingest loop with
    compact_every=2 → the store's file count is bounded by the compaction
    cadence (not by stream length) and answers exactly like a from-scratch
    build over all vectors."""
    from custom_columnar_format_spark.streaming.vectors import start_vector_ingest_loop

    base = emb.select("vec_id", "embedding")
    src = str(tmp_path / "src")
    for i in range(4):
        base.filter(F.col("vec_id") % 4 == i).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(base.schema).option("maxFilesPerTrigger", 1).parquet(src)
    store = str(tmp_path / "store")
    q = start_vector_ingest_loop(
        stream, store, cent, str(tmp_path / "ck"), compact_every=2
    )
    q.awaitTermination()

    # compaction ran on the last (4th) batch → ≤ 1 file per surviving list
    assert len(_data_files(store)) <= NLIST
    assert spark.read.parquet(store).count() == emb.count()

    rebuilt = str(tmp_path / "rebuilt")
    S.ivf_write_partitioned(emb, rebuilt, cent)
    qv = list(emb.orderBy("vec_id").first()["embedding"])
    got = _rows(S.ivf_topk_partitioned(spark, store, qv, cent, k=10, nprobe=3))
    want = _rows(S.ivf_topk_partitioned(spark, rebuilt, qv, cent, k=10, nprobe=3))
    assert got == want


def test_pq_add_batch_equals_rebuild_and_lifecycle(spark, emb, cent, tmp_path):
    """The compressed index grows incrementally (frozen centroids AND
    codebooks) to the same answers as a from-scratch build, and the
    tombstone/compaction lifecycle works unchanged on the codes-only
    layout (it never touches the vector payload)."""
    import numpy as np

    rows = emb.orderBy("vec_id").limit(16).collect()
    raw = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    books = np.stack([raw[:, m * 8 : (m + 1) * 8] for m in range(8)])

    grown = str(tmp_path / "grown")
    rebuilt = str(tmp_path / "rebuilt")
    S.ivf_pq_write_partitioned(emb.filter(F.col("vec_id") % 5 != 0), grown, cent, books)
    S.ivf_pq_add_batch(emb.filter(F.col("vec_id") % 5 == 0), grown, cent, books)
    S.ivf_pq_write_partitioned(emb, rebuilt, cent, books)

    qv = list(emb.orderBy("vec_id").first()["embedding"])
    got = _rows(S.ivf_pq_topk_partitioned(spark, grown, qv, cent, books, k=10, nprobe=3))
    want = _rows(S.ivf_pq_topk_partitioned(spark, rebuilt, qv, cent, books, k=10, nprobe=3))
    assert got == want

    # lifecycle on the codes layout: logical delete + physical purge
    dead = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    S.ivf_delete_ids(dead, grown)
    stats = S.ivf_compact_store(spark, grown)
    assert stats["rows_deleted"] == dead.count()
    left = spark.read.parquet(grown)
    assert left.filter(F.col("vec_id") % 7 == 3).count() == 0
    assert set(left.columns) == {"vec_id", "pq_codes", "ivf_list"}


def test_knn_join_full_probe_equals_bruteforce(spark, emb, cent):
    """Probing ALL lists makes the batched ANN join exact — it must equal
    a from-scratch exact top-k computed on the SAME rank key the operator
    uses (RAW cosine desc, corpus id asc). knn_join_bruteforce is not the
    reference here on purpose: it ranks on the 4-decimal ROUNDED cosine,
    whose tie-handling can legitimately pick a different member at the k
    boundary."""
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)

    q_ids = [int(i) for i in ids if i % 50 == 0]
    want = set()
    for qi in q_ids:
        qv = matn[ids == qi][0]
        cos = matn @ qv
        order = sorted(range(len(ids)), key=lambda j: (-cos[j], ids[j]))[:3]
        want |= {(qi, int(ids[j])) for j in order}

    queries = (
        emb.filter(F.col("vec_id") % 50 == 0)
        .select(F.col("vec_id").alias("q_id"), "embedding")
    )
    got = S.ivf_knn_join(queries, emb, cent, k=3, nprobe=NLIST)
    g = {(r["q_id"], r["vec_id"]) for r in got.collect()}
    assert g == want


def test_knn_join_reuses_store_assignment(spark, emb, cent, tmp_path):
    """A corpus read back from the partitioned store (ivf_list already a
    column) must skip re-assignment and produce identical results."""
    path = str(tmp_path / "store")
    S.ivf_write_partitioned(emb, path, cent)
    store = spark.read.parquet(path)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    got = S.ivf_knn_join(queries, store, cent, k=5, nprobe=3)
    want = S.ivf_knn_join(queries, emb, cent, k=5, nprobe=3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_compact_rerun_heals_crashed_swap(spark, emb, cent, tmp_path):
    """A compaction that died mid-swap leaves some lists only in
    <store>.compact_old; the NEXT run must move them back before doing
    anything destructive — rerunning after a crash may never lose rows."""
    import shutil

    path = str(tmp_path / "store")
    S.ivf_write_partitioned(emb, path, cent)
    n = emb.count()
    qv = list(emb.orderBy("vec_id").first()["embedding"])
    before = _rows(S.ivf_topk_partitioned(spark, path, qv, cent, k=10, nprobe=NLIST))

    # simulate the crash window: two lists parked, never moved back
    parked = path + ".compact_old"
    os.makedirs(parked)
    moved = 0
    for entry in sorted(os.listdir(path)):
        if entry.startswith("ivf_list=") and moved < 2:
            shutil.move(os.path.join(path, entry), os.path.join(parked, entry))
            moved += 1
    assert moved == 2
    assert spark.read.parquet(path).count() < n  # store really is partial

    stats = S.ivf_compact_store(spark, path)
    assert stats["lists_recovered"] == 2
    assert not os.path.isdir(parked)
    assert spark.read.parquet(path).count() == n
    after = _rows(S.ivf_topk_partitioned(spark, path, qv, cent, k=10, nprobe=NLIST))
    assert after == before


def test_compact_refuses_to_empty_the_store(spark, emb, cent, tmp_path):
    """Tombstoning every row must not let compaction rewrite the store into
    an unreadable zero-file directory — it skips the purge and keeps the
    logical-delete view intact."""
    path = str(tmp_path / "store")
    S.ivf_write_partitioned(emb, path, cent)
    S.ivf_delete_ids(emb.select("vec_id"), path)
    stats = S.ivf_compact_store(spark, path)
    assert stats.get("skipped_empty") is True
    assert stats["tombstones_cleared"] == 0
    # store still readable; logical deletes still honored
    assert spark.read.parquet(path).count() == emb.count()
    qv = list(emb.orderBy("vec_id").first()["embedding"])
    served = S.ivf_topk_partitioned(
        spark, path, qv, cent, k=10, nprobe=NLIST, honor_tombstones=True
    )
    assert served.count() == 0


def test_threshold_join_full_probe_equals_bruteforce(spark, emb, cent):
    """Probing ALL lists makes the semantic history-match exact: it must
    equal the quadratic cross-join pairs (batch x history, cosine >= t) on
    the same floor-rounded key."""
    from custom_columnar_format_spark.functions.vector import cosine as _cos

    t = 0.25
    batch = emb.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    hist = emb.filter(F.col("vec_id") % 5 != 0)
    got = {
        (r["q_id"], r["vec_id"])
        for r in S.ivf_threshold_join(batch, hist, cent, threshold=t, nprobe=NLIST).collect()
    }
    b = batch.select("q_id", F.col("embedding").alias("qv"))
    h = hist.select("vec_id", F.col("embedding").alias("hv"))
    exact = {
        (r["q_id"], r["vec_id"])
        for r in b.crossJoin(h)
        .select(
            "q_id", "vec_id",
            (F.floor(_cos(F.col("hv"), F.col("qv")) * 1e4 + 0.5) / 1e4).alias("c"),
        )
        .filter(F.col("c") >= t)
        .collect()
    }
    assert got == exact and len(exact) > 0


def test_stream_semantic_matches_are_split_independent(spark, emb, cent, tmp_path):
    """The streaming semantic-curation match set must not depend on how
    vectors were split into micro-batches: 4 micro-batches vs ONE batch
    produce identical (id_a, id_b) sets (co-assignment blocking is
    symmetric — the property the oracle's one-batch replay relies on)."""
    from custom_columnar_format_spark.streaming.vectors import (
        semantic_match_batch,
        start_vector_ingest_loop,
    )

    base = emb.select("vec_id", "embedding")
    src = str(tmp_path / "src")
    for i in range(4):
        base.filter(F.col("vec_id") % 4 == i).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(base.schema).option("maxFilesPerTrigger", 1).parquet(src)
    store = str(tmp_path / "store")
    matches = str(tmp_path / "matches")
    q = start_vector_ingest_loop(
        stream, store, cent, str(tmp_path / "ck"), matches_store=matches, threshold=0.25
    )
    q.awaitTermination()
    streamed = {
        (r["id_a"], r["id_b"]) for r in spark.read.parquet(matches).collect()
    }

    single = {
        (r["id_a"], r["id_b"])
        for r in semantic_match_batch(base, None, cent, 0.25).collect()
    }
    assert streamed == single and len(single) > 0


def test_stream_semantic_matches_honor_tombstones(spark, emb, cent, tmp_path):
    """A vector tombstoned from the store mid-stream must stop generating
    matches in later micro-batches (logical deletes honored between
    compactions) — and an id present in both store and batch must never
    match itself."""
    from custom_columnar_format_spark.streaming.vectors import semantic_match_batch

    base = emb.select("vec_id", "embedding")
    store = str(tmp_path / "store")
    S.ivf_write_partitioned(base, store, cent)

    # pick a stored id that WOULD match something in a batch at this threshold
    probe_batch = base.filter(F.col("vec_id") % 3 == 0)
    store_df = spark.read.parquet(store)
    t = 0.25
    m0 = semantic_match_batch(probe_batch, store_df, cent, t)
    # a STORE-ONLY participant (not also in the batch): tombstoning only
    # removes store-side participation — the same id re-arriving in a batch
    # is a new document and may still match within-batch
    a_match = m0.filter(
        (F.col("id_a") % 3 != 0) | (F.col("id_b") % 3 != 0)
    ).first()
    assert a_match is not None
    dead_id = int(
        a_match["id_b"] if a_match["id_b"] % 3 != 0 else a_match["id_a"]
    )

    S.ivf_delete_ids(spark.createDataFrame([(dead_id,)], "vec_id int"), store)
    dead = S.ivf_tombstones(spark, store)
    live = store_df.join(F.broadcast(dead), "vec_id", "left_anti")
    m1 = semantic_match_batch(probe_batch, live, cent, t)
    assert m1.filter(
        (F.col("id_a") == dead_id) | (F.col("id_b") == dead_id)
    ).count() == 0
    # self-guard: ids shared by batch and store never pair with themselves
    assert m1.filter(F.col("id_a") == F.col("id_b")).count() == 0
