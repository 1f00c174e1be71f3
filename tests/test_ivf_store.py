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


def test_intersect_matches_equal_probe_set_definition(spark, emb, cent):
    """blocking='intersect' must equal its definition exactly: unordered
    pairs whose nprobe probe SETS intersect, at floor-rounded cosine >=
    threshold — computed here by brute force; and it must be a superset of
    co-assignment blocking (a co-assigned pair shares its assigned list
    in both probe sets)."""
    from custom_columnar_format_spark.functions.vector import cosine as _cos
    from custom_columnar_format_spark.streaming.vectors import semantic_match_batch

    base = emb.select("vec_id", "embedding").filter(F.col("vec_id") < 150)
    t = 0.25
    probed = base.select(
        "vec_id", "embedding", S.ivf_probe_lists(cent, 2).alias("p")
    )
    a = probed.select(
        F.col("vec_id").alias("id_a"), F.col("p").alias("pa"),
        F.col("embedding").alias("va"),
    )
    b = probed.select(
        F.col("vec_id").alias("id_b"), F.col("p").alias("pb"),
        F.col("embedding").alias("vb"),
    )
    want = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.size(F.array_intersect("pa", "pb")) > 0)
        .select(
            "id_a", "id_b",
            (F.floor(_cos(F.col("va"), F.col("vb")) * 1e4 + 0.5) / 1e4).alias("c"),
        )
        .filter(F.col("c") >= t)
        .collect()
    }
    got_rows = semantic_match_batch(
        base, None, cent, t, blocking="intersect", nprobe=2
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in got_rows}
    assert got == want and len(want) > 0
    # min-witness dedupe: each pair emitted exactly once
    assert len(got_rows) == len(got)
    # superset of co-assignment blocking at the same threshold
    assign = {
        (r["id_a"], r["id_b"])
        for r in semantic_match_batch(base, None, cent, t).collect()
    }
    assert assign <= got


def test_stream_intersect_matches_are_split_independent(spark, emb, cent, tmp_path):
    """r9 VERDICT #4 done-criterion: the symmetric multiprobe tier drained
    over 4 micro-batches equals the ONE-batch computation over the union at
    nprobe=2 (probe-set intersection is symmetric, hence batch-split-
    independent), and the loop persists each row's probe set so stored
    rows match through their FULL sets."""
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
        stream, store, cent, str(tmp_path / "ck"),
        matches_store=matches, threshold=0.25, blocking="intersect", nprobe=2,
    )
    q.awaitTermination()
    streamed = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(matches).collect()}
    single = {
        (r["id_a"], r["id_b"])
        for r in semantic_match_batch(
            base, None, cent, 0.25, blocking="intersect", nprobe=2
        ).collect()
    }
    assert streamed == single and len(single) > 0
    st = spark.read.parquet(store)
    assert "ivf_probes" in st.columns
    assert st.filter(F.element_at("ivf_probes", 1) != F.col("ivf_list")).count() == 0
    assert st.count() == base.count()


def test_stream_ingest_replay_is_idempotent(spark, emb, cent, tmp_path):
    """r9 ADVICE (medium): an at-least-once replay — foreachBatch ran but
    the checkpoint commit didn't — must fold in as a no-op. Simulated
    faithfully by deleting the LAST commit marker and restarting on the
    same checkpoint (Structured Streaming re-executes that batch with the
    same offsets): the store must stay row-identical (no appended
    duplicates — compaction never dedupes by id, so they'd be permanent)
    and the matches partitions must reproduce exactly. A full fresh-
    checkpoint re-run (every batch replayed) must also add zero rows."""
    import os as _os

    from custom_columnar_format_spark.streaming.vectors import start_vector_ingest_loop

    base = emb.select("vec_id", "embedding")
    src = str(tmp_path / "src")
    for i in range(3):
        base.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode("append").parquet(src)
    store = str(tmp_path / "store")
    matches = str(tmp_path / "matches")

    def run(ck):
        stream = spark.readStream.schema(base.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = start_vector_ingest_loop(
            stream, store, cent, ck, matches_store=matches, threshold=0.25
        )
        q.awaitTermination()

    ck1 = str(tmp_path / "ck1")
    run(ck1)
    store_rows = sorted(r["vec_id"] for r in spark.read.parquet(store).collect())
    match_rows = sorted(
        (r["id_a"], r["id_b"]) for r in spark.read.parquet(matches).collect()
    )
    assert store_rows == sorted(r["vec_id"] for r in base.collect())

    # crash simulation: last batch's commit never landed -> replay it
    # (drop the checksum sidecar too, or the local Hadoop FS refuses the
    # replayed commit's rename)
    last = sorted(int(f) for f in _os.listdir(_os.path.join(ck1, "commits")) if f.isdigit())[-1]
    _os.remove(_os.path.join(ck1, "commits", str(last)))
    crc = _os.path.join(ck1, "commits", f".{last}.crc")
    if _os.path.exists(crc):
        _os.remove(crc)
    run(ck1)
    assert sorted(r["vec_id"] for r in spark.read.parquet(store).collect()) == store_rows
    assert sorted(
        (r["id_a"], r["id_b"]) for r in spark.read.parquet(matches).collect()
    ) == match_rows

    # full replay (fresh checkpoint, same store): still zero new rows, and
    # the drained match SET is unchanged (cross pairs may move between
    # batch partitions when every batch sees the full store, so multiset
    # equality is not the contract here — the set is)
    run(str(tmp_path / "ck2"))
    assert sorted(r["vec_id"] for r in spark.read.parquet(store).collect()) == store_rows
    assert {
        (r["id_a"], r["id_b"]) for r in spark.read.parquet(matches).collect()
    } == set(match_rows)


def test_rebuild_equals_scratch_build_over_survivors(spark, emb, cent, tmp_path):
    """r9 VERDICT #3 done-criterion: after grow + tombstone + rebuild, the
    store must be ROW-IDENTICAL to an index built from scratch over the
    surviving vectors with the same new quantizer, tombstones become
    physical, and search needs no tombstone anti-join."""
    store = str(tmp_path / "store")
    S.ivf_write_partitioned(emb.filter(F.col("vec_id") % 5 != 0), store, cent)
    S.ivf_add_batch(emb.filter(F.col("vec_id") % 5 == 0), store, cent)
    S.ivf_delete_ids(emb.filter(F.col("vec_id") % 7 == 3).select("vec_id"), store)

    new_cent, stats = S.ivf_rebuild_store(spark, store, nlist=NLIST, seed=7)
    assert not stats["skipped_empty"] and stats["healed"] == "clean"

    live = emb.filter(F.col("vec_id") % 7 != 3)
    scratch = str(tmp_path / "scratch")
    S.ivf_write_partitioned(live, scratch, new_cent)
    got = sorted(
        (r["vec_id"], r["ivf_list"]) for r in spark.read.parquet(store).collect()
    )
    want = sorted(
        (r["vec_id"], r["ivf_list"]) for r in spark.read.parquet(scratch).collect()
    )
    assert got == want and len(got) == live.count()
    # tombstones are physical now: set cleared with the old generation
    assert S.ivf_tombstones(spark, store) is None
    qv = list(emb.orderBy("vec_id").first()["embedding"])
    assert _rows(
        S.ivf_topk_partitioned(spark, store, qv, new_cent, k=10, nprobe=3)
    ) == _rows(S.ivf_topk_partitioned(spark, scratch, qv, new_cent, k=10, nprobe=3))


def test_rebuild_trains_without_tombstoned_rows(spark, emb, cent, tmp_path):
    """The retrain must sample the LIVE rows only — rebuilding after
    tombstoning half the corpus must produce the same centroids as
    training on the survivors directly (a takedown must not keep steering
    the quantizer)."""
    store = str(tmp_path / "store")
    S.ivf_write_partitioned(emb, store, cent)
    S.ivf_delete_ids(emb.filter(F.col("vec_id") % 2 == 0).select("vec_id"), store)
    new_cent, _ = S.ivf_rebuild_store(spark, store, nlist=NLIST, seed=11)
    want = S.ivf_centroids(emb.filter(F.col("vec_id") % 2 != 0), nlist=NLIST, seed=11)
    assert np.allclose(new_cent, want)


def test_rebuild_crash_windows_heal_on_next_call(spark, emb, cent, tmp_path):
    """Every crash window of the two-rename swap heals to ONE coherent
    generation on the next call — never a mixed-generation layout (old and
    new lists are assigned under different quantizers; a mix silently
    breaks the probe→directory contract)."""
    import os as _os
    import shutil as _shutil

    store = str(tmp_path / "store")
    S.ivf_write_partitioned(emb, store, cent)
    rows_v1 = sorted(r["vec_id"] for r in spark.read.parquet(store).collect())
    staged, parked = S._rebuild_dirs(store)

    # window A: crash after staging, before any rename (no commit marker
    # scenario covered too) -> store untouched, stage dropped
    _os.makedirs(staged)
    with open(_os.path.join(staged, "junk"), "w") as fh:
        fh.write("partial")
    assert S.ivf_rebuild_heal(store) == "dropped_stale"
    assert not _os.path.isdir(staged)

    # window B: crash between rename 1 and rename 2 (committed stage) ->
    # heal completes the swap forward
    new_cent, _ = S.ivf_rebuild_store(spark, store, nlist=NLIST, seed=3)
    # stage a fake "next generation" with a commit marker, park the store
    _shutil.copytree(store, staged)
    with open(_os.path.join(staged, "_REBUILD_COMMIT"), "w") as fh:
        fh.write("1")
    _os.rename(store, parked)
    assert S.ivf_rebuild_heal(store) == "completed_swap"
    assert _os.path.isdir(store) and not _os.path.isdir(parked) and not _os.path.isdir(staged)
    assert sorted(r["vec_id"] for r in spark.read.parquet(store).collect()) == rows_v1

    # window C: crash after rename 1 with an UNcommitted stage -> roll the
    # parked old generation back
    _shutil.copytree(store, staged)  # no commit marker
    _os.rename(store, parked)
    assert S.ivf_rebuild_heal(store) == "restored_old"
    assert _os.path.isdir(store) and not _os.path.isdir(parked) and not _os.path.isdir(staged)
    assert sorted(r["vec_id"] for r in spark.read.parquet(store).collect()) == rows_v1


def test_rebuild_recomputes_persisted_probe_sets(spark, emb, cent, tmp_path):
    """A store carrying ivf_probes (the streaming intersect tier) must come
    out of a rebuild with probe sets recomputed under the NEW quantizer —
    stale arrays encode old list ids and would silently mis-block the
    streaming matcher."""
    store = str(tmp_path / "store")
    base = emb.select(
        "vec_id", "embedding", S.ivf_probe_lists(cent, 2).alias("ivf_probes")
    ).withColumn("ivf_list", F.element_at("ivf_probes", 1))
    S._write_listed(base, store, "parquet", "overwrite", cluster=True)

    new_cent, _ = S.ivf_rebuild_store(spark, store, nlist=NLIST, seed=5)
    st = spark.read.parquet(store)
    assert "ivf_probes" in st.columns
    # first probe == assigned list, and the arrays match a fresh recompute
    assert st.filter(F.element_at("ivf_probes", 1) != F.col("ivf_list")).count() == 0
    fresh = emb.select("vec_id", S.ivf_probe_lists(new_cent, 2).alias("want"))
    joined = st.join(fresh, "vec_id")
    assert joined.filter(F.col("ivf_probes") != F.col("want")).count() == 0
    assert joined.count() == emb.count()


def test_probe_adjacency_lifecycle(spark, emb, cent, tmp_path):
    """The intersect tier's directory-pruning metadata: the ingest loop
    records (ivf_list, probe) pairs; the dataset stays nlist-bounded and
    exactly matches a recompute from the stored rows; compaction refreshes
    it from the survivors; rebuild regenerates it under the NEW quantizer
    (old list ids must not leak through)."""
    from custom_columnar_format_spark.streaming.vectors import start_vector_ingest_loop

    base = emb.select("vec_id", "embedding")
    src = str(tmp_path / "src")
    for i in range(3):
        base.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(base.schema).option("maxFilesPerTrigger", 1).parquet(src)
    store = str(tmp_path / "store")
    q = start_vector_ingest_loop(
        stream, store, cent, str(tmp_path / "ck"),
        matches_store=str(tmp_path / "m"), threshold=0.25,
        blocking="intersect", nprobe=2,
    )
    q.awaitTermination()

    def exact_adj():
        return {
            (r["ivf_list"], r["probe"])
            for r in spark.read.parquet(store)
            .select("ivf_list", F.explode("ivf_probes").alias("probe"))
            .filter(F.col("probe") != F.col("ivf_list"))
            .distinct()
            .collect()
        }

    adj = S.ivf_probe_adjacency(spark, store)
    assert adj is not None
    got = {(r["ivf_list"], r["probe"]) for r in adj.collect()}
    assert got == exact_adj()
    assert len(got) <= NLIST * (NLIST - 1)  # non-identity (list, probe) pairs

    # compaction refresh: purge some rows, adjacency re-derives exactly
    S.ivf_delete_ids(base.filter(F.col("vec_id") % 2 == 0).select("vec_id"), store)
    S.ivf_compact_store(spark, store)
    adj2 = {(r["ivf_list"], r["probe"]) for r in S.ivf_probe_adjacency(spark, store).collect()}
    assert adj2 == exact_adj()

    # rebuild regenerates under the new quantizer
    new_cent, _ = S.ivf_rebuild_store(spark, store, nlist=NLIST, seed=13)
    adj3 = {(r["ivf_list"], r["probe"]) for r in S.ivf_probe_adjacency(spark, store).collect()}
    assert adj3 == exact_adj()


# ---------------------------------------------------------------------------
# Generational layout: versioned directories + atomic pointer (r11)
# ---------------------------------------------------------------------------


def test_generational_migration_and_lifecycle(spark, emb, cent, tmp_path):
    """Flat → generational migration is in-place and idempotent; appends,
    deletes, compaction and vacuum all work through the pointer; compaction
    commits a NEW generation instead of renaming under readers."""
    flat = str(tmp_path / "flat")
    genr = str(tmp_path / "genr")
    hist = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    S.ivf_write_partitioned(emb, flat, cent)

    S.ivf_write_partitioned(hist, genr, cent)
    gen_dir = S.ivf_init_generational(genr)
    assert S.ivf_current_generation(genr) == "gen-000001"
    assert S.ivf_init_generational(genr) == gen_dir  # idempotent
    S.ivf_add_batch(batch, genr, cent)  # append lands inside gen-000001

    qv = list(emb.orderBy("vec_id").first()["embedding"])
    want = _rows(S.ivf_topk_partitioned(spark, flat, qv, cent, k=5, nprobe=3))
    # centroids=None: reader loads the quantizer saved with the generation
    assert _rows(S.ivf_topk_partitioned(spark, genr, qv, k=5, nprobe=3)) == want

    # logical delete + physical purge: compaction stages gen-000002 and
    # flips the pointer; the old generation stays until vacuum
    doomed = emb.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    S.ivf_delete_ids(doomed, genr)
    stats = S.ivf_compact_store(spark, genr)
    assert stats["generation"] == "gen-000002"
    assert S.ivf_current_generation(genr) == "gen-000002"
    assert os.path.isdir(os.path.join(genr, "_generations", "gen-000001"))
    survivors = {r["vec_id"] for r in emb.collect()} - {r["vec_id"] for r in doomed.collect()}
    assert {r["vec_id"] for r in spark.read.parquet(S._resolve_store(genr)).collect()} == survivors
    # quantizer carried forward: pointer reads still answer
    got = S.ivf_topk_partitioned(spark, genr, qv, k=5, nprobe=NLIST)
    assert len(_rows(got)) == 5
    assert S.ivf_vacuum_generations(genr, keep=0) == ["gen-000001"]
    assert not os.path.isdir(os.path.join(genr, "_generations", "gen-000001"))


def test_generational_concurrent_reads_never_partial(spark, emb, cent, tmp_path):
    """The r10 VERDICT #3 scenario: top-k reads hammer the store WHILE a
    rebuild (new quantizer) and then a tombstone+compact swap generations.
    Every observed result must equal a complete generation's answer — old
    or new — never an error and never a mix (a read of one generation's
    layout under another's quantizer would produce a set outside both)."""
    import threading

    store = str(tmp_path / "store")
    S.ivf_write_partitioned(emb, store, cent)
    S.ivf_init_generational(store)
    qv = list(emb.orderBy("vec_id").first()["embedding"])

    def snap():
        return frozenset(
            (r["vec_id"], r["cos_sim"])
            for r in S.ivf_topk_partitioned(spark, store, qv, k=5, nprobe=2).collect()
        )

    expected = {snap()}
    results, errors = [], []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                results.append(snap())
            except Exception as e:  # noqa: BLE001 — any reader error fails the test
                errors.append(repr(e))
                return

    t = threading.Thread(target=reader)
    t.start()
    try:
        S.ivf_rebuild_store(spark, store, nlist=6, seed=3)
        expected.add(snap())
        S.ivf_delete_ids(emb.filter(F.col("vec_id") % 3 == 0).select("vec_id"), store)
        S.ivf_compact_store(spark, store)
        expected.add(snap())
    finally:
        stop.set()
        t.join()
    assert errors == []
    assert results, "reader thread never completed a read"
    bad = [r for r in results if r not in expected]
    assert bad == [], f"{len(bad)} torn/partial reads: {bad[:2]}"


def test_rebuild_heal_clears_leftover_marker_in_live_store(spark, emb, cent, tmp_path):
    """Window D of the marker protocol (r10 ADVICE #1): a crash AFTER the
    final rename but BEFORE marker cleanup leaves _REBUILD_COMMIT inside
    the live store. Heal must finish forward (remove the marker, drop the
    park) — the pre-r11 ordering rolled this committed swap BACK."""
    store = str(tmp_path / "store")
    S.ivf_write_partitioned(emb, store, cent)
    rows_v1 = sorted(r["vec_id"] for r in spark.read.parquet(store).collect())
    _, parked = S._rebuild_dirs(store)

    import shutil as _shutil

    _shutil.copytree(store, parked)  # the parked old generation
    with open(os.path.join(store, "_REBUILD_COMMIT"), "w") as fh:
        fh.write("1")
    assert S.ivf_rebuild_heal(store) == "completed_swap"
    assert not os.path.isfile(os.path.join(store, "_REBUILD_COMMIT"))
    assert not os.path.isdir(parked)
    assert sorted(r["vec_id"] for r in spark.read.parquet(store).collect()) == rows_v1
    # the marker is hidden from readers even while present (underscore)
    with open(os.path.join(store, "_REBUILD_COMMIT"), "w") as fh:
        fh.write("1")
    assert sorted(r["vec_id"] for r in spark.read.parquet(store).collect()) == rows_v1
    os.remove(os.path.join(store, "_REBUILD_COMMIT"))


def test_probe_adjacency_unreadable_dir_falls_back_to_none(spark, emb, cent, tmp_path):
    """r10 ADVICE #2: an adjacency dir that exists but holds no readable
    parquet (legacy crash mid-refresh) must degrade to None (full-scan
    fallback), not raise on every subsequent micro-batch."""
    store = str(tmp_path / "store")
    S.ivf_write_partitioned(emb, store, cent)
    os.makedirs(S._probe_adjacency_dir(store))
    assert S.ivf_probe_adjacency(spark, store) is None


def test_write_listed_records_adjacency_for_probe_frames(spark, emb, cent, tmp_path):
    """r10 ADVICE #5: ANY probes-carrying write records adjacency — a
    direct _write_listed must maintain the pruning invariant, not just
    ivf_add_batch."""
    store = str(tmp_path / "store")
    base = emb.select(
        "vec_id", "embedding", S.ivf_probe_lists(cent, 2).alias("ivf_probes")
    ).withColumn("ivf_list", F.element_at("ivf_probes", 1))
    S._write_listed(base, store, "parquet", "overwrite", cluster=True)
    adj = S.ivf_probe_adjacency(spark, store)
    assert adj is not None
    want = {
        (r["ivf_list"], r["probe"])
        for r in base.select("ivf_list", F.explode("ivf_probes").alias("probe"))
        .filter(F.col("probe") != F.col("ivf_list"))
        .distinct()
        .collect()
    }
    assert {(r["ivf_list"], r["probe"]) for r in adj.collect()} == want


def test_replay_guard_full_rejects_changed_vector_reingest(spark, tmp_path):
    """r10 ADVICE #4: under the default 'touched' guard a re-crawled id
    whose CHANGED vector assigns to a different list evades the replay
    anti-join and appends a permanent duplicate id (the documented
    id-immutability contract); replay_guard='full' anti-joins the store's
    entire id set and deterministically rejects the re-ingest."""
    from custom_columnar_format_spark.streaming.vectors import start_vector_ingest_loop

    dim = 8
    cent2 = np.zeros((2, dim))
    cent2[0, 0], cent2[1, 0] = 1.0, -1.0  # two antipodal lists
    v1 = [[float(i == 0) for i in range(dim)]] * 10          # → list 0
    v2 = [[-float(i == 0) for i in range(dim)]] * 10         # same ids → list 1
    b1 = spark.createDataFrame(
        [(i, v1[0]) for i in range(10)], "vec_id long, embedding array<double>"
    )
    b2 = spark.createDataFrame(
        [(i, v2[0]) for i in range(10)], "vec_id long, embedding array<double>"
    )

    def run(guard):
        store = str(tmp_path / f"store_{guard}")
        for j, b in enumerate([b1, b2]):
            src = str(tmp_path / f"src_{guard}_{j}")
            b.coalesce(1).write.mode("overwrite").parquet(src)
            stream = spark.readStream.schema(b1.schema).parquet(src)
            q = start_vector_ingest_loop(
                stream, store, cent2, str(tmp_path / f"ck_{guard}_{j}"),
                replay_guard=guard,
            )
            q.awaitTermination()
        return spark.read.parquet(store)

    full = run("full")
    assert full.count() == 10  # re-ingest rejected outright
    assert full.filter(F.col("ivf_list") != 0).count() == 0  # originals kept
    touched = run("touched")
    # the contract's documented failure mode, pinned so it stays documented:
    # the changed vector lands in list 1, evades the touched-lists guard,
    # and the id is now permanently duplicated
    assert touched.count() == 20
    assert touched.select("vec_id").distinct().count() == 10


def test_ingest_loop_vacuums_generations(spark, emb, cent, tmp_path):
    """A generational store under the ingest loop flips a generation per
    compaction; the loop must vacuum superseded ones down to vacuum_keep
    or a long-running stream retains every generation it ever compacted."""
    from custom_columnar_format_spark.streaming.vectors import start_vector_ingest_loop

    base = emb.select("vec_id", "embedding")
    src = str(tmp_path / "src")
    for i in range(4):
        base.filter(F.col("vec_id") % 4 == i).coalesce(1).write.mode("append").parquet(src)
    store = str(tmp_path / "store")
    S.ivf_write_partitioned(base.limit(0), store, cent)  # empty seed layout
    S.ivf_init_generational(store)

    stream = spark.readStream.schema(base.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = start_vector_ingest_loop(
        stream, store, cent, str(tmp_path / "ck"), compact_every=2,
    )
    q.awaitTermination()

    gens = sorted(os.listdir(os.path.join(store, "_generations")))
    cur = S.ivf_current_generation(store)
    # 4 batches / compact_every=2 → two compactions → two flips; retention
    # keeps the current generation plus at most vacuum_keep=1 prior one
    assert cur == gens[-1]
    assert len(gens) <= 2
    got = {r["vec_id"] for r in spark.read.parquet(S._resolve_store(store)).collect()}
    assert got == {r["vec_id"] for r in base.collect()}


def test_compact_preserves_probes_on_mixed_schema_store(spark, emb, cent, tmp_path):
    """r11 review #1: a store that started probeless and later gained
    ivf_probes (blocking tier switched to 'intersect') mixes file schemas;
    compaction must read it with mergeSchema so the rewrite keeps the
    probes column — plain inference can sample a probeless file and
    rewrite the store WITHOUT it, and the loss is permanent. Exercised on
    both the flat and the generational branch."""
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    for gen_mode in (False, True):
        store = str(tmp_path / f"store_gen{gen_mode}")
        S.ivf_write_partitioned(old, store, cent)  # probeless generation
        if gen_mode:
            S.ivf_init_generational(store)
        probed = new.select(
            "vec_id", "embedding", S.ivf_probe_lists(cent, 2).alias("ivf_probes")
        ).withColumn("ivf_list", F.element_at("ivf_probes", 1))
        S._write_listed(probed, store, "parquet", "append", cluster=True)

        stats = S.ivf_compact_store(spark, store)
        assert stats["files_after"] <= stats["files_before"]
        compacted = spark.read.option("mergeSchema", "true").parquet(
            S._resolve_store(store)
        )
        assert "ivf_probes" in compacted.columns
        kept_probes = compacted.filter(F.size("ivf_probes") >= 1).count()
        assert kept_probes == new.count()


def test_append_records_adjacency_before_data(spark, emb, cent, tmp_path):
    """r11 review #2: append-mode _write_listed must record the probe
    adjacency BEFORE the data lands. A crash between the two writes then
    errs toward extra pairs (wider pruning — safe); the reverse order
    left stored rows with unrecorded pairs that at-least-once replay can
    never heal (the replayed rows anti-join away as already stored)."""
    store = str(tmp_path / "store")
    probed = emb.select(
        "vec_id", "embedding", S.ivf_probe_lists(cent, 2).alias("ivf_probes")
    ).withColumn("ivf_list", F.element_at("ivf_probes", 1))
    seed = probed.filter(F.col("vec_id") < 50)
    batch = probed.filter(F.col("vec_id").between(50, 99))
    S._write_listed(seed, store, "parquet", "overwrite", cluster=True)
    rows_before_append = spark.read.parquet(store).count()

    seen_at_adjacency_time = {}
    real = S.ivf_record_probe_adjacency

    def spy(assigned, path, adj_dir=None):
        seen_at_adjacency_time["rows"] = spark.read.parquet(store).count()
        return real(assigned, path, adj_dir=adj_dir)

    orig = S.ivf_record_probe_adjacency
    S.ivf_record_probe_adjacency = spy
    try:
        S._write_listed(batch, store, "parquet", "append", cluster=True)
    finally:
        S.ivf_record_probe_adjacency = orig
    # adjacency ran while the store still held only the seed rows
    assert seen_at_adjacency_time["rows"] == rows_before_append
    assert spark.read.parquet(store).count() == seed.count() + batch.count()


def test_init_generational_heals_crashed_compact_park(spark, emb, cent, tmp_path):
    """r11 review #3: migrating a flat store that has a crashed
    compaction's park (<store>.compact_old holding the ONLY copy of some
    lists) must heal first — the generational branch never consults the
    flat park again, so unhealed lists would be invisible forever."""
    import shutil

    store = str(tmp_path / "store")
    S.ivf_write_partitioned(emb, store, cent)
    all_ids = {r["vec_id"] for r in spark.read.parquet(store).collect()}

    # simulate the crash window: one list dir moved to the park, store copy gone
    parked = store + ".compact_old"
    os.makedirs(parked)
    victim = next(e for e in os.listdir(store) if e.startswith("ivf_list="))
    shutil.move(os.path.join(store, victim), os.path.join(parked, victim))

    gen_dir = S.ivf_init_generational(store)
    assert not os.path.isdir(parked)
    assert os.path.isdir(os.path.join(gen_dir, victim))
    got = {r["vec_id"] for r in spark.read.parquet(S._resolve_store(store)).collect()}
    assert got == all_ids


def test_cent_carrier_memoizes_large_broadcasts(spark, monkeypatch):
    """r11 review #4: repeated _cent_carrier calls with the same frozen
    quantizer (one per micro-batch in the ingest loop) must reuse ONE
    broadcast, not torrent a fresh copy per batch and leak it."""
    monkeypatch.setattr(S, "_CENT_BROADCAST_BYTES", 256)
    monkeypatch.setattr(S, "_CENT_BC_CACHE", None)
    cent_a = np.ones((16, 8), dtype=np.float64)
    cent_b = np.full((16, 8), 2.0, dtype=np.float64)

    loc1, bc1 = S._cent_carrier(cent_a)
    loc2, bc2 = S._cent_carrier(cent_a.copy())  # same content, new object
    loc3, bc3 = S._cent_carrier(cent_b)
    assert loc1 is None and loc2 is None and loc3 is None
    assert bc1 is bc2  # content-addressed reuse
    assert bc3 is not bc1
    assert np.array_equal(bc1.value, cent_a)
    # small matrices stay on the closure path, no broadcast bookkeeping
    small = np.ones((2, 2), dtype=np.float64)
    monkeypatch.setattr(S, "_CENT_BROADCAST_BYTES", 1 << 20)
    loc, bc = S._cent_carrier(small)
    assert bc is None and loc is small
