"""Similarity-search tests: brute-force cosine against numpy ground truth,
LSH recall against brute force, k-NN join, norms."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from custom_columnar_format_spark.operators import similarity

N, DIM = 200, 16


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.RandomState(7)
    base = rng.standard_normal((N, DIM))
    base[1] = base[0] + 0.01 * rng.standard_normal(DIM)  # planted near-dup of vec 0
    return base


@pytest.fixture(scope="module")
def emb(spark, vecs):
    schema = StructType(
        [StructField("vec_id", LongType(), False), StructField("embedding", ArrayType(FloatType()), False)]
    )
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, schema)


def np_topk(vecs, q, k):
    sims = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(vecs)), key=lambda i: (-round(sims[i], 4), i))
    return order[:k]


def test_brute_force_matches_numpy(emb, vecs):
    # float32 storage truncates values, so ground truth uses the same cast
    v32 = vecs.astype(np.float32).astype(np.float64)
    q = v32[0]
    got = [r.vec_id for r in similarity.brute_force_topk(emb, q, k=10).collect()]
    assert got == np_topk(v32, q, 10)
    assert got[0] == 0 and got[1] == 1  # self first, planted near-dup second


def test_lsh_topk_recall(emb, vecs):
    v32 = vecs.astype(np.float32).astype(np.float64)
    q = v32[0]
    exact = set(np_topk(v32, q, 10))
    approx = {r.vec_id for r in similarity.lsh_topk(emb, q, k=10, num_planes=6).collect()}
    assert 0 in approx and 1 in approx  # near neighbors collide in the same bucket
    assert len(exact & approx) >= 5  # multiprobe recall on a random corpus


def test_cosine_neardup_bruteforce_vs_lsh(emb):
    bf = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_neardup_pairs(emb, threshold=0.9, bruteforce=True).collect()
    }
    assert (0, 1) in bf
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_neardup_pairs(emb, threshold=0.9, bruteforce=False).collect()
    }
    assert lsh <= bf  # LSH tier never invents pairs
    assert (0, 1) in lsh  # ~identical vectors share every hyperplane side


def test_knn_join(emb):
    queries = emb.limit(3).select(F.col("vec_id").alias("q_id"), "embedding")
    out = similarity.knn_join_bruteforce(queries, emb, k=4)
    counts = {r.q_id: r.n for r in out.groupBy("q_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 4, 1: 4, 2: 4}
    top = {r.q_id: r.vec_id for r in out.filter("cos_sim >= 0.9999").collect() if r.q_id == r.vec_id}
    assert set(top) == {0, 1, 2}  # self-match is the 1.0 hit


def test_embedding_norms(emb, vecs):
    got = {r.vec_id: (r.dim, r.l2_norm) for r in similarity.embedding_norms(emb).collect()}
    v32 = vecs.astype(np.float32).astype(np.float64)
    for i in (0, 5, 199):
        assert got[i][0] == DIM
        assert abs(got[i][1] - round(float(np.linalg.norm(v32[i])), 4)) < 1e-3


def test_ivf_topk_recall(emb, vecs):
    v32 = vecs.astype(np.float32).astype(np.float64)
    q = v32[0]
    exact = set(np_topk(v32, q, 10))
    approx = {r.vec_id for r in similarity.ivf_topk(emb, q, k=10, nlist=8, nprobe=3).collect()}
    # probing 3 of 8 lists on a random corpus must still find the hot
    # neighborhood: the query's own list always contains vec 0 and its
    # planted near-dup
    assert 0 in approx and 1 in approx
    assert len(exact & approx) >= 5


def test_ivf_assignment_covers_all_vectors(emb):
    cent = similarity.ivf_centroids(emb, nlist=8)
    assert cent.shape == (8, DIM)
    assigned = emb.withColumn("ivf_list", similarity.ivf_assign(cent))
    lists = assigned.groupBy("ivf_list").count().collect()
    assert sum(r["count"] for r in lists) == N
    assert all(0 <= r.ivf_list < 8 for r in lists)


def test_ivf_probe_subsets_bruteforce(emb, vecs):
    # probing ALL lists must equal the exact brute-force answer
    q = vecs.astype(np.float32).astype(np.float64)[3]
    exact = [r.vec_id for r in similarity.brute_force_topk(emb, q, k=10).collect()]
    full_probe = [r.vec_id for r in similarity.ivf_topk(emb, q, k=10, nlist=8, nprobe=8).collect()]
    assert full_probe == exact


def test_ivf_partitioned_layout_prunes_and_matches(spark, sf_small, tmp_path):
    """The serving layout: corpus written partitionBy(ivf_list) → the probe
    filter prunes directories (every scanned file is under a probed list),
    and results equal the in-memory IVF path with the same quantizer."""
    from custom_columnar_format_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    cent = S.ivf_centroids(emb, nlist=8)
    path = str(tmp_path / "ivf_corpus")
    S.ivf_write_partitioned(emb, path, cent)

    qrow = emb.orderBy("vec_id").first()
    qv = list(qrow["embedding"])
    got = S.ivf_topk_partitioned(spark, path, qv, cent, k=5, nprobe=3)
    want = S.ivf_topk(emb, qv, k=5, nlist=8, nprobe=3, centroids=cent)
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in want.collect()]

    # pruning proof: the scan plans a partition filter on ivf_list and reads
    # only the probed directories (inputFiles() would lie — it lists the
    # relation's files BEFORE partition pruning)
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[ivf_list#\d+ IN \(([\d,]+)\)\]", plan)
    assert m, f"no partition filter on ivf_list:\n{plan}"
    qn = __import__("numpy").asarray(qv, dtype="float64")
    qn = qn / max(float(__import__("numpy").linalg.norm(qn)), 1e-12)
    probe = {int(p) for p in (-(cent @ qn)).argsort()[:3]}
    assert {int(x) for x in m.group(1).split(",")} == probe


def test_group_centroids(spark):
    from pyspark.sql import Row

    from custom_columnar_format_spark.operators.similarity import group_centroids

    df = spark.createDataFrame(
        [
            Row(label=0, embedding=[1.0, 2.0]),
            Row(label=0, embedding=[3.0, 4.0]),
            Row(label=1, embedding=[10.0, 20.0]),
        ]
    )
    rows = {(r["label"], r["pos"]): r["centroid_val"] for r in group_centroids(df).collect()}
    assert rows == {(0, 0): 2.0, (0, 1): 3.0, (1, 0): 10.0, (1, 1): 20.0}


def test_pq_train_shapes_and_determinism(vecs):
    books1 = similarity.pq_train(vecs, n_subspaces=4, ksub=8, seed=3)
    books2 = similarity.pq_train(vecs, n_subspaces=4, ksub=8, seed=3)
    assert books1.shape == (4, 8, DIM // 4)
    assert np.array_equal(books1, books2)
    with pytest.raises(ValueError):
        similarity.pq_train(vecs, n_subspaces=5)


def test_pq_codes_exact_on_codewords(spark, vecs):
    """A vector that IS codeword j in every subspace must encode to code j+1
    (1-based) everywhere, and its ADC distance to itself as the query must
    be ~the quantization floor (0 when query == its own reconstruction)."""
    books = similarity.pq_train(vecs, n_subspaces=4, ksub=8, seed=3)
    # synthesize a vector from codeword 2 of each subspace
    v = np.concatenate([books[m][2] for m in range(4)])
    df = spark.createDataFrame([(0, [float(x) for x in v])], "vec_id: long, embedding: array<double>")
    codes = df.select(similarity.pq_codes_col(books).alias("c")).first()["c"]
    assert codes == [3, 3, 3, 3]
    got = similarity.pq_adc_topk(df, v, books, k=1).first()
    assert got["vec_id"] == 0 and got["pq_dist"] == 0.0


def test_pq_adc_recall_on_clustered_data(spark):
    """On cluster-structured data (where PQ's codebooks capture the
    geometry), ADC top-10 must recover most of the exact L2 top-10."""
    rng = np.random.RandomState(11)
    centers = rng.standard_normal((8, DIM)) * 5
    x = np.stack([centers[i % 8] + 0.3 * rng.standard_normal(DIM) for i in range(N)])
    rows = [(i, [float(v) for v in x[i].astype(np.float32)]) for i in range(N)]
    schema = StructType(
        [StructField("vec_id", LongType(), False), StructField("embedding", ArrayType(FloatType()), False)]
    )
    df = spark.createDataFrame(rows, schema)
    books = similarity.pq_train(x, n_subspaces=4, ksub=16, seed=5)
    q = x[0].astype(np.float32).astype(np.float64)
    approx = [r["vec_id"] for r in similarity.pq_adc_topk(df, q, books, k=10).collect()]
    x32 = x.astype(np.float32).astype(np.float64)
    exact = sorted(range(N), key=lambda i: (float(((x32[i] - q) ** 2).sum()), i))[:10]
    assert len(set(approx) & set(exact)) >= 6
    assert approx[0] == 0  # the query itself must rank first


def test_ivf_pq_topk_composes(spark):
    """IVF-PQ: candidates outside the probed lists must never appear, the
    query's own cluster must be probed, and recall vs exact L2 stays high
    on cluster-structured data."""
    rng = np.random.RandomState(23)
    centers = rng.standard_normal((6, DIM)) * 5
    x = np.stack([centers[i % 6] + 0.3 * rng.standard_normal(DIM) for i in range(N)])
    rows = [(i, [float(v) for v in x[i].astype(np.float32)]) for i in range(N)]
    schema = StructType(
        [StructField("vec_id", LongType(), False), StructField("embedding", ArrayType(FloatType()), False)]
    )
    df = spark.createDataFrame(rows, schema)
    cent = similarity._spherical_kmeans(x.copy(), 6, seed=9)
    # 8 subspaces of 2 dims, 16 codewords each — fine enough quantization
    # that ADC ranking tracks exact L2 on this cluster structure
    books = similarity.pq_train(x, n_subspaces=8, ksub=16, seed=9)
    q = x[0].astype(np.float32).astype(np.float64)

    got = [r["vec_id"] for r in similarity.ivf_pq_topk(df, q, cent, books, k=10, nprobe=2).collect()]
    assert got[0] == 0  # the query vector itself survives both quantizers
    x32 = x.astype(np.float32).astype(np.float64)
    exact = sorted(range(N), key=lambda i: (float(((x32[i] - q) ** 2).sum()), i))[:10]
    assert len(set(got) & set(exact)) >= 6

    # nprobe=0-adjacent sanity: with all lists probed the result equals plain ADC
    all_probe = similarity.ivf_pq_topk(df, q, cent, books, k=10, nprobe=6)
    plain = similarity.pq_adc_topk(df, q, books, k=10)
    assert [r["vec_id"] for r in all_probe.collect()] == [r["vec_id"] for r in plain.collect()]


def test_ivf_pq_partitioned_serving_layout(spark, tmp_path):
    """The materialized IVF-PQ index must (a) store only (id, codes) — no
    embedding column, (b) answer queries from probed directories only
    (partition pruning, checked via inputFiles), and (c) return exactly
    what ivf_pq_topk computes over the raw corpus with the same
    quantizers."""
    rng = np.random.RandomState(31)
    centers = rng.standard_normal((6, DIM)) * 5
    x = np.stack([centers[i % 6] + 0.3 * rng.standard_normal(DIM) for i in range(N)])
    rows = [(i, [float(v) for v in x[i].astype(np.float32)]) for i in range(N)]
    schema = StructType(
        [StructField("vec_id", LongType(), False), StructField("embedding", ArrayType(FloatType()), False)]
    )
    df = spark.createDataFrame(rows, schema)
    cent = similarity._spherical_kmeans(x.copy(), 6, seed=13)
    books = similarity.pq_train(x, n_subspaces=8, ksub=16, seed=13)
    q = x[0].astype(np.float32).astype(np.float64)

    path = str(tmp_path / "ivfpq")
    similarity.ivf_pq_write_partitioned(df, path, cent, books)

    stored = spark.read.parquet(path)
    assert set(stored.columns) == {"vec_id", "pq_codes", "ivf_list"}  # vectors dropped

    got = similarity.ivf_pq_topk_partitioned(spark, path, q, cent, books, k=10, nprobe=2)
    want = similarity.ivf_pq_topk(df, q, cent, books, k=10, nprobe=2)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    # pruning proof: a PartitionFilters entry on ivf_list with exactly the
    # probed lists (inputFiles() lists the relation's files BEFORE pruning —
    # same caveat as test_ivf_partitioned_layout_prunes_and_matches)
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    m = re.search(r"PartitionFilters: \[ivf_list#\d+ IN \(([\d,]+)\)\]", buf.getvalue())
    assert m, "no partition filter on ivf_list"
    qn = q / np.linalg.norm(q)
    dots = cent @ qn
    probe = {int(i) for i in sorted(range(len(cent)), key=lambda i: (-dots[i], i))[:2]}
    assert {int(x) for x in m.group(1).split(",")} == probe


def test_semdedup_matches_numpy_greedy(spark):
    """semdedup_prune == pure-numpy replay: argmax-cosine cluster assign
    (ties -> smaller centroid id), within-cluster pairs at round(cos,4) >=
    tau, pruned = any member with a lower-id neighbor above threshold."""
    rng = np.random.RandomState(7)
    centers = rng.standard_normal((4, DIM)) * 3
    x = np.stack([centers[i % 4] + 0.6 * rng.standard_normal(DIM) for i in range(120)])
    # plant exact near-dups: 110..119 copy 0..9 with a nudge
    for j in range(10):
        x[110 + j] = x[j] + 0.01 * rng.standard_normal(DIM)
    rows = [(i, [float(v) for v in x[i].astype(np.float32)]) for i in range(120)]
    schema = StructType(
        [StructField("vec_id", LongType(), False), StructField("embedding", ArrayType(FloatType()), False)]
    )
    df = spark.createDataFrame(rows, schema)
    cent = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    tau = 0.9

    got = {
        r.vec_id: (r.sem_cluster, r.pruned)
        for r in similarity.semdedup_prune(df, cent, threshold=tau).collect()
    }

    xf = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    xn = xf / np.linalg.norm(xf, axis=1, keepdims=True)
    assign = np.argmax(xn @ cent.T, axis=1)
    pruned = set()
    for c in range(4):
        ids = [i for i in range(120) if assign[i] == c]
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                if round(float(xn[a] @ xn[b]), 4) >= tau:
                    pruned.add(b)
    assert len(got) == 120
    for i in range(120):
        assert got[i][0] == int(assign[i])
        assert got[i][1] == (i in pruned), i
    # the planted copies must actually be pruned
    assert all((110 + j) in pruned for j in range(10))


def test_pq_arrow_encoder_bit_identical_to_expr(spark):
    """The Arrow-batched PQ encoder must produce EXACTLY the codes of the
    expression form — same dim-sequential accumulation order, same
    first-min argmin — on vectors engineered to include near-ties."""
    rng = np.random.RandomState(97)
    x = rng.standard_normal((N, DIM)).astype(np.float32)
    # plant exact codeword hits (distance 0 ties impossible to half-guess)
    books = similarity.pq_train(x.astype(np.float64), n_subspaces=8, ksub=16, seed=5)
    for j in range(8):
        x[j] = books[:, j % 16, :].reshape(-1).astype(np.float32)
    rows = [(i, [float(v) for v in x[i]]) for i in range(N)]
    schema = StructType(
        [StructField("vec_id", LongType(), False), StructField("embedding", ArrayType(FloatType()), False)]
    )
    df = spark.createDataFrame(rows, schema)
    expr = {
        r.vec_id: list(r.c)
        for r in df.select("vec_id", similarity.pq_codes_col(books).alias("c")).collect()
    }
    arrow = {
        r.vec_id: list(r.c)
        for r in df.select(
            "vec_id", similarity.pq_codes_pandas_udf(books)(similarity.F.col("embedding")).alias("c")
        ).collect()
    }
    assert expr == arrow
    # and the two ADC rankings are therefore identical too
    q = x[0].astype(np.float64)
    a = [tuple(r) for r in similarity.pq_adc_topk(df, q, books, k=10, encoder="expr").collect()]
    b = [tuple(r) for r in similarity.pq_adc_topk(df, q, books, k=10, encoder="arrow").collect()]
    assert a == b


def test_semdedup_arrow_scorer_bit_identical_to_expr(spark):
    """The Arrow pair scorer + JVM round must reproduce the expression
    path's rounded cosines EXACTLY — including the planted near-identical
    pairs whose cos sits right at the rounding boundary region."""
    rng = np.random.RandomState(55)
    centers = rng.standard_normal((4, DIM)) * 3
    x = np.stack([centers[i % 4] + 0.5 * rng.standard_normal(DIM) for i in range(100)])
    for j in range(8):
        x[90 + j] = x[j] + 1e-4 * rng.standard_normal(DIM)
    rows = [(i, [float(v) for v in x[i].astype(np.float32)]) for i in range(100)]
    schema = StructType(
        [StructField("vec_id", LongType(), False), StructField("embedding", ArrayType(FloatType()), False)]
    )
    df = spark.createDataFrame(rows, schema)
    cent = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    a = {
        (r.id_a, r.id_b): r.cos_sim
        for r in similarity.semdedup_pairs(df, cent, threshold=-1.0, scorer="expr").collect()
    }
    b = {
        (r.id_a, r.id_b): r.cos_sim
        for r in similarity.semdedup_pairs(df, cent, threshold=-1.0, scorer="arrow").collect()
    }
    assert a == b and len(a) > 1000


def test_matryoshka_topk_constructed(spark):
    """Truncated-dim ranking uses ONLY the leading dims: a vector aligned
    with the query's first 4 dims but opposite in the tail must outrank a
    vector that is mediocre up front — and cos_full still reports the
    true full-dim similarity."""
    from custom_columnar_format_spark.operators.similarity import matryoshka_topk

    q = [1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0]
    rows = [
        (0, q),
        (1, [1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0]),  # perfect head, bad tail
        (2, [0.5, 0.5, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0]),      # weak head
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    got = [r.asDict() for r in matryoshka_topk(df, q, trunc_dim=4, k=3).collect()]
    assert [r["vec_id"] for r in got] == [0, 1, 2]
    assert got[1]["cos_trunc"] == 1.0          # head-perfect
    assert got[1]["cos_full"] < got[0]["cos_full"]  # full cosine sees the tail


def test_int8_quantization_error_bounds(spark):
    """Bucket-center dequantization bounds per-value error by half a bucket:
    mse <= (span/256/2)^2 per dim; constant dims quantize exactly."""
    from custom_columnar_format_spark.operators.similarity import (
        int8_quantization_error,
    )

    rows = [
        (i, [float(i), 7.0, float(i % 3)], i % 2) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>, label: int")
    got = {r["label"]: r for r in int8_quantization_error(df).collect()}
    assert set(got) == {0, 1}
    assert got[0]["n_vecs"] == 32 and got[1]["n_vecs"] == 32
    # dim0 span 63 -> half-bucket 63/512; dim1 constant (exact); dim2 span 2
    worst = (63.0 / 256 / 2) ** 2
    for lbl in (0, 1):
        assert 0.0 < got[lbl]["mse"] <= worst + 1e-9


# ---------------------------------------------------------------------------
# SemDeDup quantizer: bounded seed collect + scale-independent oracle
# (r10 VERDICT #1 / ADVICE #3)
# ---------------------------------------------------------------------------


def _synth_emb_dir(tmp_path, n=6000, dim=8, seed=7):
    """Synthetic embeddings.parquet past the ~4.3k-row point where a FIXED
    oracle nlist diverged from the engine's n//256 rule (r10 ADVICE #3)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype("float32")
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([i % 5 for i in range(n)], pa.int32()),
        }
    )
    d = tmp_path / "semsf"
    d.mkdir()
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def _norm_frames(df):
    import pandas as pd  # noqa: F401

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_sem_nlist_rule_bounded():
    # floor below 4096 rows, n//256 in the middle, hard-capped forever after
    assert similarity.sem_nlist(0) == 16
    assert similarity.sem_nlist(500) == 16
    assert similarity.sem_nlist(4351) == 16
    assert similarity.sem_nlist(6000) == 23
    assert similarity.sem_nlist(256 * 65536) == 65536
    assert similarity.sem_nlist(10**12) == 65536  # 1T vectors: still constant
    assert similarity.sem_nlist(10**12, cap=20) == 20


def test_semdedup_oracle_scale_independent(spark, tmp_path):
    """Engine vs DuckDB at a corpus size where nlist = 23 ≠ the old fixed
    16 — the regime where r10's oracle silently diverged."""
    import duckdb
    import pandas as pd

    from custom_columnar_format_spark.queries.corpus_ops import (
        _semdedup_oracle_sql,
        q_semdedup_prune,
    )

    d = _synth_emb_dir(tmp_path)
    eng = q_semdedup_prune(spark, d).toPandas()
    assert eng["sem_cluster"].nunique() > 16  # really using nlist=23

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")
    ora = con.execute(_semdedup_oracle_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        _norm_frames(eng), _norm_frames(ora), check_dtype=False, rtol=1e-6, atol=1e-6
    )


def test_semdedup_seed_collect_capped(spark, tmp_path):
    """The driver-side seed collect is bounded by the cap at ANY corpus
    size: with cap=20 on a 6000-row corpus (n//256 = 23 > cap) the seed
    matrix holds exactly 20 rows, and the engine still hash-matches a
    DuckDB replay that derives nlist from the same capped rule."""
    import duckdb
    import pandas as pd

    from custom_columnar_format_spark.queries import corpus_ops

    d = _synth_emb_dir(tmp_path)
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    nlist = similarity.sem_nlist(emb.count(), cap=20)
    assert nlist == 20
    cent = corpus_ops._sem_seed_centroids(emb, nlist)
    assert cent.shape[0] == 20  # the collect is the cap, not n//256

    eng = corpus_ops._semdedup_census(spark, d, cap=20).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")
    capped_rule = "GREATEST(16, LEAST((SELECT COUNT(*) FROM embeddings) // 256, 20))"
    sql = corpus_ops._semdedup_oracle_sql().replace(
        "GREATEST(16, LEAST((SELECT COUNT(*) FROM embeddings) // 256, 65536))",
        capped_rule,
    )
    assert capped_rule in sql  # the replace really rewired the rule
    ora = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        _norm_frames(eng), _norm_frames(ora), check_dtype=False, rtol=1e-6, atol=1e-6
    )


def test_semdedup_within_cap_semantics(spark):
    """within_cap (the paper's within-cluster subsampling, deterministic):
    a huge cap is EXACTLY the uncapped result; a small cap prunes a subset
    of it (pruner candidates shrink, decisions never appear from nowhere);
    a planted duplicate pair whose both members rank after the cap is the
    documented miss."""
    rng = np.random.RandomState(11)
    centers = rng.standard_normal((3, DIM)) * 3
    x = np.stack([centers[i % 3] + 0.5 * rng.standard_normal(DIM) for i in range(60)])
    # same-cluster near-twin pair with BOTH members late in id order:
    # 57 copies 54 (both assigned to 54's cluster, ranks far past cap=2)
    x[57] = x[54] + 0.005 * rng.standard_normal(DIM)
    rows = [(i, [float(v) for v in x[i].astype(np.float32)]) for i in range(60)]
    schema = StructType(
        [StructField("vec_id", LongType(), False), StructField("embedding", ArrayType(FloatType()), False)]
    )
    df = spark.createDataFrame(rows, schema)
    cent = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    tau = 0.98

    def marked(within_cap):
        return {
            r.vec_id: r.pruned
            for r in similarity.semdedup_prune(
                df, cent, threshold=tau, within_cap=within_cap
            ).collect()
        }

    exact = marked(None)
    assert marked(10_000) == exact  # cap >= cluster size: identical
    capped = marked(2)
    assert set(capped) == set(exact)  # every vector still gets a decision
    assert {i for i, p in capped.items() if p} <= {i for i, p in exact.items() if p}
    # the planted late-pair: exact catches it, cap=2 documents the miss
    assert exact[57] is True
    assert capped[57] is False
