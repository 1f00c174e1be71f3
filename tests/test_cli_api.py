"""Reference-parity surface tests: the CLI command set (reference cli.py:33-43)
and the SCBFReader class API (promised in reference README.md:67-89, never
implemented there)."""

import csv
import os

import pytest

from custom_columnar_format_spark.cli import main as cli_main
from custom_columnar_format_spark.scbf.reader_api import SCBFReader

CSV_BODY = "id,score,name\n1,1.5,alpha\n2,2.5,beta\n3,3.5,gamma\n"


@pytest.fixture()
def sample_csv(tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(CSV_BODY)
    return str(p)


def test_cli_local_roundtrip(sample_csv, tmp_path):
    scbf = str(tmp_path / "out.scbf")
    out_csv = str(tmp_path / "out.csv")
    assert cli_main(["csv_to_custom", sample_csv, scbf, "--local"]) == 0
    assert cli_main(["custom_to_csv", scbf, out_csv, "--local"]) == 0
    with open(out_csv) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["id", "score", "name"]
    assert rows[1] == ["1", "1.5", "alpha"] and len(rows) == 4


def test_cli_selective_columns(sample_csv, tmp_path):
    scbf = str(tmp_path / "out.scbf")
    out_csv = str(tmp_path / "sel.csv")
    cli_main(["csv_to_custom", sample_csv, scbf, "--local"])
    cli_main(["custom_to_csv", scbf, out_csv, "--local", "--cols", "name", "id"])
    with open(out_csv) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["name", "id"]  # request order preserved
    assert rows[1] == ["alpha", "1"]


def test_cli_compat_inference(tmp_path):
    """Reference inference: first non-empty value decides the type
    (reference writer.py:41-47) — '1' then '2.5' crashes there; our compat
    mode reproduces the type choice but the full mode widens."""
    p = tmp_path / "mix.csv"
    p.write_text("x\n1\n2\n")
    scbf = str(tmp_path / "mix.scbf")
    cli_main(["csv_to_custom", str(p), scbf, "--local", "--compat-inference"])
    assert SCBFReader(scbf).schema() == {"x": "int32"}


def test_reader_class_api(sample_csv, tmp_path):
    scbf = str(tmp_path / "r.scbf")
    cli_main(["csv_to_custom", sample_csv, scbf, "--local"])
    r = SCBFReader(scbf)
    assert r.list_columns() == ["id", "score", "name"]
    assert r.num_rows == 3
    assert r.schema()["score"] == "float64"
    names, rows = r.read_all()
    assert names == ["id", "score", "name"] and rows[0] == [1, 1.5, "alpha"]
    cols = r.read_columns(["score"])
    assert cols == {"score": [1.5, 2.5, 3.5]}
    pdf = r.to_pandas(["name"])
    assert list(pdf["name"]) == ["alpha", "beta", "gamma"]


def test_reader_to_spark(spark, sample_csv, tmp_path):
    scbf = str(tmp_path / "s.scbf")
    cli_main(["csv_to_custom", sample_csv, scbf, "--local"])
    df = SCBFReader(scbf).to_spark(spark, columns=["id", "score"])
    assert df.schema.fieldNames() == ["id", "score"]
    assert df.count() == 3


def test_cli_maintenance_surface(spark, sf_small, tmp_path, capsys):
    """compact / snapshot / rollback / vacuum drive the operators end-to-end
    from the CLI entry point."""
    import glob as g

    from custom_columnar_format_spark.cli import main
    from custom_columnar_format_spark.sources.scbf_datasource import register

    register(spark)
    path = str(tmp_path / "ds")
    df = spark.read.parquet(f"{sf_small}/orders.parquet").select("o_orderkey", "o_totalprice")
    df.repartition(6).write.format("scbf").option("version", "2").mode("overwrite").save(path)
    n = spark.read.format("scbf").load(path).count()

    assert main(["snapshot", "create", path, "--tag", "before"]) == 0
    df.limit(100).coalesce(1).write.format("scbf").option("version", "2").mode("append").save(path)
    assert spark.read.format("scbf").load(path).count() == n + 100

    assert main(["snapshot", "list", path]) == 0
    assert "before" in capsys.readouterr().out

    assert main(["snapshot", "rollback", path, "--snapshot", "before"]) == 0
    assert spark.read.format("scbf").load(path).count() == n

    assert main(["compact", path, "--target-files", "2", "--sort-by", "o_orderkey"]) == 0
    assert len(g.glob(os.path.join(path, "*.scbf"))) <= 2
    assert spark.read.format("scbf").load(path).count() == n

    os.makedirs(path + ".merge-tmp")
    assert main(["vacuum", path, "--older-than", "0"]) == 0
    assert not os.path.exists(path + ".merge-tmp")


def test_reader_class_api_v2(tmp_path):
    """SCBFReader auto-detects v2 files: same README surface, richer types,
    nulls as None — including a row-grouped file."""
    import pyarrow as pa

    from custom_columnar_format_spark.scbf import codec_v2

    t = pa.table(
        {
            "id": pa.array([1, 2, None, 4], type=pa.int64()),
            "name": pa.array(["a", None, "c", "d"]),
            "ok": pa.array([True, False, True, None]),
        }
    )
    p = str(tmp_path / "v2.scbf")
    codec_v2.write_arrow_table(p, t, rows_per_group=3)
    r = SCBFReader(p)
    assert r.version == 2
    assert r.list_columns() == ["id", "name", "ok"]
    assert r.schema() == {"id": "int64", "name": "utf8", "ok": "bool"}
    assert r.num_rows == 4
    names, rows = r.read_all()
    assert names == ["id", "name", "ok"]
    assert rows[1] == [2, None, False] and rows[2] == [None, "c", True]
    assert r.read_columns(["ok"]) == {"ok": [True, False, True, None]}
    assert r.to_arrow(["id"]).column("id").to_pylist() == [1, 2, None, 4]


def test_cli_inspect_head_preview(sample_csv, tmp_path, capsys):
    """``inspect --head N`` is the reference reader demo surface
    (reference reader.py:164-198: first-N-rows preview, or per-column
    first-N values with --cols) — pure codec path, no Spark session."""
    scbf = str(tmp_path / "out.scbf")
    cli_main(["csv_to_custom", sample_csv, scbf, "--local"])

    assert cli_main(["inspect", scbf, "--head", "2"]) == 0
    out = capsys.readouterr().out
    assert "rows: 3" in out
    assert "Columns: ['id', 'score', 'name']" in out
    assert "First 2 rows:" in out
    assert "[1, 1.5, 'alpha']" in out and "[2, 2.5, 'beta']" in out
    assert "'gamma'" not in out  # head honored

    assert cli_main(["inspect", scbf, "--head", "2", "--cols", "name", "id"]) == 0
    out = capsys.readouterr().out
    assert "--- Column: name (3 rows) ---" in out
    assert "['alpha', 'beta']" in out
    assert "--- Column: id (3 rows) ---" in out
    assert "[1, 2]" in out

    # no --head: metadata only, unchanged surface
    assert cli_main(["inspect", scbf]) == 0
    out = capsys.readouterr().out
    assert "rows: 3" in out and "First" not in out


def test_cli_ivf_maintenance_surface(spark, sf_small, tmp_path, capsys):
    """The IVF store ops surface end-to-end from the CLI: info (flat) →
    init-generational → info (pointer) → compact (generation flip) →
    rebuild → vacuum-generations → heal (no-op on a healthy store)."""
    import numpy as np
    from pyspark.sql import functions as F

    from custom_columnar_format_spark.cli import main
    from custom_columnar_format_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    cent = S.ivf_centroids(emb, nlist=8)
    store = str(tmp_path / "store")
    S.ivf_write_partitioned(emb, store, cent)

    assert main(["ivf", "info", store]) == 0
    out = capsys.readouterr().out
    assert "'layout': 'flat'" in out and "'quantizer': [8, " in out

    assert main(["ivf", "init-generational", store]) == 0
    capsys.readouterr()
    assert main(["ivf", "info", store]) == 0
    out = capsys.readouterr().out
    assert "'layout': 'generational'" in out and "gen-000001" in out

    S.ivf_delete_ids(emb.filter(F.col("vec_id") % 2 == 0).select("vec_id"), store)
    assert main(["ivf", "compact", store]) == 0
    out = capsys.readouterr().out
    assert "'generation': 'gen-000002'" in out

    assert main(["ivf", "rebuild", store, "--nlist", "8"]) == 0
    out = capsys.readouterr().out
    assert "'generation': 'gen-000003'" in out

    assert main(["ivf", "vacuum-generations", store, "--keep-last", "0"]) == 0
    out = capsys.readouterr().out
    assert "gen-000001" in out and "gen-000002" in out

    assert main(["ivf", "heal", store]) == 0
    out = capsys.readouterr().out
    assert "'action':" in out

    # the store still answers through the pointer with its stored quantizer
    qv = list(emb.orderBy("vec_id").first()["embedding"])
    got = S.ivf_topk_partitioned(spark, store, qv, k=5, nprobe=8)
    assert got.count() == 5
    survivors = {r["vec_id"] for r in spark.read.parquet(S._resolve_store(store)).collect()}
    assert all(v % 2 != 0 for v in survivors)
