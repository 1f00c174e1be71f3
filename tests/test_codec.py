"""SCBF codec unit + property tests: round-trip over the three types and the
edge cases probed in SURVEY.md §1.2, golden-read of the reference's own
sample file, and two-way byte-compat with the reference implementation
(reference writer.py/reader.py, loaded from /root/reference when present)."""

import importlib.util
import math
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from custom_columnar_format_spark.scbf import codec

from .conftest import REFERENCE

REF_SAMPLE = os.path.join(REFERENCE, "examples", "sample.scbf")


def _load_ref_module(name):
    path = os.path.join(REFERENCE, f"{name}.py")
    if not os.path.exists(path):
        pytest.skip(f"reference module missing: {path}")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def roundtrip(tmp_path, names, types, columns):
    path = str(tmp_path / "t.scbf")
    codec.write_table_path(path, names, types, columns)
    got = codec.read_columns(path, names)
    return {n: list(got[n]) for n in names}


def test_roundtrip_three_types(tmp_path):
    names = ["i", "f", "s"]
    types = [codec.TYPE_INT32, codec.TYPE_FLOAT64, codec.TYPE_UTF8]
    cols = [[1, -2, 2**31 - 1, -(2**31)], [0.5, -1.25, 1e300, 0.0], ["a", "", "héllo ✓", "x" * 1000]]
    got = roundtrip(tmp_path, names, types, cols)
    assert got["i"] == cols[0]
    assert got["f"] == cols[1]
    assert got["s"] == cols[2]


def test_roundtrip_nan_inf(tmp_path):
    got = roundtrip(tmp_path, ["f"], [codec.TYPE_FLOAT64], [[math.nan, math.inf, -math.inf]])
    assert math.isnan(got["f"][0]) and got["f"][1] == math.inf and got["f"][2] == -math.inf


def test_int32_overflow_rejected(tmp_path):
    with pytest.raises(Exception):
        codec.write_table_path(str(tmp_path / "o.scbf"), ["i"], [codec.TYPE_INT32], [[2**31]])


def test_selective_read_order_and_unknown(tmp_path):
    path = str(tmp_path / "t.scbf")
    codec.write_table_path(
        path, ["a", "b", "c"], [codec.TYPE_INT32] * 3, [[1], [2], [3]]
    )
    got = codec.read_columns(path, ["c", "a"])
    assert list(got.keys()) == ["c", "a"]  # request order preserved (reference reader.py:111-133)
    with pytest.raises(KeyError):
        codec.read_columns(path, ["nope"])


def test_str_uncomp_field_correct(tmp_path):
    """The reference writer clobbers str_uncomp with an offset (writer.py:208);
    our writer must store the true uncompressed blob length."""
    path = str(tmp_path / "t.scbf")
    vals = ["abc", "defg", ""]
    codec.write_table_path(path, ["s"], [codec.TYPE_UTF8], [vals])
    with open(path, "rb") as f:
        info = codec.read_file_info(f)
    (meta,) = info.columns
    assert meta.str_uncomp_size == len("".join(vals).encode("utf-8"))


@pytest.mark.skipif(not os.path.exists(REF_SAMPLE), reason="reference sample not present")
def test_golden_read_reference_sample():
    names, rows = codec.read_all(REF_SAMPLE)
    assert len(rows) == 3 and len(names) == len(rows[0])


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not present")
def test_reference_reads_our_file(tmp_path):
    """Byte-compat forward: a file written by this codec decodes identically
    through the reference's reader.py (reader.py:135 read_all)."""
    ref_reader = _load_ref_module("reader")
    path = str(tmp_path / "ours.scbf")
    cols = [[1, 2, 3], [1.5, -2.5, 0.0], ["x", "", "yy"]]
    codec.write_table_path(
        path, ["i", "f", "s"], [codec.TYPE_INT32, codec.TYPE_FLOAT64, codec.TYPE_UTF8], cols
    )
    names, rows = ref_reader.read_all(path)
    assert names == ["i", "f", "s"]
    assert [list(r) for r in rows] == [[1, 1.5, "x"], [2, -2.5, ""], [3, 0.0, "yy"]]


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not present")
def test_we_read_reference_file(tmp_path):
    """Byte-compat backward: a file written by the reference's writer.py
    (writer.py:28 write_scbf) decodes through this codec."""
    ref_writer = _load_ref_module("writer")
    csv_path = tmp_path / "in.csv"
    csv_path.write_text("id,score,name\n1,1.5,alpha\n2,2.5,beta\n")
    scbf_path = str(tmp_path / "ref.scbf")
    ref_writer.write_scbf(str(csv_path), scbf_path)
    got = codec.read_columns(scbf_path, ["name", "id"])
    assert list(got["id"]) == [1, 2]
    assert list(got["name"]) == ["alpha", "beta"]


@settings(max_examples=25, deadline=None)
@given(
    ints=st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), min_size=1, max_size=50),
    texts=st.lists(st.text(max_size=40), min_size=1, max_size=50),
)
def test_property_roundtrip(tmp_path_factory, ints, texts):
    n = min(len(ints), len(texts))
    tmp = tmp_path_factory.mktemp("prop")
    path = str(tmp / "p.scbf")
    codec.write_table_path(
        path, ["i", "s"], [codec.TYPE_INT32, codec.TYPE_UTF8], [ints[:n], texts[:n]]
    )
    got = codec.read_columns(path, ["i", "s"])
    assert list(got["i"]) == ints[:n] and list(got["s"]) == texts[:n]
