"""Pure-Python/NumPy codec for the SCBF v1 columnar file format.

Implements the binary layout of the reference spec (/root/reference/SPEC.md:18-98):
header (magic ``SCBFv1\\0\\0``, schema JSON, counts, meta offset), per-column
metadata table, and per-column zlib-compressed data blocks. Three physical
types: int32 (code 1), float64 (code 2), utf8 (code 3, prefix-sum u32 offsets
+ concatenated blob — layout-identical to Arrow's variable-length binary).

Differences from the reference implementation (all deliberate, behavior-compatible):

- **Single forward pass**: block offsets are computed up-front from known
  compressed sizes, instead of the reference's write-placeholder-then-seek-back
  patching (reference writer.py:158,221-223). This makes the writer usable on
  non-seekable sinks (object stores, pipes).
- **Correct ``str_uncomp``**: the reference clobbers the utf8 ``str_uncomp``
  metadata field with an offset during patching (reference writer.py:208-209);
  we store the true uncompressed blob length, and on read treat ``*_uncomp``
  fields as advisory (so reference-written files still decode).
- **Vectorized**: numeric packing/unpacking uses NumPy ``tobytes``/
  ``frombuffer`` instead of per-value ``struct`` loops (reference
  reader.py:80,88 / writer.py:84,98).

This module has NO Spark dependency — it is shared by the Spark DataSource V2
(`custom_columnar_format_spark.sources`) and the reference-parity CLI.
"""

from __future__ import annotations

import json
import struct
import zlib
from dataclasses import dataclass, field
from typing import Any, BinaryIO, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

MAGIC = b"SCBFv1\x00\x00"

TYPE_INT32 = 1
TYPE_FLOAT64 = 2
TYPE_UTF8 = 3

TYPE_NAMES = {TYPE_INT32: "int32", TYPE_FLOAT64: "float64", TYPE_UTF8: "utf8"}
TYPE_CODES = {v: k for k, v in TYPE_NAMES.items()}

DEFAULT_ZLIB_LEVEL = 6

# u32 prefix-sum offsets cap a single utf8 blob at 4 GiB (SPEC.md:80).
MAX_UTF8_BLOB = (1 << 32) - 1
INT32_MIN = -(1 << 31)
INT32_MAX = (1 << 31) - 1


class ScbfError(ValueError):
    """Malformed SCBF data or unsupported value for the format."""


@dataclass
class ColumnMeta:
    """Decoded per-column metadata record (SPEC.md:53-80)."""

    name: str
    type_code: int
    count: int
    # numeric: (uncomp, comp, offset); utf8 uses both pairs.
    uncomp_size: int = 0
    comp_size: int = 0
    block_offset: int = 0
    str_uncomp_size: int = 0
    str_comp_size: int = 0
    str_offset: int = 0

    @property
    def type_name(self) -> str:
        return TYPE_NAMES[self.type_code]


@dataclass
class ScbfFileInfo:
    """Parsed header + metadata table of one SCBF file."""

    schema: dict
    num_columns: int
    total_rows: int
    meta_table_offset: int
    columns: List[ColumnMeta] = field(default_factory=list)

    def column_map(self) -> Dict[str, ColumnMeta]:
        # Last duplicate wins, matching reference reader.py:120 behavior.
        return {m.name: m for m in self.columns}


# ---------------------------------------------------------------------------
# Encoding
# ---------------------------------------------------------------------------


def _meta_record_size(name_bytes: bytes, type_code: int) -> int:
    base = 2 + len(name_bytes) + 1 + 8  # name_len u16 + name + type u8 + count u64
    return base + (6 * 8 if type_code == TYPE_UTF8 else 3 * 8)


def encode_int32_block(values: Sequence[int], level: int = DEFAULT_ZLIB_LEVEL) -> Tuple[bytes, int]:
    """Pack a no-null int32 column to (compressed block, uncompressed size)."""
    arr = np.asarray(values, dtype=np.int64)
    if arr.size and (arr.min() < INT32_MIN or arr.max() > INT32_MAX):
        raise ScbfError(
            f"int32 overflow: values outside [{INT32_MIN}, {INT32_MAX}] "
            "(SCBF v1 has no wider integer type; cast to float64 or use parquet)"
        )
    raw = arr.astype("<i4").tobytes()
    return zlib.compress(raw, level), len(raw)


def encode_float64_block(values: Sequence[float], level: int = DEFAULT_ZLIB_LEVEL) -> Tuple[bytes, int]:
    raw = np.asarray(values, dtype="<f8").tobytes()
    return zlib.compress(raw, level), len(raw)


def encode_utf8_blocks(
    values: Sequence[str], level: int = DEFAULT_ZLIB_LEVEL
) -> Tuple[bytes, int, bytes, int]:
    """Pack a no-null string column.

    Returns (comp_offsets, uncomp_offsets_len, comp_blob, uncomp_blob_len).
    Offsets are (count+1) little-endian u32 prefix sums over the UTF-8 blob,
    the same layout as Arrow StringArray buffers.
    """
    encoded = [v.encode("utf-8") for v in values]
    lengths = np.fromiter((len(b) for b in encoded), dtype=np.uint64, count=len(encoded))
    offsets = np.zeros(len(encoded) + 1, dtype=np.uint64)
    np.cumsum(lengths, out=offsets[1:])
    blob_len = int(offsets[-1])
    if blob_len > MAX_UTF8_BLOB:
        raise ScbfError(
            f"utf8 column blob is {blob_len} bytes; u32 offsets cap it at 4 GiB "
            "— split the data into more files/partitions"
        )
    off_raw = offsets.astype("<u4").tobytes()
    blob = b"".join(encoded)
    return zlib.compress(off_raw, level), len(off_raw), zlib.compress(blob, level), blob_len


def write_table(
    out: BinaryIO,
    names: Sequence[str],
    type_codes: Sequence[int],
    columns: Sequence[Sequence[Any]],
    level: int = DEFAULT_ZLIB_LEVEL,
) -> None:
    """Write one SCBF v1 file in a single forward pass.

    All compressed blocks are built in memory first (they must be, to know
    sizes), then every offset is computed before a single byte hits ``out`` —
    no placeholder/seek-back patching, so ``out`` need not be seekable.
    """
    if not (len(names) == len(type_codes) == len(columns)):
        raise ScbfError("names/types/columns length mismatch")
    n_rows = len(columns[0]) if columns else 0
    for c in columns:
        if len(c) != n_rows:
            raise ScbfError("ragged columns: all columns must have the same row count")

    schema_json = json.dumps(
        {"columns": [{"name": n, "type": TYPE_NAMES[t]} for n, t in zip(names, type_codes)]}
    ).encode("utf-8")

    # 1) Encode all blocks.
    blocks: List[Tuple[bytes, ...]] = []  # per column: (comp,) or (off_comp, str_comp)
    uncomp_sizes: List[Tuple[int, ...]] = []
    name_bytes = [n.encode("utf-8") for n in names]
    for tc, col in zip(type_codes, columns):
        if tc == TYPE_INT32:
            comp, usz = encode_int32_block(col, level)
            blocks.append((comp,))
            uncomp_sizes.append((usz,))
        elif tc == TYPE_FLOAT64:
            comp, usz = encode_float64_block(col, level)
            blocks.append((comp,))
            uncomp_sizes.append((usz,))
        elif tc == TYPE_UTF8:
            off_comp, off_usz, str_comp, str_usz = encode_utf8_blocks(col, level)
            blocks.append((off_comp, str_comp))
            uncomp_sizes.append((off_usz, str_usz))
        else:
            raise ScbfError(f"unknown type code {tc}")

    # 2) Compute layout: header | meta table | data blocks.
    header_len = len(MAGIC) + 4 + len(schema_json) + 4 + 8 + 8
    meta_table_offset = header_len
    meta_len = sum(_meta_record_size(nb, tc) for nb, tc in zip(name_bytes, type_codes))
    pos = meta_table_offset + meta_len
    block_offsets: List[Tuple[int, ...]] = []
    for blk in blocks:
        offs = []
        for b in blk:
            offs.append(pos)
            pos += len(b)
        block_offsets.append(tuple(offs))

    # 3) Emit.
    out.write(MAGIC)
    out.write(struct.pack("<I", len(schema_json)))
    out.write(schema_json)
    out.write(struct.pack("<IQQ", len(names), n_rows, meta_table_offset))

    for nb, tc, blk, usz, offs in zip(name_bytes, type_codes, blocks, uncomp_sizes, block_offsets):
        out.write(struct.pack("<H", len(nb)))
        out.write(nb)
        out.write(struct.pack("<BQ", tc, n_rows))
        if tc == TYPE_UTF8:
            out.write(
                struct.pack(
                    "<QQQQQQ",
                    usz[0], len(blk[0]), offs[0],  # offsets block
                    usz[1], len(blk[1]), offs[1],  # string blob (true uncomp length)
                )
            )
        else:
            out.write(struct.pack("<QQQ", usz[0], len(blk[0]), offs[0]))

    for blk in blocks:
        for b in blk:
            out.write(b)


def write_table_path(
    path: str,
    names: Sequence[str],
    type_codes: Sequence[int],
    columns: Sequence[Sequence[Any]],
    level: int = DEFAULT_ZLIB_LEVEL,
) -> None:
    with open(path, "wb") as f:
        write_table(f, names, type_codes, columns, level)


# ---------------------------------------------------------------------------
# Decoding
# ---------------------------------------------------------------------------


def read_file_info(f: BinaryIO) -> ScbfFileInfo:
    """Parse header + full metadata table (SPEC.md:28-80)."""
    f.seek(0)
    if f.read(8) != MAGIC:
        raise ScbfError("bad magic: not an SCBF v1 file")
    (schema_len,) = struct.unpack("<I", f.read(4))
    schema = json.loads(f.read(schema_len).decode("utf-8"))
    num_columns, total_rows, meta_table_offset = struct.unpack("<IQQ", f.read(4 + 8 + 8))

    f.seek(meta_table_offset)
    cols: List[ColumnMeta] = []
    for _ in range(num_columns):
        (name_len,) = struct.unpack("<H", f.read(2))
        name = f.read(name_len).decode("utf-8")
        type_code, count = struct.unpack("<BQ", f.read(1 + 8))
        if type_code in (TYPE_INT32, TYPE_FLOAT64):
            u, c, o = struct.unpack("<QQQ", f.read(24))
            cols.append(ColumnMeta(name, type_code, count, u, c, o))
        elif type_code == TYPE_UTF8:
            ou, oc, oo, su, sc, so = struct.unpack("<QQQQQQ", f.read(48))
            cols.append(ColumnMeta(name, type_code, count, ou, oc, oo, su, sc, so))
        else:
            raise ScbfError(f"unknown type code {type_code} for column {name!r}")
    return ScbfFileInfo(schema, num_columns, total_rows, meta_table_offset, cols)


def _read_block(f: BinaryIO, offset: int, comp_size: int) -> bytes:
    f.seek(offset)
    return zlib.decompress(f.read(comp_size))


def decode_numeric(f: BinaryIO, meta: ColumnMeta) -> np.ndarray:
    """Decode an int32/float64 column block to a NumPy array (zero-copy view)."""
    raw = _read_block(f, meta.block_offset, meta.comp_size)
    dtype = "<i4" if meta.type_code == TYPE_INT32 else "<f8"
    return np.frombuffer(raw, dtype=dtype, count=meta.count)


def decode_utf8_buffers(f: BinaryIO, meta: ColumnMeta) -> Tuple[np.ndarray, bytes]:
    """Decode a utf8 column to (offsets u32[count+1], blob bytes).

    ``*_uncomp`` metadata is advisory only: reference-written files carry a
    corrupted ``str_uncomp`` (reference writer.py:208-209 clobber), so sizes
    come from the actual decompressed payloads.
    """
    off_raw = _read_block(f, meta.block_offset, meta.comp_size)
    blob = _read_block(f, meta.str_offset, meta.str_comp_size)
    offsets = np.frombuffer(off_raw, dtype="<u4", count=meta.count + 1)
    return offsets, blob


def decode_utf8(f: BinaryIO, meta: ColumnMeta) -> List[str]:
    offsets, blob = decode_utf8_buffers(f, meta)
    return [blob[offsets[i]:offsets[i + 1]].decode("utf-8") for i in range(meta.count)]


def read_columns(path: str, columns: Sequence[str]) -> Dict[str, Any]:
    """Selective column read — decompress ONLY the named columns' blocks.

    The format's single query capability (reference reader.py:111-133,
    SPEC.md:101-108): seeks straight to each requested column's stored byte
    offsets; unrequested columns are never read. Raises ``KeyError`` on an
    unknown name, as the reference does. With duplicate column names, the
    last duplicate wins (reference reader.py:120 dict collapse).
    """
    with open(path, "rb") as f:
        info = read_file_info(f)
        meta_map = info.column_map()
        out: Dict[str, Any] = {}
        for name in columns:
            if name not in meta_map:
                raise KeyError(f"Column {name} not found")
            m = meta_map[name]
            if m.type_code == TYPE_UTF8:
                out[name] = decode_utf8(f, m)
            else:
                out[name] = decode_numeric(f, m).tolist()
        return out


def read_all(path: str) -> Tuple[List[str], List[List[Any]]]:
    """Full read, pivoted to rows — parity with reference reader.py:135-161."""
    with open(path, "rb") as f:
        info = read_file_info(f)
        names = [m.name for m in info.columns]
        cols: List[List[Any]] = []
        for m in info.columns:
            if m.type_code == TYPE_UTF8:
                cols.append(decode_utf8(f, m))
            else:
                cols.append(decode_numeric(f, m).tolist())
        rows = [list(row) for row in zip(*cols)] if cols and info.total_rows else []
        return names, rows


def read_arrow_table(path: str, columns: Optional[Sequence[str]] = None):
    """Read an SCBF file into a ``pyarrow.Table``, pruning to ``columns``.

    SCBF's utf8 layout (u32 prefix-sum offsets + blob) is identical to Arrow's
    StringArray buffers, so string columns are constructed without re-copying
    per value; numeric columns come from zero-copy ``frombuffer`` views.
    This is the fast path used by the Spark DataSource.
    """
    import pyarrow as pa

    with open(path, "rb") as f:
        info = read_file_info(f)
        meta_map = info.column_map()
        if columns is None:
            selected = [m.name for m in info.columns]
        else:
            selected = list(columns)
        arrays = []
        fields = []
        for name in selected:
            if name not in meta_map:
                raise KeyError(f"Column {name} not found")
            m = meta_map[name]
            if m.type_code == TYPE_UTF8:
                offsets, blob = decode_utf8_buffers(f, m)
                arr = pa.StringArray.from_buffers(
                    m.count,
                    pa.py_buffer(offsets.astype("<i4").tobytes()),
                    pa.py_buffer(blob),
                )
                fields.append(pa.field(name, pa.string(), nullable=False))
            else:
                np_arr = decode_numeric(f, m)
                arr = pa.array(np_arr, type=pa.int32() if m.type_code == TYPE_INT32 else pa.float64())
                fields.append(
                    pa.field(
                        name,
                        pa.int32() if m.type_code == TYPE_INT32 else pa.float64(),
                        nullable=False,
                    )
                )
            arrays.append(arr)
        return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def write_arrow_table(path: str, table, level: int = DEFAULT_ZLIB_LEVEL) -> None:
    """Write a ``pyarrow.Table`` as one SCBF v1 file.

    Maps Arrow types onto the three SCBF physical types; anything else (or any
    null) raises ``ScbfError`` — SCBF v1 has no null encoding (SPEC.md:118-123
    lists null bitmaps as an unimplemented extension).
    """
    import pyarrow as pa

    names: List[str] = []
    codes: List[int] = []
    cols: List[Sequence[Any]] = []
    for fld in table.schema:
        col = table.column(fld.name)
        if col.null_count:
            raise ScbfError(
                f"column {fld.name!r} contains nulls; SCBF v1 cannot represent them "
                "(drop/fill nulls or write parquet)"
            )
        t = fld.type
        if pa.types.is_integer(t):
            codes.append(TYPE_INT32)
            cols.append(col.to_pylist())
        elif pa.types.is_floating(t):
            codes.append(TYPE_FLOAT64)
            cols.append(col.to_pylist())
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            codes.append(TYPE_UTF8)
            cols.append(col.to_pylist())
        else:
            raise ScbfError(
                f"column {fld.name!r} has type {t}, not representable in SCBF v1 "
                "(int32/float64/utf8 only)"
            )
        names.append(fld.name)
    write_table_path(path, names, codes, cols, level)
