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


def _check_int32_range(arr: np.ndarray) -> None:
    if arr.size and (arr.min() < INT32_MIN or arr.max() > INT32_MAX):
        raise ScbfError(
            f"int32 overflow: values outside [{INT32_MIN}, {INT32_MAX}] "
            "(SCBF v1 has no wider integer type; cast to float64 or use parquet)"
        )


def _pack_int32(values: Sequence[int]) -> bytes:
    arr = np.asarray(values, dtype=np.int64)
    _check_int32_range(arr)
    return arr.astype("<i4").tobytes()


def _pack_float64(values: Sequence[float]) -> bytes:
    return np.asarray(values, dtype="<f8").tobytes()


def _check_utf8_blob(blob_len: int) -> None:
    if blob_len > MAX_UTF8_BLOB:
        raise ScbfError(
            f"utf8 column blob is {blob_len} bytes; u32 offsets cap it at 4 GiB "
            "— split the data into more files/partitions"
        )


def _pack_utf8(values: Sequence[str]) -> Tuple[bytes, bytes]:
    """(offsets raw, blob raw): (count+1) little-endian u32 prefix sums over
    the concatenated UTF-8 blob — the same layout as Arrow StringArray
    buffers."""
    encoded = [v.encode("utf-8") for v in values]
    lengths = np.fromiter((len(b) for b in encoded), dtype=np.uint64, count=len(encoded))
    offsets = np.zeros(len(encoded) + 1, dtype=np.uint64)
    np.cumsum(lengths, out=offsets[1:])
    _check_utf8_blob(int(offsets[-1]))
    return offsets.astype("<u4").tobytes(), b"".join(encoded)


def encode_int32_block(values: Sequence[int], level: int = DEFAULT_ZLIB_LEVEL) -> Tuple[bytes, int]:
    """Pack a no-null int32 column to (compressed block, uncompressed size)."""
    raw = _pack_int32(values)
    return zlib.compress(raw, level), len(raw)


def encode_float64_block(values: Sequence[float], level: int = DEFAULT_ZLIB_LEVEL) -> Tuple[bytes, int]:
    raw = _pack_float64(values)
    return zlib.compress(raw, level), len(raw)


def encode_utf8_blocks(
    values: Sequence[str], level: int = DEFAULT_ZLIB_LEVEL
) -> Tuple[bytes, int, bytes, int]:
    """Pack a no-null string column.

    Returns (comp_offsets, uncomp_offsets_len, comp_blob, uncomp_blob_len).
    """
    off_raw, blob = _pack_utf8(values)
    return zlib.compress(off_raw, level), len(off_raw), zlib.compress(blob, level), len(blob)


def _compress_blocks(raws: Sequence[bytes], level: int, workers: int) -> List[bytes]:
    """zlib-compress raw blocks, optionally on a thread pool — zlib releases
    the GIL, so per-column compression parallelizes within one process.
    ``workers=1`` stays serial (the right choice inside a Spark executor,
    which already runs one writer task per core); ``workers=0`` sizes the
    pool to min(blocks, cpus) for single-process/driver-side writes."""
    if workers == 1 or len(raws) <= 1:
        return [zlib.compress(r, level) for r in raws]
    import os
    from concurrent.futures import ThreadPoolExecutor

    n = workers if workers > 0 else min(len(raws), os.cpu_count() or 4)
    with ThreadPoolExecutor(max_workers=n) as ex:
        return list(ex.map(lambda r: zlib.compress(r, level), raws))


def write_table(
    out: BinaryIO,
    names: Sequence[str],
    type_codes: Sequence[int],
    columns: Sequence[Sequence[Any]],
    level: int = DEFAULT_ZLIB_LEVEL,
    workers: int = 1,
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

    raw_blocks: List[Tuple[bytes, ...]] = []  # per column: (raw,) or (off_raw, blob)
    for tc, col in zip(type_codes, columns):
        if tc == TYPE_INT32:
            raw_blocks.append((_pack_int32(col),))
        elif tc == TYPE_FLOAT64:
            raw_blocks.append((_pack_float64(col),))
        elif tc == TYPE_UTF8:
            raw_blocks.append(_pack_utf8(col))
        else:
            raise ScbfError(f"unknown type code {tc}")
    write_table_raw(out, names, type_codes, raw_blocks, n_rows, level, workers)


def write_table_raw(
    out: BinaryIO,
    names: Sequence[str],
    type_codes: Sequence[int],
    raw_blocks: Sequence[Tuple[bytes, ...]],
    n_rows: int,
    level: int = DEFAULT_ZLIB_LEVEL,
    workers: int = 1,
) -> None:
    """Write pre-packed raw blocks — (raw,) per numeric column, (offsets raw,
    blob) per utf8 column — as one SCBF v1 file. Compression optionally fans
    out across threads (see ``_compress_blocks``)."""
    schema_json = json.dumps(
        {"columns": [{"name": n, "type": TYPE_NAMES[t]} for n, t in zip(names, type_codes)]}
    ).encode("utf-8")
    name_bytes = [n.encode("utf-8") for n in names]

    # 1) Compress all raw blocks (flattened so utf8's two blocks parallelize
    #    independently), then regroup per column.
    flat: List[bytes] = [b for blk in raw_blocks for b in blk]
    comp_flat = _compress_blocks(flat, level, workers)
    blocks: List[Tuple[bytes, ...]] = []
    uncomp_sizes: List[Tuple[int, ...]] = []
    i = 0
    for blk in raw_blocks:
        blocks.append(tuple(comp_flat[i : i + len(blk)]))
        uncomp_sizes.append(tuple(len(b) for b in blk))
        i += len(blk)

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


def _utf8_raw_from_arrow(col) -> Tuple[bytes, bytes]:
    """(offsets raw, blob raw) straight from Arrow string buffers — SCBF's
    utf8 layout IS Arrow's variable-length layout, so no per-value Python
    string materialization is needed; just rebase the offsets to 0 and
    narrow them to u32."""
    import pyarrow as pa

    combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(combined, pa.ChunkedArray):
        arr = combined.chunk(0) if combined.num_chunks else pa.array([], type=combined.type)
    else:
        arr = combined
    if len(arr) == 0:
        return np.zeros(1, dtype="<u4").tobytes(), b""
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    lo, hi = int(offs[0]), int(offs[-1])
    _check_utf8_blob(hi - lo)
    rebased = (offs.astype(np.int64) - lo).astype("<u4")
    # zero-copy slice of the Arrow data buffer; zlib consumes any buffer object
    blob = memoryview(bufs[2])[lo:hi]
    return rebased.tobytes(), blob


def write_arrow_table(
    path: str, table, level: int = DEFAULT_ZLIB_LEVEL, workers: int = 1
) -> None:
    """Write a ``pyarrow.Table`` as one SCBF v1 file.

    Maps Arrow types onto the three SCBF physical types; anything else (or any
    null) raises ``ScbfError`` — SCBF v1 has no null encoding (SPEC.md:118-123
    lists null bitmaps as an unimplemented extension).

    Raw blocks are built from Arrow buffers directly (numeric: vectorized
    cast; utf8: offset rebase + blob slice — no ``to_pylist`` round-trip).
    ``workers=0`` parallelizes per-block zlib across threads for
    single-process writes; keep the default 1 inside Spark executors, which
    already run one writer task per core."""
    import pyarrow as pa

    names: List[str] = []
    codes: List[int] = []
    raw_blocks: List[Tuple[bytes, ...]] = []
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
            arr = col.to_numpy(zero_copy_only=False)
            _check_int32_range(arr)
            raw_blocks.append((arr.astype("<i4").tobytes(),))
        elif pa.types.is_floating(t):
            codes.append(TYPE_FLOAT64)
            raw_blocks.append((col.to_numpy(zero_copy_only=False).astype("<f8").tobytes(),))
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            codes.append(TYPE_UTF8)
            raw_blocks.append(_utf8_raw_from_arrow(col))
        else:
            raise ScbfError(
                f"column {fld.name!r} has type {t}, not representable in SCBF v1 "
                "(int32/float64/utf8 only)"
            )
        names.append(fld.name)
    with open(path, "wb") as f:
        write_table_raw(f, names, codes, raw_blocks, table.num_rows, level, workers)
