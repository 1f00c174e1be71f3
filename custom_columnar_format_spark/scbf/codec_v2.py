"""SCBF **v2** codec — implements the reference spec's own declared future
extensions (reference SPEC.md:118-123 lists them as unimplemented: null
bitmaps, dictionary encoding, min/max statistics, checksums) as a clean
second format version, plus the type-system fixes v1 forces workarounds for.

v2 is OUR format (the reference defines only v1), so the layout is designed
for object stores and distributed writers from the start:

    magic "SCBFv2\\0\\0"
    <data blocks ...>                (per column / per role; file-level codec:
                                      zlib default, bz2 | lzma | none)
    <metadata JSON, zlib>            (footer, like Parquet's; names the codec)
    u64 meta_comp_len | magic tail

- **Footer metadata**: written last, so the writer is one forward pass with
  no seeks at all (v1 needs sizes precomputed; v2 streams). Readers seek to
  EOF-16, which object stores serve as a ranged GET.
- **Null support**: optional per-column validity bitmap, bit-packed LSB-first
  — exactly Arrow's validity layout, so reads hand the decompressed buffer
  to Arrow without per-value work.
- **Types**: int32, float64, utf8 (v1 set) + int64 and bool (v1's biggest
  wart: Spark bigint had to be range-checked down to int32).
- **Dictionary encoding**: utf8 columns with repetition ratio ≤ 0.5 store a
  sorted unique dictionary + u32 indices (auto; per-column flag in metadata).
- **Stats**: per-column min/max (nulls excluded) + null_count in metadata —
  used by the Spark DataSource for file-level skipping under pushed filters;
  low-NDV utf8 columns (≤ ``DVS_MAX`` distinct short values) additionally
  store their EXACT distinct-value set, turning ``=`` / ``IN`` pruning into
  a membership proof where Bloom filters are only probabilistic.
- **Checksums**: crc32 of every compressed block, verified on read.
- **Row groups** (optional, ``rows_per_group``): intra-file block sets with
  their own stats/blooms, so selective reads of compacted multi-hundred-MB
  files skip group I/O the way Parquet row-group pruning does; ungrouped
  files keep the original byte layout exactly.

Metadata is a zlib'd JSON document rather than v1's hand-packed binary
records: footer size is irrelevant next to data blocks, and JSON keeps the
format evolvable (same reasoning as Parquet's thrift footer).
"""

from __future__ import annotations

import json
import struct
import zlib
from dataclasses import dataclass
from typing import Any, BinaryIO, Dict, List, Optional, Sequence

import numpy as np

MAGIC_V2 = b"SCBFv2\x00\x00"

V2_TYPES = ("int32", "int64", "float64", "bool", "utf8")
_NP_DTYPES = {"int32": "<i4", "int64": "<i8", "float64": "<f8", "bool": "u1"}

DEFAULT_ZLIB_LEVEL = 6
DICT_RATIO = 0.5
MAX_STAT_STR = 64
#: distinct-value-set stats: a utf8 column whose block set has ≤ this many
#: distinct non-null values (each ≤ MAX_STAT_STR chars) stores the EXACT
#: value set in its metadata — `=` / `IN` pruning becomes a set-membership
#: proof where Bloom filters are only probabilistic and min/max only bounds
#: the range. 32 short strings cost ~the same footer bytes as one Bloom.
DVS_MAX = 32


def _c_zlib(raw, level): return zlib.compress(raw, level)
def _c_bz2(raw, level):
    import bz2
    return bz2.compress(raw, max(1, min(9, level)))
def _c_lzma(raw, level):
    import lzma
    return lzma.compress(raw, preset=max(0, min(9, level)))
def _c_none(raw, level): return raw
def _d_bz2(comp):
    import bz2
    return bz2.decompress(comp)
def _d_lzma(comp):
    import lzma
    return lzma.decompress(comp)

#: pluggable block codecs (all stdlib — Parquet-style per-file codec choice):
#: zlib = balanced default, bz2/lzma = colder data & better ratios, none =
#: hot data where decompress CPU dominates (e.g. NVMe-local shuffle spill)
BLOCK_CODECS = {
    "zlib": (_c_zlib, zlib.decompress),
    "bz2": (_c_bz2, _d_bz2),
    "lzma": (_c_lzma, _d_lzma),
    "none": (_c_none, lambda b: b),
}


class ScbfV2Error(ValueError):
    pass


@dataclass
class BlockRef:
    offset: int
    comp: int
    uncomp: int
    crc32: int

    def to_json(self) -> dict:
        return {"offset": self.offset, "comp": self.comp, "uncomp": self.uncomp, "crc32": self.crc32}

    @staticmethod
    def from_json(d: dict) -> "BlockRef":
        return BlockRef(d["offset"], d["comp"], d["uncomp"], d["crc32"])


class _BlockWriter:
    """Appends compressed blocks, tracking offsets/crc — one forward pass."""

    def __init__(self, f: BinaryIO, level: int, codec: str = "zlib"):
        if codec not in BLOCK_CODECS:
            raise ScbfV2Error(f"unknown codec {codec!r}; have {sorted(BLOCK_CODECS)}")
        self.f = f
        self.level = level
        self.codec = codec
        self.pos = f.write(MAGIC_V2)

    def put(self, raw: bytes) -> BlockRef:
        comp = BLOCK_CODECS[self.codec][0](raw, self.level)
        ref = BlockRef(self.pos, len(comp), len(raw), zlib.crc32(comp) & 0xFFFFFFFF)
        self.f.write(comp)
        self.pos += len(comp)
        return ref


def _trunc_min(s: str) -> str:
    """Truncating a min to a prefix is always safe (prefix <= full string)."""
    return s[:MAX_STAT_STR]


def _trunc_max(s: str) -> Optional[str]:
    """Upper-bound-preserving truncation for a max stat: a plain prefix would
    UNDERSTATE the max and make stats skipping drop files that contain
    matching rows. Like Parquet, increment the last retainable character of
    the kept prefix; if every kept character is already U+10FFFF (absurd),
    give up and store no max (treated as unbounded)."""
    if len(s) <= MAX_STAT_STR:
        return s
    prefix = s[:MAX_STAT_STR]
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < 0x10FFFF:
            return prefix[:i] + chr(cp + 1)
    return None


def _stats_of(values: np.ndarray, type_name: str, valid: Optional[np.ndarray]) -> Optional[dict]:
    vals = values if valid is None else values[valid]
    if vals.size == 0:
        return None
    if type_name == "utf8":
        mn, mx = min(vals), max(vals)
        mx_t = _trunc_max(str(mx))
        st = {"min": _trunc_min(str(mn))}
        if mx_t is not None:
            st["max"] = mx_t
        return st
    if type_name == "bool":
        return {"min": bool(vals.min()), "max": bool(vals.max())}
    mn, mx = vals.min(), vals.max()
    if type_name == "float64":
        if np.isnan(mn) or np.isnan(mx):
            finite = vals[~np.isnan(vals)]
            if finite.size == 0:
                return None
            mn, mx = finite.min(), finite.max()
        return {"min": float(mn), "max": float(mx)}
    return {"min": int(mn), "max": int(mx)}


_BLOOM_MAX_BITS = 1 << 19  # 64 KiB of bits per column — bounded footer growth
_BLOOM_FPP = 0.01


def _bloom_value_bytes(v, type_name: str) -> bytes:
    """Canonical hash input per value: ints little-endian 8 bytes, strings
    UTF-8 — identical for int32/int64 widths so readers need no width info."""
    if type_name == "utf8":
        return str(v).encode("utf-8")
    return struct.pack("<q", int(v))


def _bloom_hashes(data: bytes, k: int, m: int) -> List[int]:
    """k bit positions via double hashing h1 + i*h2 over a blake2b-128 digest
    (stdlib, stable across platforms — the write/read contract)."""
    import hashlib

    d = hashlib.blake2b(data, digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd → full-period stepping
    return [(h1 + i * h2) % m for i in range(k)]


def _bloom_of(values, type_name: str) -> Optional[dict]:
    """Standard Bloom filter over the column's distinct non-null values:
    m = -n·ln(p)/ln²2 bits (capped), k = m/n·ln2 hash probes. Stored
    base64(zlib(bits)) inside the JSON footer — a sparse filter compresses
    to near-nothing."""
    import base64
    import math

    distinct = set(values)
    n = len(distinct)
    if n == 0:
        return None
    m = min(_BLOOM_MAX_BITS, max(64, int(math.ceil(-n * math.log(_BLOOM_FPP) / (math.log(2) ** 2)))))
    k = max(1, min(16, round(m / n * math.log(2))))
    bits = np.zeros(m, dtype=bool)
    for v in distinct:
        for pos in _bloom_hashes(_bloom_value_bytes(v, type_name), k, m):
            bits[pos] = True
    packed = np.packbits(bits, bitorder="little").tobytes()
    return {"m": m, "k": k, "bits": base64.b64encode(zlib.compress(packed, 6)).decode("ascii")}


def bloom_contains(bloom: dict, value, type_name: str) -> bool:
    """May-contain test against a stored filter (False = provably absent)."""
    import base64

    m, k = bloom["m"], bloom["k"]
    bits = np.unpackbits(
        np.frombuffer(zlib.decompress(base64.b64decode(bloom["bits"])), dtype=np.uint8),
        bitorder="little",
    )
    return all(bits[pos] for pos in _bloom_hashes(_bloom_value_bytes(value, type_name), k, m))


def _encode_columns(bw: "_BlockWriter", table, bloom_set: set) -> List[dict]:
    """Encode every column of ``table`` as blocks via ``bw``; returns the
    per-column metadata entries (blocks, stats, optional bloom). One call per
    row group — or per file for ungrouped files (the original v2 layout)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    columns_meta: List[dict] = []
    for fld in table.schema:
        col = table.column(fld.name).combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks else pa.array([], type=fld.type)
        t = fld.type
        null_count = col.null_count
        valid_np = None
        if null_count:
            valid_np = np.asarray(col.is_valid())
        blocks: Dict[str, BlockRef] = {}
        dvs: Optional[List[str]] = None  # set only by the utf8 branch

        if pa.types.is_boolean(t):
            type_name = "bool"
            vals = np.asarray(col.fill_null(False)).astype("u1")
            blocks["data"] = bw.put(vals.tobytes())
            stats = _stats_of(np.asarray(col.drop_null()).astype("u1"), "bool", None) if len(col) else None
        elif pa.types.is_integer(t) or pa.types.is_floating(t):
            if pa.types.is_floating(t):
                type_name = "float64"
                fill = 0.0
            elif t.bit_width <= 32:
                type_name = "int32"
                fill = 0
            else:
                type_name = "int64"
                fill = 0
            vals = np.asarray(col.fill_null(fill)).astype(_NP_DTYPES[type_name])
            blocks["data"] = bw.put(vals.tobytes())
            stats = _stats_of(vals, type_name, valid_np)
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            type_name = "utf8"
            # Arrow-native path: dictionary_encode / offset-buffer reuse
            # instead of a to_pylist round-trip + object-dtype np.unique
            # (measured ~6× on the 200k bench column).
            from .codec import _utf8_raw_from_arrow

            filled = pc.fill_null(col, "")
            dict_arr = filled.dictionary_encode()
            uniq = dict_arr.dictionary
            if len(filled) and len(uniq) / len(filled) <= DICT_RATIO:
                # dictionary encoding: u32 indices + sorted dict offsets +
                # dict blob (sorted per the format contract; remap the
                # first-occurrence indices Arrow produces)
                order = np.asarray(pc.sort_indices(uniq))
                rank = np.empty(len(uniq), dtype=np.int64)
                rank[order] = np.arange(len(uniq))
                idx = rank[dict_arr.indices.to_numpy(zero_copy_only=False)]
                d_off_raw, d_blob = _utf8_raw_from_arrow(uniq.take(pa.array(order)))
                blocks["indices"] = bw.put(idx.astype("<u4").tobytes())
                blocks["dict_offsets"] = bw.put(d_off_raw)
                blocks["dict_blob"] = bw.put(d_blob)
            else:
                off_raw, blob = _utf8_raw_from_arrow(filled)
                blocks["offsets"] = bw.put(off_raw)
                blocks["blob"] = bw.put(blob)
            nn = col.drop_null()
            if len(nn):
                mm = pc.min_max(nn)
                stats = {"min": _trunc_min(str(mm["min"].as_py()))}
                mx_t = _trunc_max(str(mm["max"].as_py()))
                if mx_t is not None:
                    stats["max"] = mx_t
                # distinct-value-set stats for low-NDV columns (exact IN/=
                # pruning — see DVS_MAX). An optional JSON footer key: pre-dvs
                # readers ignore it, the format version stays 2.
                uniq_nn = pc.unique(nn)
                if len(uniq_nn) <= DVS_MAX:
                    vals_py = [str(v) for v in uniq_nn.to_pylist()]
                    if all(len(v) <= MAX_STAT_STR for v in vals_py):
                        dvs = sorted(vals_py)
            else:
                stats = None
        else:
            raise ScbfV2Error(
                f"column {fld.name!r}: type {t} not representable in SCBF v2 "
                "(int32/int64/float64/bool/utf8)"
            )

        if null_count:
            bitmap = np.packbits(valid_np, bitorder="little")  # Arrow validity layout
            blocks["validity"] = bw.put(bitmap.tobytes())

        cm = {
            "name": fld.name,
            "type": type_name,
            "nullable": bool(null_count),
            "null_count": int(null_count),
            "dict": "indices" in blocks,
            "blocks": {k: v.to_json() for k, v in blocks.items()},
            "stats": stats,
        }
        if dvs is not None:
            cm["dvs"] = dvs
        if fld.name in bloom_set:
            if type_name not in ("int32", "int64", "utf8"):
                raise ScbfV2Error(
                    f"bloom filter on column {fld.name!r}: only int/string "
                    f"columns are supported (got {type_name})"
                )
            nn = col.drop_null()
            bloom = _bloom_of(
                nn.to_pylist() if type_name == "utf8" else np.asarray(nn), type_name
            )
            if bloom is not None:
                cm["bloom"] = bloom
        columns_meta.append(cm)
    return columns_meta


def _merged_columns_meta(groups: List[dict]) -> List[dict]:
    """File-level column metadata synthesized from per-group entries, so
    grouped files keep the same footer shape consumers already read (schema
    listing, null counts, min/max pruning). Mins/maxes fold conservatively
    (a group whose string max was truncated away makes the file max unbounded
    too); the merged entries carry no blocks — data lives in the groups."""
    out: List[dict] = []
    for i, c0 in enumerate(groups[0]["columns"]):
        cols = [g["columns"][i] for g in groups]
        present = [c["stats"] for c in cols if c["stats"]]
        stats: Optional[dict] = None
        if present:
            stats = {"min": min(s["min"] for s in present)}
            if all("max" in s for s in present):
                stats["max"] = max(s["max"] for s in present)
        merged = {
            "name": c0["name"],
            "type": c0["type"],
            "nullable": any(c["nullable"] for c in cols),
            "null_count": sum(c["null_count"] for c in cols),
            "dict": False,
            "blocks": {},
            "stats": stats,
        }
        # file-level distinct-value set = union of per-group sets, kept only
        # while every group has one and the union stays within DVS_MAX (the
        # same bound as per-group sets — footer growth stays capped)
        group_dvs = [c.get("dvs") for c in cols]
        if all(d is not None for d in group_dvs):
            union = sorted(set().union(*[set(d) for d in group_dvs]))
            if len(union) <= DVS_MAX:
                merged["dvs"] = union
        out.append(merged)
    return out


def write_arrow_table(
    path: str,
    table,
    level: int = DEFAULT_ZLIB_LEVEL,
    bloom_columns: Optional[Sequence[str]] = None,
    codec: str = "zlib",
    rows_per_group: Optional[int] = None,
) -> None:
    """Write a ``pyarrow.Table`` as one SCBF v2 file (nulls allowed).

    ``bloom_columns`` (int/string columns) additionally get a per-file Bloom
    filter in the footer: point-lookup (``=`` / ``IN``) predicates can then
    skip files whose key RANGE overlaps but which provably lack the value —
    the case min/max stats cannot prune (Parquet's column bloom filters,
    SPARK-34562, solve exactly this).

    ``rows_per_group`` splits the file into intra-file **row groups** (the
    Parquet analogy): each group carries its own blocks, min/max stats, and
    blooms, so a selective read of one large file skips whole groups' I/O —
    file-level stats can only skip ALL of a file, which stops helping once
    compaction grows files to hundreds of MB. ``None`` (default) keeps the
    original single-group layout BYTE-IDENTICAL (small files pay no footer
    growth); files with one group's worth of rows likewise. The footer keeps
    ``version: 2`` and file-level ``columns`` (merged stats, empty block
    maps), so schema listing and file-level pruning work unchanged on
    grouped files, and a pre-row-group reader fails loudly on the missing
    block refs rather than returning wrong rows."""
    bloom_set = set(bloom_columns or ())

    with open(path, "wb") as f:
        bw = _BlockWriter(f, level, codec)
        if rows_per_group is not None and rows_per_group <= 0:
            raise ScbfV2Error("rows_per_group must be positive (or None)")
        if rows_per_group is None or table.num_rows <= rows_per_group:
            columns_meta = _encode_columns(bw, table, bloom_set)
            meta = {"version": 2, "rows": table.num_rows, "codec": codec, "columns": columns_meta}
        else:
            groups = []
            for start in range(0, table.num_rows, rows_per_group):
                sl = table.slice(start, rows_per_group)
                groups.append({"rows": sl.num_rows, "columns": _encode_columns(bw, sl, bloom_set)})
            meta = {
                "version": 2,
                "rows": table.num_rows,
                "codec": codec,
                "columns": _merged_columns_meta(groups),
                "row_groups": groups,
            }
        meta_comp = zlib.compress(json.dumps(meta).encode("utf-8"), level)
        f.write(meta_comp)
        f.write(struct.pack("<Q", len(meta_comp)))
        f.write(MAGIC_V2)


def read_meta(path: str) -> dict:
    """Footer metadata of a v2 file (EOF-ranged read, no data blocks touched)."""
    with open(path, "rb") as f:
        f.seek(0)
        if f.read(8) != MAGIC_V2:
            raise ScbfV2Error("bad magic: not an SCBF v2 file")
        f.seek(-16, 2)
        meta_len, tail = struct.unpack("<Q8s", f.read(16))
        if tail != MAGIC_V2:
            raise ScbfV2Error("bad tail magic: truncated or corrupt SCBF v2 file")
        f.seek(-16 - meta_len, 2)
        return json.loads(zlib.decompress(f.read(meta_len)).decode("utf-8"))


def _get_block(f: BinaryIO, ref: BlockRef, verify: bool = True, codec: str = "zlib") -> bytes:
    f.seek(ref.offset)
    comp = f.read(ref.comp)
    if verify and (zlib.crc32(comp) & 0xFFFFFFFF) != ref.crc32:
        raise ScbfV2Error(f"crc32 mismatch at offset {ref.offset}: corrupted block")
    raw = BLOCK_CODECS[codec][1](comp)
    if len(raw) != ref.uncomp:
        raise ScbfV2Error("uncompressed size mismatch: corrupted block")
    return raw


_PA_TYPES = {"int32": "int32", "int64": "int64", "float64": "float64", "bool": "bool_", "utf8": "string"}


def read_arrow_table(
    path: str,
    columns: Optional[Sequence[str]] = None,
    verify_crc: bool = True,
    filters: Optional[Sequence[Any]] = None,
    group_indices: Optional[Sequence[int]] = None,
):
    """Pruned Arrow read of a v2 file. Validity bitmaps and string buffers go
    to Arrow as raw buffers (the on-disk layout IS Arrow's layout).

    For row-grouped files, ``filters`` (pyspark.sql.datasource Filter
    dataclasses) additionally skip whole groups whose stats/blooms prove no
    match — those groups' data blocks are never read. The result is then a
    SUPERSET of the matching rows (surviving groups come back whole); the
    engine re-applies the row filter, exactly as with Parquet row-group
    pruning. Ungrouped files ignore ``filters`` (file-level pruning is the
    caller's job there, via ``file_may_match``).

    ``group_indices`` restricts the read to those groups of a grouped file —
    the SPLIT primitive: the DataSource plans one input partition per group
    so executors scan a single large compacted file in parallel (Parquet's
    row-group split model). Composes with ``filters`` (intersection)."""
    import pyarrow as pa

    meta = read_meta(path)
    codec = meta.get("codec", "zlib")  # absent in pre-codec files
    if codec not in BLOCK_CODECS:
        raise ScbfV2Error(f"file uses unknown codec {codec!r}; have {sorted(BLOCK_CODECS)}")
    selected = list(columns) if columns is not None else [c["name"] for c in meta["columns"]]

    groups = meta.get("row_groups")
    with open(path, "rb") as f:
        if groups is None:
            if group_indices is not None and list(group_indices) != [0]:
                raise ScbfV2Error(
                    f"group_indices {list(group_indices)!r} on an ungrouped file "
                    "(only [0] is valid)"
                )
            return _read_group(f, codec, meta["columns"], meta["rows"], selected, verify_crc)
        # per-group nullability can differ (one group has nulls, another
        # doesn't); concat needs one schema, so force the file-level flags
        nullable = {c["name"]: bool(c["nullable"]) for c in meta["columns"]}
        want = range(len(groups)) if group_indices is None else group_indices
        tables = [
            _read_group(
                f, codec, groups[i]["columns"], groups[i]["rows"], selected, verify_crc, nullable
            )
            for i in want
            if not filters or _stats_may_match(groups[i]["columns"], groups[i]["rows"], filters)
        ]
    if not tables:
        by_name = {c["name"]: c for c in meta["columns"]}
        empty_fields = [
            pa.field(n, getattr(pa, _PA_TYPES[by_name[n]["type"]])(), nullable=nullable[n])
            for n in selected
        ]
        return pa.Table.from_arrays(
            [pa.nulls(0, fl.type) for fl in empty_fields], schema=pa.schema(empty_fields)
        )
    return pa.concat_tables(tables)


def _read_group(
    f: BinaryIO,
    codec: str,
    columns_meta: List[dict],
    rows: int,
    selected: Sequence[str],
    verify_crc: bool,
    nullable_override: Optional[Dict[str, bool]] = None,
):
    """Decode one block set (a row group, or a whole ungrouped file)."""
    import pyarrow as pa

    by_name = {c["name"]: c for c in columns_meta}
    arrays, fields = [], []
    for name in selected:
        if name not in by_name:
            raise KeyError(f"Column {name} not found")
        cm = by_name[name]
        refs = {k: BlockRef.from_json(v) for k, v in cm["blocks"].items()}
        validity_buf = None
        if "validity" in refs:
            validity_buf = pa.py_buffer(_get_block(f, refs["validity"], verify_crc, codec))
        pa_type = getattr(pa, _PA_TYPES[cm["type"]])()

        if cm["type"] == "utf8":
            if cm["dict"]:
                idx = np.frombuffer(_get_block(f, refs["indices"], verify_crc, codec), dtype="<u4", count=rows)
                d_offs = _get_block(f, refs["dict_offsets"], verify_crc, codec)
                d_blob = _get_block(f, refs["dict_blob"], verify_crc, codec)
                n_dict = len(d_offs) // 4 - 1
                dict_arr = pa.StringArray.from_buffers(
                    n_dict, pa.py_buffer(d_offs), pa.py_buffer(d_blob)
                )
                indices = pa.Array.from_buffers(
                    pa.int32(), rows, [validity_buf, pa.py_buffer(idx.astype("<i4").tobytes())]
                )
                arr = pa.DictionaryArray.from_arrays(indices, dict_arr).cast(pa.string())
            else:
                offs = _get_block(f, refs["offsets"], verify_crc, codec)
                blob = _get_block(f, refs["blob"], verify_crc, codec)
                np_offs = np.frombuffer(offs, dtype="<u4", count=rows + 1)
                arr = pa.StringArray.from_buffers(
                    rows, pa.py_buffer(np_offs.astype("<i4").tobytes()), pa.py_buffer(blob), validity_buf
                )
        else:
            raw = _get_block(f, refs["data"], verify_crc, codec)
            if cm["type"] == "bool":
                # stored as u1 bytes; Arrow wants bit-packed values
                vals = np.frombuffer(raw, dtype="u1", count=rows)
                data_buf = pa.py_buffer(np.packbits(vals.astype(bool), bitorder="little").tobytes())
            else:
                data_buf = pa.py_buffer(raw)
            arr = pa.Array.from_buffers(pa_type, rows, [validity_buf, data_buf])

        arrays.append(arr)
        nullable = cm["nullable"] if nullable_override is None else nullable_override[name]
        fields.append(pa.field(name, pa_type, nullable=bool(nullable)))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


# ---------------------------------------------------------------------------
# Stats-based pruning (file skipping under pushed filters)
# ---------------------------------------------------------------------------


def file_may_match(meta: dict, filters: Sequence[Any]) -> bool:
    """Conservative stats check: False only when some pushed filter PROVES the
    file has no matching rows. ``filters`` are pyspark.sql.datasource Filter
    dataclasses; unknown filter shapes are ignored (treated as may-match).

    Row-grouped files match iff ANY group may match — per-group stats are
    strictly tighter than the merged file-level stats, and per-group blooms
    exist where the merged entry has none."""
    if meta.get("row_groups"):
        return any(
            _stats_may_match(g["columns"], g["rows"], filters) for g in meta["row_groups"]
        )
    return _stats_may_match(meta["columns"], meta["rows"], filters)


def _stats_may_match(columns_meta: Sequence[dict], rows: int, filters: Sequence[Any]) -> bool:
    """``file_may_match`` core over one block set's column metadata — used
    per file (ungrouped) and per row group (grouped)."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        IsNotNull,
        LessThan,
        LessThanOrEqual,
    )

    stats_by_col: Dict[str, dict] = {}
    nulls_by_col: Dict[str, int] = {}
    bloom_by_col: Dict[str, tuple] = {}
    dvs_by_col: Dict[str, set] = {}
    for c in columns_meta:
        if c.get("stats"):
            stats_by_col[c["name"]] = c["stats"]
        if c.get("bloom"):
            bloom_by_col[c["name"]] = (c["bloom"], c["type"])
        if c.get("dvs") is not None:
            dvs_by_col[c["name"]] = set(c["dvs"])
        nulls_by_col[c["name"]] = c.get("null_count", 0)

    for flt in filters:
        col = flt.attribute[0] if getattr(flt, "attribute", None) else None
        if col is None:
            continue
        st = stats_by_col.get(col)
        if isinstance(flt, IsNotNull):
            if rows and nulls_by_col.get(col, 0) == rows:
                return False
            continue
        # Distinct-value-set check first: EXACT membership proof for = / IN
        # on low-NDV string columns — prunes where the Bloom check below can
        # only say "probably present" (its false positives keep the group)
        # and min/max only bounds the range. String probes only: a non-string
        # probe on a utf8 column can't have been pushed from a typed plan.
        dv = dvs_by_col.get(col)
        if dv is not None:
            if isinstance(flt, EqualTo) and isinstance(flt.value, str) and flt.value not in dv:
                return False
            if isinstance(flt, In):
                str_probes = [v for v in flt.value if isinstance(v, str)]
                if len(str_probes) == len(flt.value) and not (set(str_probes) & dv):
                    return False
        # Bloom check for point lookups: skips files whose key RANGE overlaps
        # but which provably lack the value — the case min/max can't prune.
        bl = bloom_by_col.get(col)
        if bl is not None:
            bloom, tname = bl
            try:
                if isinstance(flt, EqualTo) and not bloom_contains(bloom, flt.value, tname):
                    return False
                if isinstance(flt, In) and not any(
                    bloom_contains(bloom, v, tname) for v in flt.value
                ):
                    return False
            except (TypeError, ValueError):
                pass  # incomparable probe type → fall through to stats
        if st is None:
            continue
        # "max" may be absent (upper-bound truncation gave up) → unbounded
        mn, mx = st["min"], st.get("max")
        try:
            if isinstance(flt, EqualTo) and not (mn <= flt.value and (mx is None or flt.value <= mx)):
                return False
            if isinstance(flt, GreaterThan) and not (mx is None or mx > flt.value):
                return False
            if isinstance(flt, GreaterThanOrEqual) and not (mx is None or mx >= flt.value):
                return False
            if isinstance(flt, LessThan) and not (mn < flt.value):
                return False
            if isinstance(flt, LessThanOrEqual) and not (mn <= flt.value):
                return False
            if isinstance(flt, In) and not any(
                mn <= v and (mx is None or v <= mx) for v in flt.value
            ):
                return False
        except TypeError:
            continue  # incomparable types (e.g. str filter on numeric stats)
    return True
