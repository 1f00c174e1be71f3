"""Spark Python DataSource V2 for the SCBF columnar format.

Registers format ``"scbf"`` so the full DataFrame API works against SCBF data:

    spark.dataSource.register(ScbfDataSource)
    df = spark.read.format("scbf").load("/data/dir-or-file")
    df.select("a", "b").filter(...).groupBy(...)...
    df.write.format("scbf").mode("overwrite").save("/out/dir")

Design (Spark-first, NOT a translation of the reference's single-file engine):

- **Dataset = directory of SCBF files** (or one file for reference compat).
  A 100 TB dataset is many files; each file is one input partition, so a
  1000-executor cluster reads them fully in parallel. The reference's
  single-file, absolute-offset layout (reference SPEC.md:18-26) cannot be
  appended to concurrently, so parallel writes emit one ``part-*.scbf`` per
  Spark partition — the same files-per-partition strategy Parquet uses.
- **Projection pushdown to the storage layer** — the format's raison d'être
  (reference reader.py:111-133): ``read()`` decompresses only the columns in
  the schema Spark hands to ``DataSource.reader(schema)``. Whether Catalyst
  prunes that schema or not, the ``columns`` read option always prunes
  explicitly, and the codec never touches unrequested blocks.
- **Arrow exchange** — ``read()`` yields ``pyarrow.RecordBatch`` (SCBF's utf8
  layout is Arrow's StringArray layout, so strings transfer without per-value
  copying); the writer is a ``DataSourceArrowWriter``.
- **Commit protocol** — writers emit to hidden ``.tmp-<uuid>.scbf`` names and
  ``commit()`` renames them, so failed/speculative tasks never leave partial
  files visible.
"""

from __future__ import annotations

import glob as _glob
import os
import re
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..scbf import codec, codec_v2

SPARK_TYPE_FOR_CODE = {
    codec.TYPE_INT32: IntegerType(),
    codec.TYPE_FLOAT64: DoubleType(),
    codec.TYPE_UTF8: StringType(),
}

SPARK_TYPE_FOR_V2 = {
    "int32": IntegerType(),
    "int64": LongType(),
    "float64": DoubleType(),
    "bool": BooleanType(),
    "utf8": StringType(),
}


def _file_version(path: str) -> int:
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic == codec_v2.MAGIC_V2:
        return 2
    if magic == codec.MAGIC:
        return 1
    raise codec.ScbfError(f"{path}: not an SCBF file")


def _under_scratch(root: str, file_path: str) -> bool:
    """True when any directory component of ``file_path`` below ``root`` is a
    maintenance scratch dir (hidden, or suffixed ``*.merge-tmp``/``-old`` /
    ``*.compact-tmp``/``-old``). New scratch is dot-prefixed (invisible to
    glob already); this also shields against legacy visible staging dirs, so
    a crashed or concurrent compaction can never be ingested as data rows."""
    from ..operators._staging import is_scratch_component

    rel = os.path.relpath(os.path.abspath(file_path), os.path.abspath(root))
    comps = rel.split(os.sep)[:-1]  # directory components only
    return any(is_scratch_component(c) for c in comps)


def _list_scbf_files(
    path: str, snapshot: Optional[str] = None, files: Optional[str] = None
) -> List[str]:
    """Resolve a load path to concrete SCBF files: a single file, a directory
    of ``*.scbf`` (searched recursively, so hive-partitioned ``k=v`` subdirs
    are included), or a glob pattern. Maintenance scratch directories
    (``.k=v.compact-tmp`` siblings and legacy in-tree staging) are never
    listed — see ``operators/_staging.py``. With ``snapshot``, the listing
    comes from the pinned manifest instead (time travel — see
    ``operators/snapshot.py``)."""
    if snapshot is not None and files is not None:
        # both pin the file set; silently preferring one would read a set the
        # caller didn't ask for
        raise ValueError(
            "options 'snapshot' and 'files' both pin the file set — pass only one"
        )
    if snapshot is not None:
        from ..operators.snapshot import snapshot_files

        return snapshot_files(path, snapshot)
    if files is not None:
        # explicit file pinning (comma-separated paths relative to the
        # dataset root) — the snapshot change feed and external manifest
        # integrations use this; missing files fail loudly like snapshots do.
        # Entries must resolve INSIDE the root: an absolute path or a '..'
        # component would let a read option pull arbitrary host files into
        # the dataset, so those are rejected.
        root = os.path.abspath(path)
        out = []
        for p in files.split(","):
            if not p:
                continue
            if os.path.isabs(p):
                raise ValueError(f"pinned file {p!r} is absolute — paths must be relative to {root}")
            resolved = os.path.abspath(os.path.join(root, p))
            if os.path.commonpath([root, resolved]) != root:
                raise ValueError(f"pinned file {p!r} escapes the dataset root {root}")
            out.append(resolved)
        missing = [p for p in out if not os.path.isfile(p)]
        if missing:
            raise FileNotFoundError(f"pinned files do not exist: {missing[:5]}")
        return sorted(out)
    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        files = sorted(
            f
            for f in _glob.glob(os.path.join(path, "**", "*.scbf"), recursive=True)
            if not _under_scratch(path, f)
        )
        if not files:
            raise FileNotFoundError(f"no *.scbf files under directory {path}")
        return files
    files = sorted(_glob.glob(path))
    if not files:
        raise FileNotFoundError(f"no SCBF files match {path}")
    return files


def _partition_spec(root: str, file_path: str) -> "OrderedDict[str, str]":
    """Hive-style partition values encoded in the directory path between the
    dataset root and the file: ``root/region=EU/year=2024/part-x.scbf`` →
    ``{region: EU, year: 2024}`` (values URL-unquoted)."""
    from collections import OrderedDict
    from urllib.parse import unquote

    spec: "OrderedDict[str, str]" = OrderedDict()
    if not os.path.isdir(root):
        return spec
    rel = os.path.relpath(os.path.dirname(os.path.abspath(file_path)), os.path.abspath(root))
    if rel == ".":
        return spec
    from ..operators._staging import is_scratch_component

    for comp in rel.split(os.sep):
        if is_scratch_component(comp):
            # maintenance scratch (".k=v.compact-tmp" etc.) is never a
            # partition component; the file lister excludes these paths, and
            # skipping here keeps a directly-loaded scratch file from
            # corrupting partition values (e.g. int key -> string)
            continue
        if "=" not in comp:
            raise codec.ScbfError(
                f"{file_path}: directory component {comp!r} under dataset root is not "
                "hive-style 'key=value' — mixed layouts are not supported"
            )
        k, _, v = comp.partition("=")
        spec[k] = unquote(v)
    return spec


def _dataset_layout(path: str, snapshot: Optional[str] = None, files_opt: Optional[str] = None):
    """(files, partition keys, per-key python type, per-file typed values).

    Partition keys must be identical (same names, same order) for every file.
    A key is typed int when every file's value parses as an int, else str —
    the same inference Spark applies to parquet partition directories."""
    files = _list_scbf_files(path, snapshot, files_opt)
    raw_specs = [_partition_spec(path, f) for f in files]
    keys = list(raw_specs[0].keys())
    for f, s in zip(files, raw_specs):
        if list(s.keys()) != keys:
            raise codec.ScbfError(
                f"inconsistent partition directories: {f} has keys {list(s.keys())}, "
                f"expected {keys}"
            )
    # Strict digit check: bare int() also accepts '1_0', ' 7', '+5' and
    # non-ASCII digits, which would corrupt string partition values on read
    # (int('1_0') == 10). Mirror Spark's parquet inference: optional sign +
    # ASCII digits only.
    _int_re = re.compile(r"^-?[0-9]+$")
    key_types = {}
    for k in keys:
        if all(_int_re.match(s[k]) for s in raw_specs):
            key_types[k] = int
        else:
            key_types[k] = str
    typed = [
        {k: key_types[k](s[k]) for k in keys}
        for s in raw_specs
    ]
    return files, keys, key_types, dict(zip(files, typed))


def _partition_may_match(values: dict, filters) -> bool:
    """Partition pruning: False only when a pushed filter on a partition
    column PROVES this file's directory can't match. Unknown filter shapes
    are ignored (may-match); Spark re-applies every filter above the scan
    anyway, so this is purely an I/O optimization."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        IsNull,
        LessThan,
        LessThanOrEqual,
    )

    for flt in filters:
        col = flt.attribute[0] if getattr(flt, "attribute", None) else None
        if col is None or col not in values:
            continue
        v = values[col]
        try:
            if isinstance(flt, IsNull):
                return False  # directory-encoded partition values are never null
            if isinstance(flt, EqualTo) and v != flt.value:
                return False
            if isinstance(flt, GreaterThan) and not (v > flt.value):
                return False
            if isinstance(flt, GreaterThanOrEqual) and not (v >= flt.value):
                return False
            if isinstance(flt, LessThan) and not (v < flt.value):
                return False
            if isinstance(flt, LessThanOrEqual) and not (v <= flt.value):
                return False
            if isinstance(flt, In) and v not in flt.value:
                return False
        except TypeError:
            continue
    return True


def _schema_of_file(path: str) -> StructType:
    if _file_version(path) == 2:
        # Dataset-level nullability must be True even when the sampled file
        # happens to contain no nulls: a sibling partition file may carry
        # nulls in the same column, and a nullable=False schema would make
        # Spark's Arrow accessors crash on them. This mirrors Spark's own
        # Parquet behavior (dataset schemas are always nullable).
        meta = codec_v2.read_meta(path)
        return StructType(
            [
                StructField(c["name"], SPARK_TYPE_FOR_V2[c["type"]], nullable=True)
                for c in meta["columns"]
            ]
        )
    with open(path, "rb") as f:
        info = codec.read_file_info(f)
    return StructType(
        [
            StructField(m.name, SPARK_TYPE_FOR_CODE[m.type_code], nullable=False)
            for m in info.columns
        ]
    )


class ScbfFilePartition(InputPartition):
    def __init__(
        self,
        file_path: str,
        part_values: dict | None = None,
        groups: list | None = None,
        n_rows: int | None = None,
    ):
        self.file_path = file_path
        self.part_values = part_values or {}
        # groups: row-group indices this split covers (None = whole file);
        # n_rows: their row count, so column-less projections need no re-read
        self.groups = groups
        self.n_rows = n_rows


class ScbfReader(DataSourceReader):
    """One input partition per SCBF file; pruned Arrow-batch reads.

    v2 files additionally support **filter-pushdown file skipping**:
    ``pushFilters`` records Spark's pushed predicates, and ``partitions()``
    drops every file whose footer min/max stats prove it cannot match — the
    DataSource-level analog of Parquet row-group pruning. All filters are
    returned to Spark (we skip whole files, Spark still filters rows), so
    semantics never depend on the stats."""

    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.path = options.get("path")
        if self.path is None:
            raise ValueError("scbf read requires a path: .load('/path/to/data')")
        # ``read()`` must yield exactly the schema negotiated by
        # ``DataSource.schema()`` (Spark enforces arity) — the ``columns``
        # projection option is therefore applied in ``schema()``, and here we
        # simply read whatever columns that schema carries.
        self.columns: List[str] = [f.name for f in schema.fields]
        self.verify_crc = options.get("verify_crc", "true").lower() != "false"
        self.file_skipping = options.get("file_skipping", "true").lower() != "false"
        # files at least this big are split into one input partition per row
        # group (when grouped); below it, one partition per file and no
        # planning-time footer read on unfiltered scans
        self.split_bytes = int(options.get("split_bytes", str(32 * 1024 * 1024)))
        self.snapshot = options.get("snapshot")
        self.files_opt = options.get("files")
        self._filters: List = []

    def pushFilters(self, filters):
        self._filters = list(filters)
        return filters  # Spark re-applies everything; stats only skip files

    def partitions(self) -> Sequence[InputPartition]:
        # Lifecycle note: every planning cycle runs in a fresh Python worker
        # with a fresh reader (pushFilters → partitions in one shot), so
        # self._filters is always this plan's filters. HOWEVER, the JVM's
        # PythonDataSourceV2 caches the resulting readInfo per relation: a
        # later FILTERLESS query on the same DataFrame object reuses the
        # previous query's pruned partition list (upstream limitation of
        # Python-data-source pushdown, pinned in
        # tests/test_datasource.py::test_stale_scan_reuse_upstream_behavior).
        # Use a fresh spark.read per differently-filtered query, or disable
        # skipping with .option("file_skipping", "false").
        filters = self._filters if self.file_skipping else []
        files, _keys, _types, specs = _dataset_layout(self.path, self.snapshot, self.files_opt)
        # Partition pruning first (cheapest: no file I/O at all).
        candidates = [
            p
            for p in files
            if not (filters and specs[p] and not _partition_may_match(specs[p], filters))
        ]
        # Footer reads (one ranged read per v2 file needing stats pruning or
        # split planning) are I/O-bound and independent — fetch them with a
        # thread pool, the way Parquet parallelizes driver-side footer reads.
        # Serial, a filtered plan over 100k files is tens of seconds of
        # planning; threaded it's bounded by storage round-trips / 16.
        def _meta_of(p: str):
            if (filters or os.path.getsize(p) >= self.split_bytes) and _file_version(p) == 2:
                return codec_v2.read_meta(p)
            return None

        if len(candidates) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(16, len(candidates))) as pool:
                metas = list(pool.map(_meta_of, candidates))
        else:
            metas = [_meta_of(p) for p in candidates]

        parts = []
        for p, meta in zip(candidates, metas):
            spec = specs[p]
            if filters and meta is not None and not codec_v2.file_may_match(meta, filters):
                continue
            # Row-group SPLITTING: a big compacted file becomes one input
            # partition per surviving group, so a single file scans in
            # parallel across executors (Parquet's split model). Gated on
            # file size so planning a many-small-files dataset stays one
            # stat() per file with no footer reads.
            groups = None if meta is None else meta.get("row_groups")
            if groups and len(groups) > 1 and os.path.getsize(p) >= self.split_bytes:
                for i, g in enumerate(groups):
                    if filters and not codec_v2._stats_may_match(
                        g["columns"], g["rows"], filters
                    ):
                        continue
                    parts.append(ScbfFilePartition(p, spec, groups=[i], n_rows=g["rows"]))
            else:
                parts.append(ScbfFilePartition(p, spec))
        # An all-files-skipped scan still needs one (empty) partition so the
        # negotiated schema flows through.
        return parts or [ScbfFilePartition("")]

    def read(self, partition: ScbfFilePartition):
        # Same filters that pruned whole files also prune row GROUPS inside
        # each surviving v2 file (codec_v2.read_arrow_table skips groups
        # whose stats/blooms prove no match — Parquet row-group pruning).
        yield from _read_file_partition(
            partition,
            self.schema,
            self.verify_crc,
            self._filters if self.file_skipping else (),
        )


def _merged_schema(files: Sequence[str]) -> StructType:
    """Union of all files' schemas in first-seen column order, every field
    nullable (files that predate a column back-fill nulls on read). Same-name
    fields must agree on type — widening casts are the caller's job."""
    fields: dict[str, StructField] = {}
    for p in files:
        for f in _schema_of_file(p).fields:
            prev = fields.get(f.name)
            if prev is None:
                fields[f.name] = StructField(f.name, f.dataType, nullable=True)
            elif prev.dataType != f.dataType:
                raise codec.ScbfError(
                    f"merge_schemas type conflict on column {f.name!r}: "
                    f"{prev.dataType} vs {f.dataType} in {p}"
                )
    return StructType(list(fields.values()))


def _file_column_info(path: str) -> tuple[set, int]:
    """(column names, row count) from a file's footer/header — no data I/O."""
    if _file_version(path) == 2:
        meta = codec_v2.read_meta(path)
        return {c["name"] for c in meta["columns"]}, meta["rows"]
    with open(path, "rb") as f:
        info = codec.read_file_info(f)
    return {m.name for m in info.columns}, info.total_rows


def _pa_type_for_spark(dt):
    import pyarrow as pa

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        IntegerType,
        LongType,
        StringType,
    )

    for spark_t, pa_t in (
        (IntegerType, pa.int32()),
        (LongType, pa.int64()),
        (DoubleType, pa.float64()),
        (BooleanType, pa.bool_()),
        (StringType, pa.string()),
    ):
        if isinstance(dt, spark_t):
            return pa_t
    raise ValueError(f"no arrow type for spark type {dt}")


def _read_file_partition(
    partition: ScbfFilePartition, schema: StructType, verify_crc: bool, filters=()
):
    """Decode one SCBF file partition to Arrow batches, attaching directory-
    encoded partition columns as constants and back-filling typed nulls for
    columns the file predates (schema evolution under merge_schemas). Shared
    by the batch and streaming readers."""
    import pyarrow as pa

    if not partition.file_path:
        return
    columns = [f.name for f in schema.fields]
    spark_types = {f.name: f.dataType for f in schema.fields}
    part_values = partition.part_values
    file_cols = [c for c in columns if c not in part_values]
    avail, n = _file_column_info(partition.file_path)
    present = [c for c in file_cols if c in avail]
    missing = [c for c in file_cols if c not in avail]
    is_v2 = _file_version(partition.file_path) == 2
    if present:
        if is_v2:
            table = codec_v2.read_arrow_table(
                partition.file_path, present, verify_crc=verify_crc,
                filters=list(filters) or None,
                group_indices=partition.groups,
            )
        else:
            table = codec.read_arrow_table(partition.file_path, present)
        n = table.num_rows
    else:
        # No data blocks needed (partition-only / all-evolved projection):
        # just the row count — the split's own count for a row-group
        # partition, the footer total (already in hand) otherwise.
        table = None
        if partition.groups is not None:
            n = partition.n_rows
    if part_values or missing:
        # Assemble in negotiated column order: file data, constant partition
        # values, and typed nulls for evolved columns this file predates.
        arrays = []
        for c in columns:
            if c in part_values:
                v = part_values[c]
                typ = pa.int64() if isinstance(v, int) else pa.string()
                # constant column without an n-element Python list round-trip
                arrays.append(pa.repeat(pa.scalar(v, type=typ), n))
            elif c in missing:
                arrays.append(pa.nulls(n, _pa_type_for_spark(spark_types[c])))
            else:
                arrays.append(table.column(c))
        table = pa.table(dict(zip(columns, arrays)))
    for batch in table.to_batches(max_chunksize=1 << 16):
        yield batch


@dataclass
class ScbfCommitMessage(WriterCommitMessage):
    # (tmp, final) per file this task wrote — one pair normally, one pair per
    # partition value combo under partition_by.
    files: tuple = ()
    rows: int = 0


class ScbfWriter(DataSourceArrowWriter):
    """One SCBF file per Spark partition, written via a tmp-name commit
    protocol (write hidden, rename on commit) so aborted tasks leave nothing
    visible. Single-file reference-compat output = ``df.coalesce(1)`` first."""

    def __init__(self, schema: StructType, options, overwrite: bool):
        self.schema = schema
        self.path = options.get("path")
        if self.path is None:
            raise ValueError("scbf write requires a path: .save('/path/to/dir')")
        self.level = int(options.get("compression_level", codec.DEFAULT_ZLIB_LEVEL))
        self.version = int(options.get("version", "1"))
        bloom_opt = options.get("bloom_filters", "")
        self.bloom_columns: List[str] = [c.strip() for c in bloom_opt.split(",") if c.strip()]
        if self.bloom_columns and self.version != 2:
            raise ValueError("bloom_filters requires .option('version', '2')")
        self.max_records_per_file = int(options.get("max_records_per_file", "0"))
        if self.max_records_per_file < 0:
            raise ValueError("max_records_per_file must be >= 0 (0 = unlimited)")
        self.rows_per_group = int(options.get("rows_per_group", "0")) or None
        if self.rows_per_group is not None:
            if self.version != 2:
                raise ValueError("rows_per_group requires .option('version', '2')")
            if self.rows_per_group < 0:
                raise ValueError("rows_per_group must be >= 0 (0 = one group per file)")
        self.codec = options.get("codec", "zlib")
        if self.codec != "zlib":
            if self.version != 2:
                raise ValueError("codec requires .option('version', '2') (v1 is zlib-only)")
            if self.codec not in codec_v2.BLOCK_CODECS:
                raise ValueError(
                    f"unknown codec {self.codec!r}; have {sorted(codec_v2.BLOCK_CODECS)}"
                )
        self.overwrite = overwrite
        part_opt = options.get("partition_by", "")
        self.partition_by: List[str] = [c.strip() for c in part_opt.split(",") if c.strip()]
        by_name = {f.name: f for f in schema.fields}
        for c in self.partition_by:
            if c not in by_name:
                raise ValueError(f"partition_by column {c!r} not in schema")
            if not isinstance(by_name[c].dataType, (IntegerType, LongType, StringType)):
                raise ValueError(
                    f"partition_by column {c!r} must be int/long/string "
                    f"(got {by_name[c].dataType.simpleString()})"
                )
        data_fields = [f for f in schema.fields if f.name not in self.partition_by]
        if not data_fields:
            raise ValueError("partition_by cannot cover every column")
        data_by_name = {f.name: f for f in data_fields}
        for c in self.bloom_columns:
            if c not in data_by_name:
                raise ValueError(f"bloom_filters column {c!r} not in data columns")
            if not isinstance(data_by_name[c].dataType, (IntegerType, LongType, StringType)):
                raise ValueError(
                    f"bloom_filters column {c!r} must be int/long/string "
                    f"(got {data_by_name[c].dataType.simpleString()})"
                )
        if self.version == 2:
            ok = (IntegerType, LongType, DoubleType, BooleanType, StringType)
            for f in data_fields:
                if not isinstance(f.dataType, ok):
                    raise ValueError(
                        f"column {f.name!r}: {f.dataType.simpleString()} is not representable "
                        "in SCBF v2 (int32/int64/float64/bool/utf8) — cast first"
                    )
        elif self.version == 1:
            for f in data_fields:
                if not isinstance(f.dataType, (IntegerType, DoubleType, StringType)):
                    raise ValueError(
                        f"column {f.name!r}: {f.dataType.simpleString()} is not representable "
                        "in SCBF v1 (int32/float64/utf8 only) — cast, or write with "
                        ".option('version', '2')"
                    )
        else:
            raise ValueError(f"unknown scbf version {self.version} (1 or 2)")

    def _write_one(self, directory: str, table) -> tuple:
        os.makedirs(directory, exist_ok=True)
        file_id = uuid.uuid4().hex[:12]
        tmp = os.path.join(directory, f".tmp-{file_id}.scbf")
        final = os.path.join(directory, f"part-{file_id}.scbf")
        if self.version == 2:
            codec_v2.write_arrow_table(
                tmp, table, self.level, bloom_columns=self.bloom_columns, codec=self.codec,
                rows_per_group=self.rows_per_group,
            )
        else:
            codec.write_arrow_table(tmp, table, self.level)
        return (tmp, final)

    def _write_sized(self, directory: str, table) -> list:
        """One file per ``max_records_per_file`` slice (zero-copy Arrow
        slices), or a single file when unset — the parquet-writer knob that
        keeps file sizes bounded no matter how large a task's partition is."""
        if not self.max_records_per_file or table.num_rows <= self.max_records_per_file:
            return [self._write_one(directory, table)]
        step = self.max_records_per_file
        return [
            self._write_one(directory, table.slice(off, step))
            for off in range(0, table.num_rows, step)
        ]

    def write(self, iterator: Iterator) -> ScbfCommitMessage:
        import pyarrow as pa
        import pyarrow.compute as pc

        batches = list(iterator)
        if not batches:
            return ScbfCommitMessage(files=(), rows=0)
        table = pa.Table.from_batches(batches)
        if not self.partition_by:
            return ScbfCommitMessage(
                files=tuple(self._write_sized(self.path, table)), rows=table.num_rows
            )

        # Hive-layout write: one file per distinct partition-value combo seen
        # by this task, under k=v directories; partition columns live in the
        # path, not the file (so a reader reconstructs them for free and
        # prunes directories without any I/O). Same layout contract as
        # df.write.partitionBy for parquet — at scale, repartition() by the
        # same keys first so each combo lands in few tasks.
        from urllib.parse import quote

        combos = table.select(self.partition_by).group_by(self.partition_by).aggregate([])
        files = []
        data_cols = [c for c in table.column_names if c not in self.partition_by]
        for i in range(combos.num_rows):
            vals = {k: combos.column(k)[i].as_py() for k in self.partition_by}
            if any(v is None for v in vals.values()):
                raise codec.ScbfError(
                    "null partition value: hive directory layout cannot encode "
                    f"nulls (combo {vals})"
                )
            mask = None
            for k, v in vals.items():
                eq = pc.equal(table.column(k), pa.scalar(v, type=table.column(k).type))
                mask = eq if mask is None else pc.and_(mask, eq)
            sub = table.filter(mask).select(data_cols)
            directory = os.path.join(
                self.path, *[f"{k}={quote(str(v), safe='')}" for k, v in vals.items()]
            )
            files.extend(self._write_sized(directory, sub))
        return ScbfCommitMessage(files=tuple(files), rows=table.num_rows)

    def commit(self, messages):
        if self.overwrite:
            for old in _glob.glob(os.path.join(self.path, "**", "part-*.scbf"), recursive=True):
                os.unlink(old)
        for m in messages:
            for tmp, final in (m.files if m else ()):
                os.replace(tmp, final)

    def abort(self, messages):
        for m in messages:
            for tmp, _final in (m.files if m else ()):
                if os.path.exists(tmp):
                    os.unlink(tmp)


class ScbfStreamReader(DataSourceStreamReader):
    """Structured Streaming source over an append-only SCBF directory.

    Offsets are positions in the file list sorted by **basename** (path as
    tiebreak): ``{"count": N, "last": <basename>}`` means the first N files
    in that order are processed. Basename order makes hive-partitioned
    output safe — the sink's ``part-b<batchId>-*`` names are monotonic
    across batches no matter which ``k=v`` directory a file lands in,
    whereas full-path order would interleave later batches into
    earlier-sorting directories. New files must sort after every processed
    file; a violation is detected via ``last`` and fails loudly rather than
    misreading. One input partition per new file, so a microbatch's files
    decode fully in parallel. The dataset must contain at least one file
    when the stream starts (schema comes from it)."""

    def __init__(self, schema: StructType, options):
        self.path = options.get("path")
        if self.path is None:
            raise ValueError("scbf readStream requires a path: .load('/path/to/data')")
        self.schema = schema
        self.columns: List[str] = [f.name for f in schema.fields]
        self.verify_crc = options.get("verify_crc", "true").lower() != "false"

    def _files(self) -> List[str]:
        try:
            files = _list_scbf_files(self.path)
        except FileNotFoundError:
            return []
        return sorted(files, key=lambda p: (os.path.basename(p), p))

    def initialOffset(self) -> dict:
        return {"count": 0, "last": ""}

    def latestOffset(self) -> dict:
        files = self._files()
        return {"count": len(files), "last": os.path.basename(files[-1]) if files else ""}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        files = self._files()
        lo, hi = start["count"], min(end["count"], len(files))
        if lo and (lo > len(files) or os.path.basename(files[lo - 1]) != start["last"]):
            raise codec.ScbfError(
                f"streaming offset desync at {self.path}: processed file "
                f"{start['last']!r} is no longer at sorted position {lo} — files "
                "were removed or a new file sorted into the processed prefix "
                "(streaming reads require append-only, monotonically-named files)"
            )
        _f, _keys, _types, specs = _dataset_layout(self.path) if files else ([], [], {}, {})
        parts = [ScbfFilePartition(p, specs.get(p)) for p in files[lo:hi]]
        return parts or [ScbfFilePartition("")]

    def read(self, partition: ScbfFilePartition):
        yield from _read_file_partition(partition, self.schema, self.verify_crc)

    def commit(self, end: dict) -> None:
        pass  # offsets are positional; nothing to clean up


class ScbfStreamWriter(DataSourceStreamArrowWriter):
    """Structured Streaming sink for SCBF: each microbatch's tasks write
    hidden tmp files (delegating to the batch writer, so compression/version/
    partition_by options all apply), and ``commit(batchId)`` renames them to
    ``part-b<batchId>-r<runId>-*`` names, in ascending final-name order so a
    concurrent tailing ``readStream`` only ever observes a sorted prefix of
    the batch. Spark-level re-commits of the same batch within one query run
    first delete that (batch, run)'s previously-visible files, making the
    commit idempotent. The run id scopes the delete: a NEW query writing
    into the same directory must never clobber a previous run's committed
    batch 0 (that would be silent data loss). The narrow trade-off: a driver
    crash *mid-commit* followed by a checkpoint-recovered replay is a new
    run and can leave the crashed attempt's partial files as duplicates —
    eliminating that too requires a Parquet-sink-style `_spark_metadata`
    commit log (future work, noted in README)."""

    def __init__(self, schema: StructType, options, overwrite: bool):
        if overwrite:
            raise ValueError(
                "scbf streaming sink supports outputMode('append') only — "
                "complete/truncate semantics cannot be expressed by an "
                "append-only file sink"
            )
        # Reuse the batch writer wholesale: same validation, same tmp-name
        # write path, same partition_by splitting.
        self._inner = ScbfWriter(schema, options, overwrite=False)
        self.path = self._inner.path
        self.run_id = uuid.uuid4().hex[:8]

    def write(self, iterator):
        return self._inner.write(iterator)

    def _batch_final(self, final: str, batch_id: int) -> str:
        d, base = os.path.split(final)
        return os.path.join(d, f"part-b{batch_id:06d}-r{self.run_id}-{base[len('part-'):]}")

    def commit(self, messages, batchId: int) -> None:
        stale = _glob.glob(
            os.path.join(self.path, "**", f"part-b{batchId:06d}-r{self.run_id}-*.scbf"),
            recursive=True,
        )
        for s in stale:
            os.unlink(s)
        renames = sorted(
            ((self._batch_final(final, batchId), tmp)
             for m in messages
             for tmp, final in (m.files if m else ())),
            key=lambda t: (os.path.basename(t[0]), t[0]),  # reader's sort order
        )
        for final, tmp in renames:
            os.replace(tmp, final)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            for tmp, _final in (m.files if m else ()):
                if os.path.exists(tmp):
                    os.unlink(tmp)


class ScbfDataSource(DataSource):
    """Python DataSource V2 for format ``"scbf"``.

    Read options: ``columns`` (comma-separated explicit projection),
    ``verify_crc`` (v2, default true), ``snapshot`` (id or tag — time-travel
    read pinned to a manifest from ``operators/snapshot.py``).
    Write options: ``compression_level`` (zlib 0-9, default 6), ``version``
    (1 or 2), ``partition_by`` (comma-separated columns → hive ``k=v``
    directory layout; readers reconstruct the columns from the path and
    prune whole directories on pushed filters without touching a file),
    ``bloom_filters`` (v2, comma-separated int/string columns → per-file
    Bloom filters in the footer; ``=``/``IN`` predicates then skip files
    whose key range overlaps but which provably lack the value),
    ``codec`` (v2 block compression: zlib default, bz2/lzma for colder
    data & better ratios, none for decode-CPU-bound hot data),
    ``max_records_per_file`` (split each task's output into bounded-size
    files — the parquet-writer knob; 0/unset = one file per partition).
    """

    @classmethod
    def name(cls) -> str:
        return "scbf"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if path is None:
            raise ValueError("scbf requires a path")
        files, keys, key_types, _specs = _dataset_layout(
            path, self.options.get("snapshot"), self.options.get("files")
        )
        if self.options.get("merge_schemas", "false").lower() == "true":
            # Schema evolution: union of every file's schema, first-seen
            # column order, all nullable (older files back-fill nulls at
            # read). Same contract as parquet's mergeSchema; off by default
            # because it reads every footer at planning time.
            full = _merged_schema(files)
        else:
            full = _schema_of_file(files[0])
        if keys:
            # Hive-partitioned dataset: directory-encoded columns come after
            # the file columns, like Spark's parquet source.
            full = StructType(
                list(full.fields)
                + [
                    StructField(k, LongType() if key_types[k] is int else StringType(), True)
                    for k in keys
                ]
            )
        cols_opt = self.options.get("columns")
        if not cols_opt:
            return full
        # Explicit storage-level projection: pruning the *negotiated* schema is
        # what keeps unrequested column blocks untouched on disk (the Python
        # DSv2 API has no SupportsPushDownRequiredColumns hook yet, so Catalyst
        # prunes above the scan; this option prunes *at* the scan).
        by_name = {f.name: f for f in full.fields}
        missing = [c.strip() for c in cols_opt.split(",") if c.strip() not in by_name]
        if missing:
            raise ValueError(f"columns option names unknown columns {missing}")
        return StructType([by_name[c.strip()] for c in cols_opt.split(",")])

    def reader(self, schema: StructType) -> ScbfReader:
        return ScbfReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> ScbfWriter:
        return ScbfWriter(schema, self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> ScbfStreamWriter:
        return ScbfStreamWriter(schema, self.options, overwrite)

    def streamReader(self, schema: StructType) -> ScbfStreamReader:
        return ScbfStreamReader(schema, self.options)


def register(spark) -> None:
    """Idempotently register the scbf format on a SparkSession."""
    from ..shipping import ensure_worker_imports

    ensure_worker_imports(spark)
    try:
        # Required for pushFilters() to reach the reader (v2 stats skipping).
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # static conf in some deployments; reader then sees no filters
    spark.dataSource.register(ScbfDataSource)
