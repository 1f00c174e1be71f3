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
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
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


def _list_scbf_files(path: str) -> List[str]:
    """Resolve a load path to concrete SCBF files: a single file, a directory
    of ``*.scbf``, or a glob pattern."""
    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.scbf")))
        if not files:
            raise FileNotFoundError(f"no *.scbf files under directory {path}")
        return files
    files = sorted(_glob.glob(path))
    if not files:
        raise FileNotFoundError(f"no SCBF files match {path}")
    return files


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
    def __init__(self, file_path: str):
        self.file_path = file_path


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
        self._filters: List = []

    def pushFilters(self, filters):
        self._filters = list(filters)
        return filters  # Spark re-applies everything; stats only skip files

    def partitions(self) -> Sequence[InputPartition]:
        parts = []
        skipped = 0
        for p in _list_scbf_files(self.path):
            if self._filters and _file_version(p) == 2:
                if not codec_v2.file_may_match(codec_v2.read_meta(p), self._filters):
                    skipped += 1
                    continue
            parts.append(ScbfFilePartition(p))
        # An all-files-skipped scan still needs one (empty) partition so the
        # negotiated schema flows through.
        return parts or [ScbfFilePartition("")]

    def read(self, partition: ScbfFilePartition):
        if not partition.file_path:
            return
        if _file_version(partition.file_path) == 2:
            table = codec_v2.read_arrow_table(
                partition.file_path, self.columns, verify_crc=self.verify_crc
            )
        else:
            table = codec.read_arrow_table(partition.file_path, self.columns)
        for batch in table.to_batches(max_chunksize=1 << 16):
            yield batch


@dataclass
class ScbfCommitMessage(WriterCommitMessage):
    tmp_path: str = ""
    final_path: str = ""
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
        self.overwrite = overwrite
        if self.version == 2:
            ok = (IntegerType, LongType, DoubleType, BooleanType, StringType)
            for f in schema.fields:
                if not isinstance(f.dataType, ok):
                    raise ValueError(
                        f"column {f.name!r}: {f.dataType.simpleString()} is not representable "
                        "in SCBF v2 (int32/int64/float64/bool/utf8) — cast first"
                    )
        elif self.version == 1:
            for f in schema.fields:
                if not isinstance(f.dataType, (IntegerType, DoubleType, StringType)):
                    raise ValueError(
                        f"column {f.name!r}: {f.dataType.simpleString()} is not representable "
                        "in SCBF v1 (int32/float64/utf8 only) — cast, or write with "
                        ".option('version', '2')"
                    )
        else:
            raise ValueError(f"unknown scbf version {self.version} (1 or 2)")

    def write(self, iterator: Iterator) -> ScbfCommitMessage:
        import pyarrow as pa

        batches = list(iterator)
        os.makedirs(self.path, exist_ok=True)
        file_id = uuid.uuid4().hex[:12]
        tmp = os.path.join(self.path, f".tmp-{file_id}.scbf")
        final = os.path.join(self.path, f"part-{file_id}.scbf")
        if not batches:
            return ScbfCommitMessage(tmp_path="", final_path="", rows=0)
        table = pa.Table.from_batches(batches)
        if self.version == 2:
            codec_v2.write_arrow_table(tmp, table, self.level)
        else:
            codec.write_arrow_table(tmp, table, self.level)
        return ScbfCommitMessage(tmp_path=tmp, final_path=final, rows=table.num_rows)

    def commit(self, messages):
        if self.overwrite:
            for old in _glob.glob(os.path.join(self.path, "part-*.scbf")):
                os.unlink(old)
        for m in messages:
            if m and m.tmp_path:
                os.replace(m.tmp_path, m.final_path)

    def abort(self, messages):
        for m in messages:
            if m and m.tmp_path and os.path.exists(m.tmp_path):
                os.unlink(m.tmp_path)


class ScbfDataSource(DataSource):
    """Python DataSource V2 for format ``"scbf"``.

    Read options: ``columns`` (comma-separated explicit projection).
    Write options: ``compression_level`` (zlib 0-9, default 6).
    """

    @classmethod
    def name(cls) -> str:
        return "scbf"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if path is None:
            raise ValueError("scbf requires a path")
        full = _schema_of_file(_list_scbf_files(path)[0])
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


def _ship_package(spark) -> None:
    """Make ``custom_columnar_format_spark`` importable on executor Python
    workers. The DataSource class is cloudpickled *by reference*, so workers
    re-import this module — which fails if the driver process happened to be
    launched from a cwd where the package isn't on sys.path. Shipping a zip
    via ``addPyFile`` (the standard mechanism, works on a real cluster too)
    removes that dependence on driver cwd/PYTHONPATH."""
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_base = os.path.join(
        tempfile.gettempdir(), f"scbf_pyfiles_{os.getpid()}", "custom_columnar_format_spark"
    )
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        os.makedirs(os.path.dirname(zip_base), exist_ok=True)
        shutil.make_archive(
            zip_base, "zip", root_dir=os.path.dirname(pkg_dir), base_dir=os.path.basename(pkg_dir)
        )
    spark.sparkContext.addPyFile(zip_path)


def register(spark) -> None:
    """Idempotently register the scbf format on a SparkSession."""
    try:
        _ship_package(spark)
    except Exception:
        pass  # already-shipped or restricted env; worker import may still work via PYTHONPATH
    try:
        # Required for pushFilters() to reach the reader (v2 stats skipping).
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # static conf in some deployments; reader then sees no filters
    spark.dataSource.register(ScbfDataSource)
