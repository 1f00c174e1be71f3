"""The class-shaped reader API the reference's README promises but never
ships (reference README.md:67-89 documents an ``SCBFReader`` with
``list_columns`` / ``read_all`` / ``read_columns``; reference reader.py only
exposes module functions — verified in SURVEY.md §3/EP3). This provides that
exact API, plus Spark interop.

Single-file operations go straight through the pure-Python codec (no JVM
startup for a metadata peek); ``to_spark``/``SCBFDataset`` route through the
DataSource V2 for distributed work on file directories."""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from . import codec, codec_v2


class SCBFReader:
    """Reader for a single SCBF file — v1 or v2, auto-detected from the
    magic, same surface for both (the reference defines only v1; v2 files
    come back with their richer types and nulls as ``None``).

    >>> r = SCBFReader("examples/sample.scbf")
    >>> r.list_columns()
    ['id', 'name', 'score']
    >>> cols = r.read_columns(["id", "score"])
    """

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            magic = f.read(8)
        if magic == codec_v2.MAGIC_V2:
            self.version = 2
            self._meta = codec_v2.read_meta(path)
        else:
            self.version = 1
            with open(path, "rb") as f:
                self._info = codec.read_file_info(f)

    # -- reference-README surface ------------------------------------------
    def list_columns(self) -> List[str]:
        if self.version == 2:
            return [c["name"] for c in self._meta["columns"]]
        return [m.name for m in self._info.columns]

    def schema(self) -> Dict[str, str]:
        if self.version == 2:
            return {c["name"]: c["type"] for c in self._meta["columns"]}
        return {m.name: m.type_name for m in self._info.columns}

    @property
    def num_rows(self) -> int:
        return self._meta["rows"] if self.version == 2 else self._info.total_rows

    def read_all(self) -> Tuple[List[str], List[List]]:
        if self.version == 2:
            t = codec_v2.read_arrow_table(self.path)
            cols = [t.column(n).to_pylist() for n in t.column_names]
            rows = [list(r) for r in zip(*cols)] if cols and t.num_rows else []
            return list(t.column_names), rows
        return codec.read_all(self.path)

    def read_columns(self, columns: Sequence[str]) -> Dict[str, list]:
        if self.version == 2:
            t = codec_v2.read_arrow_table(self.path, list(columns))
            # duplicate request names collapse dict-style, like the reference
            return {n: t.column(n).to_pylist() for n in t.column_names}
        return {k: list(v) for k, v in codec.read_columns(self.path, columns).items()}

    # -- engine extensions --------------------------------------------------
    def to_arrow(self, columns: Sequence[str] | None = None):
        if self.version == 2:
            return codec_v2.read_arrow_table(self.path, columns)
        return codec.read_arrow_table(self.path, columns)

    def to_pandas(self, columns: Sequence[str] | None = None):
        return self.to_arrow(columns).to_pandas()

    def to_spark(self, spark, columns: Sequence[str] | None = None):
        from ..sources.scbf_datasource import register

        register(spark)
        reader = spark.read.format("scbf")
        if columns:
            reader = reader.option("columns", ",".join(columns))
        return reader.load(self.path)


class SCBFDataset:
    """A directory of per-partition SCBF files (the distributed layout the
    DSv2 writer emits). Thin convenience over ``spark.read.format('scbf')``."""

    def __init__(self, path: str):
        self.path = path

    def to_spark(self, spark, columns: Sequence[str] | None = None):
        from ..sources.scbf_datasource import register

        register(spark)
        reader = spark.read.format("scbf")
        if columns:
            reader = reader.option("columns", ",".join(columns))
        return reader.load(self.path)
