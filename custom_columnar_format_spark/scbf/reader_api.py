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

from . import codec


class SCBFReader:
    """Reader for a single SCBF file.

    >>> r = SCBFReader("examples/sample.scbf")
    >>> r.list_columns()
    ['id', 'name', 'score']
    >>> cols = r.read_columns(["id", "score"])
    """

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            self._info = codec.read_file_info(f)

    # -- reference-README surface ------------------------------------------
    def list_columns(self) -> List[str]:
        return [m.name for m in self._info.columns]

    def schema(self) -> Dict[str, str]:
        return {m.name: m.type_name for m in self._info.columns}

    @property
    def num_rows(self) -> int:
        return self._info.total_rows

    def read_all(self) -> Tuple[List[str], List[List]]:
        return codec.read_all(self.path)

    def read_columns(self, columns: Sequence[str]) -> Dict[str, list]:
        return {k: list(v) for k, v in codec.read_columns(self.path, columns).items()}

    # -- engine extensions --------------------------------------------------
    def to_arrow(self, columns: Sequence[str] | None = None):
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
