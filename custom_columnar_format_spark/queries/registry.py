"""Central query registry: every implemented operator from SURVEY.md §2 gets
one named entry with (a) a Spark callable ``(spark, sf_dir) -> DataFrame`` and
(b) where SQL-expressible, a DuckDB oracle SQL string over the pre-registered
parquet views. The driver hash-compares (a) against (b) at sf0.01.

Column-name contract: every computed/aggregate column is aliased identically
in the Spark code and the oracle SQL (the driver sorts columns by name before
hashing values).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # DuckDB oracle; None → driver's weaker rows-only check
    doc: str = ""


_REGISTRY: Dict[str, QueryDef] = {}


def query(name: str, sql: Optional[str], doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame callable.

    Duplicate names are an import-time error: dict semantics would silently
    shadow the earlier registration (which one wins then depends on module
    import order — including transitive imports), and the driver's
    correctness history for the name would quietly switch semantics.
    Caught live in round 5: a second ``q_retention_cohorts`` landed in
    another module and shadowed the original without any test noticing."""

    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(
                f"query {name!r} already registered by "
                f"{_REGISTRY[name].fn.__module__}; refusing to shadow it"
            )
        _REGISTRY[name] = QueryDef(fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_modules() -> None:
    # Import for side effect of @query registration.
    from . import (  # noqa: F401
        analytics,
        corpus_ops,
        curation_ops,
        extras,
        llm_ops,
        relational,
        streaming_queries,
        tpch,
    )


def all_queries() -> Dict[str, QueryDef]:
    _load_modules()
    return dict(_REGISTRY)


def spark_queries() -> Dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in all_queries().items()}


def oracle_queries() -> Dict[str, str]:
    return {name: qd.sql for name, qd in all_queries().items() if qd.sql is not None}
