"""Query registry: the engine's public, driver-verifiable surface.

Every operator from SURVEY.md §2 registers here as a named query with
(a) a Spark callable ``(spark, sf_dir) -> DataFrame`` and (b) where
SQL-expressible, an ANSI-SQL oracle string DuckDB runs on the same
parquet views. The driver hashes both results order-insensitively with
columns sorted by name, so every computed column is aliased identically
on both sides.

Float discipline: double-precision SUM/AVG are order-dependent, and Spark
and DuckDB will legitimately disagree in the last ulps. Any money-like
aggregate therefore goes through DECIMAL (exact, order-independent) and
is cast back to DOUBLE at the end on BOTH sides — identical bits, stable
hash. See ``operators.relational`` for the pattern.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query to the engine surface."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import bishe_gpu_database_spark.operators.relational  # noqa: F401
    import bishe_gpu_database_spark.operators.tpch_extra  # noqa: F401
    import bishe_gpu_database_spark.operators.kv  # noqa: F401
    import bishe_gpu_database_spark.operators.functions_q  # noqa: F401
    import bishe_gpu_database_spark.operators.dedup  # noqa: F401
    import bishe_gpu_database_spark.operators.similarity  # noqa: F401
    import bishe_gpu_database_spark.operators.text_analysis  # noqa: F401
    import bishe_gpu_database_spark.operators.multimodal  # noqa: F401
    import bishe_gpu_database_spark.operators.udfs  # noqa: F401
    import bishe_gpu_database_spark.operators.pipeline  # noqa: F401
    import bishe_gpu_database_spark.operators.timeseries  # noqa: F401
    import bishe_gpu_database_spark.operators.mining  # noqa: F401
    import bishe_gpu_database_spark.operators.quality  # noqa: F401
    import bishe_gpu_database_spark.operators.graph  # noqa: F401
    import bishe_gpu_database_spark.operators.geo  # noqa: F401
    import bishe_gpu_database_spark.operators.cdc  # noqa: F401
    import bishe_gpu_database_spark.operators.sketches  # noqa: F401
    import bishe_gpu_database_spark.operators.linkage  # noqa: F401
    import bishe_gpu_database_spark.aria.queries  # noqa: F401
    import bishe_gpu_database_spark.streaming.batch_twins  # noqa: F401
    import bishe_gpu_database_spark.sources.formats  # noqa: F401

    _LOADED = True
