"""Query/oracle registry — the correctness contract behind __spark_entry__.py.

Every operator the engine claims is registered here as
  - a PySpark callable ``(spark, sf_dir) -> DataFrame``; and
  - (when SQL-expressible) an equivalent DuckDB oracle SQL string.

The driver runs both at sf=0.01 and compares row-count + schema +
order-insensitive value-hash, so column names AND value bit-patterns
must match. See piper_spark/functions/numeric.py for the recipes that
make double aggregation deterministic across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and its DuckDB oracle, if expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from piper_spark import operators, functions, sources, pipelines  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
