"""Query workload registry — the driver-facing surface of the engine.

Every implemented operator from SURVEY.md §2 registers here as a named
query (a ``(spark, sf_dir) -> DataFrame`` callable) plus, where
SQL-expressible, a DuckDB oracle string with IDENTICAL column names and
deterministic values (see util.dsum for the float-determinism strategy).
``__spark_entry__.py`` re-exports these to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import all query modules (registration side effect), once."""
    global _LOADED
    if _LOADED:
        return
    from olr_cdc_oracle_no_dbz_spark.workload import (  # noqa: F401
        aggregates,
        cdc_queries,
        events_analytics,
        ext_queries,
        joins,
        scalars,
        sql_api,
        tpch,
        udf_queries,
        windows,
    )

    _LOADED = True
