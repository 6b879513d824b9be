"""Query registry backing the driver contract (``__spark_entry__.py``).

Every implemented operator from SURVEY.md §2 (plus the training-data
operator families) registers a named query: a ``(spark, sf_dir) ->
DataFrame`` callable and, where SQL-expressible, an equivalent DuckDB
oracle SQL string over the same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_LOADED = False


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for registration side effects.
    from wiki_references_db_spark.queries import (  # noqa: F401
        analytics,
        citations,
        generic,
        multimodal,
        streams,
        training,
    )

    _LOADED = True
