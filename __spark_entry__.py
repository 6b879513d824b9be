"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 plus the training-data operator families; ``oracle_sql()``
provides the equivalent DuckDB SQL for every SQL-expressible query (all
of them, currently).  See wiki_references_db_spark/queries/ for the
implementations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: citations visible at a
    revision with first/last-seen lifecycle, appearance count,
    currently_visible and removed_at (reference:api_v1.py:145-364)."""
    from wiki_references_db_spark.queries.citations import wiki_citations_at_revision

    return wiki_citations_at_revision(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from wiki_references_db_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from wiki_references_db_spark.queries import all_oracles

    return all_oracles()
