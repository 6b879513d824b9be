"""Degenerate-input sweep: every registered query must run (not
necessarily return rows) against a ZERO-ROW corpus with the production
schemas — the empty-incremental-delta case a scheduled pipeline hits on
quiet days.  Classes of bug this catches: unguarded 1-row parameter
fetches (``.first()`` -> None), ANSI divide-by-zero on empty aggregates,
and streaming sinks whose state never materializes when zero
micro-batches fire.
"""

import os

import pytest

from wiki_references_db_spark.queries import all_queries
from wiki_references_db_spark.tables import TESTDATA_TABLES, load_table

SRC_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TESTDATA_TABLES:
        load_table(spark, SRC_SF, t).limit(0).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    return out


def test_every_registered_query_survives_an_empty_corpus(spark, empty_sf_dir):
    failures = {}
    for name, fn in all_queries().items():
        try:
            fn(spark, empty_sf_dir).write.mode("overwrite").format("noop").save()
        except Exception as e:  # noqa: BLE001 - we report them all at once
            failures[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
        spark.catalog.clearCache()
    assert not failures, failures
