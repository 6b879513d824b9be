"""Cross-check every registered query against its DuckDB oracle at a small
scale factor — a local mirror of the driver's CORRECTNESS gate."""

import pytest

from wiki_references_db_spark.oracle import check_query
from wiki_references_db_spark.queries import all_oracles, all_queries


def _cases():
    qs = all_queries()
    os_ = all_oracles()
    return [(name, qs[name], os_[name]) for name in sorted(os_)]


@pytest.mark.parametrize("name,fn,sql", _cases(), ids=[c[0] for c in _cases()])
def test_oracle_parity(spark, sf_dir, name, fn, sql):
    res = check_query(spark, name, fn, sql, sf_dir)
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows >= 0


def test_every_query_has_oracle_or_is_documented():
    qs = all_queries()
    os_ = all_oracles()
    missing = sorted(set(qs) - set(os_))
    # Round-11 invariant (also enforced in test_registry.py): EVERY
    # registered query carries a full SQL oracle — no exemptions.
    assert not missing, f"queries without oracle: {missing}"
