"""table_profile_stats_approx — the registered 100 TB substitution for
the exact profile (VERDICT r9 item 3).  Its SQL-oracle-free contract is
pinned here instead:

- VALUE: every per-column HLL++ estimate lands within 5% of the exact
  distinct count (rsd=0.02, measured worst error 2.3% across
  sf0.001/0.01/0.1 — the bound keeps >2x headroom, and the estimate
  is deterministic for fixed data, so this never flakes);
  n_rows / n_nulls / min / max are EXACTLY the exact query's values.
- PLAN: the shape the docstring claims — per-column union of narrow
  aggregates, zero Expand (the multi-distinct form's row multiplier),
  every file scan pruned to exactly one column.
"""

import pytest
from pyspark.sql import functions as F

from wiki_references_db_spark.queries.profiling import (
    _PROFILE_COLS,
    table_profile_stats,
    table_profile_stats_approx,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def results(spark):
    exact = {
        r["column_name"]: r
        for r in table_profile_stats(spark, SF_DIR).collect()
    }
    approx = {
        r["column_name"]: r
        for r in table_profile_stats_approx(spark, SF_DIR).collect()
    }
    return exact, approx


def test_approx_distinct_within_5pct_of_exact(results):
    exact, approx = results
    assert set(exact) == set(approx) == {c for c, _ in _PROFILE_COLS}
    for col in exact:
        e = exact[col]["n_distinct"]
        a = approx[col]["n_distinct_approx"]
        assert abs(a - e) <= max(1, 0.05 * e), (col, e, a)


def test_non_sketch_columns_identical_to_exact(results):
    """Everything except the sketch column is the SAME aggregate as the
    exact query — bit-identical values, so the approx form is a drop-in
    replacement for the profile's non-cardinality consumers."""
    exact, approx = results
    for col in exact:
        for field in ("n_rows", "n_nulls", "min_value", "max_value"):
            assert exact[col][field] == approx[col][field], (col, field)


def test_plan_is_expand_free_single_column_scans(spark):
    df = table_profile_stats_approx(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The whole point of the per-column union shape: no Expand row
    # multiplier anywhere (the fused multi-distinct form has one), and
    # each branch's parquet scan reads exactly its one column.
    assert "Expand" not in plan, plan
    scans = [
        line for line in plan.splitlines() if "ReadSchema: struct<" in line
    ]
    assert len(scans) == len(_PROFILE_COLS), plan
    for line in scans:
        schema = line.split("ReadSchema: struct<", 1)[1]
        assert schema.count(":") == 1, line  # one field per scan
    # The sketch aggregates as a plain partial/final pair (HLL++ uses a
    # flat fixed-width register buffer, so each branch ships ONE
    # buffer row per partition) — no per-distinct-value shuffle rows
    # and no distinct-specific extra aggregation level.
    assert plan.count("partial_approx_count_distinct") == len(_PROFILE_COLS), plan
    assert "partial_count_distinct" not in plan, plan


def test_exact_plan_has_no_expand_either(spark):
    """The exact form's documented 6x win over the fused multi-distinct
    aggregate rests on the same Expand-free union shape — pin both."""
    df = table_profile_stats(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan
