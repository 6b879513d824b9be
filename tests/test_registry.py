"""Registry invariants backing the driver contract: window integrity,
oracle completeness, name hygiene."""

from wiki_references_db_spark.queries import _DRIVER_WINDOW, all_oracles, all_queries


def test_driver_window_is_the_first_fifty():
    names = list(all_queries())
    assert len(_DRIVER_WINDOW) == 50, len(_DRIVER_WINDOW)
    assert names[:50] == _DRIVER_WINDOW
    # Every pinned name must actually be registered (a typo here would
    # silently shrink the driver's evaluated set).
    missing = [n for n in _DRIVER_WINDOW if n not in names]
    assert not missing, missing


def test_every_query_has_an_oracle():
    # NO exceptions since round 11: even sketch-valued outputs whose
    # raw estimates are engine-specific (Spark HLL++ vs DuckDB HLL)
    # register a hashable contract instead of skipping the oracle —
    # table_profile_stats_approx emits the exact profile plus an
    # engine-exact within-5%-of-exact verdict, so its accuracy bound
    # IS the value hash (tests/test_profiling_approx.py pins the rest).
    qs, os_ = all_queries(), all_oracles()
    assert not set(qs) - set(os_), sorted(set(qs) - set(os_))
    assert not set(os_) - set(qs), sorted(set(os_) - set(qs))


def test_query_names_are_stable_identifiers():
    for name in all_queries():
        assert name.replace("_", "").isalnum() and name.lower() == name, name


def test_pivot_unpivot_round_trip(spark, sf_dir):
    """The pivot/unpivot pair round-trips: unpivoting the wide
    ``part_metrics_pivot`` crosstab reproduces the long (brand, class,
    count) form computed directly — groupBy().pivot() and
    DataFrame.unpivot are true inverses over the pinned value list."""
    import pyspark.sql.functions as F

    from wiki_references_db_spark.tables import load_table

    wide = all_queries()["part_metrics_pivot"](spark, sf_dir)
    metric_cols = [c for c in wide.columns if c != "p_brand"]
    melted = {
        (r.p_brand, r.type_class, r.n_parts)
        for r in wide.unpivot(
            ["p_brand"], metric_cols, "type_class", "n_parts"
        ).collect()
    }
    part = load_table(spark, sf_dir, "part")
    direct = {
        (r.p_brand, f"n_{r.type_class.lower()}", r.n_parts)
        for r in part.withColumn(
            "type_class", F.split(F.col("p_type"), " ").getItem(0)
        )
        .groupBy("p_brand", "type_class")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .collect()
    }
    # unpivot emits explicit zero rows for absent combinations; the
    # direct long form simply lacks them.
    assert {t for t in melted if t[2] != 0} == direct


def test_registered_queries_emit_scalar_columns_only(spark, sf_dir):
    """Driver canonicalization contract (round-3 lesson): the driver's
    hasher factorizes cell values with pandas and hard-errors on
    array/map/struct cells (`multimodal_feature_extract` burned a driver
    row discovering this).  Schemas are inspected lazily — no query is
    executed."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name, fn in all_queries().items():
        schema = fn(spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"non-scalar output columns in registered queries: {bad}"
