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
    qs, os_ = all_queries(), all_oracles()
    assert set(qs) == set(os_), sorted(set(qs) ^ set(os_))


def test_query_names_are_stable_identifiers():
    for name in all_queries():
        assert name.replace("_", "").isalnum() and name.lower() == name, name


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
