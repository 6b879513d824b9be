"""Bucketed-table layout for co-located (shuffle-free) joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides onto the join key.  Bucketing pays that shuffle ONCE at write
time: both tables are written pre-hash-partitioned (and sorted) on the
key into the same number of buckets, and every subsequent join between
them is planned as a SortMergeJoin with NO Exchange on either side —
each task reads matching bucket files directly.

The reference stages everything as flat parquet and re-partitions per
join (dedup_staged.py's hash-partition pass is the manual form of
exactly this); bucketing is the Spark-native, declarative replacement:
the layout is recorded in the table catalog, and Catalyst proves the
co-location instead of the pipeline author re-doing it per query.

Usage shape (tested in tests/test_bucketing.py):

    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, path=...)
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8, path=...)
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    # executed plan: SortMergeJoin, zero Exchange operators
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int,
    path: str | None = None,
    sort_keys: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``path`` makes it an external table (keeps test artifacts out of the
    session warehouse); bucket count must MATCH on both sides of an
    intended co-located join — at production scale pick it so one
    bucket of the larger table fits an executor's memory comfortably
    (e.g. 100 TB / 4096 buckets ~ 25 GB per bucket pre-filter).

    ``sort_keys`` (default: the bucket keys) sets the within-bucket file
    sort order and may extend beyond the bucket keys — e.g. histories
    bucketed on ``citation_instance_id`` but sorted by
    ``(citation_instance_id, revision_id)`` so parquet row-group min/max
    stats also skip on the secondary column.  It must start with the
    bucket keys in order, or Catalyst cannot use the sort for
    co-located SortMergeJoins.

    Because the layout lives in the session catalog, writing a SECOND
    table under an existing name silently replaces the first's catalog
    entry (``mode("overwrite")``) — that is usually an accident when two
    warehouses share a ``table_prefix``, so it warns."""
    if sort_keys is None:
        sort_keys = keys
    if sort_keys[: len(keys)] != keys:
        raise ValueError(
            f"sort_keys {sort_keys} must extend the bucket keys {keys}"
        )
    spark = df.sparkSession
    if spark.catalog.tableExists(table):
        import warnings

        warnings.warn(
            f"write_bucketed is overwriting existing catalog table "
            f"{table!r} — pass a distinct table name/prefix if both "
            f"warehouses must stay readable in this session",
            stacklevel=2,
        )
    writer = (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, keys[0], *keys[1:])
        .sortBy(sort_keys[0], *sort_keys[1:])
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
