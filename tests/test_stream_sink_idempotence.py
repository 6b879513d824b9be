"""foreachBatch sink idempotence (round-10 ADVICE): foreachBatch is
at-least-once, so a retried micro-batch re-runs its write.  The shared
sink helper partitions by batch_id and overwrites only that partition
(dynamic partition overwrite), making the retry REPLACE the earlier
output instead of double-emitting — exactly-once per row by layout.
This simulates the retry the streaming engine can issue but a
single-run availableNow harness never does."""

from wiki_references_db_spark.queries.streams import _write_batch_idempotent


def test_retried_batch_replaces_its_partition_only(spark, tmp_path):
    path = str(tmp_path / "sink")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    b1 = spark.createDataFrame([(3, "c")], "id bigint, v string")
    _write_batch_idempotent(b0, 0, path)
    _write_batch_idempotent(b1, 1, path)

    # the failure mode the old mode('append') sink had: a retry of
    # batch 0 (same recomputed rows) must NOT add a second copy, and
    # must NOT touch batch 1's committed partition
    retry0 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    _write_batch_idempotent(retry0, 0, path)

    rows = sorted(
        (r.id, r.v, r.batch_id) for r in spark.read.parquet(path).collect()
    )
    assert rows == [(1, "a", 0), (2, "b", 0), (3, "c", 1)]


def test_partial_failure_retry_heals_to_the_recomputed_batch(spark, tmp_path):
    """A batch that half-wrote before dying leaves arbitrary rows in
    its partition; the retry's overwrite must leave EXACTLY the
    recomputed output (parquet append could never repair this)."""
    path = str(tmp_path / "sink")
    partial = spark.createDataFrame([(9, "junk")], "id bigint, v string")
    _write_batch_idempotent(partial, 0, path)
    good = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    _write_batch_idempotent(good, 0, path)
    rows = sorted(
        (r.id, r.v, r.batch_id) for r in spark.read.parquet(path).collect()
    )
    assert rows == [(1, "a", 0), (2, "b", 0)]
