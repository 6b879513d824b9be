"""Phase 2: deduplicated staging -> id-resolved warehouse.

Replaces the reference's FK-ordered PostgreSQL load
(reference:load_all.py:533-588: 11 phases of chunked SELECT..IN lookups
+ batched upserts) with one DAG of column-resolution joins:

- Surrogate ids are DETERMINISTIC: ``xxhash64`` of the natural key
  (SURVEY §2.8 U4).  Content-hash ids make full rebuilds reproducible,
  need no sequence coordination across 1000 executors, and turn every
  natural-key lookup (J7) into a pure column expression — most FK
  resolutions below don't even join.
- FK ordering (U5) becomes dataflow dependency; nothing is sequential.
- Orphan accounting (U7, reference:load_all.py:394-399): inner joins
  drop orphans; ``orphan_stats`` counts them via anti-joins.

Table shapes follow reference:models.py:18-572 (minus the Postgres-only
columns); `id` columns are BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _id(*cols) -> F.Column:
    return F.xxhash64(*cols)


def build_warehouse(staging: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """staging (deduplicated, natural keys) -> warehouse (surrogate ids).

    Join strategy: all dimension resolutions that DO need a join
    (domain value -> id for cited URLs, revision bundle registry) are
    broadcast; the big fact tables (citation_histories at ~28.8e9 rows
    design scale, reference:models.py:340-342) only ever join by
    pre-hashed keys they already carry.
    """
    containers = staging["containers"].select(
        _id("label").alias("id"), F.col("label")
    )

    domains = staging["domains"].select(
        _id("value").alias("id"),
        "value",
        F.element_at(F.split(F.col("value"), "\\."), -1).alias("top_level_domain"),
        F.when(
            F.col("for_container_label").isNotNull(), _id("for_container_label")
        ).alias("for_container"),
    )

    documents = staging["documents"].select(
        _id("has_container_label", "page_id").alias("id"),
        "language_code",
        _id("has_container_label").alias("has_container"),
        F.col("page_id"),
    )

    # web_resources: domain_id via hash of the label; instance_of_document
    # only resolvable for curid rows (they carry page_id + wiki domain).
    web_resources = staging["web_resources"].select(
        _id("url").alias("id"),
        "url",
        F.md5(F.col("url")).alias("url_hash"),
        F.when(
            F.col("page_id").isNotNull() & F.col("domain_label").isNotNull(),
            _id("domain_label", "page_id"),
        ).alias("instance_of_document"),
        F.when(F.col("domain_label").isNotNull(), _id("domain_label")).alias(
            "domain_id"
        ),
        "numeric_page_id",
        "numeric_namespace_id",
    )

    normalized_citations = staging["normalized_citations"].select(
        _id("normalized_sha1").alias("id"),
        "normalized_sha1",
        "reference_normalized",
        F.when(
            F.col("appears_on_page_id").isNotNull()
            & F.col("appears_on_domain").isNotNull(),
            _id("appears_on_domain", "appears_on_page_id"),
        ).alias("appears_on_article"),
    )

    citation_instances = staging["citation_instances"].select(
        _id("page_id", "raw_sha1").alias("id"),
        _id("normalized_sha1").alias("normalized_id"),
        "page_id",
        "raw_sha1",
        "reference_type",
        "reference_name",
    )

    # citation_history: (page_id, raw_sha1) -> instance id is a pure
    # expression — the 28.8B-row table never joins during the build.
    citation_histories = staging["citation_histories"].select(
        _id("page_id", "raw_sha1").alias("citation_instance_id"),
        "revision_id",
    )

    revisions = staging["revisions"].select(
        "revision_id",
        "page_id",
        "parent_revision_id",
        "revision_timestamp",
    )

    ncwr = staging["ncwr"].select(
        _id("normalized_sha1").alias("normalized_id"),
        _id("url").alias("web_resource_id"),
    )

    wiki_templates = staging["wiki_templates"].select(
        _id("domain_label", "name").alias("id"),
        _id("domain_label").alias("domain"),
        "name",
    )

    template_data = staging["template_data"].select(
        _id("domain_label", "template_name").alias("wiki_template_id"),
        _id("normalized_sha1").alias("normalized_id"),
        "offset_start",
        F.md5(F.col("parameter_key")).alias("parameter_key_md5"),
        "parameter_key",
        "parameter_value",
    )

    return {
        "containers": containers,
        "domains": domains,
        "documents": documents,
        "web_resources": web_resources,
        "normalized_citations": normalized_citations,
        "citation_instances": citation_instances,
        "citation_histories": citation_histories,
        "revisions": revisions,
        "ncwr": ncwr,
        "wiki_templates": wiki_templates,
        "template_data": template_data,
    }


def orphan_stats(staging: dict[str, DataFrame]) -> dict[str, int]:
    """U7 accounting: history rows whose (page_id, raw_sha1) has no
    citation instance, and ncwr rows without a web_resource/citation."""
    ch = staging["citation_histories"]
    ci = staging["citation_instances"].select("page_id", "raw_sha1").distinct()
    orphan_history = ch.join(ci, ["page_id", "raw_sha1"], "left_anti").count()

    ncwr = staging["ncwr"]
    nc = staging["normalized_citations"].select("normalized_sha1").distinct()
    orphan_ncwr = ncwr.join(nc, ["normalized_sha1"], "left_anti").count()
    return {
        "orphan_citation_histories": orphan_history,
        "orphan_ncwr": orphan_ncwr,
    }


# The two instance-keyed fact tables and their co-location keys:
# every downstream instance-keyed join (citation_histories ⋈
# citation_instances on citation_instance_id = id) and the flagship's
# lifecycle aggregation (groupBy citation_instance_id) plan
# exchange-free when both land bucketed on these keys with the SAME
# bucket count.  At the 28.8B-row design point that is THE shuffle to
# pay once at write time instead of per serving query (SURVEY §7.3
# risk 5; the reference re-sorts per query inside Postgres instead).
_BUCKETED_FACTS: dict[str, tuple[list[str], list[str]]] = {
    # name -> (bucket keys, within-bucket sort keys).  The sort keys
    # extend the bucket key where a secondary column matters for
    # row-group skipping: history lookups filter by revision_id inside
    # an instance, so the plain-parquet path's
    # (citation_instance_id, revision_id) sort is preserved here too.
    "citation_histories": (
        ["citation_instance_id"],
        ["citation_instance_id", "revision_id"],
    ),
    "citation_instances": (["id"], ["id"]),
}


def write_warehouse(
    warehouse: dict[str, DataFrame],
    out_dir: str,
    history_buckets: int = 0,
    bucketed: bool = True,
    table_prefix: str = "wh",
) -> None:
    """Warehouse sink.  ``citation_histories`` — the 28.8B-row design
    point — is written sorted within partitions by its join key so
    parquet min/max row-group stats give data skipping, and optionally
    repartitioned by instance id (the dominant join key downstream).
    Never collected or broadcast (SURVEY §7.3 risk 5).

    Bucketing is the SERVING DEFAULT: whenever ``history_buckets`` > 0
    the two instance-keyed fact tables land as BUCKETED external catalog
    tables (pass ``bucketed=False`` to opt out and write plain sorted
    parquet, e.g. when no metastore will be present at read time).
    With ``bucketed=True`` (and ``history_buckets`` > 0) they land as
    (``{table_prefix}_{name}`` at ``{out_dir}/{name}``) via
    plans/bucketing.write_bucketed — bucket-hashed AND bucket-sorted on
    their co-location key, same bucket count on both sides, so
    Catalyst plans instance-keyed fact-fact joins and aggregations with
    zero Exchange (tests/test_warehouse_bucketing.py pins the plan).
    The files are still plain zstd parquet — a reader without the
    catalog entry sees an ordinary parquet directory."""
    from wiki_references_db_spark.plans.bucketing import write_bucketed

    for name, df in warehouse.items():
        if bucketed and history_buckets and name in _BUCKETED_FACTS:
            keys, sort_keys = _BUCKETED_FACTS[name]
            write_bucketed(
                df,
                f"{table_prefix}_{name}",
                keys,
                history_buckets,
                path=f"{out_dir}/{name}",
                sort_keys=sort_keys,
            )
            continue
        writer_df = df
        if name == "citation_histories":
            if history_buckets:
                writer_df = df.repartition(history_buckets, "citation_instance_id")
            writer_df = writer_df.sortWithinPartitions("citation_instance_id", "revision_id")
        (
            writer_df.write.mode("overwrite")
            .option("compression", "zstd")
            .parquet(f"{out_dir}/{name}")
        )


def read_warehouse(
    spark, out_dir: str, table_prefix: str | None = None
) -> dict[str, DataFrame]:
    """Load a written warehouse back as table DataFrames — the serving
    layer's production input (parquet scans with pushdown, not
    recomputed join DAGs).  Pass the ``table_prefix`` used at write
    time to read the bucketed fact tables through the catalog (the
    bucket layout lives in the table catalog, not the files — a plain
    parquet read of the same directory is correct but re-shuffles)."""
    import os

    out: dict[str, DataFrame] = {}
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("_"):
            continue
        if table_prefix is not None and name in _BUCKETED_FACTS:
            out[name] = spark.table(f"{table_prefix}_{name}")
        else:
            out[name] = spark.read.parquet(f"{out_dir}/{name}")
    return out
