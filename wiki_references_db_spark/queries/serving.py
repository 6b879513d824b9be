"""Serving-layer query surface: every reference API endpoint as a pure
``(warehouse_tables, params) -> DataFrame`` function.

Endpoint map (reference:api_v1.py / explorer.py):

- ``article_revisions``            GET /article + /article/<id>/revisions
  (revision list + per-revision citation counts, reference:api_v1.py:68-142)
- ``article_citations``            GET /article/<id>/citations
  (the flagship: lifecycle + hydrated links/templates/other-articles,
  reference:api_v1.py:145-364)
- ``citation_detail``              GET /citation/<sha1>
  (reference:api_v1.py:367-441)
- ``citation_history``             GET /citation/<sha1>/history
  (reference:api_v1.py:444-476)
- ``template_report``              GET /template/<id>/report
  (reference:api_v1.py:479-528)
- ``web_resource_lookup``          GET /web_resource
  (reference:api_v1.py:531-570)

Request parameters arrive as Python literals (they come from an HTTP
layer); Catalyst folds them into pushed-down predicates.  Hydration is
join + ``collect_list(struct(...))`` — the set-oriented form of the
reference's batched IN-lists + Python-side grouping (J8, the N+1
avoidance noted at reference:explorer.py:155-160).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wiki_references_db_spark.operators.relational import paginate
from wiki_references_db_spark.queries.citations import type_label


def _sort_template_structs(arr):
    """array_sort with an explicit comparator: the template structs carry
    a MAP field, which Spark's default struct ordering cannot compare."""

    def cmp(left, right):
        def by(field):
            return (
                F.when(left[field] < right[field], -1)
                .when(left[field] > right[field], 1)
                .otherwise(0)
            )

        return (
            F.when(by("offset_start") != 0, by("offset_start"))
            .when(by("template_name") != 0, by("template_name"))
            .otherwise(by("wiki_template_id"))
        )

    return F.array_sort(arr, cmp)


def article_revisions(w: dict[str, DataFrame], page_id: int, limit: int = 100,
                      offset: int = 0) -> DataFrame:
    """Revisions of a page with citation counts; zero-citation revisions
    kept by the left join (J3/A4)."""
    rev = w["revisions"].filter(F.col("page_id") == page_id)
    ch = w["citation_histories"]
    counted = (
        rev.join(ch, "revision_id", "left")
        .groupBy("revision_id", "revision_timestamp", "parent_revision_id")
        .agg(F.count("citation_instance_id").alias("citation_count"))
    )
    return paginate(
        counted,
        [F.col("revision_timestamp").asc(), F.col("revision_id").asc()],
        limit=limit,
        offset=offset,
    )


def _resolve_revision(w: dict[str, DataFrame], page_id: int,
                      revision_id: int | None) -> dict:
    """Resolve the flagship's scalar params (target/latest/next revision
    ids) with ONE tiny aggregation over the page's revisions — the
    reference's own resolve-then-query serving shape
    (reference:api_v1.py:153-170).  The 1-row collect keeps every
    scalar-subquery subtree (and its repeated broadcast jobs) out of the
    main plan, whose page/revision predicates then push into the
    parquet scans as literals."""
    rev = w["revisions"].filter(F.col("page_id") == page_id)
    row = rev.groupBy().agg(
        F.max("revision_id").alias("latest"),
        F.min(
            F.when(F.col("revision_id") > F.lit(revision_id), F.col("revision_id"))
        ).alias("next_after_given"),
    ).first()
    latest = row["latest"] if row else None
    if revision_id is None:
        target, nxt = latest, None
    else:
        target, nxt = revision_id, row["next_after_given"] if row else None
    return {
        "target_revision_id": target,
        "latest_revision_id": latest,
        "next_revision_id": nxt,
    }


def article_citations(
    w: dict[str, DataFrame],
    page_id: int,
    revision_id: int | None = None,
    raw: bool = False,
    limit: int = 100,
    offset: int = 0,
) -> DataFrame:
    """The flagship (reference:api_v1.py:145-364): citations visible at a
    revision with lifecycle stats, currently_visible, removed_at, and —
    in normalized mode — hydrated links / templates / other-articles."""
    p = _resolve_revision(w, page_id, revision_id)
    target, latest, nxt = (
        p["target_revision_id"],
        p["latest_revision_id"],
        p["next_revision_id"],
    )
    ci = w["citation_instances"].filter(F.col("page_id") == page_id)
    ch = w["citation_histories"]
    rev = w["revisions"]

    present = ch.filter(
        F.col("revision_id") == F.lit(target).cast("long")
    ).select("citation_instance_id")
    visible = ci.join(
        F.broadcast(present.withColumnRenamed("citation_instance_id", "id")),
        "id",
        "left_semi",
    )

    hist = ch.join(F.broadcast(visible.select(F.col("id").alias("citation_instance_id"))),
                   "citation_instance_id", "left_semi").join(
        rev.select("revision_id", "revision_timestamp"), "revision_id"
    )
    stats = hist.groupBy("citation_instance_id").agg(
        F.min("revision_timestamp").alias("first_seen_ts"),
        F.max("revision_timestamp").alias("last_seen_ts"),
        F.min("revision_id").alias("first_seen_id"),
        F.max("revision_id").alias("last_seen_id"),
        F.count("revision_id").alias("appearance_count"),
    )

    if nxt is not None:
        present_next = ch.filter(F.col("revision_id") == F.lit(nxt)).select(
            "citation_instance_id", F.lit(1).alias("__in_next")
        )
    else:
        present_next = ch.filter(F.lit(False)).select(
            "citation_instance_id", F.lit(1).alias("__in_next")
        )
    removed_at = (
        F.when(F.col("__in_next").isNull(), F.lit(nxt).cast("long"))
        if nxt is not None
        else F.lit(None).cast("long")
    )

    base = (
        visible.join(F.broadcast(stats), visible.id == stats.citation_instance_id)
        .join(
            F.broadcast(present_next.withColumnRenamed("citation_instance_id", "id")),
            "id",
            "left",
        )
        .withColumn(
            "currently_visible",
            F.col("last_seen_id") == F.lit(latest).cast("long"),
        )
        .withColumn("removed_at_revision_id", removed_at)
    )

    if raw:
        out = base.select(
            F.col("id").alias("citation_instance_id"),
            "raw_sha1",
            type_label(F.col("reference_type")).alias("reference_type"),
            "reference_name",
            "first_seen_id",
            "first_seen_ts",
            "last_seen_id",
            "last_seen_ts",
            "appearance_count",
            "currently_visible",
        )
        return paginate(
            out,
            [F.col("last_seen_ts").desc(), F.col("citation_instance_id").asc()],
            limit=limit,
            offset=offset,
        )

    nc = w["normalized_citations"]
    joined = base.join(
        nc.select(
            F.col("id").alias("normalized_id"),
            "normalized_sha1",
            "reference_normalized",
        ),
        "normalized_id",
    )

    # Hydration (J8 + A7) — all grouped child collections, deterministic
    # intra-array order via array_sort on leading struct fields.
    docs = w["documents"]
    other_articles = (
        nc.join(
            docs.select(F.col("id").alias("appears_on_article"),
                        F.col("page_id").alias("oa_page_id")),
            "appears_on_article",
            "left",
        )
        .groupBy(F.col("id").alias("normalized_id"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("oa_page_id").alias("page_id"),
                        F.col("appears_on_article").alias("document_id"),
                    )
                )
            ).alias("other_articles")
        )
    )

    links = (
        w["ncwr"]
        .join(
            w["web_resources"].select(
                F.col("id").alias("web_resource_id"), "url"
            ),
            "web_resource_id",
        )
        .groupBy("normalized_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("url"), F.col("web_resource_id")))
            ).alias("extracted_links")
        )
    )

    tpl = (
        w["template_data"]
        .join(
            w["wiki_templates"].select(
                F.col("id").alias("wiki_template_id"), F.col("name")
            ),
            "wiki_template_id",
        )
        .groupBy("normalized_id", "wiki_template_id", "name", "offset_start")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("parameter_key"), F.col("parameter_value"))
                    )
                )
            ).alias("parameters")
        )
        .groupBy("normalized_id")
        .agg(
            _sort_template_structs(
                F.collect_list(
                    F.struct(
                        F.col("offset_start"),
                        F.col("name").alias("template_name"),
                        F.col("wiki_template_id"),
                        F.col("parameters"),
                    )
                )
            ).alias("templates")
        )
    )

    out = (
        joined.join(other_articles, "normalized_id", "left")
        .join(links, "normalized_id", "left")
        .join(tpl, "normalized_id", "left")
        .select(
            F.col("id").alias("citation_instance_id"),
            "normalized_sha1",
            "reference_normalized",
            type_label(F.col("reference_type")).alias("reference_type"),
            "reference_name",
            "first_seen_id",
            "first_seen_ts",
            "last_seen_id",
            "last_seen_ts",
            "appearance_count",
            "currently_visible",
            "removed_at_revision_id",
            "other_articles",
            "extracted_links",
            "templates",
        )
    )
    return paginate(
        out,
        [F.col("last_seen_ts").desc(), F.col("citation_instance_id").asc()],
        limit=limit,
        offset=offset,
    )


def citation_history(
    w: dict[str, DataFrame], normalized_sha1: str, page_id: int | None = None
) -> DataFrame:
    """All revisions where any instance of a normalized citation appears
    (reference:api_v1.py:444-476)."""
    nc = w["normalized_citations"].filter(F.col("normalized_sha1") == normalized_sha1)
    ci = w["citation_instances"].join(
        F.broadcast(nc.select(F.col("id").alias("normalized_id"))), "normalized_id"
    )
    hist = w["citation_histories"].join(
        F.broadcast(ci.select(F.col("id").alias("citation_instance_id"))),
        "citation_instance_id",
    )
    out = hist.join(w["revisions"], "revision_id").select(
        "revision_id", "revision_timestamp", "page_id"
    )
    if page_id is not None:
        out = out.filter(F.col("page_id") == page_id)
    return out.orderBy("revision_timestamp", "revision_id")


def citation_detail(w: dict[str, DataFrame], normalized_sha1: str) -> DataFrame:
    """Citation card (reference:api_v1.py:367-441): normalized text +
    hydrated articles/links/templates as collected arrays, 1 row."""
    nc = w["normalized_citations"].filter(F.col("normalized_sha1") == normalized_sha1)
    nc_ids = F.broadcast(nc.select(F.col("id").alias("normalized_id")))

    articles = (
        nc.join(
            w["documents"].select(
                F.col("id").alias("appears_on_article"),
                F.col("page_id").alias("oa_page_id"),
            ),
            "appears_on_article",
            "left",
        )
        .groupBy(F.col("id").alias("normalized_id"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("oa_page_id").alias("page_id"),
                        F.col("appears_on_article").alias("document_id"),
                    )
                )
            ).alias("appears_on_articles")
        )
    )
    links = (
        w["ncwr"].join(nc_ids, "normalized_id")
        .join(
            w["web_resources"].select(F.col("id").alias("web_resource_id"), "url"),
            "web_resource_id",
        )
        .groupBy("normalized_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("url", "web_resource_id"))
            ).alias("extracted_links")
        )
    )
    tpls = (
        w["template_data"].join(nc_ids, "normalized_id")
        .join(
            w["wiki_templates"].select(F.col("id").alias("wiki_template_id"), "name"),
            "wiki_template_id",
        )
        .groupBy("normalized_id", "wiki_template_id", "name", "offset_start")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("parameter_key", "parameter_value")))
            ).alias("parameters")
        )
        .groupBy("normalized_id")
        .agg(
            _sort_template_structs(
                F.collect_list(
                    F.struct(
                        "offset_start",
                        F.col("name").alias("template_name"),
                        "wiki_template_id",
                        "parameters",
                    )
                )
            ).alias("templates")
        )
    )
    return (
        nc.select(
            F.col("id").alias("normalized_id"),
            "normalized_sha1",
            "reference_normalized",
        )
        .join(articles, "normalized_id", "left")
        .join(links, "normalized_id", "left")
        .join(tpls, "normalized_id", "left")
    )


def template_report(
    w: dict[str, DataFrame],
    wiki_template_id: int,
    parameter_key: str,
    parameter_value: str,
    limit: int = 100,
    offset: int = 0,
) -> DataFrame:
    """Citations using template T with key=value (reference:api_v1.py:479-528)."""
    td = w["template_data"].filter(
        (F.col("wiki_template_id") == wiki_template_id)
        & (F.col("parameter_key") == parameter_key)
        & (F.col("parameter_value") == parameter_value)
    )
    nc = w["normalized_citations"]
    out = (
        td.select(F.col("normalized_id").alias("id"))
        .distinct()
        .join(nc, "id")
        .select("normalized_sha1", "reference_normalized", "appears_on_article")
        .distinct()
    )
    return paginate(
        out, [F.col("normalized_sha1").asc()], limit=limit, offset=offset
    )


def web_resource_lookup(w: dict[str, DataFrame], url: str) -> DataFrame:
    """Reverse lookup: which citations reference a URL
    (reference:api_v1.py:531-570)."""
    wr = w["web_resources"].filter(F.col("url") == url)
    refs = (
        w["ncwr"]
        .join(
            F.broadcast(wr.select(F.col("id").alias("web_resource_id"))),
            "web_resource_id",
        )
        .join(
            w["normalized_citations"].select(
                F.col("id").alias("normalized_id"),
                "normalized_sha1",
                "appears_on_article",
            ),
            "normalized_id",
        )
    )
    dom = w["domains"].select(F.col("id").alias("domain_id"), F.col("value").alias("domain"))
    return (
        wr.join(dom, "domain_id", "left")
        .select(
            F.col("id").alias("web_resource_id"),
            "url",
            "domain",
            "numeric_page_id",
        )
        .join(
            refs.groupBy("web_resource_id").agg(
                F.array_sort(
                    F.collect_list(
                        F.struct("normalized_sha1", "appears_on_article")
                    )
                ).alias("referenced_by")
            ),
            "web_resource_id",
            "left",
        )
    )


def name_only_refs(w: dict[str, DataFrame], page_id: int) -> DataFrame:
    """Named-instance convenience from the explorer: instances whose
    normalized text is just a name-only ref tag
    (reference:explorer.py:20-26,486-491) — the regex-predicate operator
    P6 in service position."""
    ci = w["citation_instances"].filter(
        (F.col("page_id") == page_id)
        & F.col("reference_name").isNotNull()
        & (F.col("reference_name") != "")
    )
    nc = w["normalized_citations"].select(
        F.col("id").alias("normalized_id"), "reference_normalized"
    )
    pattern = r'(?i)^<ref\s+name\s*=\s*("[^"]*"|\'[^\']*\'|[^\s/>]+)\s*/\s*>$'
    return ci.join(nc, "normalized_id").withColumn(
        "is_name_only", F.col("reference_normalized").rlike(pattern)
    )
