"""Operator library: generic relational helpers plus the large-scale
training-data operator families (dedup, similarity, text analysis,
multimodal plumbing)."""

from wiki_references_db_spark.operators.relational import (  # noqa: F401
    distinct_on,
    insert_if_absent,
    merge_non_null,
    paginate,
    top_k_per_group,
    upsert_coalesce,
)
