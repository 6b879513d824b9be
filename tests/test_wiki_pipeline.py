"""End-to-end wiki pipeline: .mwrev.zst fixture bundle -> mwrev source ->
extractor UDFs -> staging -> dedup -> warehouse -> flagship lifecycle
query.  Fixture shape follows FIXTURES.md §2 (pages with references
added / removed / re-added across revisions)."""

import os

import pytest
from pyspark.sql import functions as F

from wiki_references_db_spark.functions.wikitext import get_sha1, normalize_wikitext
from wiki_references_db_spark.plans.dedup_tables import dedup_staging
from wiki_references_db_spark.plans.stage import stage_revisions
from wiki_references_db_spark.plans.warehouse import (
    build_warehouse,
    orphan_stats,
)
from wiki_references_db_spark.queries.citations import citations_at_revision
from wiki_references_db_spark.sources.mwrev import (
    read_mwrev_bundles,
    write_mwrev_zst,
)

REF_A = "<ref name=a>https://a.example/x</ref>"
REF_B = "{{Sfn|Smith|2020|p=1}}"
REF_C = "{{cite web |url=http://c.example/page |title=C}}"


def _rev(page, rid, parent, day, text):
    return {
        "page_id": page,
        "namespace_id": 0,
        "revision_id": rid,
        "parent_revision_id": parent,
        "revision_timestamp": f"2020-01-{day:02d}T00:00:00Z",
        "revision_text": text,
    }


FIXTURE = [
    _rev(100, 1001, None, 1, f"Intro. {REF_A} text."),
    _rev(100, 1002, 1001, 2, f"Intro. {REF_A} and {REF_B} text."),
    _rev(100, 1003, 1002, 3, f"Intro. {REF_B} only."),
    _rev(100, 1004, 1003, 4, f"Back: {REF_A} plus {REF_B}."),
    _rev(100, 1005, 1004, 5, f"Final {REF_B}."),
    _rev(200, 2001, None, 1, f"Other page {REF_C} here."),
    _rev(200, 2002, 2001, 2, f"Still {REF_C} here."),
    _rev(300, 3001, None, 1, "No references at all."),
]


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    bundle_dir = tmp_path_factory.mktemp("bundles")
    write_mwrev_zst(os.path.join(bundle_dir, "fixture-00.mwrev.zst"), FIXTURE)
    raw = read_mwrev_bundles(spark, str(bundle_dir))
    staging = stage_revisions(raw, domain="en.wikipedia.org")
    deduped = dedup_staging(staging)
    # Materialize the small fixture tables once: every downstream check
    # re-uses them without re-running the extractor.
    deduped = {k: v.localCheckpoint() for k, v in deduped.items()}
    warehouse = build_warehouse(deduped)
    return {"raw": raw, "staging": staging, "deduped": deduped, "warehouse": warehouse}


def test_mwrev_roundtrip(pipeline):
    raw = pipeline["raw"]
    rows = {r.revision_id: r for r in raw.collect()}
    assert set(rows) == {1001, 1002, 1003, 1004, 1005, 2001, 2002, 3001}
    assert rows[1002].parent_revision_id == 1001
    assert rows[1001].revision_timestamp == "2020-01-01 00:00:00"
    assert REF_A in rows[1001].revision_text
    assert rows[3001].source_bundle == "fixture-00.mwrev.zst"


def test_staging_dedup_counts(pipeline):
    d = pipeline["deduped"]
    # Page 300 has no references => no revision row (reference quirk,
    # reference:build_db.py:368-373).
    assert {r.revision_id for r in d["revisions"].collect()} == {
        1001, 1002, 1003, 1004, 1005, 2001, 2002,
    }
    # Instances: (page, raw) pairs — A and B on page 100, C on page 200.
    inst = {(r.page_id, r.raw_sha1): r for r in d["citation_instances"].collect()}
    assert (100, get_sha1(REF_A)) in inst
    assert (100, get_sha1(REF_B)) in inst
    assert (200, get_sha1(REF_C)) in inst
    assert len(inst) == 3
    assert inst[(100, get_sha1(REF_A))].reference_name == "a"
    assert inst[(100, get_sha1(REF_A))].reference_type == 1  # inline
    assert inst[(100, get_sha1(REF_B))].reference_type == 0  # standalone tpl

    # History: A at 1001/1002/1004, B at 1002..1005, C at 2001/2002.
    hist = {
        (r.page_id, r.raw_sha1, r.revision_id)
        for r in d["citation_histories"].collect()
    }
    a, b = get_sha1(REF_A), get_sha1(REF_B)
    assert {(p, r) for (p, s, r) in hist if s == a} == {(100, 1001), (100, 1002), (100, 1004)}
    assert {(p, r) for (p, s, r) in hist if s == b} == {
        (100, 1002), (100, 1003), (100, 1004), (100, 1005),
    }

    # ncwr + web_resources carry the cited URLs.
    urls = {r.url for r in d["ncwr"].collect()}
    assert urls == {"https://a.example/x", "http://c.example/page"}
    wr_urls = {r.url for r in d["web_resources"].collect()}
    assert "https://en.wikipedia.org/w/index.php?curid=100" in wr_urls
    assert "https://a.example/x" in wr_urls

    # Template data: Sfn params (positional keys '1','2' + named 'p').
    td = [
        (r.template_name, r.parameter_key, r.parameter_value)
        for r in d["template_data"].collect()
    ]
    assert ("Sfn", "1", "Smith") in td
    assert ("Sfn", "2", "2020") in td
    assert ("Sfn", "p", "1") in td
    assert ("Cite web", "url", "http://c.example/page") in td
    names = {r.name for r in d["wiki_templates"].collect()}
    assert names == {"Sfn", "Cite web"}


def test_normalized_citations_content_addressing(pipeline):
    d = pipeline["deduped"]
    rows = {r.normalized_sha1: r for r in d["normalized_citations"].collect()}
    norm_a = normalize_wikitext(REF_A)
    assert get_sha1(norm_a) in rows
    assert rows[get_sha1(norm_a)].reference_normalized == norm_a
    # Spark-side sha1(normalized) == Python content addressing.
    assert set(rows) == {
        get_sha1(normalize_wikitext(r)) for r in (REF_A, REF_B, REF_C)
    }


def test_flagship_lifecycle_query(spark, pipeline):
    d = pipeline["deduped"]
    out = {
        r.raw_sha1: r
        for r in citations_at_revision(d, 100, 1002, 1005, 1003).collect()
    }
    a, b = get_sha1(REF_A), get_sha1(REF_B)
    assert set(out) == {a, b}
    # A: seen at 1001,1002,1004; absent at 1003 => removed_at 1003; not
    # visible at latest (1005).
    assert out[a].first_seen_id == 1001
    assert out[a].last_seen_id == 1004
    assert out[a].appearance_count == 3
    assert out[a].currently_visible is False
    assert out[a].removed_at_revision_id == 1003
    assert out[a].reference_type == "inline"
    assert out[a].first_seen_ts == "2020-01-01 00:00:00"
    assert out[a].last_seen_ts == "2020-01-04 00:00:00"
    # B: present 1002..1005, still visible, never removed.
    assert out[b].first_seen_id == 1002
    assert out[b].last_seen_id == 1005
    assert out[b].appearance_count == 4
    assert out[b].currently_visible is True
    assert out[b].removed_at_revision_id is None


def test_warehouse_ids_and_fk_resolution(pipeline):
    w = pipeline["warehouse"]
    ci = {r.raw_sha1: r for r in w["citation_instances"].collect()}
    nc = {r.normalized_sha1: r for r in w["normalized_citations"].collect()}
    a = get_sha1(REF_A)
    norm_a_sha = get_sha1(normalize_wikitext(REF_A))
    # FK: instance.normalized_id == id of its normalized citation.
    assert ci[a].normalized_id == nc[norm_a_sha].id
    # History rows reference instance ids that exist.
    hist_ids = {r.citation_instance_id for r in w["citation_histories"].collect()}
    assert hist_ids == {r.id for r in ci.values()}
    # ncwr links resolve to real web_resources.
    wr_ids = {r.id for r in w["web_resources"].collect()}
    for r in w["ncwr"].collect():
        assert r.web_resource_id in wr_ids
    # documents resolve from curid web_resources.
    doc_ids = {r.id for r in w["documents"].collect()}
    curid = [
        r for r in w["web_resources"].collect() if r.numeric_page_id is not None
    ]
    assert curid and all(r.instance_of_document in doc_ids for r in curid)
    # url_hash is md5 (reference:models.py:57-59).
    import hashlib

    some = curid[0]
    assert some.url_hash == hashlib.md5(some.url.encode()).hexdigest()


def test_orphan_stats_zero_on_consistent_fixture(pipeline):
    stats = orphan_stats(pipeline["deduped"])
    assert stats == {"orphan_citation_histories": 0, "orphan_ncwr": 0}


def test_idempotent_rerun_same_ids(pipeline):
    """Deterministic ids: rebuilding the warehouse yields identical ids
    (SURVEY §2.8 U4 reproducibility requirement)."""
    w1 = build_warehouse(pipeline["deduped"])
    w2 = build_warehouse(pipeline["deduped"])
    ids1 = sorted(r.id for r in w1["citation_instances"].collect())
    ids2 = sorted(r.id for r in w2["citation_instances"].collect())
    assert ids1 == ids2
