"""Serving-layer endpoint functions over the fixture warehouse."""

import os

import pytest

from wiki_references_db_spark.functions.wikitext import get_sha1, normalize_wikitext
from wiki_references_db_spark.plans.dedup_tables import dedup_staging
from wiki_references_db_spark.plans.stage import stage_revisions
from wiki_references_db_spark.plans.warehouse import build_warehouse
from wiki_references_db_spark.queries import serving
from wiki_references_db_spark.sources.mwrev import read_mwrev_bundles, write_mwrev_zst
from tests.test_wiki_pipeline import FIXTURE, REF_A, REF_B, REF_C


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    bundle_dir = tmp_path_factory.mktemp("bundles_srv")
    write_mwrev_zst(os.path.join(bundle_dir, "fixture-00.mwrev.zst"), FIXTURE)
    raw = read_mwrev_bundles(spark, str(bundle_dir))
    deduped = dedup_staging(stage_revisions(raw, domain="en.wikipedia.org"))
    w = build_warehouse(deduped)
    return {k: v.localCheckpoint() for k, v in w.items()}


def test_article_revisions_counts(warehouse):
    rows = {r.revision_id: r for r in serving.article_revisions(warehouse, 100).collect()}
    assert set(rows) == {1001, 1002, 1003, 1004, 1005}
    assert rows[1001].citation_count == 1   # A only
    assert rows[1002].citation_count == 2   # A + B
    assert rows[1003].citation_count == 1   # B only
    assert rows[1005].parent_revision_id == 1004


def test_article_citations_hydrated(warehouse):
    out = {
        r.normalized_sha1: r
        for r in serving.article_citations(warehouse, 100, revision_id=1002).collect()
    }
    a_sha = get_sha1(normalize_wikitext(REF_A))
    b_sha = get_sha1(normalize_wikitext(REF_B))
    assert set(out) == {a_sha, b_sha}
    a = out[a_sha]
    assert a.reference_type == "inline"
    assert a.reference_name == "a"
    assert a.first_seen_id == 1001 and a.last_seen_id == 1004
    assert a.appearance_count == 3
    assert a.currently_visible is False
    assert a.removed_at_revision_id == 1003
    assert [l.url for l in a.extracted_links] == ["https://a.example/x"]
    b = out[b_sha]
    assert b.currently_visible is True
    assert b.removed_at_revision_id is None
    assert b.templates[0].template_name == "Sfn"
    assert dict(b.templates[0].parameters) == {"1": "Smith", "2": "2020", "p": "1"}
    assert [oa.page_id for oa in b.other_articles] == [100]


def test_article_citations_default_latest_revision(warehouse):
    out = serving.article_citations(warehouse, 100).collect()
    shas = {r.normalized_sha1 for r in out}
    assert shas == {get_sha1(normalize_wikitext(REF_B))}  # only B at rev 1005
    assert out[0].currently_visible is True


def test_article_citations_raw_mode(warehouse):
    out = {r.raw_sha1: r for r in serving.article_citations(
        warehouse, 100, revision_id=1002, raw=True).collect()}
    assert set(out) == {get_sha1(REF_A), get_sha1(REF_B)}
    assert "normalized_sha1" not in out[get_sha1(REF_A)].asDict()


def test_citation_history_cross_page(warehouse):
    b_sha = get_sha1(normalize_wikitext(REF_B))
    rows = serving.citation_history(warehouse, b_sha).collect()
    assert [r.revision_id for r in rows] == [1002, 1003, 1004, 1005]
    page_filtered = serving.citation_history(warehouse, b_sha, page_id=100).collect()
    assert len(page_filtered) == 4


def test_citation_detail(warehouse):
    c_sha = get_sha1(normalize_wikitext(REF_C))
    row = serving.citation_detail(warehouse, c_sha).collect()
    assert len(row) == 1
    r = row[0]
    assert r.reference_normalized == normalize_wikitext(REF_C)
    assert [l.url for l in r.extracted_links] == ["http://c.example/page"]
    tpl = r.templates[0]
    assert tpl.template_name == "Cite web"
    assert dict(tpl.parameters) == {"url": "http://c.example/page", "title": "C"}


def test_template_report(warehouse):
    tpl = {r.name: r for r in warehouse["wiki_templates"].collect()}
    rows = serving.template_report(
        warehouse, tpl["Cite web"].id, "url", "http://c.example/page"
    ).collect()
    assert len(rows) == 1
    assert rows[0].normalized_sha1 == get_sha1(normalize_wikitext(REF_C))


def test_web_resource_lookup(warehouse):
    rows = serving.web_resource_lookup(warehouse, "https://a.example/x").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.domain == "a.example"
    assert [x.normalized_sha1 for x in r.referenced_by] == [
        get_sha1(normalize_wikitext(REF_A))
    ]


def test_name_only_refs_regex(warehouse):
    rows = serving.name_only_refs(warehouse, 100).collect()
    # REF_A has a name but full content => not name-only.
    assert all(not r.is_name_only for r in rows)


def test_pagination_cap(warehouse):
    out = serving.article_revisions(warehouse, 100, limit=2, offset=1).collect()
    assert [r.revision_id for r in out] == [1002, 1003]
