"""Behavior tests for extract_references, ported from the reference spec
(reference:tests/test_article_extract_references.py:1-58, per FIXTURES.md
§3), plus additional coverage for urls/templates payloads."""

from wiki_references_db_spark.functions.extract import extract_references


def _by_raw(results):
    return {r["raw_reference"]: r for r in results}


def test_extract_references_types_and_offsets_and_dedupe_external_links():
    wikitext = (
        "Lead text. <!-- <ref>https://comment.invalid</ref> -->\n"
        "Inline <ref name=foo>https://example.com/a</ref> then more.\n"
        "And a short footnote {{Sfn|Smith|2020|p=12}} here.\n"
        "\n"
        "==External links==\n"
        "* [https://archive.org Internet Archive]\n"
        "\n"
        "==Other section==\n"
        "* No links here\n"
        "* Has a bare url https://example.com/b\n"
        "\n"
        "Standalone https://example.com/c at end.\n"
    )

    results = extract_references(wikitext, include_offsets=True)
    by_raw = _by_raw(results)

    ref_raw = "<ref name=foo>https://example.com/a</ref>"
    assert ref_raw in by_raw
    assert by_raw[ref_raw]["reference_name"] == "foo"
    assert by_raw[ref_raw]["offset_start"] == wikitext.find(ref_raw)
    assert by_raw[ref_raw]["length"] == len(ref_raw)
    assert by_raw[ref_raw]["reference_type"] == 1
    assert by_raw[ref_raw]["urls"] == ["https://example.com/a"]

    sfn_raw = "{{Sfn|Smith|2020|p=12}}"
    assert sfn_raw in by_raw
    assert by_raw[sfn_raw]["reference_name"] is None
    assert by_raw[sfn_raw]["offset_start"] == wikitext.find(sfn_raw)
    assert by_raw[sfn_raw]["templates"][0]["template_name"] == "Sfn"
    assert by_raw[sfn_raw]["templates"][0]["parameters"] == [
        {"key": "1", "value": "Smith"},
        {"key": "2", "value": "2020"},
        {"key": "p", "value": "12"},
    ]

    list_raw = "* [https://archive.org Internet Archive]"
    assert list_raw in by_raw
    assert by_raw[list_raw]["offset_start"] == wikitext.find(list_raw)
    assert by_raw[list_raw]["reference_type"] == 2  # endnote (ref section)
    assert by_raw[list_raw]["urls"] == ["https://archive.org"]

    # Bare URL list item in non-reference section should be included
    item_raw = "* Has a bare url https://example.com/b"
    assert item_raw in by_raw
    assert by_raw[item_raw]["reference_type"] == 0

    # List item without URL in non-reference section is NOT captured
    assert "* No links here" not in by_raw

    # Standalone URL included; URL inside <ref> NOT re-emitted standalone
    assert "https://example.com/c" in by_raw
    assert "https://example.com/a" not in by_raw

    # Comment content skipped entirely
    assert not any("comment.invalid" in r for r in by_raw)


def test_extract_references_self_closing_ref_name():
    wikitext = "X <ref name=bar /> Y"
    results = extract_references(wikitext)
    by_raw = _by_raw(results)
    raw = "<ref name=bar />"
    assert raw in by_raw
    assert by_raw[raw]["reference_name"] == "bar"
    assert by_raw[raw]["offset_start"] == wikitext.find(raw)


def test_extract_cite_template_with_params_and_urls():
    wikitext = (
        "Intro {{cite web |url=http://example.com/page |title=T |"
        "access-date=2023-05-19}} outro.\n"
    )
    results = extract_references(wikitext)
    by_raw = _by_raw(results)
    raw = "{{cite web |url=http://example.com/page |title=T |access-date=2023-05-19}}"
    assert raw in by_raw
    r = by_raw[raw]
    assert r["reference_type"] == 0
    assert r["urls"] == ["http://example.com/page"]
    tpl = r["templates"][0]
    assert tpl["template_name"] == "cite web"
    assert {p["key"]: p["value"] for p in tpl["parameters"]} == {
        "url": "http://example.com/page",
        "title": "T",
        "access-date": "2023-05-19",
    }
    # URL inside the captured template is not re-emitted standalone
    assert "http://example.com/page" not in by_raw


def test_extract_multiple_templates_in_one_ref():
    wikitext = "<ref>{{cite web|url=http://a.com|title=A}} and {{sfn|B|2001}}</ref>"
    results = extract_references(wikitext)
    assert len(results) == 1
    tpls = results[0]["templates"]
    assert [t["template_name"] for t in tpls] == ["cite web", "sfn"]
    assert results[0]["urls"] == ["http://a.com"]


def test_extract_domain_config_it():
    wikitext = "==Collegamenti esterni==\n* [https://example.it Sito]\n"
    results = extract_references(wikitext, domain="it.wikipedia.org")
    by_raw = _by_raw(results)
    assert "* [https://example.it Sito]" in by_raw
    assert by_raw["* [https://example.it Sito]"]["reference_type"] == 2


def test_extract_empty_and_none():
    assert extract_references("") == []
    assert extract_references(None) == []


# Per-domain golden coverage for every domain in the reference's config
# (reference:wikis.yaml:1-49, reference:wiki_config.py:12-33): section
# recognition, template prefix match, template exact match, and the
# en fallback for unknown domains.


def test_extract_domain_config_it_template_prefix_and_exact():
    wikitext = (
        "<ref>{{Cita libro|titolo=T|url=http://libro.it}}</ref>\n"
        "<ref>{{Citazione|testo=Q}}</ref>"
    )
    results = extract_references(wikitext, domain="it.wikipedia.org")
    names = sorted(
        t["template_name"] for r in results for t in r["templates"]
    )
    # MediaWiki-canonical capitalization is preserved in the emitted name;
    # matching against the config is case-insensitive.
    assert names == ["Cita libro", "Citazione"]


def test_extract_domain_config_af_sections():
    wikitext = "==Eksterne skakels==\n* [https://voorbeeld.af Webwerf]\n"
    results = extract_references(wikitext, domain="af.wikipedia.org")
    by_raw = _by_raw(results)
    assert "* [https://voorbeeld.af Webwerf]" in by_raw
    assert by_raw["* [https://voorbeeld.af Webwerf]"]["reference_type"] == 2


def test_extract_domain_config_af_template_exact():
    wikitext = "<ref>{{Verwysing|titel=T|url=http://bron.af}}</ref>"
    results = extract_references(wikitext, domain="af.wikipedia.org")
    assert len(results) == 1
    tpls = results[0]["templates"]
    assert [t["template_name"] for t in tpls] == ["Verwysing"]
    assert results[0]["urls"] == ["http://bron.af"]


def test_extract_unknown_domain_falls_back_to_en():
    # reference:wiki_config.py:12-15 — unknown domains use the
    # en.wikipedia.org config.
    wikitext = "==References==\n* [https://example.org Src]\n"
    results = extract_references(wikitext, domain="xx.wikipedia.org")
    by_raw = _by_raw(results)
    assert "* [https://example.org Src]" in by_raw
    assert by_raw["* [https://example.org Src]"]["reference_type"] == 2

    # it sections are NOT recognized under the en fallback: the external
    # link is still captured, but as a bare URL reference (type 0), not
    # an endnote from a recognized reference section (type 2).
    wikitext_it = "==Collegamenti esterni==\n* [https://example.it Sito]\n"
    it_rows = _by_raw(extract_references(wikitext_it, domain="xx.wikipedia.org"))
    assert it_rows["* [https://example.it Sito]"]["reference_type"] == 0
