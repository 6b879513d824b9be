"""F10 title -> curid resolution (functions/resolve.py) with an
injectable fake resolver — semantics pinned to reference:explorer.py:43-94,
no live network."""

from pyspark.sql import Row

from wiki_references_db_spark.functions.resolve import (
    ALREADY_CURID,
    make_title_resolver,
    parse_wikipedia_title_url,
    resolve_title_urls,
)

PAGES = {
    ("en.wikipedia.org", "Apollo_11"): 1001,
    ("de.wikipedia.org", "Berlin"): 2002,
}


def test_url_grammar():
    assert parse_wikipedia_title_url("https://en.wikipedia.org/wiki/Apollo_11") == (
        "en.wikipedia.org",
        "Apollo_11",
    )
    assert parse_wikipedia_title_url(
        "https://en.wikipedia.org/w/index.php?title=Apollo_11"
    ) == ("en.wikipedia.org", "Apollo_11")
    assert (
        parse_wikipedia_title_url("https://en.wikipedia.org/w/index.php?curid=1001")
        is ALREADY_CURID
    )
    assert parse_wikipedia_title_url("https://example.com/article/5") is None
    assert parse_wikipedia_title_url("") is None
    assert parse_wikipedia_title_url(None) is None


def test_resolver_with_fake_lookup():
    calls = []

    def lookup(domain, title):
        calls.append((domain, title))
        return PAGES.get((domain, title))

    resolve = make_title_resolver(lookup)
    assert (
        resolve("https://en.wikipedia.org/wiki/Apollo_11")
        == "https://en.wikipedia.org/w/index.php?curid=1001"
    )
    # Memoized: the second hit must not call the lookup again.
    assert (
        resolve("https://en.wikipedia.org/w/index.php?title=Apollo_11")
        == "https://en.wikipedia.org/w/index.php?curid=1001"
    )
    assert calls == [("en.wikipedia.org", "Apollo_11")]
    # Unknown title -> None (the reference's page_id == -1 branch).
    assert resolve("https://en.wikipedia.org/wiki/No_Such_Page") is None
    # curid URLs pass through untouched.
    url = "https://en.wikipedia.org/w/index.php?curid=42"
    assert resolve(url) == url
    # Non-wiki URL -> None.
    assert resolve("https://example.com/x") is None


def test_resolver_swallows_lookup_errors():
    def lookup(domain, title):
        raise RuntimeError("network down")

    resolve = make_title_resolver(lookup)
    assert resolve("https://en.wikipedia.org/wiki/Apollo_11") is None


def test_bulk_resolution_matches_driver_side(spark):
    urls = spark.createDataFrame(
        [
            Row(url="https://en.wikipedia.org/wiki/Apollo_11"),
            Row(url="https://de.wikipedia.org/w/index.php?title=Berlin"),
            Row(url="https://en.wikipedia.org/w/index.php?curid=42"),
            Row(url="https://en.wikipedia.org/wiki/No_Such_Page"),
            Row(url="https://example.com/x"),
        ]
    )
    mapping = spark.createDataFrame(
        [Row(domain=d, title=t, page_id=p) for (d, t), p in PAGES.items()]
    )
    out = {
        r.url: r.resolved_url
        for r in resolve_title_urls(urls, mapping).collect()
    }
    resolve = make_title_resolver(lambda d, t: PAGES.get((d, t)))
    for url, got in out.items():
        assert got == resolve(url), url


def test_column_twin_matches_python_grammar(spark):
    """title_url_parts must agree with parse_wikipedia_title_url on the
    full precedence grid, including /wiki/index.php legacy forms where
    the index path also matches the /wiki/ regexp."""
    from pyspark.sql import functions as F

    from wiki_references_db_spark.functions.resolve import title_url_parts

    urls = [
        "https://en.wikipedia.org/wiki/Apollo_11",
        "https://en.wikipedia.org/w/index.php?title=Apollo_11",
        "https://en.wikipedia.org/w/index.php?curid=1001",
        "https://en.wikipedia.org/w/index.php?title=Apollo_11&curid=1001",
        "https://en.wikipedia.org/w/index.php",
        "https://en.wikipedia.org/w/index.php?title=",
        "https://en.wikipedia.org/w/index.php?curid=",
        # the legacy corner from the advice: index.php under /wiki/
        "https://en.wikipedia.org/wiki/index.php?title=Apollo_11",
        "https://en.wikipedia.org/wiki/index.php?curid=1001",
        "https://en.wikipedia.org/wiki/index.php",
        "https://en.wikipedia.org/wiki/index.php?title=Apollo_11&curid=7",
        "https://en.wikipedia.org/wiki/index.php?title=&curid=7",
        "https://example.com/article/5",
        # encoded ?title= values: parse_qs form-decodes ('+'/'%20' ->
        # space, %XX unescaped); the Column twin must agree
        "https://en.wikipedia.org/w/index.php?title=Apollo+11",
        "https://en.wikipedia.org/w/index.php?title=Apollo%2011",
        "https://en.wikipedia.org/w/index.php?title=Caf%C3%A9_au_lait",
        "https://en.wikipedia.org/w/index.php?title=A%26B%3DC",
        # encoded title on the PATH stays raw on both sides
        "https://en.wikipedia.org/wiki/Apollo%2011",
    ]
    df = spark.createDataFrame([Row(url=u) for u in urls])
    d, t, c = title_url_parts(F.col("url"))
    got = {
        r.url: (r.d, r.t, r.c)
        for r in df.select(
            "url", d.alias("d"), t.alias("t"), c.alias("c")
        ).collect()
    }
    for u in urls:
        want = parse_wikipedia_title_url(u)
        d_, t_, c_ = got[u]
        if want is ALREADY_CURID:
            assert c_ and t_ is None, u
        elif want is None:
            assert not c_ and (t_ is None or not d_), (u, got[u])
        else:
            assert (d_, t_) == want and not c_, (u, got[u], want)
