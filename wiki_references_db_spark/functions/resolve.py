"""Title -> curid URL resolution (SURVEY.md §2.9 F10,
reference:explorer.py:43-94).

The reference resolves title-based Wikipedia URLs to canonical
curid-based URLs through the live MediaWiki API with an LRU cache.  A
network side-effect does not belong inside a query engine, so this
module splits the operator:

- ``parse_wikipedia_title_url`` — the pure URL grammar (``/wiki/Title``,
  ``/w/index.php?title=...``, curid passthrough), identical decisions to
  reference:explorer.py:70-94.
- ``make_title_resolver(lookup)`` — the driver-side resolver with the
  reference's memoization, but the page-id lookup is INJECTED (any
  ``(domain, title) -> page_id | None`` callable; tests use a dict, the
  explorer shell would pass an HTTP client).  No live network anywhere
  in this repo.
- ``resolve_title_urls`` — the scale path the reference lacks: bulk
  resolution of a URL column against a (domain, title, page_id) mapping
  table (e.g. a page dump) as a broadcast join, all JVM expressions.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from functools import lru_cache
from urllib.parse import parse_qs, urlparse

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WIKI_PATH = re.compile(r"^/wiki/(.+)$")
_INDEX_PATHS = ("/w/index.php", "/wiki/index.php")

# Sentinel: the URL is already curid-canonical; return it unchanged.
ALREADY_CURID = object()


def parse_wikipedia_title_url(url: str) -> tuple[str, str] | object | None:
    """Classify a URL exactly as reference:explorer.py:70-94 does:
    returns ``(domain, title)`` for a title-style URL, ``ALREADY_CURID``
    for an index.php?curid= URL, ``None`` for anything unrecognized."""
    parsed = urlparse(url or "")
    domain, title = parsed.netloc, None
    m = _WIKI_PATH.match(parsed.path)
    if m:
        title = m.group(1)
    if parsed.path in _INDEX_PATHS:
        qs = parse_qs(parsed.query)
        if "title" in qs:
            title = qs["title"][0]
        elif "curid" in qs:
            return ALREADY_CURID
    if not title or not domain:
        return None
    return domain, title


def curid_url(domain: str, page_id: int | str) -> str:
    return f"https://{domain}/w/index.php?curid={page_id}"


def make_title_resolver(
    lookup: Callable[[str, str], int | str | None],
    maxsize: int = 1024,
) -> Callable[[str], str | None]:
    """Build the reference's ``resolve_wikipedia_url_to_curid`` with the
    page-id lookup injected.  Memoized per (domain, title) with the same
    LRU size as reference:explorer.py:43 (1024 entries); lookup failures
    (None / exception) resolve to None without caching poisoning other
    titles."""

    @lru_cache(maxsize=maxsize)
    def _resolve(domain: str, title: str) -> str | None:
        try:
            page_id = lookup(domain, title)
        except Exception:
            return None
        if page_id is None:
            return None
        return curid_url(domain, page_id)

    def resolve(url: str) -> str | None:
        parsed = parse_wikipedia_title_url(url)
        if parsed is ALREADY_CURID:
            return url
        if parsed is None:
            return None
        return _resolve(*parsed)

    resolve.cache_info = _resolve.cache_info  # type: ignore[attr-defined]
    return resolve


def title_url_parts(url: Column) -> tuple[Column, Column, Column]:
    """JVM-side twin of ``parse_wikipedia_title_url``: (domain, title,
    is_curid) columns.  ``parse_url`` + ``regexp_extract`` — no Python.

    Precedence mirrors the Python grammar, including the
    ``/wiki/index.php`` corner (an index path that ALSO matches the
    ``/wiki/`` regexp): on an index path a non-blank ``?title=`` wins,
    else a non-blank ``?curid=`` means curid passthrough, else the
    ``/wiki/`` capture (possibly the literal ``index.php``) stands.
    Blank query values are treated as absent — ``parse_qs`` drops them
    on the Python side.

    Value decoding mirrors ``parse_qs`` too: ``?title=`` values are
    form-decoded (``+``/``%20`` -> space, ``%XX`` unescaped) via
    ``try_url_decode``, falling back to the raw value on malformed
    escapes (where ``unquote_plus`` keeps invalid ``%`` sequences
    literal).  The ``/wiki/`` PATH capture stays raw on both sides
    (``urlparse().path`` is not decoded).  Residual divergence is
    confined to malformed-escape query values whose raw and
    kept-literal forms differ, e.g. ``title=%zz+x`` (Python yields
    ``%zz x``, the fallback keeps ``%zz+x``)."""
    domain = F.parse_url(url, F.lit("HOST"))
    path = F.parse_url(url, F.lit("PATH"))
    wiki_title = F.regexp_extract(path, r"^/wiki/(.+)$", 1)
    qs_title_raw = F.parse_url(url, F.lit("QUERY"), F.lit("title"))
    qs_title = F.coalesce(F.try_url_decode(qs_title_raw), qs_title_raw)
    curid = F.parse_url(url, F.lit("QUERY"), F.lit("curid"))
    is_index = path.isin(*_INDEX_PATHS)
    # NULL-when-blank: parse_qs(keep_blank_values=False) never yields
    # empty values, while parse_url returns "" for `title=` — normalize.
    qs_t = F.when(qs_title != "", qs_title)
    curid_nn = F.when(curid != "", curid)
    wiki_t = F.when(wiki_title != "", wiki_title)
    title = F.when(
        is_index, F.coalesce(qs_t, F.when(curid_nn.isNull(), wiki_t))
    ).otherwise(wiki_t)
    is_curid = is_index & qs_t.isNull() & curid_nn.isNotNull()
    return domain, title, is_curid


def resolve_title_urls(
    urls: DataFrame, mapping: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Bulk F10: resolve every title-style URL in ``urls`` against a
    ``(domain, title, page_id)`` mapping table.  Adds ``resolved_url``
    (curid URL, passthrough for already-curid URLs, NULL when
    unrecognized or unmapped — the reference's None).  The mapping side
    is broadcast when small; at dump scale drop the hint and let AQE
    pick the join."""
    u = urls
    domain, title, is_curid = title_url_parts(F.col(url_col))
    u = (
        u.withColumn("__domain", domain)
        .withColumn("__title", title)
        .withColumn("__is_curid", is_curid)
    )
    m = mapping.select(
        F.col("domain").alias("__domain"),
        F.col("title").alias("__title"),
        "page_id",
    )
    joined = u.join(F.broadcast(m), ["__domain", "__title"], "left")
    resolved = (
        F.when(F.col("__is_curid"), F.col(url_col))
        .when(
            F.col("page_id").isNotNull(),
            F.concat(
                F.lit("https://"),
                F.col("__domain"),
                F.lit("/w/index.php?curid="),
                F.col("page_id").cast("string"),
            ),
        )
    )
    return joined.withColumn("resolved_url", resolved).drop(
        "__domain", "__title", "__is_curid", "page_id"
    )
