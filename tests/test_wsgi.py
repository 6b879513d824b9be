"""WSGI transport over the api_v1 router: direct PEP-3333 calls AND a
real HTTP round-trip through wsgiref + http.client on a live socket —
the transport layer the transport-free router tests leave out."""

from __future__ import annotations

import json
import threading

import pytest

from tests.test_serving import warehouse  # noqa: F401  (module-scoped fixture)
from wiki_references_db_spark.router import ServingRouter
from wiki_references_db_spark.wsgi import make_wsgi_app, serve


@pytest.fixture(scope="module")
def app(warehouse):  # noqa: F811
    return make_wsgi_app(ServingRouter(warehouse))


def _call(app, method, path, query=""):
    from wsgiref.util import setup_testing_defaults

    environ = {}
    setup_testing_defaults(environ)
    environ.update(
        REQUEST_METHOD=method, PATH_INFO=path, QUERY_STRING=query
    )
    out = {}

    def start_response(status, headers):
        out["status"] = int(status.split()[0])
        out["headers"] = dict(headers)

    body = b"".join(app(environ, start_response))
    out["json"] = json.loads(body)
    assert out["headers"]["Content-Type"] == "application/json"
    assert int(out["headers"]["Content-Length"]) == len(body)
    return out


def test_wsgi_error_statuses(app):
    assert _call(app, "GET", "/api/v1/article")["status"] == 400  # url required
    assert _call(app, "GET", "/api/v1/nope")["status"] == 404
    assert _call(app, "POST", "/api/v1/article")["status"] == 405
    # Flask converter semantics survive the transport: non-int id -> 404
    assert _call(app, "GET", "/api/v1/article/abc/revisions")["status"] == 404
    body = _call(app, "GET", "/api/v1/citation/deadbeef")
    assert body["status"] == 404 and body["json"]["code"] == 404


def test_wsgi_head_mirrors_get(app):
    """Flask auto-handles HEAD on GET routes; the WSGI layer does the
    same — identical status and Content-Length, no body."""
    from wsgiref.util import setup_testing_defaults

    get = _call(app, "GET", "/api/v1/article")  # 400 with a JSON body
    environ = {}
    setup_testing_defaults(environ)
    environ.update(REQUEST_METHOD="HEAD", PATH_INFO="/api/v1/article")
    out = {}

    def start_response(status, headers):
        out["status"] = int(status.split()[0])
        out["headers"] = dict(headers)

    body = b"".join(app(environ, start_response))
    assert out["status"] == get["status"] == 400
    assert body == b""
    assert int(out["headers"]["Content-Length"]) == len(
        json.dumps(get["json"]).encode()
    )


def test_wsgi_rows_match_router(app, warehouse):  # noqa: F811
    from tests.test_serving import REF_A
    from wiki_references_db_spark.functions.wikitext import (
        get_sha1,
        normalize_wikitext,
    )

    sha = get_sha1(normalize_wikitext(REF_A))
    direct = ServingRouter(warehouse).dispatch(
        "GET", f"/api/v1/citation/{sha}"
    )
    via_wsgi = _call(app, "GET", f"/api/v1/citation/{sha}")
    assert via_wsgi["status"] == direct.status == 200
    want = [r.asDict(recursive=True) for r in direct.df.collect()]
    # JSON round-trip stringifies non-native cells identically
    assert via_wsgi["json"] == json.loads(
        json.dumps(want, default=str)
    )
    assert len(via_wsgi["json"]) >= 1


def test_wsgi_query_params_reach_router(app):
    # limit cap + offset through a real query string (fixture page 100;
    # router caps limit at 1000 — reference:api_v1.py:26-27)
    got = _call(
        app, "GET", "/api/v1/article/100/revisions", "limit=999999&offset=0"
    )
    assert got["status"] == 200
    assert 1 <= len(got["json"]) <= 1000
    rev_ids = {r["revision_id"] for r in got["json"]}
    assert rev_ids == {1001, 1002, 1003, 1004, 1005}


def test_wsgi_real_tcp_round_trip(warehouse):  # noqa: F811
    """Live socket: wsgiref server on an ephemeral port, http.client
    GETs — the full transport path, not just the callable."""
    import http.client

    server = serve(ServingRouter(warehouse), port=0)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.request("GET", "/api/v1/article")
        resp = conn.getresponse()
        assert resp.status == 400
        assert json.loads(resp.read())["code"] == 400
        conn.request("GET", "/api/v1/article/100/revisions?limit=2")
        resp = conn.getresponse()
        assert resp.status == 200
        rows = json.loads(resp.read())
        assert isinstance(rows, list) and len(rows) == 2
        conn.close()
    finally:
        server.shutdown()
        t.join(timeout=10)
        server.server_close()


def test_wsgi_flagship_e2e_sf01(spark):
    """End-to-end at the driver's bench scale (sf0.1): a REAL wsgiref
    server over a warehouse built from the synthetic corpus serves the
    flagship citations endpoint, and the HTTP JSON equals the registered
    ``serving_article_citations`` DataFrame (the reference's
    api_v1.py:145-364 contract, through the transport) — same page,
    same target revision, same raw/limit params, row-for-row and
    order-for-order."""
    import http.client

    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.queries.serving_query import (
        derive_warehouse_for_page,
        resolve_target_params,
    )
    from wiki_references_db_spark.router import Result
    from wiki_references_db_spark.wsgi import result_body

    sf_dir = "/root/testdata/sf0.1"
    p = resolve_target_params(spark, sf_dir)
    # Page-sliced warehouse, checkpointed once so the HTTP request and
    # the expected DataFrame read the identical materialized input
    # (and the request stays in the ~seconds budget).
    wh = {
        k: v.localCheckpoint(eager=True)
        for k, v in derive_warehouse_for_page(spark, sf_dir, p["page_id"]).items()
    }

    expected_df = all_queries()["serving_article_citations"](spark, sf_dir)
    want = json.loads(result_body(Result(200, expected_df)))
    assert len(want) > 0

    server = serve(ServingRouter(wh), port=0)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection(host, port, timeout=120)
        conn.request(
            "GET",
            f"/api/v1/article/{p['page_id']}/citations"
            f"?raw=true&revision_id={p['target_revision_id']}&limit=100",
        )
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "application/json"
        got = json.loads(resp.read())
        conn.close()
    finally:
        server.shutdown()
        t.join(timeout=10)
        server.server_close()

    assert got == want
