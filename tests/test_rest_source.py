"""Live REST capture against a local paginated HTTP server: the fetch loop
follows Link-header cursors to exhaustion (the reference's client read one
limit=250 page and truncated — ``services/shopifyApi.js:35-45``), writes
page-N.json capture files, and the engine ingests them distributed with
overlap resolution."""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from xboard_spark import ingest
from xboard_spark.sources import rest

CUSTOMERS = [
    {"id": i, "email": f"u{i}@x.com", "first_name": f"U{i}", "last_name": "T",
     "created_at": f"2024-01-{i:02d}T00:00:00Z"}
    for i in range(1, 8)  # 7 rows -> 3 pages at limit=3: the truncation case
]


class _PagedShopify(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        if self.headers.get("X-Shopify-Access-Token") != "tok-123":
            self.send_response(401)
            self.end_headers()
            return
        u = urlparse(self.path)
        q = parse_qs(u.query)
        limit = int(q.get("limit", ["250"])[0])
        since = int(q.get("since_id", ["0"])[0])
        rows = [c for c in CUSTOMERS if c["id"] > since][:limit]
        body = json.dumps({"customers": rows}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        if rows and rows[-1]["id"] < CUSTOMERS[-1]["id"]:
            nxt = (f"http://{self.headers['Host']}{u.path}"
                   f"?limit={limit}&since_id={rows[-1]['id']}")
            self.send_header("Link", f'<{nxt}>; rel="next"')
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _PagedShopify)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_parse_next_link():
    assert rest.parse_next_link(
        '<https://a/x?page_info=abc>; rel="next"') == "https://a/x?page_info=abc"
    assert rest.parse_next_link(
        '<https://a/p>; rel="previous", <https://a/n>; rel="next"') == "https://a/n"
    assert rest.parse_next_link('<https://a/p>; rel="previous"') is None
    assert rest.parse_next_link(None) is None


def test_clean_domain():
    assert rest.clean_domain("https://shop.example.com") == "shop.example.com"
    assert rest.clean_domain("shop.example.com") == "shop.example.com"


def test_fetch_follows_cursor_chain(server, tmp_path, spark):
    d = str(tmp_path / "cap" / "customers")
    written = rest.fetch_entity_pages(
        server, "customers.json", "tok-123", d, "customers", limit=3
    )
    assert len(written) == 3  # 7 rows / limit 3 -> pages of 3,3,1
    raw = ingest.ingest_entity_pages(
        spark, d, ingest.CUSTOMER_PAYLOAD, "customers"
    )
    assert sorted(r.id for r in raw.collect()) == [1, 2, 3, 4, 5, 6, 7]
    # the reference's behavior would have been: one page, 3 of 7 rows

    silver = ingest.ingest_tenant_capture(spark, 5, {"customers": d})["customers"]
    got = silver.collect()
    assert len(got) == 7
    assert all(r.tenant_id == 5 for r in got)


def test_fetch_rejects_bad_token(server, tmp_path):
    with pytest.raises(Exception):  # urllib raises HTTPError(401)
        rest.fetch_entity_pages(
            server, "customers.json", "WRONG", str(tmp_path / "x"), "customers"
        )


def test_fetch_loop_guard(tmp_path):
    """A server whose next-link points at itself must raise, not truncate
    silently or loop forever."""
    def transport(url, headers):
        return (json.dumps({"customers": [{"id": 1}]}).encode(),
                {"Link": f'<{url}>; rel="next"'})

    with pytest.raises(RuntimeError, match="max_pages"):
        rest.fetch_entity_pages(
            "http://x", "customers.json", "t", str(tmp_path / "loop"),
            "customers", max_pages=5, transport=transport,
        )


def test_recapture_clears_stale_pages(tmp_path):
    """A tenant whose data SHRANK between captures must not resurrect old
    rows: stale higher-numbered page files from the previous sweep would
    win ingest_entity_pages' highest-page-wins window."""
    out = str(tmp_path / "recap")

    def transport_5pages(url, headers):
        n = int(url.rsplit("p=", 1)[1]) if "p=" in url else 1
        body = json.dumps({"customers": [{"id": n}]}).encode()
        link = {"Link": f'<http://x/c.json?p={n + 1}>; rel="next"'} if n < 5 else {}
        return body, link

    rest.fetch_entity_pages(
        "http://x", "c.json", "t", out, "customers", transport=transport_5pages
    )
    assert len(os.listdir(out)) == 5

    def transport_2pages(url, headers):
        n = int(url.rsplit("p=", 1)[1]) if "p=" in url else 1
        body = json.dumps({"customers": [{"id": 100 + n}]}).encode()
        link = {"Link": f'<http://x/c.json?p={n + 1}>; rel="next"'} if n < 2 else {}
        return body, link

    written = rest.fetch_entity_pages(
        "http://x", "c.json", "t", out, "customers", transport=transport_2pages
    )
    assert len(written) == 2
    assert sorted(os.listdir(out)) == ["page-1.json", "page-2.json"]


def test_mid_chain_empty_page_does_not_truncate(tmp_path):
    """An empty entity array that still carries rel="next" (filtered /
    eventually-consistent endpoints) must not end the walk — the old
    break-on-empty dropped every later page silently."""
    pages = {
        1: ([{"id": 1}], 2),
        2: ([], 3),  # empty mid-chain page WITH a next link
        3: ([{"id": 3}], None),
    }

    def transport(url, headers):
        n = int(url.rsplit("p=", 1)[1]) if "p=" in url else 1
        rows, nxt = pages[n]
        link = {"Link": f'<http://x/c.json?p={nxt}>; rel="next"'} if nxt else {}
        return json.dumps({"customers": rows}).encode(), link

    written = rest.fetch_entity_pages(
        "http://x", "c.json", "t", str(tmp_path / "mid"), "customers",
        transport=transport,
    )
    # two non-empty pages written contiguously; page 3's row survived
    assert [os.path.basename(p) for p in written] == ["page-1.json", "page-2.json"]
    ids = {
        row["id"]
        for p in written
        for row in json.loads(open(p).read())["customers"]
    }
    assert ids == {1, 3}


def test_mid_walk_transport_error_preserves_previous_capture(tmp_path):
    """A transport error mid-walk must not destroy the previous COMPLETE
    capture: the old clear-then-write-in-place left a partial,
    contiguously-numbered page set that a later ingest would read as a
    complete (silently truncated) capture. The staging-dir swap promotes
    a new capture only after the whole cursor chain succeeds."""
    out = str(tmp_path / "durable")

    def transport_ok(url, headers):
        n = int(url.rsplit("p=", 1)[1]) if "p=" in url else 1
        body = json.dumps({"customers": [{"id": n}]}).encode()
        link = {"Link": f'<http://x/c.json?p={n + 1}>; rel="next"'} if n < 3 else {}
        return body, link

    rest.fetch_entity_pages(
        "http://x", "c.json", "t", out, "customers", transport=transport_ok
    )
    before = {
        p: open(os.path.join(out, p)).read() for p in sorted(os.listdir(out))
    }
    assert len(before) == 3

    def transport_dies_on_page_2(url, headers):
        n = int(url.rsplit("p=", 1)[1]) if "p=" in url else 1
        if n >= 2:
            raise OSError("connection reset mid-walk")
        return transport_ok(url, headers)

    with pytest.raises(OSError):
        rest.fetch_entity_pages(
            "http://x", "c.json", "t", out, "customers",
            transport=transport_dies_on_page_2,
        )
    after = {
        p: open(os.path.join(out, p)).read() for p in sorted(os.listdir(out))
    }
    assert after == before  # previous complete capture untouched
