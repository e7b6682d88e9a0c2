"""Shopify-shaped REST capture client (S5 + the S2-S4 fetch side).

The reference's client (``/root/reference/services/shopifyApi.js:17-45``)
issues ONE ``limit=250`` GET per entity and silently truncates every tenant
with more rows — it never follows the API's ``Link: <...>; rel="next"``
cursor header. This client is the corrected capture step: it walks the
cursor chain to exhaustion, writing each response body verbatim to
``page-<N>.json`` files.

Engine boundary (why this is driver-side code in a Spark repo): the fetch
loop is sequential metadata-scale I/O against a rate-limited API — there is
nothing to distribute, and Shopify cursors are inherently serial. The DATA
path is ``ingest.ingest_entity_pages``: one distributed scan over the whole
capture directory, page files as input splits, overlap resolution as a
keyed window. Capture cost grows with the API's page count; engine cost
grows with cluster size. (At real scale the capture step runs as many
independent per-tenant/per-entity loops — parallelism across tenants, not
within a cursor chain.)

Stdlib-only (urllib) so it runs in this container; the transport is
injectable for tests and for swapping in a pooled HTTP client.
"""

from __future__ import annotations

import json
import os
import re
import urllib.request
from collections.abc import Callable

# reference parity: the "CRITICAL FIX" prefix strip (shopifyApi.js:10-13),
# generalized to both schemes
_SCHEME_RE = re.compile(r"^https?://")


def clean_domain(shop_domain: str) -> str:
    """F9: strip a scheme prefix from a stored shop domain."""
    return _SCHEME_RE.sub("", shop_domain)


def _default_transport(url: str, headers: dict[str, str]) -> tuple[bytes, dict]:
    """GET ``url`` -> (body bytes, response headers). Swap via the
    ``transport=`` parameter (tests use a local HTTP server; production
    wants a pooled client with retry/backoff)."""
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req) as resp:  # noqa: S310 - caller-built URL
        return resp.read(), dict(resp.headers)


_NEXT_LINK_RE = re.compile(r'<([^>]+)>;\s*rel="next"')


def parse_next_link(link_header: str | None) -> str | None:
    """Extract the rel="next" URL from a Link header (the cursor the
    reference never follows)."""
    if not link_header:
        return None
    m = _NEXT_LINK_RE.search(link_header)
    return m.group(1) if m else None


def fetch_entity_pages(
    base_url: str,
    endpoint: str,
    access_token: str,
    out_dir: str,
    entity: str,
    limit: int = 250,
    max_pages: int = 10_000,
    transport: Callable[[str, dict[str, str]], tuple[bytes, dict]] | None = None,
) -> list[str]:
    """Walk ``{base_url}/{endpoint}?limit={limit}`` through its Link-header
    cursor chain, writing each page body to ``{out_dir}/page-<N>.json``.
    Returns the written paths. Stops ONLY on: no next link, or
    ``max_pages`` fetches (a loop guard against a server that links to
    itself — hitting it raises, because silent truncation is exactly the
    defect this exists to fix). A mid-chain EMPTY page does not end the
    walk — filtered endpoints and eventually-consistent APIs can serve an
    empty array that still carries ``rel="next"``; breaking there would
    drop every later page with no error (the same silent-truncation
    class). Empty pages are skipped on disk (nothing to ingest), so the
    page-file numbering stays contiguous.

    The walk writes into a sibling ``._staging`` directory and swaps it
    over ``out_dir`` (demote/promote renames, the silver-swap pattern)
    only after the cursor chain completes. Clearing ``out_dir`` up front
    and writing in place had the inverse durability hole: a transport
    error mid-walk destroyed the previous COMPLETE capture and left a
    partial, contiguously-numbered page set a later ingest would read as
    a complete (silently truncated) capture — the exact defect class this
    function documents itself as preventing. ``out_dir`` is wholly owned
    by this function (it holds nothing but the page files), and a
    re-capture of a tenant whose data shrank can leave no stale
    higher-numbered pages behind because the swap replaces the directory
    as a unit."""
    import shutil

    transport = transport or _default_transport
    headers = {
        "X-Shopify-Access-Token": access_token,
        "Content-Type": "application/json",
    }
    staging = out_dir.rstrip("/") + "._staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    os.makedirs(staging)
    sep = "&" if "?" in endpoint else "?"
    url: str | None = f"{base_url.rstrip('/')}/{endpoint}{sep}limit={limit}"
    staged: list[str] = []
    fetches = 0
    while url:
        fetches += 1
        if fetches > max_pages:
            raise RuntimeError(
                f"pagination exceeded max_pages={max_pages} at {url!r}; "
                "refusing to truncate silently"
            )
        body, resp_headers = transport(url, headers)
        rows = json.loads(body).get(entity, [])
        link = next(
            (v for k, v in resp_headers.items() if k.lower() == "link"), None
        )
        if rows or not staged:
            # an empty FIRST page is still written: the capture dir must
            # exist with evidence of the (empty) sweep
            path = os.path.join(staging, f"page-{len(staged) + 1}.json")
            with open(path, "wb") as f:
                f.write(body)
            staged.append(path)
        url = parse_next_link(link)
    # complete walk -> promote the staging dir. A crash inside the swap
    # leaves either the old capture intact (pre-demote) or no out_dir at
    # all (a reader fails loudly; the next capture rebuilds) — never a
    # silently truncated page set.
    backup = out_dir.rstrip("/") + "._backup"
    if os.path.exists(backup):
        shutil.rmtree(backup)
    if os.path.exists(out_dir):
        os.rename(out_dir, backup)
    os.rename(staging, out_dir)
    if os.path.exists(backup):
        shutil.rmtree(backup)
    return [os.path.join(out_dir, os.path.basename(p)) for p in staged]


ENTITY_ENDPOINTS = {
    # entity -> endpoint (orders needs status=any, shopifyApi.js:41)
    "customers": "customers.json",
    "orders": "orders.json?status=any",
    "products": "products.json",
}


def capture_tenant(
    shop_domain: str,
    access_token: str,
    out_root: str,
    limit: int = 250,
    transport: Callable[[str, dict[str, str]], tuple[bytes, dict]] | None = None,
    scheme: str = "https",
) -> dict[str, str]:
    """S12's fetch half: capture customers/orders/products for one tenant
    into ``{out_root}/{entity}/page-N.json`` directories. Returns
    entity -> capture dir, ready for ``ingest.ingest_tenant_capture``."""
    base = f"{scheme}://{clean_domain(shop_domain)}/admin/api/2023-10"
    out: dict[str, str] = {}
    for entity, endpoint in ENTITY_ENDPOINTS.items():
        d = os.path.join(out_root, entity)
        fetch_entity_pages(
            base, endpoint, access_token, d, entity, limit, transport=transport
        )
        out[entity] = d
    return out
