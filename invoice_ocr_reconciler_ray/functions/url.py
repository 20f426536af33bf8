"""URL canonicalization (RFC 3986 subset), stdlib-only.

Canonical form is THE dedup key of web crawling — the same resource
arrives as mixed-case scheme/host, explicit default ports, dot-segments,
shuffled query parameters and fragments, and a corpus that hashes raw
URLs over-counts.  Rules implemented (the standard safe set):

- scheme and host lowercased
- default port dropped (``:80`` for http, ``:443`` for https)
- path dot-segments resolved (RFC 3986 §5.2.4)
- query parameters sorted by (key, value), preserved verbatim otherwise
- fragment stripped
- empty path becomes ``/``

Property-tested in tests/test_url_canonicalize.py (idempotence, variant
collapse); exercised corpus-wide with a SQL oracle in
``pipelines/queries.py:docs_url_canonicalize_census``.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _resolve_dots(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1]:
                out.pop()
            continue
        out.append(seg)
    res = "/".join(out)
    if path.startswith("/") and not res.startswith("/"):
        res = "/" + res
    return res or "/"


def canonicalize_url(url: str) -> str:
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = _resolve_dots(parts.path) if parts.path else "/"
    query = parts.query
    if query:
        pairs = sorted(p for p in query.split("&") if p)
        query = "&".join(pairs)
    return urlunsplit((scheme, netloc, path, query, ""))
