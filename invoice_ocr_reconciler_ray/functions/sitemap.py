"""Real sitemap.xml writer + strict parser (sitemaps.org protocol subset).

The crawl-side coverage artifact next to robots.txt: a host publishes the
URLs it wants indexed; a corpus pipeline parses sitemaps to audit crawl
coverage (which published URLs are missing from the corpus, which corpus
URLs are unlisted).  Deterministic byte layout so manifests are
SQL-mirrorable, like the WARC/tar codecs (functions/warc.py, tar.py):

    <?xml version="1.0" encoding="UTF-8"?>
    <urlset>
    <url><loc>URL</loc><lastmod>YYYY-MM-DD</lastmod></url>   (per entry)
    </urlset>

Record length: 33 + len(url) bytes per entry line (tags+newline), header
39 + 8 = 47 bytes, trailer 9 bytes.  Parser is strict (raises on
malformed structure) and cross-validated against xml.etree in tests.
"""

from __future__ import annotations

import re

_HEADER = b'<?xml version="1.0" encoding="UTF-8"?>\n<urlset>\n'
_TRAILER = b"</urlset>\n"
# <url><loc></loc><lastmod></lastmod></url>\n = 42 bytes of fixed framing
ENTRY_OVERHEAD = len(b"<url><loc></loc><lastmod></lastmod></url>\n")  # 42
HEADER_LEN = len(_HEADER)  # 48 (39 + 9)
TRAILER_LEN = len(_TRAILER)  # 10

_ENTRY_RE = re.compile(
    rb"<url><loc>([^<]*)</loc><lastmod>(\d{4}-\d{2}-\d{2})</lastmod></url>"
)


def write_sitemap(entries: list[tuple[str, str]]) -> bytes:
    """[(url, lastmod-ISO-date)] → deterministic sitemap.xml bytes."""
    out = [_HEADER]
    for url, lastmod in entries:
        out.append(
            b"<url><loc>%s</loc><lastmod>%s</lastmod></url>\n"
            % (url.encode("utf-8"), lastmod.encode("ascii"))
        )
    out.append(_TRAILER)
    return b"".join(out)


def sitemap_length(url_bytes_total: int, n_entries: int) -> int:
    """Exact byte length of :func:`write_sitemap`'s output — the formula the
    SQL oracle mirrors: HEADER + TRAILER + n·(ENTRY_OVERHEAD + 10) +
    Σ len(url)  (every lastmod is exactly 10 bytes)."""
    return (
        HEADER_LEN
        + TRAILER_LEN
        + n_entries * (ENTRY_OVERHEAD + 10)
        + url_bytes_total
    )


def parse_sitemap(data: bytes) -> list[tuple[str, str]]:
    """Strict inverse of :func:`write_sitemap` — raises on malformed input."""
    if not data.startswith(_HEADER) or not data.endswith(_TRAILER):
        raise ValueError("sitemap: bad header/trailer")
    body = data[len(_HEADER) : len(data) - len(_TRAILER)]
    entries: list[tuple[str, str]] = []
    pos = 0
    while pos < len(body):
        m = _ENTRY_RE.match(body, pos)
        if m is None or body[m.end() : m.end() + 1] != b"\n":
            raise ValueError(f"sitemap: malformed entry at byte {pos}")
        entries.append((m.group(1).decode("utf-8"), m.group(2).decode("ascii")))
        pos = m.end() + 1
    return entries
