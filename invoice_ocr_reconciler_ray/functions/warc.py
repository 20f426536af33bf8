"""Minimal REAL WARC/1.0 writer + parser, stdlib-only.

WARC (ISO 28500) is the container every web crawl ships in, so a
web-scale extraction engine should speak the genuine framing: CRLF
header block, ``Content-Length`` exact-byte payload framing (a payload
containing ``\\r\\n\\r\\n`` MUST still parse — the format is
length-delimited, not sentinel-delimited), and the mandatory two-CRLF
record trailer.  Scope: the deterministic ``resource`` records the
synthetic corpus needs; unknown versions or malformed framing raise
rather than silently misparse.  The record layout is arithmetically
reconstructable (fixed header text + digit widths of the id and the
payload length), which is what makes the round-trip census
SQL-oracle-checkable byte-for-byte — see
``pipelines/queries.py:docs_warc_roundtrip_census``.

Reference shape ≙ the ingest side of the graft's flagship
(sources/pages.py synthesises page payloads; this is the container
those payloads would arrive in on a real crawl).
"""

from __future__ import annotations

_CRLF = b"\r\n"
# fixed bytes of the header block, excluding the variable digit runs:
#   "WARC/1.0\r\n"                                  10
#   "WARC-Type: resource\r\n"                       21
#   "WARC-Record-ID: <urn:doc:" + id + ">\r\n"      25 + d(id) + 3
#   "WARC-Target-URI: https://corpus.example/" ...  40 + d(id) + 2
#   "Content-Length: " + n + "\r\n"                 16 + d(n) + 2
#   "\r\n"                                           2
#   payload (n bytes) + "\r\n\r\n"                   n + 4
FIXED_OVERHEAD = 10 + 21 + 25 + 3 + 40 + 2 + 16 + 2 + 2 + 4  # = 125


def record_length(doc_id: int, payload_len: int) -> int:
    """Exact byte length of :func:`write_record`'s output — the formula
    the SQL oracle mirrors (125 + 2·digits(doc_id) + digits(n) + n)."""
    return (
        FIXED_OVERHEAD
        + 2 * len(str(doc_id))
        + len(str(payload_len))
        + payload_len
    )


def write_record(doc_id: int, payload: bytes) -> bytes:
    """One deterministic WARC/1.0 ``resource`` record."""
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:doc:%d>\r\n"
        b"WARC-Target-URI: https://corpus.example/%d\r\n"
        b"Content-Length: %d\r\n"
        b"\r\n" % (doc_id, doc_id, len(payload))
    )
    return head + payload + b"\r\n\r\n"


def parse_records(buf: bytes) -> list[dict]:
    """Parse a concatenation of WARC/1.0 records.

    Framing is strictly by ``Content-Length`` (never by scanning the
    payload for a sentinel), exactly as the spec requires; each record
    must close with CRLF CRLF.  Returns one dict per record with
    ``doc_id``, ``uri``, ``payload`` and ``record_len``.
    """
    out: list[dict] = []
    pos = 0
    n = len(buf)
    while pos < n:
        head_end = buf.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        head = buf[pos:head_end]
        lines = head.split(_CRLF)
        if lines[0] != b"WARC/1.0":
            raise ValueError(f"unsupported WARC version: {lines[0]!r}")
        fields: dict[bytes, bytes] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b": ")
            if not sep:
                raise ValueError(f"malformed WARC header line: {ln!r}")
            fields[k] = v
        clen = int(fields[b"Content-Length"])
        body_start = head_end + 4
        body_end = body_start + clen
        if buf[body_end : body_end + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record trailer")
        rid = fields[b"WARC-Record-ID"]
        if not (rid.startswith(b"<urn:doc:") and rid.endswith(b">")):
            raise ValueError(f"unexpected record id: {rid!r}")
        rec_end = body_end + 4
        out.append(
            {
                "doc_id": int(rid[9:-1]),
                "uri": fields[b"WARC-Target-URI"].decode("ascii"),
                "payload": buf[body_start:body_end],
                "record_len": rec_end - pos,
            }
        )
        pos = rec_end
    return out
