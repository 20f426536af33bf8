"""functions/robots.py — RFC 9309 longest-prefix dialect: parser group
semantics + matcher properties (pure functions, no Ray)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from invoice_ocr_reconciler_ray.functions.robots import is_allowed, parse_robots


def test_group_replacement_not_merge():
    txt = """
User-agent: *
Disallow: /

User-agent: graftbot
Disallow: /private/
"""
    # specific group REPLACES * (RFC 9309 2.2.1)
    rules = parse_robots(txt, agent="graftbot")
    assert rules == [(False, "/private/")]
    # unknown agent falls back to *
    assert parse_robots(txt, agent="otherbot") == [(False, "/")]


def test_stacked_user_agent_lines_share_a_group():
    txt = """
User-agent: a
User-agent: b
Disallow: /x/
"""
    assert parse_robots(txt, agent="a") == [(False, "/x/")]
    assert parse_robots(txt, agent="b") == [(False, "/x/")]
    assert parse_robots(txt, agent="c") == []


def test_comments_empty_disallow_and_case():
    txt = """
# policy
USER-AGENT: GraftBot
DISALLOW:            # empty value matches nothing
Allow: /ok/          # trailing comment
"""
    assert parse_robots(txt, agent="graftbot") == [(True, "/ok/")]


def test_longest_prefix_and_allow_tie():
    rules = [(False, "/a/"), (True, "/a/b/"), (False, "/a/b/"), (True, "/a/b")]
    # /a/b/c matches /a/ (deny,3), /a/b (allow,4), /a/b/ (allow,5) and
    # /a/b/ (deny,5): longest=5 tie -> allow wins
    assert is_allowed(rules, "/a/b/c") == (True, "/a/b/")
    assert is_allowed(rules, "/a/x") == (False, "/a/")
    assert is_allowed(rules, "/z") == (True, "")


_paths = st.text(alphabet="ab/", min_size=1, max_size=8).map(lambda s: "/" + s)


@settings(max_examples=200, deadline=None)
@given(
    rules=st.lists(st.tuples(st.booleans(), _paths), max_size=8),
    path=_paths,
)
def test_matcher_equals_naive_spec(rules, path):
    got = is_allowed(rules, path)
    # naive spec: stable-sort matches by (length desc, allow desc); no match
    # -> default allow
    matches = [(a, p) for a, p in rules if path.startswith(p)]
    if not matches:
        assert got == (True, "")
    else:
        best = sorted(matches, key=lambda r: (-len(r[1]), not r[0]))[0]
        assert got == best


@settings(max_examples=100, deadline=None)
@given(
    star=st.lists(st.tuples(st.booleans(), _paths), min_size=1, max_size=4),
    own=st.lists(st.tuples(st.booleans(), _paths), max_size=4),
)
def test_parse_roundtrip(star, own):
    def block(agent, rules):
        lines = [f"User-agent: {agent}"]
        lines += [
            f"{'Allow' if a else 'Disallow'}: {p}" for a, p in rules
        ]
        return "\n".join(lines)

    txt = block("*", star) + "\n\n" + block("graftbot", own)
    assert parse_robots(txt, agent="graftbot") == (own if own else star)
    assert parse_robots(txt, agent="nobody") == star


def test_mime_sniffer_routes_real_codec_bytes():
    import numpy as np

    from invoice_ocr_reconciler_ray.functions.bmp import encode_bmp
    from invoice_ocr_reconciler_ray.functions.gif import encode_gif
    from invoice_ocr_reconciler_ray.functions.mimesniff import sniff
    from invoice_ocr_reconciler_ray.functions.png import encode_png
    from invoice_ocr_reconciler_ray.functions.wav import encode_wav

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert sniff(encode_png(px)) == "png"
    assert sniff(encode_bmp(px)) == "bmp"
    assert sniff(encode_gif(px)) == "gif"
    assert sniff(encode_wav(np.zeros(4, dtype=np.int16), 8000)) == "wav"
    assert sniff(b"%PDF-1.4\n") == "pdf"
    assert sniff(b"  <!DOCTYPE HTML><html>") == "html"
    assert sniff(b"<html lang=\"en\">") == "html"
    assert sniff(b"\x00\x01garbage") == "octet-stream"
    assert sniff(b"") == "empty"
    assert sniff(None) == "empty"
    assert sniff(b"RIFFxxxxWAVE") == "wav"
    assert sniff(b"RIFFxxxxAVI ") == "octet-stream"


def test_soundex_reference_values():
    from invoice_ocr_reconciler_ray.functions.phonetic import soundex

    # classic published values for the simple (H/W-as-vowel) variant
    assert soundex("Robert") == soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A226"
    assert soundex("Tymczak") == "T522"
    assert soundex("Pfister") == "P236"  # PF collapse exercised
    assert soundex("rod") == "R300"
    assert soundex("") == "" and soundex(None) == ""
    assert soundex("123") == ""
    assert soundex("O'Brien-42") == soundex("OBRIEN")
