"""functions/url.py — RFC 3986-subset canonicalizer properties."""

from hypothesis import given, settings
from hypothesis import strategies as st

from invoice_ocr_reconciler_ray.functions.url import canonicalize_url


def test_case_and_default_port():
    assert (
        canonicalize_url("HTTPS://Example.COM:443/a")
        == "https://example.com/a"
    )
    assert canonicalize_url("http://example.com:80/") == "http://example.com/"
    # non-default port survives
    assert (
        canonicalize_url("https://example.com:8443/a")
        == "https://example.com:8443/a"
    )


def test_dot_segments_and_fragment():
    assert (
        canonicalize_url("https://e.com/./a/../b/c#frag")
        == "https://e.com/b/c"
    )
    assert canonicalize_url("https://e.com") == "https://e.com/"


def test_query_sort_preserves_values():
    assert (
        canonicalize_url("https://e.com/p?b=2&a=1&a=0")
        == "https://e.com/p?a=0&a=1&b=2"
    )
    # empty query stays absent
    assert canonicalize_url("https://e.com/p") == "https://e.com/p"


@settings(max_examples=80, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**9),
    st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=3),
            st.text(alphabet="xyz0", min_size=1, max_size=3),
        ),
        max_size=4,
    ),
)
def test_idempotent_and_variant_collapse(d, params):
    q = "&".join(f"{k}={v}" for k, v in params)
    qs = f"?{q}" if q else ""
    base = f"https://corpus.example/doc/{d}{qs}"
    c = canonicalize_url(base)
    # idempotence
    assert canonicalize_url(c) == c
    # case/port/dot-segment variants collapse to the same canonical
    variants = [
        f"HTTPS://CORPUS.EXAMPLE:443/doc/{d}{qs}",
        f"https://corpus.example/./doc/../doc/{d}{qs}#z",
    ]
    for v in variants:
        assert canonicalize_url(v) == c
