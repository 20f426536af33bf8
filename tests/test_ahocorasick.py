"""functions/ahocorasick.py — cross-validated against re.findall semantics."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from invoice_ocr_reconciler_ray.functions.ahocorasick import AhoCorasick


def _ref_counts(patterns, text):
    return [len(re.findall(re.escape(p), text)) for p in patterns]


def test_suffix_nested_patterns():
    ac = AhoCorasick(["join", "hash join"])
    assert ac.count_nonoverlapping("a hash join and a join") == [2, 1]


def test_self_overlap_greedy_leftmost():
    ac = AhoCorasick(["batch batch"])
    # greedy leftmost non-overlapping: only one match in a triple run
    assert ac.count_nonoverlapping("batch batch batch") == [1]
    assert ac.count_nonoverlapping("batch batch batch batch") == [2]


def test_iter_matches_reports_all():
    ac = AhoCorasick(["aa"])
    assert list(ac.iter_matches("aaaa")) == [(1, 0), (2, 0), (3, 0)]


def test_empty_pattern_rejected():
    with pytest.raises(ValueError):
        AhoCorasick(["ok", ""])
    with pytest.raises(ValueError):
        AhoCorasick([])


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=5),
        min_size=1,
        max_size=5,
        unique=True,
    ),
    st.text(alphabet="abc ", max_size=60),
)
def test_counts_match_re_findall(patterns, text):
    ac = AhoCorasick(patterns)
    assert ac.count_nonoverlapping(text) == _ref_counts(patterns, text)
