"""Closed-form / fold properties behind the round-5 audit ops (pure math,
no Ray): fair-share RR finish positions vs brute-force simulation, and the
Merkle promote-odd fold vs an independent recursive implementation."""

import hashlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _closed_form_finish(L: list[int]) -> list[int]:
    # mirror of events_fair_share_schedule_audit's arithmetic
    La = np.asarray(L, dtype=np.int64)
    out = []
    for i, k in enumerate(La):
        out.append(
            int(np.minimum(La, k - 1).sum())
            + int(((La >= k) & (np.arange(len(La)) <= i)).sum())
        )
    return out


def _simulate_rr(L: list[int]) -> list[int]:
    remaining = list(L)
    finish = [0] * len(L)
    pos = 0
    while any(r > 0 for r in remaining):
        for t in range(len(L)):
            if remaining[t] > 0:
                pos += 1
                remaining[t] -= 1
                if remaining[t] == 0:
                    finish[t] = pos
    return finish


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(1, 12), min_size=1, max_size=10))
def test_fair_share_closed_form_equals_simulation(L):
    assert _closed_form_finish(L) == _simulate_rr(L)


def _merkle_fold(leaves: list[str]) -> str:
    # mirror of docs_merkle_root's level loop
    level = list(leaves)
    while len(level) > 1:
        nxt = [
            hashlib.md5((level[i] + level[i + 1]).encode()).hexdigest()
            for i in range(0, len(level) - 1, 2)
        ]
        if len(level) % 2 == 1:
            nxt.append(level[-1])
        level = nxt
    return level[0]


def _merkle_recursive(leaves: list[str]) -> str:
    if len(leaves) == 1:
        return leaves[0]
    nxt = []
    for i in range(0, len(leaves) - 1, 2):
        nxt.append(hashlib.md5((leaves[i] + leaves[i + 1]).encode()).hexdigest())
    if len(leaves) % 2 == 1:
        nxt.append(leaves[-1])
    return _merkle_recursive(nxt)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="0123456789abcdef", min_size=4, max_size=8),
                min_size=1, max_size=40))
def test_merkle_fold_matches_recursive_and_detects_tamper(leaves):
    root = _merkle_fold(leaves)
    assert root == _merkle_recursive(leaves)
    if len(leaves) > 1:
        tampered = list(leaves)
        tampered[0] = tampered[0] + "0"
        assert _merkle_fold(tampered) != root


def test_merkle_depth_is_ceil_log2():
    import math

    for n in range(2, 600):
        level = [f"{i:x}" for i in range(n)]
        depth = 0
        while len(level) > 1:
            level = [
                hashlib.md5((level[i] + level[i + 1]).encode()).hexdigest()
                for i in range(0, len(level) - 1, 2)
            ] + ([level[-1]] if len(level) % 2 == 1 else [])
            depth += 1
        assert depth == math.ceil(math.log2(n))
