"""Byte-pair-encoding merge training over a distributed corpus.

BPE training (Sennrich, Haddow & Birch, ACL 2016 — public algorithm) never
needs the corpus after one statistic is extracted: the WORD-FREQUENCY
table.  Pair counts, merge selection and vocabulary evolution are all
functions of (word, freq) pairs, and the word table is vocabulary-sized —
orders of magnitude smaller than the corpus.  So the Ray-first layout is:
one distributed pass builds the word-frequency table (block-local
``group_by`` count combiner → one O(vocab) shuffle), and the merge loop
runs on the driver over that table, exactly like every production BPE
trainer (the loop is inherently sequential — merge r+1's counts depend on
merge r).

Determinism: ties on pair frequency break lexicographically (smallest
(left, right) pair wins), so the merge table is reproducible under any
block order.

Scale notes: the driver holds O(vocab) words, not O(corpus).  At 100 TB the
word table for natural-language text is ~10⁷ entries — gigabytes at worst,
the standard practice (tokenizer trainers run exactly this reduction).  If
vocab itself exploded, the pair-count step inside the loop is a groupby
over the word table and could itself be distributed; the loop structure is
unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum


def word_frequencies(ds, *, text_col: str = "text") -> list[tuple[str, int]]:
    """One distributed pass: lowercase [a-z0-9]+ word counts.  Block-local
    ``group_by`` partials keep the shuffle O(vocab) per block."""

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t[text_col]), pattern=r"[^a-z0-9]+"
        )
        flat = pc.list_flatten(toks.combine_chunks())
        flat = flat.filter(pc.not_equal(flat, ""))
        tb = pa.table(
            {"word": flat, "freq": pa.array(np.ones(len(flat), np.int64))}
        )
        g = tb.group_by("word").aggregate([("freq", "sum")])
        return g.rename_columns(["word", "freq"])

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"))
        .to_pandas()
    )
    return sorted(zip(merged["word"], merged["freq"].astype(int)))


def train_bpe(ds, *, text_col: str = "text", num_merges: int = 10) -> pa.Table:
    """Learn ``num_merges`` BPE merges; returns ``(rank, left, right,
    merged, freq)`` — rank is the merge order (0-based), freq the pair
    count that won that round."""
    words = word_frequencies(ds, text_col=text_col)
    seqs: list[tuple[list[str], int]] = [(list(w), int(f)) for w, f in words]
    ranks, lefts, rights, mergeds, freqs = [], [], [], [], []
    for r in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in seqs:
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] = (
                    counts.get((sym[i], sym[i + 1]), 0) + f
                )
        if not counts:
            break
        # max freq, ties broken by lexicographically smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), f = best
        ab = a + b
        for sym, _ in seqs:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [ab]
                else:
                    i += 1
        ranks.append(r)
        lefts.append(a)
        rights.append(b)
        mergeds.append(ab)
        freqs.append(f)
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "merged": pa.array(mergeds, pa.string()),
            "freq": pa.array(freqs, pa.int64()),
        }
    )
