"""REAL Aho–Corasick multi-pattern automaton (CACM 1975), stdlib-only.

One linear pass matches every pattern simultaneously — the multi-pattern
scan a crawl-scale content filter runs over each document (blocklists,
quality phrases, PII triggers) where per-pattern regex passes would cost
O(patterns × bytes).  Standard construction: goto trie, BFS fail links,
output sets merged through the fail chain, so suffix-nested patterns
("join" inside "hash join") are both reported at the same position.

Counting semantics: :meth:`count_nonoverlapping` reports, per pattern
INDEPENDENTLY, the greedy leftmost non-overlapping occurrence count —
exactly ``re.findall(re.escape(p), text)`` / SQL ``replace()`` semantics
(cross-validated in tests/test_ahocorasick.py), which is what makes the
corpus census SQL-oracle-checkable.  A match of one pattern never
suppresses an overlapping match of a different pattern; only
self-overlaps of the same pattern are skipped.
"""

from __future__ import annotations


class AhoCorasick:
    def __init__(self, patterns: list[str]):
        if not patterns or any(not p for p in patterns):
            raise ValueError("patterns must be non-empty strings")
        self.patterns = list(patterns)
        self.lens = [len(p) for p in patterns]
        # goto trie
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        for idx, p in enumerate(patterns):
            node = 0
            for ch in p:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    nxt = len(self.goto)
                    self.goto[node][ch] = nxt
                    self.goto.append({})
                    self.out.append([])
                node = nxt
            self.out[node].append(idx)
        # BFS fail links; merge output sets through the fail chain
        self.fail = [0] * len(self.goto)
        queue = list(self.goto[0].values())
        for node in queue:  # depth-1 nodes fail to root
            self.fail[node] = 0
        head = 0
        while head < len(queue):
            node = queue[head]
            head += 1
            for ch, nxt in self.goto[node].items():
                queue.append(nxt)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0)
                if self.fail[nxt] == nxt:
                    self.fail[nxt] = 0
                self.out[nxt] = self.out[nxt] + self.out[self.fail[nxt]]

    def _step(self, node: int, ch: str) -> int:
        while node and ch not in self.goto[node]:
            node = self.fail[node]
        return self.goto[node].get(ch, 0)

    def iter_matches(self, text: str):
        """Yield (end_index_inclusive, pattern_index) for EVERY match."""
        node = 0
        for i, ch in enumerate(text):
            node = self._step(node, ch)
            for idx in self.out[node]:
                yield i, idx

    def count_nonoverlapping(self, text: str) -> list[int]:
        """Per-pattern greedy leftmost non-overlapping counts (one pass)."""
        counts = [0] * len(self.patterns)
        next_ok = [0] * len(self.patterns)
        for i, idx in self.iter_matches(text):
            start = i - self.lens[idx] + 1
            if start >= next_ok[idx]:
                counts[idx] += 1
                next_ok[idx] = i + 1
        return counts
