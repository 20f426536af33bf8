"""Text-analysis kernels: language ID, quality scoring, token counting.

Large-scale training-data pipeline operators (beyond the reference's own
inventory, per the build brief).  The quality/token kernels are pure
pyarrow.compute — fully vectorized; language ID is an n-gram/stopword
heuristic over Python strings (compiled state at import).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# small, public stopword cores — enough to separate the big European
# languages; CJK is detected by script ratio before stopwords are consulted
_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that it for on with as are was be this have".split()),
    "es": frozenset("el la de que y en los se del las un por con una su para es al lo".split()),
    "de": frozenset("der die und den von zu das mit sich des auf ist im nicht ein als auch es".split()),
    "fr": frozenset("le la de les des et en un une du dans est que pour qui sur au pas".split()),
    "it": frozenset("il di che la e per una sono con non del si da come anche più".split()),
    "pt": frozenset("o de a e que do da em um para com uma os no se na por mais".split()),
}
_CJK_RE = re.compile(r"[一-鿿぀-ヿ가-힯]")
_WORD_RE = re.compile(r"[a-zA-ZÀ-ÿ]+")
_LANGS = sorted(_STOPWORDS)  # fixed order → deterministic argmax ties


def lang_id(text: str) -> tuple[str, float]:
    """(language, score∈[0,1]).  CJK-script ratio first, then stopword-hit
    argmax with a fixed language order for deterministic ties; unknown → 'und'."""
    if not text:
        return "und", 0.0
    sample = text[:4000]
    cjk = len(_CJK_RE.findall(sample))
    if cjk / max(1, len(sample)) > 0.15:
        return "zh", min(1.0, cjk / max(1, len(sample)) * 2)
    toks = [t.lower() for t in _WORD_RE.findall(sample)]
    if not toks:
        return "und", 0.0
    best_lang, best_hits = "und", 0
    for lg in _LANGS:
        hits = sum(1 for t in toks if t in _STOPWORDS[lg])
        if hits > best_hits:
            best_lang, best_hits = lg, hits
    score = best_hits / len(toks)
    if score < 0.05:
        return "und", round(score, 4)
    return best_lang, round(score, 4)


def quality_columns(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Vectorized per-document quality counters (all exact integers, so an
    SQL oracle can reproduce them bit-for-bit):

    * n_chars  — unicode char count
    * n_words  — whitespace token count (trim first; empty → 0)
    * n_punct  — count of [!?.,;:]
    * n_upper  — count of [A-Z]
    """
    t = pc.cast(texts, pa.large_string())
    n_chars = pc.cast(pc.utf8_length(t), pa.int64())
    trimmed = pc.utf8_trim_whitespace(t)
    collapsed = pc.replace_substring_regex(trimmed, r"\s+", " ")
    clen = pc.utf8_length(collapsed)
    n_words = pc.cast(
        pc.if_else(
            pc.equal(clen, 0), pa.scalar(0), pc.add(spaces_count(collapsed), 1)
        ),
        pa.int64(),
    )
    n_punct = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(t, r"[^!?.,;:]", "")), pa.int64()
    )
    n_upper = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(t, r"[^A-Z]", "")), pa.int64()
    )
    return {"n_chars": n_chars, "n_words": n_words, "n_punct": n_punct, "n_upper": n_upper}


def spaces_count(collapsed: pa.Array | pa.ChunkedArray):
    """Count of single spaces in an already-whitespace-collapsed string."""
    return pc.subtract(
        pc.utf8_length(collapsed),
        pc.utf8_length(pc.replace_substring(collapsed, " ", "")),
    )


def token_count(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Whitespace token count — vectorized, matches ``len(s.split())`` for
    ASCII whitespace and the SQL ``len(string_split_regex(trim(s),'\\s+'))``."""
    t = pc.utf8_trim_whitespace(pc.cast(texts, pa.large_string()))
    collapsed = pc.replace_substring_regex(t, r"\s+", " ")
    clen = pc.utf8_length(collapsed)
    return pc.cast(
        pc.if_else(pc.equal(clen, 0), pa.scalar(0), pc.add(spaces_count(collapsed), 1)),
        pa.int64(),
    )
