"""Engine configuration — the data-driven rule tables and knobs.

The reference keeps its extraction semantics in a constant rule table
(``PATTERNS``, reference invoiceParser.js:5-50) and its matching knobs inline
(Fuse threshold 0.4 at reconciliationEngine.js:56, amount tolerance 0.01 at
:25, score weights 0.6/0.4 at :122, good-match gate 0.3 at :160).  The new
engine keeps the same shape: extraction heuristics and reconciliation knobs
are plain data, hot-swappable per run, and — critically for the byte-identical
output invariant — free of any wall-clock or locale dependence.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractConfig:
    """Block-classification heuristic table for the HTML extractor.

    The graft of the reference's ``PATTERNS`` first-match-wins rule table
    (invoiceParser.js:5-50): a fixed, ordered, deterministic rule set that
    makes output byte-stable.  Rules (applied per text block, in order):

    1. blocks inside ``nav/header/footer/aside/form`` containers → boilerplate
    2. blocks with ``link_density > max_link_density`` → boilerplate
    3. blocks with ``n_words >= min_words`` → content
    4. heading blocks (h1-h6) with ``n_words >= min_heading_words`` and
       ``link_density <= heading_max_link_density`` → content
    5. remaining short blocks → boilerplate, EXCEPT the continuation rule:
       a zero-link block sandwiched between two content blocks → content
       (Boilerpipe-style neighbour promotion).
    """

    min_words: int = 8
    max_link_density: float = 0.35
    min_heading_words: int = 2
    heading_max_link_density: float = 0.2
    # joiner between accepted blocks; also the ground-truth contract of the
    # synthetic generator (sources/pages.py)
    block_joiner: str = "\n"
    # charset sniff window (bytes) for the <meta charset> scan
    charset_sniff_bytes: int = 2048


@dataclass(frozen=True)
class ReconcileConfig:
    """Alignment/verdict knobs — semantics of reconciliationEngine.js kept.

    * ``tolerance``: relative length tolerance for the diagnostic
      ``length_match`` gate (≙ amountMatch threshold 0.01,
      reconciliationEngine.js:25).  The byte-identical invariant itself uses
      EXACT equality; tolerance feeds diagnostic columns only.
    * ``w_edit`` / ``w_token``: combined-score weights (≙ 0.6 vendor /
      0.4 amount, reconciliationEngine.js:122).
    * ``good_match_gate``: max distance score still called "matched-ish" for
      confidence shaping (≙ vendorScore < 0.3 gate, reconciliationEngine.js:160).
    """

    tolerance: float = 0.01
    w_edit: float = 0.6
    w_token: float = 0.4
    good_match_gate: float = 0.3
    # cap on chars fed to the O(n*m) edit-distance kernel; longer pairs use
    # the token-set ratio + prefix/suffix trim only (scale guard)
    max_edit_chars: int = 2000


DEFAULT_EXTRACT = ExtractConfig()
DEFAULT_RECONCILE = ReconcileConfig()


@dataclass(frozen=True)
class RunConfig:
    """One pipeline run: ids are content/config-derived, never wall-clock."""

    extract: ExtractConfig = field(default_factory=ExtractConfig)
    reconcile: ReconcileConfig = field(default_factory=ReconcileConfig)
    # number of output partitions for the checkpointed runner
    num_partitions: int = 16
    # byte budget per extraction batch (None = whole blocks).  Set for inputs
    # with multi-MB pages so batch size is bounded by PAYLOAD BYTES, not row
    # count (SURVEY §4.3.1 — row-count batching is wrong at 100× html size
    # variance); giant single rows still pass through alone
    rebatch_bytes: int | None = None
