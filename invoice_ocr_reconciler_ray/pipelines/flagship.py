"""The flagship pipeline: read pages → extract → dedup-flag → reconcile.

≙ the reference's two entry points chained (upload/extract server.js:285-344,
reconcile server.js:508-563), expressed as one lazy streaming Dataset plan:

    read_parquet(pages)                      # or synthesized from documents
      → map_batches(extract)                 # stateless, single pass, html dropped
      → dedup flag on url                    # the ONE shuffle (tiny key/pri pairs)
      → map_batches(reconcile)               # same-row alignment, no shuffle
      → [consume: write_parquet / aggregate] # streaming, never materialized

Everything stays lazy until the caller consumes, so Ray's streaming executor
pipelines all stages with backpressure.
"""

from __future__ import annotations

from ..config import RunConfig
from ..sources.pages import pages_from_documents
from ..stages.dedup import flag_duplicates
from ..stages.extract import extract_pages
from ..stages.reconcile import reconcile_pages


def flagship(pages_ds, cfg: RunConfig | None = None, *, dedup_strategy: str = "broadcast"):
    """pages Dataset → verdict Dataset (lazy)."""
    cfg = cfg or RunConfig()
    ext = extract_pages(pages_ds, cfg.extract)
    flagged = flag_duplicates(ext, strategy=dedup_strategy)
    return reconcile_pages(flagged, cfg.reconcile)


def run_flagship(sf_dir: str, cfg: RunConfig | None = None, **kw):
    """documents.parquet in ``sf_dir`` → synthesized pages → verdicts."""
    return flagship(pages_from_documents(sf_dir), cfg, **kw)
