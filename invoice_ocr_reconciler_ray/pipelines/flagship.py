"""The flagship pipeline: read pages → extract → dedup-flag → reconcile.

≙ the reference's two entry points chained (upload/extract server.js:285-344,
reconcile server.js:508-563), expressed as one lazy streaming Dataset plan:

    read_parquet(pages)                      # or synthesized from documents
      → map_batches(extract)                 # stateless, single pass, html dropped
      → probe(dup winner map)                # stateless; map from a cheap side scan
      → map_batches(reconcile)               # same-row alignment, no shuffle
      → [consume: write_parquet / aggregate] # streaming, never materialized

The duplicate winner map comes from a SIDE PLAN over the raw input
projected to (url, warc_ts, hash(html)) — per-block partial aggregation,
driver merge, ``ray.put`` once (stages/dedup.py).  The expensive extraction
pass therefore runs exactly once, and the main plan has NO shuffle at all.
Everything stays lazy until the caller consumes, so Ray's streaming executor
pipelines all stages with backpressure.
"""

from __future__ import annotations

from ..config import RunConfig
from ..sources.pages import pages_from_documents
from ..stages.dedup import flag_duplicates, flag_duplicates_with_side
from ..stages.extract import extract_pages
from ..stages.reconcile import reconcile_pages


def flagship(
    pages_ds,
    cfg: RunConfig | None = None,
    *,
    dedup_strategy: str = "broadcast",
    side_ds=None,
    side_narrow_ds=None,
    side_hash_col: str | None = None,
):
    """pages Dataset → verdict Dataset (lazy main plan).

    ``broadcast`` (default): the dedup winner map comes from a cheap SIDE
    SCAN of the raw input projected to (url, warc_ts, hash(html)) — pass
    ``side_ds`` as a column-pruned re-read when the caller has one (bench
    does); extraction then runs exactly once in a fully-fused streaming main
    plan with NO shuffle.  ``"shuffle"`` uses a groupby all-to-all instead —
    for key domains too large for any driver/broadcast structure; the 100 TB
    deployment path is the partitioned runner (pipelines/runner.py), where
    per-partition broadcast dedup IS global dedup because inputs are
    hash-partitioned by url."""
    cfg = cfg or RunConfig()
    if cfg.rebatch_bytes:
        from ..stages.skew import rebatch_by_bytes

        pages_ds = rebatch_by_bytes(
            pages_ds, payload_col="html", target_bytes=cfg.rebatch_bytes
        )
    ext = extract_pages(pages_ds, cfg.extract)
    if dedup_strategy == "broadcast":
        flagged = flag_duplicates_with_side(
            ext,
            side_ds if side_ds is not None else pages_ds,
            narrow_ds=side_narrow_ds,
            side_hash_col=side_hash_col,
        )
    else:
        flagged = flag_duplicates(ext, strategy=dedup_strategy)
    return reconcile_pages(flagged, cfg.reconcile)


def run_flagship(sf_dir: str, cfg: RunConfig | None = None, **kw):
    """documents.parquet in ``sf_dir`` → synthesized pages → verdicts."""
    return flagship(pages_from_documents(sf_dir), cfg, **kw)
