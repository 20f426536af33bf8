"""invoice_ocr_reconciler_ray — a Ray-Data-native main-content extraction engine.

A brand-new engine with the query/data-processing capabilities of
ramanverse/Invoice-ocr-Reconciler (reference at /root/reference, read-only),
re-expressed as idiomatic Ray Data pipelines over Common-Crawl-style page
tables ``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``.

Layout:
  functions/  pure, deterministic kernels (HTML tokenizer, PDF XY-cut,
              normalization, similarity, hashing) — no Ray imports
  sources/    readers + the deterministic synthetic page generator
  stages/     Ray Data stages (map_batches / groupby compositions)
  pipelines/  end-to-end pipelines (flagship extract→dedup→reconcile)
  state/      broadcast helpers, run manifests (checkpoint / resume)

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — sessions are
owned by the driver, bench.py, and the pytest fixture.
"""

__version__ = "0.1.0"
