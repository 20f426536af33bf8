"""Count-Min sketch laws (never-undercount, add-merge bit-identity,
layout invariance) and the per-group Misra-Gries guarantee."""

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.functions.sketches import (
    cms_add_hashes,
    cms_empty,
    cms_hash_strings,
    cms_merge,
    cms_query_hashes,
)


def _zipf_tokens(n=5000, v=50, seed=7):
    rng = np.random.RandomState(seed)
    ranks = rng.zipf(1.3, size=n) % v
    return [f"w{r}" for r in ranks]


def test_cms_never_undercounts_and_bounds():
    toks = _zipf_tokens()
    true = collections.Counter(toks)
    cms = cms_empty()
    cms_add_hashes(cms, cms_hash_strings(toks))
    probes = sorted(true) + ["neverseen1", "neverseen2"]
    est = cms_query_hashes(cms, cms_hash_strings(probes))
    n = len(toks)
    for t, e in zip(probes, est):
        assert e >= true.get(t, 0), t  # classic CMS: no underestimates
        # eps = e/width; with width=2048 and n=5000 the slack is ~7 counts
        assert e <= true.get(t, 0) + (np.e / 2048) * n + 1, t


def test_cms_merge_is_bit_identical_to_single_pass():
    toks = _zipf_tokens(n=2000)
    whole = cms_empty()
    cms_add_hashes(whole, cms_hash_strings(toks))
    # any split must sum to the same matrix — add-merge associativity
    for cut in (1, 137, 1000, 1999):
        a, b = cms_empty(), cms_empty()
        cms_add_hashes(a, cms_hash_strings(toks[:cut]))
        cms_add_hashes(b, cms_hash_strings(toks[cut:]))
        assert (cms_merge(a, b) == whole).all(), cut


def test_cms_stage_layout_invariant(ray_session, tmp_path):
    """The merged stage sketch equals the one-shot sketch regardless of how
    rows split into blocks — the scaling invariant for this sketch."""
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.sketch_stats import (
        approx_term_counts_cms,
    )

    texts = [" ".join(_zipf_tokens(n=40, seed=i)) for i in range(60)]
    tbl = pa.table({"text": texts})
    probes = ["w0", "w1", "w2", "neverseen"]
    outs = []
    for blocks in (1, 4, 16):
        ds = rd.from_arrow(tbl).repartition(blocks)
        out = approx_term_counts_cms(ds, probes).to_pandas()
        outs.append(out.est_count.tolist())
        assert str(out.est_count.dtype) == "int64"
    assert outs[0] == outs[1] == outs[2]
    # never-undercount vs exact
    true = collections.Counter(w for t in texts for w in t.split())
    for t, e in zip(probes, outs[0]):
        assert e >= true.get(t, 0)


def test_grouped_mg_guarantee_per_group(ray_session, tmp_path):
    """Every term with in-group frequency > n_g/(k+1) must surface in that
    group's summary; min_count never exceeds the true count."""
    rng = np.random.RandomState(3)
    rows_lang, rows_text = [], []
    for lang, hot in (("en", "alpha"), ("de", "beta")):
        for _ in range(40):
            toks = [hot] * 6 + [f"noise{rng.randint(200)}" for _ in range(6)]
            rng.shuffle(toks)
            rows_lang.append(lang)
            rows_text.append(" ".join(toks))
    pq.write_table(
        pa.table({"lang": rows_lang, "text": rows_text}),
        tmp_path / "documents.parquet",
    )
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_lang_heavy_hitters

    # patch sf_dir-based read through tmp_path
    out = docs_lang_heavy_hitters(str(tmp_path)).to_pandas()
    true: dict[tuple[str, str], int] = collections.Counter()
    for lang, text in zip(rows_lang, rows_text):
        for w in text.split():
            true[(lang, w)] += 1
    for lang, hot in (("en", "alpha"), ("de", "beta")):
        grp = out[out.key == lang]
        n_g = sum(n for (l, _), n in true.items() if l == lang)
        # hot term appears 240 times in ~480 tokens >> n_g/11
        assert hot in grp.term.tolist(), lang
        for r in grp.itertuples():
            assert r.min_count <= true[(lang, r.term)], (lang, r.term)
