"""Properties of the distributed PCA projection: sufficient-stats parity
with a single-machine numpy reference, component orthonormality, variance
ordering, and determinism of the sign convention."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from invoice_ocr_reconciler_ray.pipelines import queries as Q

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reference():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    fixed = np.floor(vecs * 1000.0 + 0.5)
    ids = t["vec_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids, kind="mergesort")
    return ids[order], fixed[order]


def test_projection_matches_numpy_reference(ray_session, reference):
    ids, fixed = reference
    got = Q.embeddings_pca_project(SF).to_pandas()
    assert list(got.vec_id) == list(ids)

    n, d = fixed.shape
    mean = fixed.sum(axis=0) / n  # same int-sufficient-stat expressions
    cov = (fixed.T @ fixed) / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :2]
    for k in range(2):
        jmax = int(np.abs(comps[:, k]).argmax())
        if comps[jmax, k] < 0:
            comps[:, k] = -comps[:, k]
    ref = (fixed - mean) @ comps
    np.testing.assert_allclose(got[["pc1", "pc2"]].to_numpy(), ref, rtol=1e-9, atol=1e-6)

    # variance ordering: pc1 explains at least as much as pc2
    assert got.pc1.to_numpy().var() >= got.pc2.to_numpy().var() - 1e-9
    # centered output: projections of mean-centered data sum to ~0
    assert abs(got.pc1.sum()) < 1e-4 * n * max(1.0, np.abs(ref).max())
