"""K-means: the distributed operator must match a single-node numpy
reference exactly in structure (assignments) and closely in values
(centroid coordinates; partial-sum order differs at ~1e-12).
"""

from __future__ import annotations

import numpy as np
import pytest

from species_range_data_pipeline_spark.operators.clustering import (
    kmeans_assign,
    kmeans_summary,
)

from .conftest import SF_SMOKE

K, ITERS = 4, 5


def _numpy_kmeans(ids, x, k, iters):
    order = np.argsort(ids)
    ids, x = ids[order], x[order]
    centroids = x[:k].astype(np.float64).copy()
    for _ in range(iters):
        d = -2.0 * (x @ centroids.T) + (centroids * centroids).sum(axis=1)[None, :]
        lab = np.argmin(d, axis=1)
        for c in range(k):
            m = lab == c
            if m.any():
                centroids[c] = x[m].mean(axis=0)
    d = -2.0 * (x @ centroids.T) + (centroids * centroids).sum(axis=1)[None, :]
    return ids, np.argmin(d, axis=1), centroids


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_kmeans_matches_numpy_reference(spark, emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    x = np.array([r[1] for r in rows], dtype=np.float64)
    ref_ids, ref_lab, ref_cent = _numpy_kmeans(ids, x, K, ITERS)

    assign, cent = kmeans_assign(emb, k=K, iters=ITERS)
    got = {r["id"]: r["cluster"] for r in assign.collect()}

    assert len(got) == len(ids)
    np.testing.assert_allclose(cent, ref_cent, rtol=0, atol=1e-9)
    mismatch = sum(1 for i, lab in zip(ref_ids, ref_lab) if got[int(i)] != lab)
    assert mismatch == 0


def test_kmeans_summary_shape(spark, emb):
    out = kmeans_summary(emb, k=K, iters=2).collect()
    assert len(out) <= K
    assert sum(r["n_members"] for r in out) == emb.count()
    assert all(r["centroid_norm"] > 0 for r in out)


def test_pca_matches_numpy_reference(spark, emb):
    from species_range_data_pipeline_spark.operators.clustering import pca_project

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    x = np.array([r[1] for r in rows], dtype=np.float64)
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / x.shape[0]
    eigvals, eigvecs = np.linalg.eigh(cov)
    ref = eigvecs[:, ::-1][:, :2].T
    for i in range(2):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    ref_proj = (x - mean) @ ref.T

    proj, comps = pca_project(emb, n_components=2)
    np.testing.assert_allclose(comps, ref, atol=1e-8)
    got = {r["id"]: (r["pc0"], r["pc1"]) for r in proj.collect()}
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        np.testing.assert_allclose(got[int(vid)], ref_proj[i], atol=1e-8)


def test_pca_variance_ordering(spark, emb):
    from species_range_data_pipeline_spark.operators.clustering import pca_project

    proj, _ = pca_project(emb, n_components=2)
    rows = proj.collect()
    p0 = np.array([r["pc0"] for r in rows])
    p1 = np.array([r["pc1"] for r in rows])
    # top component carries at least as much variance, projections centered
    assert p0.var() >= p1.var()
    assert abs(p0.mean()) < 1e-6 and abs(p1.mean()) < 1e-6
