"""Distributed PCA (operators/pca.py): exact-integer Gram matrix against
numpy, projection/whitening against numpy's eigendecomposition of the same
quantized data (sign-aligned), orthogonality and variance ordering."""

from __future__ import annotations

import numpy as np
import pytest

from brontes_spark.operators.pca import gram_matrix, pca_fit, pca_project

SCALE = 1_000_000


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    # anisotropic cloud: 3 dominant axes out of 8
    basis = rng.normal(size=(8, 8))
    x = rng.normal(size=(300, 8)) * np.array([5, 3, 2, 0.5, 0.3, 0.2, 0.1, 0.05])
    return (x @ basis).astype(np.float32)


@pytest.fixture(scope="module")
def df(spark, data):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(data)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _q(data):
    return np.floor(data.astype(np.float64) * SCALE).astype(np.int64)


def test_gram_matrix_exact_integers(df, data):
    q = _q(data)
    got = {(r.i, r.j): (r.g, r.s_i, r.n) for r in gram_matrix(df, "embedding").collect()}
    d = q.shape[1]
    for i in range(d):
        for j in range(i, d):
            want_g = int((q[:, i].astype(object) * q[:, j].astype(object)).sum())
            assert got[(i, j)] == (want_g, int(q[:, i].sum()), len(q)), (i, j)


def test_fit_matches_numpy(df, data):
    comps, evals, mean = pca_fit(df, "embedding", k=4)
    xq = _q(data) / SCALE
    want_mean = xq.mean(axis=0)
    cov = np.cov(xq, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    np.testing.assert_allclose(mean, want_mean, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(evals, w[order], rtol=1e-9)
    for r in range(4):  # eigenvectors match up to sign
        dot = abs(float(np.dot(comps[r], v[:, order[r]])))
        assert dot == pytest.approx(1.0, abs=1e-9)
    # orthonormal rows
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-9)


def test_projection_matches_numpy_and_orders_variance(df, data):
    comps, evals, mean = pca_fit(df, "embedding", k=4)
    got = {r.vec_id: np.array(r.proj) for r in pca_project(df, "vec_id", "embedding", k=4).collect()}
    proj = np.stack([got[i] for i in range(len(data))])
    want = (data.astype(np.float64) - mean) @ comps.T
    np.testing.assert_allclose(proj, want, rtol=1e-7, atol=1e-9)
    var = proj.var(axis=0)
    assert all(var[i] >= var[i + 1] for i in range(3))
    # quantization-level agreement with the eigenvalues
    np.testing.assert_allclose(var, evals, rtol=1e-3)


def test_whiten_unit_variance(df, data):
    got = pca_project(df, "vec_id", "embedding", k=3, whiten=True).collect()
    proj = np.stack([np.array(r.proj) for r in got])
    np.testing.assert_allclose(proj.var(axis=0), np.ones(3), rtol=1e-3)


def test_pca_outliers_flags_planted_point(spark, data, df):
    import numpy as np

    from brontes_spark.operators.pca import pca_outliers

    # plant one far-out point along the dominant direction
    big = data.std(axis=0) * 25
    rows = [(9999, [float(v) for v in big])]
    df2 = df.unionByName(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    )
    out = {r.vec_id: (r.m2, r.is_outlier)
           for r in pca_outliers(df2, "vec_id", "embedding", k=3).collect()}
    assert out[9999][1] is True
    flagged = [i for i, (_, o) in out.items() if o]
    # the planted point dominates; in-distribution mass stays mostly inside
    assert 9999 in flagged and len(flagged) <= 1 + len(data) // 10
    # E[m2] ~ k for the in-distribution cloud
    m2s = np.array([m for i, (m, _) in out.items() if i != 9999])
    assert 1.0 < m2s.mean() < 6.0
