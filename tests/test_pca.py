"""Distributed PCA: quantized-Gram fit == numpy PCA on the quantized
values, determinism, orthonormality, planted-structure recovery."""

from __future__ import annotations

import numpy as np
import pytest

from wrf_to_geodataframe_spark.operators.pca import (
    _Q,
    fit_pca,
    project_pca,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from wrf_to_geodataframe_spark.session import load_table

    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )


def _numpy_reference(df):
    rows = df.orderBy("vec_id").collect()
    vecs = np.stack([np.asarray(r["embedding"], "float64") for r in rows])
    q = np.floor(vecs * _Q) / _Q  # the fit's quantization, dequantized
    mean = q.mean(axis=0)
    cov = (q - mean).T @ (q - mean) / len(q)
    w, v = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(w)[::-1]
    return q, mean, v[:, order].T, w[order]


def test_fit_matches_numpy_on_quantized_values(spark, emb):
    mean, comp, eig = fit_pca(spark, emb)
    _, m_ref, c_ref, w_ref = _numpy_reference(emb)
    assert np.allclose(mean, m_ref, atol=1e-12)
    assert np.allclose(eig, w_ref, atol=1e-9)
    # eigenvectors match up to sign per component
    for i in range(comp.shape[0]):
        d = min(
            np.abs(comp[i] - c_ref[i]).max(),
            np.abs(comp[i] + c_ref[i]).max(),
        )
        if eig[i] > 1e-9:  # well-separated spectrum at this fixture
            assert d < 1e-6, (i, d)


def test_fit_is_deterministic_across_partitionings(spark, emb):
    a = fit_pca(spark, emb)
    b = fit_pca(spark, emb.repartition(13))
    for x, y in zip(a, b):
        assert np.array_equal(x, y)  # bitwise: integer partials


def test_components_orthonormal_eigvals_descending(spark, emb):
    _, comp, eig = fit_pca(spark, emb)
    assert np.allclose(comp @ comp.T, np.eye(comp.shape[0]), atol=1e-9)
    assert np.all(np.diff(eig) <= 1e-12)


def test_projection_variance_equals_eigval(spark, emb):
    mean, comp, eig = fit_pca(spark, emb)
    proj = project_pca(spark, emb, mean, comp, k=8)
    rows = proj.select("pca").collect()
    p = np.stack([np.asarray(r["pca"], "float64") for r in rows])
    # fit is on quantized values; projection on raw — variances agree
    # to quantization tolerance
    var = p.var(axis=0)
    assert np.allclose(var, eig[:8], atol=1e-5)
    assert len(rows) == emb.count()


def test_planted_anisotropy_recovered(spark):
    """Vectors stretched 100x along a planted direction: the top
    component must align with it and dominate the spectrum."""
    rng = np.random.default_rng(7)
    d, n = 16, 400
    u = np.zeros(d)
    u[3] = 1.0
    data = rng.normal(0, 0.05, (n, d)) + np.outer(
        rng.normal(0, 5.0, n), u
    )
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(data)],
        "vec_id long, embedding array<double>",
    )
    _, comp, eig = fit_pca(spark, df)
    assert abs(comp[0][3]) > 0.999
    assert eig[0] > 50 * eig[1]
