"""Gates for the distributed PCA operator (operators/decomposition.py).

The pipeline is iterative linear algebra, not single-statement SQL, so
the oracle is a pure-numpy twin replaying the IDENTICAL pipeline
(population covariance → eigh → stable descending sort → sign fix →
projection) on the collected corpus.  Distributed float-sum ordering
perturbs the covariance at ~1e-15; with the testdata's eigengaps that
moves loadings ≲1e-9, so the 1e-6 tolerance is three orders of slack,
not a loose gate.
"""

from __future__ import annotations

import numpy as np
import pytest

from frizzle_spark.operators.decomposition import (
    PCA_K,
    pca_fit,
    qz12_pca,
    qz12_pca_variance,
)
from frizzle_spark.operators.similarity import _corpus


def _numpy_twin(x: np.ndarray):
    n = x.shape[0]
    mu = x.sum(axis=0) / n
    cov = (x.T @ x) / n - np.outer(mu, mu)
    cov = (cov + cov.T) / 2.0
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(-vals, kind="stable")
    vals = vals[order]
    w = vecs[:, order].T
    for i in range(w.shape[0]):
        j = int(np.argmax(np.abs(w[i])))
        if w[i, j] < 0:
            w[i] = -w[i]
    return mu, vals, w


@pytest.fixture(scope="module")
def collected(spark, sf_dir):
    rows = (
        _corpus(spark, sf_dir).select("vec_id", "v").orderBy("vec_id").collect()
    )
    ids = np.asarray([r["vec_id"] for r in rows])
    x = np.asarray([r["v"] for r in rows], dtype=np.float64)
    return ids, x


def test_projection_matches_numpy_twin(spark, sf_dir, collected):
    ids, x = collected
    mu, vals, w = _numpy_twin(x)
    want = (x - mu) @ w[:PCA_K].T
    got_rows = {r["vec_id"]: r for r in qz12_pca(spark, sf_dir).collect()}
    assert len(got_rows) == len(ids)
    got = np.asarray(
        [[got_rows[i][f"pc_{j}"] for j in range(PCA_K)] for i in ids]
    )
    np.testing.assert_allclose(got, np.round(want, 6), atol=1e-6)


def test_components_orthonormal_and_variance_matches_eigenvalue(
    spark, sf_dir, collected
):
    _ids, x = collected
    n, mu, vals, w = pca_fit(_corpus(spark, sf_dir))
    assert n == x.shape[0]
    # orthonormal rows
    np.testing.assert_allclose(w @ w.T, np.eye(w.shape[0]), atol=1e-9)
    # eigenvalues descending
    assert (np.diff(vals) <= 1e-12).all()
    # variance of the projected coordinate IS the eigenvalue (population)
    proj = (x - mu) @ w[:PCA_K].T
    var = proj.var(axis=0)  # population (ddof=0), matching the fit
    np.testing.assert_allclose(var, vals[:PCA_K], rtol=1e-6)


def test_variance_summary_ratios(spark, sf_dir, collected):
    _ids, x = collected
    _mu, vals, _w = _numpy_twin(x)
    rows = sorted(
        qz12_pca_variance(spark, sf_dir).collect(), key=lambda r: r["component"]
    )
    assert len(rows) == PCA_K
    total = vals.sum()
    cum = 0.0
    for r in rows:
        i = r["component"]
        assert abs(r["eigenvalue"] - round(float(vals[i]), 6)) <= 1e-6
        ratio = float(vals[i]) / total
        cum += ratio
        assert abs(r["explained"] - ratio) <= 1e-5
        assert abs(r["cumulative"] - cum) <= 1e-5
    # ratios over ALL d eigenvalues: cumulative stays < 1 unless d == k
    assert rows[-1]["cumulative"] <= 1.0 + 1e-9


def test_empty_corpus_totality(spark, tmp_path):
    import pandas as pd

    out = str(tmp_path / "empty")
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": pd.Series([], dtype="int64")}).assign(
            embedding=None, label=None
        ),
        "vec_id long, embedding array<float>, label string",
    )
    emb.write.parquet(f"{out}/embeddings.parquet")
    assert qz12_pca(spark, out).count() == 0
    assert qz12_pca_variance(spark, out).count() == 0
    # schema stays stable on the empty path
    assert [f.name for f in qz12_pca(spark, out).schema.fields] == [
        "vec_id"
    ] + [f"pc_{i}" for i in range(PCA_K)]


def test_ood_score_matches_numpy_twin(spark, sf_dir, collected):
    import numpy as np

    from frizzle_spark.operators.decomposition import OOD_RIDGE, qz12_ood_score

    ids, x = collected
    mu, vals, w = _numpy_twin(x)
    cov = w.T @ np.diag(vals) @ w
    prec = np.linalg.inv(cov + OOD_RIDGE * np.eye(x.shape[1]))
    diff = x - mu
    want = np.einsum("ij,jk,ik->i", diff, prec, diff)
    got_rows = {r["vec_id"]: r["maha_sq"] for r in qz12_ood_score(spark, sf_dir).collect()}
    got = np.asarray([got_rows[i] for i in ids])
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-6)
    # scale sanity: mean Mahalanobis-squared over the FIT sample is ~d
    assert abs(got.mean() - x.shape[1]) / x.shape[1] < 0.05


def test_ood_flags_planted_outlier(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from frizzle_spark.operators.decomposition import qz12_ood_score

    rng = np.random.RandomState(3)
    vecs = rng.randn(300, 16)
    vecs[0] = 40.0  # far outside the cloud
    out = str(tmp_path / "ood")
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(300, dtype="int64"),
            "embedding": [v.astype("float32").tolist() for v in vecs],
            "label": ["x"] * 300,
        }
    )
    spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label string"
    ).write.parquet(f"{out}/embeddings.parquet")
    rows = {r["vec_id"]: r["maha_sq"] for r in qz12_ood_score(spark, out).collect()}
    others = sorted(v for k, v in rows.items() if k != 0)
    # the outlier sits in the fit sample, so it inflates covariance along
    # its own direction (masking) — it is still the unambiguous maximum,
    # far above the bulk of the cloud
    assert rows[0] == max(rows.values())
    assert rows[0] > 5 * others[len(others) // 2]
