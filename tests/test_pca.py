"""Distributed PCA: Jacobi eigensolver vs LAPACK, distributed
sufficient statistics vs direct NumPy covariance, projection parity,
partitioning invariance (exact for the integer fixture), planted-
direction recovery, and validation guards."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import datagen, pca


def test_jacobi_eigh_matches_lapack():
    rng = np.random.default_rng(3)
    for d in (2, 5, 12):
        M = rng.normal(0, 1, (d, d))
        A = (M + M.T) / 2
        vals, vecs = pca.jacobi_eigh(A)
        lv = np.linalg.eigvalsh(A)[::-1]
        np.testing.assert_allclose(vals, lv, rtol=1e-10, atol=1e-10)
        # rows are orthonormal eigenvectors: A v = λ v
        np.testing.assert_allclose(vecs @ vecs.T, np.eye(d), atol=1e-10)
        for i in range(d):
            np.testing.assert_allclose(A @ vecs[i], vals[i] * vecs[i],
                                       atol=1e-8)
        # sign convention: largest-|entry| coordinate positive
        for i in range(d):
            assert vecs[i, int(np.argmax(np.abs(vecs[i])))] > 0


def test_fit_matches_numpy_and_partitioning_invariant(spark):
    pdf = datagen.embeddings_pandas()
    df = spark.createDataFrame(pdf)
    m = pca.fit_pca(df, k=4)
    X = np.stack(pdf.embedding.to_numpy())
    np.testing.assert_array_equal(m.mean, X.mean(axis=0))
    cov = np.cov(X, rowvar=False, bias=True)
    lv = np.linalg.eigvalsh(cov)[::-1]
    np.testing.assert_allclose(m.eigenvalues, lv, rtol=1e-9, atol=1e-9)
    assert m.n == len(pdf)
    # integer-valued data → exact partials → bit-identical model at
    # any partitioning
    m2 = pca.fit_pca(df.repartition(13), k=4)
    np.testing.assert_array_equal(m.components, m2.components)
    np.testing.assert_array_equal(m.eigenvalues, m2.eigenvalues)


def test_transform_matches_numpy_and_zero_shuffle(spark):
    pdf = datagen.embeddings_pandas(n=60, d=8)
    df = spark.createDataFrame(pdf)
    m = pca.fit_pca(df, k=3)
    out = pca.transform_pca(df, m)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r.doc_id: np.asarray(r.pca) for r in out.collect()}
    X = np.stack(pdf.embedding.to_numpy())
    want = (X - m.mean) @ m.components.T
    for i, did in enumerate(pdf.doc_id):
        np.testing.assert_allclose(got[did], want[i], rtol=1e-12,
                                   atol=1e-12)


def test_planted_direction_recovered(spark):
    # strong 1-D signal along a known axis + small isotropic noise
    rng = np.random.default_rng(9)
    d = 10
    u = np.zeros(d)
    u[2], u[7] = 3.0, 4.0   # |u| = 5, direction (0.6, 0.8)
    X = (rng.integers(-20, 21, (400, 1)) * u
         + rng.integers(-2, 3, (400, d))).astype(np.float64)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(X)),
                      "embedding": [r.tolist() for r in X]}))
    m = pca.fit_pca(df, k=1)
    cos = abs(float(m.components[0] @ (u / np.linalg.norm(u))))
    assert cos > 0.999
    assert m.explained_variance_ratio[0] > 0.95


def test_validation(spark):
    pdf = datagen.embeddings_pandas(n=10, d=4)
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="k must be"):
        pca.fit_pca(df, k=5)
    with pytest.raises(ValueError, match="empty"):
        pca.fit_pca(df.filter("doc_id < 0"), k=2)


def test_fit_combine_spark_matches_driver(spark):
    pdf = datagen.embeddings_pandas(n=200, d=9)
    df = spark.createDataFrame(pdf).repartition(11)
    a = pca.fit_pca(df, k=3, combine="driver")
    b = pca.fit_pca(df, k=3, combine="spark", groups=4)
    # integer-valued fixture: both merge orders are exact -> identical
    np.testing.assert_array_equal(a.mean, b.mean)
    np.testing.assert_array_equal(a.eigenvalues, b.eigenvalues)
    np.testing.assert_array_equal(a.components, b.components)
    assert a.n == b.n == 200
    with pytest.raises(ValueError, match="combine"):
        pca.fit_pca(df, k=3, combine="tree")


def test_pca_then_ivf_integration(spark):
    # the intended composition: shrink d before indexing; exact search
    # over the projected vectors matches NumPy brute force top-1
    from vrtility_spark import ann
    pdf = datagen.embeddings_pandas(n=120, d=16, n_clusters=4)
    df = spark.createDataFrame(pdf[["doc_id", "embedding"]])
    m = pca.fit_pca(df, k=4)
    proj = pca.transform_pca(df, m).select(
        "doc_id", "pca").withColumnRenamed("pca", "embedding")
    cents = ann.train_ivf(proj, "embedding", "doc_id", n_clusters=4,
                          iters=2)
    indexed = ann.ivf_assign(proj, "embedding", cents).cache()
    # deterministic query set (an un-ordered limit() may pick
    # different rows in each of the two actions below)
    queries = proj.filter("doc_id < 5").withColumnRenamed(
        "doc_id", "q_id")
    got = ann.ivf_search(indexed, queries, cents, "embedding",
                         "doc_id", "q_id", k=1,
                         nprobe=len(cents)).toPandas()
    X = np.stack(pdf.embedding.to_numpy())
    Y = (X - m.mean) @ m.components.T
    Yn = Y / np.linalg.norm(Y, axis=1, keepdims=True)
    qids = [int(r.q_id) for r in queries.collect()]
    for qid in qids:
        sims = Yn @ Yn[qid]
        sims[qid] = -np.inf            # ivf_search excludes self
        grow = got[got.q_id == qid]
        top = int(grow[grow["rank"] == 1].id.iloc[0])
        # engine-vs-NumPy float noise can flip exact near-ties; the
        # similarity of the returned id must equal the true max
        assert abs(sims[top] - sims.max()) < 1e-9
