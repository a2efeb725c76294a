"""Scalar (int8) quantization: exact partitioning-invariant training,
bounded reconstruction error, recall climbing with shortlist/rerank,
and full-shortlist+rerank EXACTLY brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vrtility_spark import sq


def _clustered(n=240, d=32, n_clusters=6, seed=9):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (n_clusters, d))
    return (centers[rng.integers(0, n_clusters, n)]
            + rng.normal(0, 0.15, (n, d)))


@pytest.fixture(scope="module")
def vecs(spark):
    X = _clustered()
    pdf = pd.DataFrame({"vec_id": np.arange(len(X), dtype=np.int64),
                        "embedding": [row.tolist() for row in X]})
    return spark.createDataFrame(pdf).cache(), X


def _brute_topk(X, qids, k):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    out = {}
    for q in qids:
        sims = Xn @ Xn[q]
        sims[q] = -np.inf
        order = np.argsort(-sims, kind="stable")
        rows = sorted(((round(-s, 12), i) for s, i in
                       zip(sims[order[:3 * k]], order[:3 * k])))
        out[q] = [int(i) for _, i in rows[:k]]
    return out


def test_train_exact_and_partitioning_invariant(spark, vecs):
    df, X = vecs
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    models = [sq.train_sq(df.repartition(p), "embedding")
              for p in (1, 3, 17)]
    for m in models[1:]:
        np.testing.assert_array_equal(models[0], m)  # bit-identical
    np.testing.assert_allclose(models[0][0], Xn.min(axis=0),
                               rtol=0, atol=1e-15)
    np.testing.assert_allclose(models[0][1], Xn.max(axis=0),
                               rtol=0, atol=1e-15)
    with pytest.raises(ValueError, match="empty"):
        sq.train_sq(df.where(F.lit(False)), "embedding")


def test_roundtrip_error_bound_and_constant_dims():
    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (50, 8))
    X[:, 5] = 0.42                      # constant dimension
    model = np.stack([X.min(axis=0), X.max(axis=0)])
    codes = sq.sq_encode_np(X, model, normalize=False)
    assert codes.dtype == np.uint8 and codes.shape == X.shape
    back = sq.sq_decode_np(codes, model)
    delta = model[1] - model[0]
    # per-dimension error <= half a quantization step
    assert (np.abs(back - X) <= delta / 510.0 + 1e-12).all()
    # constant dim reconstructs exactly; endpoints reproduce exactly
    np.testing.assert_array_equal(back[:, 5], 0.42)
    jmin = X[:, 0].argmin()
    assert back[jmin, 0] == model[0][0]


def test_encode_compression_and_determinism(spark, vecs):
    df, X = vecs
    model = sq.train_sq(df, "embedding")
    enc = sq.sq_encode(df, "embedding", model)
    rows = enc.select("vec_id", "sq_code").collect()
    d = X.shape[1]
    assert all(len(bytes(r.sq_code)) == d for r in rows)  # 4x vs f32
    got = {r.vec_id: bytes(r.sq_code) for r in rows}
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    want = sq.sq_encode_np(Xn, model, normalize=False)
    for i in range(len(X)):
        assert got[i] == want[i].tobytes()


def test_recall_and_exactness_ladder(spark, vecs):
    df, X = vecs
    model = sq.train_sq(df, "embedding")
    enc = sq.sq_encode(df, "embedding", model).cache()
    qids = list(range(8))
    q = df.where(F.col("vec_id") < len(qids))
    truth = _brute_topk(X, qids, 5)

    def recall(out):
        got = {}
        for r in out.collect():
            got.setdefault(r.q_id, []).append(r.id)
        hits = sum(len(set(got.get(qi, [])) & set(truth[qi]))
                   for qi in qids)
        return hits / (5 * len(qids))

    r_tight = recall(sq.sq_search(enc, q, model, "embedding", "vec_id",
                                  "vec_id", k=5, shortlist=5))
    r_wide = recall(sq.sq_search(enc, q, model, "embedding", "vec_id",
                                 "vec_id", k=5, shortlist=64,
                                 rerank=True))
    assert r_tight <= r_wide
    assert r_wide >= 0.9               # SQ8 at 32 dims is near-exact
    # corpus-wide shortlist + exact rerank IS brute force
    n = df.count()
    full = sq.sq_search(enc, q, model, "embedding", "vec_id",
                        "vec_id", k=5, shortlist=n, rerank=True,
                        rank_round=6)
    got = {}
    for r in full.collect():
        got.setdefault(r.q_id, []).append((r.rank, r.id))
    for qi in qids:
        assert [i for _, i in sorted(got[qi])] == truth[qi]
    # determinism: run twice, identical rows
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, full.collect()))
    assert a == b
    with pytest.raises(ValueError, match="shortlist"):
        sq.sq_search(enc, q, model, "embedding", "vec_id", "vec_id",
                     k=5, shortlist=0)


def test_empty_queries(spark, vecs):
    df, _X = vecs
    model = sq.train_sq(df, "embedding")
    enc = sq.sq_encode(df, "embedding", model)
    out = sq.sq_search(enc, df.where(F.lit(False)), model,
                       "embedding", "vec_id", "vec_id", k=5)
    assert out.count() == 0
