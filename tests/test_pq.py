"""Product quantization: codebook training improves quantization error,
ADC equals the decoded-distance identity, recall climbs with
shortlist/rerank, and full-shortlist+refine is EXACTLY brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vrtility_spark import ann, pq


def _clustered(n=240, d=32, n_clusters=6, seed=4):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (n_clusters, d))
    X = (centers[rng.integers(0, n_clusters, n)]
         + rng.normal(0, 0.15, (n, d)))
    return X


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
        # deterministic id tiebreak on equal sims
        rows = sorted(((round(-s, 12), i) for s, i in
                       zip(sims[order[:3 * k]], order[:3 * k])))
        out[q] = [int(i) for _, i in rows[:k]]
    return out


def test_train_reduces_quantization_error(spark, vecs):
    df, X = vecs
    b0 = pq.train_pq(df, "embedding", "vec_id", m=4, ksub=8, iters=0)
    b3 = pq.train_pq(df, "embedding", "vec_id", m=4, ksub=8, iters=3)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    e0 = ((pq.decode_np(pq._encode_np(Xn, b0, False), b0) - Xn) ** 2).sum()
    e3 = ((pq.decode_np(pq._encode_np(Xn, b3, False), b3) - Xn) ** 2).sum()
    assert b3.shape == (4, 8, 8)
    assert e3 < e0 * 0.9


def test_adc_equals_decoded_distance(spark, vecs):
    df, X = vecs
    books = pq.train_pq(df, "embedding", "vec_id", m=4, ksub=8, iters=2)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    codes = pq._encode_np(Xn, books, False)
    q = Xn[7]
    lut = pq.adc_lut_np(X[7], books, normalize=True)
    got = pq.adc_np(codes, lut)
    want = ((pq.decode_np(codes, books) - q) ** 2).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_encode_compression_and_determinism(spark, vecs):
    df, X = vecs
    books = pq.train_pq(df, "embedding", "vec_id", m=8, ksub=16, iters=2)
    enc = pq.pq_encode(df, "embedding", books)
    rows = enc.select("vec_id", "pq_code").collect()
    assert all(len(r["pq_code"]) == 8 for r in rows)  # 32 f64 → 8 B
    again = {r["vec_id"]: r["pq_code"] for r in
             pq.pq_encode(df.repartition(7), "embedding", books)
             .select("vec_id", "pq_code").collect()}
    assert {r["vec_id"]: r["pq_code"] for r in rows} == again


def test_recall_and_exactness_ladder(spark, vecs):
    df, X = vecs
    books = pq.train_pq(df, "embedding", "vec_id", m=8, ksub=16, iters=3)
    enc = pq.pq_encode(df, "embedding", books).cache()
    qids = list(range(8))
    q = df.where(F.col("vec_id") < len(qids))
    want = _brute_topk(X, qids, k=5)

    def recall(res):
        got: dict[int, list] = {}
        for r in res.collect():
            got.setdefault(r["q_id"], []).append(r["id"])
        hits = sum(len(set(got.get(qd, [])) & set(want[qd]))
                   for qd in qids)
        return hits / (5 * len(qids))

    # pure ADC top-5: quantization error ~ within-cluster distance
    # gaps, so fine ranking is coarse BY DESIGN — PQ is a shortlist
    # generator (measured 0.275 on this fixture; bound leaves noise
    # headroom without letting a broken ADC through)
    r_adc = recall(pq.pq_search(enc, q, books, "embedding", "vec_id",
                                "vec_id", k=5, shortlist=5))
    # ADC shortlist-40 + exact refine: the 40-deep shortlist captures
    # 100% of the true top-5 on this fixture → near-exact after rerank
    r_ref = recall(pq.pq_search(enc, q, books, "embedding", "vec_id",
                                "vec_id", k=5, shortlist=40, rerank=True))
    assert r_adc >= 0.2
    assert r_ref >= r_adc and r_ref >= 0.95
    # full shortlist + refine == EXACT brute force, row for row
    res = pq.pq_search(enc, q, books, "embedding", "vec_id", "vec_id",
                       k=5, shortlist=len(X), rerank=True,
                       rank_round=9)
    got = {}
    for r in res.collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["id"]))
    for qd in qids:
        assert [i for _, i in sorted(got[qd])] == want[qd]


def test_ivf_pruning_restricts_candidates(spark, vecs):
    df, X = vecs
    cents = ann.train_ivf(df, "embedding", "vec_id", n_clusters=4,
                          iters=2)
    books = pq.train_pq(df, "embedding", "vec_id", m=4, ksub=16, iters=2)
    enc = pq.pq_encode(ann.ivf_assign(df, "embedding", cents),
                       "embedding", books).cache()
    q = df.where(F.col("vec_id") < 4)
    res1 = pq.pq_search(enc, q, books, "embedding", "vec_id", "vec_id",
                        k=5, centroids=cents, nprobe=1, shortlist=20)
    # every candidate really comes from the query's nearest cluster
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cluster_of = {r["vec_id"]: r["cluster"] for r in
                  enc.select("vec_id", "cluster").collect()}
    for r in res1.collect():
        probe = int(np.argmax(Xn[r["q_id"]] @ cn.T))
        assert cluster_of[r["id"]] == probe
    # nprobe = all clusters ⊇ the nprobe=1 result set
    res_all = pq.pq_search(enc, q, books, "embedding", "vec_id",
                           "vec_id", k=5, centroids=cents, nprobe=4,
                           shortlist=20)
    ids1 = {(r["q_id"], r["id"]) for r in res1.collect()}
    # same ADC metric, wider candidate pool: top-5 can only improve,
    # and every query still returns exactly 5 rows
    per_q = {}
    for r in res_all.collect():
        per_q[r["q_id"]] = per_q.get(r["q_id"], 0) + 1
    assert per_q == {i: 5 for i in range(4)}
    assert len(ids1) == 20


def test_dim_guard():
    with pytest.raises(ValueError, match="not divisible"):
        pq._check_dims(30, 7)


def test_guards_ksub_and_shortlist(spark, vecs):
    df, X = vecs
    with pytest.raises(ValueError, match="uint8"):
        pq.train_pq(df, "embedding", "vec_id", m=4, ksub=512)
    books = pq.train_pq(df, "embedding", "vec_id", m=4, ksub=8, iters=1)
    enc = pq.pq_encode(df, "embedding", books)
    # k wider than the shortlist: S is raised to k, so every query
    # still gets k rows (used to silently truncate)
    res = pq.pq_search(enc, df.where("vec_id < 3"), books, "embedding",
                       "vec_id", "vec_id", k=12, shortlist=4)
    per = {}
    for r in res.collect():
        per[r["q_id"]] = per.get(r["q_id"], 0) + 1
    assert per == {0: 12, 1: 12, 2: 12}
    with pytest.raises(ValueError, match="shortlist"):
        pq.pq_search(enc, df, books, "embedding", "vec_id", "vec_id",
                     k=5, shortlist=0)


def test_kmeans_parallel_init_beats_first_and_is_deterministic(spark, vecs):
    # the k-means|| seeding (default) must land a materially lower
    # quantization error than the legacy first-ksub-rows baseline at
    # the same Lloyd budget (measured 5.04 vs 15.85 at iters=1 on this
    # fixture), and be bit-reproducible run to run (hash coins, no RNG)
    df, X = vecs
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    def err(b):
        return ((pq.decode_np(pq._encode_np(Xn, b, False), b) - Xn)
                ** 2).sum()

    bf = pq.train_pq(df, "embedding", "vec_id", m=4, ksub=8, iters=1,
                     init="first")
    bk = pq.train_pq(df, "embedding", "vec_id", m=4, ksub=8, iters=1,
                     init="kmeans||")
    assert err(bk) < 0.6 * err(bf)
    bk2 = pq.train_pq(df, "embedding", "vec_id", m=4, ksub=8, iters=1,
                      init="kmeans||")
    np.testing.assert_array_equal(bk, bk2)
    with pytest.raises(ValueError, match="unknown init"):
        pq.train_pq(df, "embedding", "vec_id", m=4, ksub=8, init="rng")


def test_pq_index_persistence_roundtrip_and_resume(spark, vecs, tmp_path):
    df, X = vecs
    cents = ann.train_ivf(df, "embedding", "vec_id", n_clusters=4, iters=2)
    books = pq.train_pq(df, "embedding", "vec_id", m=4, ksub=8, iters=2)
    enc = pq.pq_encode(ann.ivf_assign(df, "embedding", cents),
                       "embedding", books).cache()
    path = str(tmp_path / "pqidx")
    man = pq.write_pq_index(enc, path, books, centroids=cents)
    assert man["partitions"]  # per-partition row counts recorded
    back, books2, cents2 = pq.read_pq_index(spark, path)
    np.testing.assert_allclose(books2, books)
    np.testing.assert_allclose(cents2, cents)
    want = sorted((r["vec_id"], bytes(r["pq_code"]))
                  for r in enc.collect())
    assert sorted((r["vec_id"], bytes(r["pq_code"]))
                  for r in back.collect()) == want
    # search straight off the restored index == search on the live one
    q = df.where(F.col("vec_id") < 4)
    live = {(r["q_id"], r["rank"]): r["id"] for r in pq.pq_search(
        enc, q, books, "embedding", "vec_id", "vec_id", k=3,
        centroids=cents, nprobe=4, shortlist=len(X), rerank=True,
        rank_round=9).collect()}
    rest = {(r["q_id"], r["rank"]): r["id"] for r in pq.pq_search(
        back, q, books2, "embedding", "vec_id", "vec_id", k=3,
        centroids=cents2, nprobe=4, shortlist=len(X), rerank=True,
        rank_round=9).collect()}
    assert live == rest and live
    # RESUME: an interrupted encode job commits the remaining
    # partitions only, and the chained read equals the single-shot one
    path2 = str(tmp_path / "pqidx2")
    tab = pq.pq_index_table(path2)
    half = enc.where(F.col("cluster") < 2)
    tab.commit(half, "cluster", upsert=True)
    todo = tab.remaining(enc, "cluster")
    assert todo.count() == enc.count() - half.count()
    pq.write_pq_index(todo, path2, books, centroids=cents)
    back2, _, _ = pq.read_pq_index(spark, path2)
    assert sorted((r["vec_id"], bytes(r["pq_code"]))
                  for r in back2.collect()) == want


def test_pq_index_bucket_fallback_and_books_only(spark, vecs, tmp_path):
    df, X = vecs
    books = pq.train_pq(df, "embedding", "vec_id", m=4, ksub=8, iters=2)
    enc = pq.pq_encode(df, "embedding", books)  # no cluster column
    path = str(tmp_path / "flatidx")
    pq.write_pq_index(enc, path, books)  # hash-bucket fallback, no IVF
    back, books2, cents2 = pq.read_pq_index(spark, path)
    # the internal _bucket partitioner never leaks into the read schema
    assert sorted(back.columns) == sorted(enc.columns)
    assert sorted((r["vec_id"], bytes(r["pq_code"]))
                  for r in back.collect()) == \
        sorted((r["vec_id"], bytes(r["pq_code"])) for r in enc.collect())
    # a books-only index reads back with centroids=None (missing
    # sidecar is legal; corruption still raises)
    assert cents2 is None
    np.testing.assert_allclose(books2, books)
