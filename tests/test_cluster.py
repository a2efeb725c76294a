"""k-means pixel classification: deterministic sampling, Lloyd kernel
properties, and the distributed fit/assign vs a driver-side twin."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, cluster, codec
from vrtility_spark.pipeline import Pipeline

RNG = np.random.default_rng(17)


# --------------------------------------------------------- kernels ----

def test_sample_offsets_deterministic_prefix():
    a = cluster.sample_offsets_np(123, 256, 16, seed=7)
    b = cluster.sample_offsets_np(123, 256, 16, seed=7)
    assert np.array_equal(a, b)
    # prefix property: n=16 is the head of the full permutation
    full = cluster.sample_offsets_np(123, 256, 256, seed=7)
    assert np.array_equal(a, full[:16])
    assert sorted(full.tolist()) == list(range(256))
    # different cell / seed -> different draw
    assert not np.array_equal(a, cluster.sample_offsets_np(124, 256, 16,
                                                           seed=7))
    assert not np.array_equal(a, cluster.sample_offsets_np(123, 256, 16,
                                                           seed=8))


def test_sample_tile_skips_invalid_keeps_order():
    arr = RNG.uniform(1, 100, (2, 8, 8))
    arr[0, 0, :] = np.nan                      # first row invalid
    feats = cluster.sample_tile_np(arr, 42, 10, seed=0)
    assert feats.shape == (10, 2)
    assert np.isfinite(feats).all()
    # the draw is the valid subsequence of the full permutation
    flat = arr.reshape(2, 64).T
    order = cluster.sample_offsets_np(42, 64, 64, 0)
    valid = np.isfinite(flat).all(axis=1)
    want = flat[order[valid[order]][:10]]
    assert np.array_equal(feats, want)


def _inertia(X, C):
    return ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2) \
        .min(axis=1).sum()


def test_train_kmeans_recovers_separated_clusters():
    centers = np.array([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]])
    X = np.concatenate([c + RNG.normal(0, 1, (50, 2)) for c in centers])
    C = cluster.train_kmeans_np(X, 3, iters=30, seed=1)
    # each true center has a learned centroid within 1 unit
    d = np.sqrt(((centers[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
    assert (d.min(axis=1) < 1.0).all()
    # deterministic
    C2 = cluster.train_kmeans_np(X, 3, iters=30, seed=1)
    assert np.array_equal(C, C2)
    # fitting beats init
    init = cluster.kmeans_pp_init_np(X, 3, seed=1)
    assert _inertia(X, C) <= _inertia(X, init) + 1e-9


def test_train_kmeans_guards_and_degenerate():
    X = np.zeros((5, 2))
    C = cluster.train_kmeans_np(X, 3, iters=5, seed=0)
    assert C.shape == (3, 2)                  # coincident points survive
    with pytest.raises(ValueError):
        cluster.train_kmeans_np(X, 6)
    with pytest.raises(ValueError):
        cluster.train_kmeans_np(X, 0)


def test_assign_tie_breaks_lowest_index():
    C = np.array([[0.0], [2.0]])
    assert cluster.assign_np(np.array([[1.0]]), C).tolist() == [0]


def test_classify_tile_nodata_sentinel_and_shape():
    arr = RNG.uniform(0, 10, (2, 4, 4))
    arr[1, 2, 2] = np.nan
    C = np.array([[1.0, 1.0], [9.0, 9.0]])
    lab = cluster.classify_tile_np(arr, C)
    assert lab.shape == (1, 4, 4) and lab.dtype == np.uint16
    assert lab[0, 2, 2] == cluster.NODATA_CLASS
    with pytest.raises(ValueError):
        cluster.classify_tile_np(arr, np.zeros((2, 3)))


# ------------------------------------------------- distributed driver ----

ZONE, RES = 50, 3
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def _tiles(n=6, h=8, w=8, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        # two planted pixel populations per tile
        arr = np.where(rng.random((2, h, w)) < 0.5,
                       rng.integers(10, 20, (2, h, w)),
                       rng.integers(200, 220, (2, h, w))).astype(float)
        arr[0, 0, 0] = 0.0                     # nodata pixel
        cid = int(cells.encode_np(ZONE, RES, i % 3, i // 3))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(np.uint16),
                                           "raw16"),
                     "w": w, "h": h, "fmt": "raw16", "nodata": 0.0})
    return rows


def test_sample_pixels_reshard_invariant(spark):
    rows = _tiles()
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    a = cluster.sample_pixels(df, n_per_tile=12, seed=3)
    b = cluster.sample_pixels(df.repartition(7), n_per_tile=12, seed=3)
    assert a.cell_id.tolist() == b.cell_id.tolist()
    assert [list(v) for v in a.feat] == [list(v) for v in b.feat]


def test_max_cells_bounds_the_sample(spark):
    rows = _tiles()
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    s = cluster.sample_pixels(df, n_per_tile=12, max_cells=2, seed=3)
    assert s.cell_id.nunique() == 2
    # the kept cells are the hash-rank winners, not arbitrary
    s2 = cluster.sample_pixels(df.repartition(5), n_per_tile=12,
                               max_cells=2, seed=3)
    assert sorted(s.cell_id.unique()) == sorted(s2.cell_id.unique())


def test_distributed_classify_matches_driver_twin(spark):
    rows = _tiles()
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    C = cluster.fit_kmeans(df, k=2, n_per_tile=16, iters=15, seed=9)
    got = {r.cell_id: r for r in cluster.classify_kmeans(df, C).collect()}
    # driver twin from the same shared kernels
    samp = []
    for r in sorted(rows, key=lambda d: d["cell_id"]):
        arr = codec.to_float_masked(
            codec.decode(r["bytes"], r["w"], r["h"], r["fmt"]), 0.0)
        samp.append(cluster.sample_tile_np(arr, r["cell_id"], 16, 9))
    X = np.concatenate(samp)
    C2 = cluster.train_kmeans_np(X, 2, iters=15, seed=9)
    assert np.array_equal(C, C2)
    for r in rows:
        arr = codec.to_float_masked(
            codec.decode(r["bytes"], r["w"], r["h"], r["fmt"]), 0.0)
        want = codec.encode(cluster.classify_tile_np(arr, C2), "raw16")
        o = got[r["cell_id"]]
        assert bytes(o.bytes) == want
        assert o.fmt == "raw16" and o.nodata == float(cluster.NODATA_CLASS)
    # both planted populations show up as distinct classes somewhere
    labs = {v for r in rows
            for v in np.unique(codec.decode(
                bytes(got[r["cell_id"]].bytes), 8, 8, "raw16"))}
    assert {0, 1} <= labs


def test_kmeans_pipeline_verb_and_bundle(spark, tmp_path):
    rows = _tiles()
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    p = Pipeline(df).kmeans(k=2, n_per_tile=16, iters=10, seed=4)
    got = {r.cell_id: bytes(r.bytes) for r in p.df.collect()}
    bpath = str(tmp_path / "kmeans_bundle.json")
    p.to_bundle(bpath)
    replay = Pipeline.from_bundle(bpath, df)
    got2 = {r.cell_id: bytes(r.bytes) for r in replay.df.collect()}
    assert got == got2 and len(got) == len(rows)


# ------------------------------------------- embeddings / SemDeDup ----

def _emb_df(spark, n=60, dup_of=(0, 1, 2), seed=11):
    """Integer clustered embeddings + planted near-exact duplicates of
    the given doc ids (id = n + i)."""
    from vrtility_spark import datagen
    pdf = datagen.embeddings_pandas(n=n, d=8, n_clusters=3, seed=seed)
    rows = pdf[["doc_id", "embedding"]].to_dict("records")
    for i, src in enumerate(dup_of):
        v = list(rows[src]["embedding"])
        rows.append({"doc_id": n + i, "embedding": v})  # exact copy
    return spark.createDataFrame(
        pd.DataFrame(rows), "doc_id long, embedding array<double>")


def test_assign_vectors_matches_numpy_and_is_expression_only(spark):
    df = _emb_df(spark)
    C = cluster.fit_kmeans_vectors(df, 3, max_rows=1000, iters=15,
                                   seed=2)
    got = {r.doc_id: r.cluster
           for r in cluster.assign_vectors(df, C).collect()}
    pdf = df.toPandas()
    X = np.asarray(pdf.embedding.tolist(), dtype=np.float64)
    want = cluster.assign_np(X, C)
    assert [got[i] for i in pdf.doc_id] == want.tolist()
    # zero Python in the assign hot path: no Arrow/Python eval nodes
    plan = cluster.assign_vectors(df, C)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_fit_kmeans_vectors_reshard_and_cap(spark):
    df = _emb_df(spark)
    a = cluster.fit_kmeans_vectors(df, 3, max_rows=1000, seed=5)
    b = cluster.fit_kmeans_vectors(df.repartition(7), 3, max_rows=1000,
                                   seed=5)
    assert np.array_equal(a, b)
    # the cap really bounds the sample (trains fine on 10 rows)
    c = cluster.fit_kmeans_vectors(df, 3, max_rows=10, seed=5)
    assert c.shape == a.shape


def test_semantic_dedup_drops_planted_duplicates(spark):
    n = 60
    df = _emb_df(spark, n=n, dup_of=(0, 1, 2))
    C = cluster.fit_kmeans_vectors(df, 3, max_rows=1000, iters=15,
                                   seed=3)
    pairs = cluster.semantic_dup_pairs(df, C, threshold=0.999999)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    # every planted exact copy pairs with its source (cos == 1)
    assert {(0, n), (1, n + 1), (2, n + 2)} <= got
    kept = cluster.semantic_dedup(df, 3, threshold=0.999999,
                                  max_rows=1000, iters=15, seed=3)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert {n, n + 1, n + 2}.isdisjoint(ids)     # copies dropped
    assert {0, 1, 2} <= ids                      # keep-min-id survives
    # python oracle: exact pair set within clusters
    pdf = df.toPandas()
    X = np.asarray(pdf.embedding.tolist(), dtype=np.float64)
    lab = cluster.assign_np(X, C)
    ids_all = pdf.doc_id.to_numpy()
    want = set()
    for i in range(len(X)):
        for j in range(i + 1, len(X)):
            if lab[i] != lab[j]:
                continue
            na, nb = np.sqrt((X[i] ** 2).sum()), np.sqrt((X[j] ** 2).sum())
            if na * nb <= 0:
                continue
            if (X[i] @ X[j]) / (na * nb) >= 0.999999:
                a, b = sorted((int(ids_all[i]), int(ids_all[j])))
                want.add((a, b))
    assert got == want


def test_semantic_dup_pairs_cluster_size_guard(spark):
    df = _emb_df(spark)
    C = cluster.fit_kmeans_vectors(df, 2, max_rows=1000, seed=1)
    with pytest.raises(Exception, match="max_cluster_size"):
        cluster.semantic_dup_pairs(df, C, threshold=0.5,
                                   max_cluster_size=3).collect()
