"""Supervised Gaussian ML / minimum-distance classification: the
sufficient-statistic fit and einsum classify kernels vs naive
per-pixel oracles, closed forms (separated blobs, midpoint boundary),
and the distributed exact-decimal fit + broadcast classify vs the
assembled mosaic — bit-identical models under repartitioning."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import oracle
from vrtility_spark import cells, codec, supervised

RNG = np.random.default_rng(97)

ZONE, RES = 53, 3
FMT, NODATA = "raw16", 0.0
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def _blob_field(H=20, W=24, B=3, seed=5):
    """Integer feature planes drawn around two class centers + the
    matching label plane (0 / 1, some unlabeled NaN)."""
    rng = np.random.default_rng(seed)
    lab = (rng.random((H, W)) < 0.5).astype(float)
    centers = np.array([[100.0, 200.0, 50.0], [400.0, 120.0, 300.0]])
    X = np.empty((B, H, W))
    for b in range(B):
        X[b] = np.round(centers[lab.astype(int), b]
                        + rng.normal(0, 20, (H, W)))
    lab[rng.random((H, W)) < 0.15] = np.nan      # unlabeled holes
    X[0][rng.random((H, W)) < 0.05] = np.nan     # feature nodata
    return X, lab


# ----------------------------------------------------- kernel oracles ----

def test_fit_kernel_matches_naive():
    X, L = _blob_field()
    stats = supervised.tile_class_stats_np(X, L)
    model = supervised.fit_from_stats_np(stats)
    naive = oracle.mlc_fit_naive(X, L)
    assert set(model) == set(naive)
    for c in model:
        n, mu, cov = naive[c]
        assert model[c]["n"] == n
        np.testing.assert_allclose(model[c]["mean"], mu, rtol=1e-12)
        np.testing.assert_allclose(model[c]["cov"], cov,
                                   rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("method", ["mlc", "mindist"])
def test_classify_kernel_matches_naive(method):
    X, L = _blob_field()
    model = supervised.fit_mlc_np(X, L)
    got = supervised.classify_np(X, model, method)
    want = oracle.mlc_predict_naive(X, model, method)
    np.testing.assert_array_equal(got, want)


def test_separated_blobs_classify_to_nearest_center():
    # spherical equal covariance, far-apart means: both rules reduce
    # to nearest-center
    X, L = _blob_field(seed=11)
    model = supervised.fit_mlc_np(X, L)
    got = supervised.classify_np(X, model, "mlc")
    ok = np.isfinite(X).all(axis=0)
    c0, c1 = model[0]["mean"], model[1]["mean"]
    d0 = ((X - c0[:, None, None]) ** 2).sum(axis=0)
    d1 = ((X - c1[:, None, None]) ** 2).sum(axis=0)
    near = np.where(d0 < d1, 0.0, 1.0)
    # the classes here are well separated: >99% agreement with the
    # nearest-center rule (covariance shape may flip a few boundary px)
    agree = (got[ok] == near[ok]).mean()
    assert agree > 0.99
    assert np.isnan(got[~ok]).all()


def test_mindist_is_exact_nearest_mean():
    X, L = _blob_field(seed=13)
    model = supervised.fit_mlc_np(X, L)
    got = supervised.classify_np(X, model, "mindist")
    ok = np.isfinite(X).all(axis=0)
    c0, c1 = model[0]["mean"], model[1]["mean"]
    d0 = ((X - c0[:, None, None]) ** 2).sum(axis=0)
    d1 = ((X - c1[:, None, None]) ** 2).sum(axis=0)
    near = np.where(d0 <= d1, 0.0, 1.0)   # ties -> lowest id
    np.testing.assert_array_equal(got[ok], near[ok])


def test_singular_covariance_raises_and_reg_fixes():
    # two perfectly correlated bands -> singular MLE covariance
    H = W = 8
    base = np.round(RNG.uniform(0, 100, (H, W)))
    X = np.stack([base, 2.0 * base])
    L = np.zeros((H, W))
    with pytest.raises(ValueError, match="singular"):
        supervised.fit_mlc_np(X, L)
    model = supervised.fit_mlc_np(X, L, reg=1.0)
    assert np.isfinite(model[0]["logdet"])


def test_too_few_pixels_and_bad_labels_raise():
    X = np.ones((3, 4, 4))
    L = np.full((4, 4), np.nan)
    L[0, 0] = 7.0
    with pytest.raises(ValueError, match="training pixels"):
        supervised.fit_mlc_np(X, L)
    with pytest.raises(ValueError, match="negative label"):
        supervised.tile_class_stats_np(X, np.full((4, 4), -1.0))
    with pytest.raises(ValueError, match="non-integer label"):
        supervised.tile_class_stats_np(X, np.full((4, 4), 0.5))


def test_proportional_priors_shift_boundary():
    X, L = _blob_field(seed=17)
    eq = supervised.fit_mlc_np(X, L, priors="equal")
    pr = supervised.fit_mlc_np(X, L, priors="proportional")
    assert eq[0]["logprior"] == 0.0
    assert pr[0]["logprior"] < 0.0 and pr[1]["logprior"] < 0.0


# ------------------------------------------- distributed vs the mosaic ----

def _feature_tiles(h, w, positions, seed=23):
    """Feature tiles (3 bands, uint16) + label tiles (single rawf32
    plane, classes 0/1/2 with unlabeled sentinel) + the assembled
    mosaics."""
    rng = np.random.default_rng(seed)
    nx = max(p[0] for p in positions) + 1
    ny = max(p[1] for p in positions) + 1
    centers = np.array([[100.0, 200.0, 50.0],
                        [400.0, 120.0, 300.0],
                        [250.0, 450.0, 150.0]])
    lab = rng.integers(0, 3, (ny * h, nx * w)).astype(float)
    X = np.empty((3, ny * h, nx * w))
    for b in range(3):
        X[b] = np.clip(np.round(centers[lab.astype(int), b]
                                + rng.normal(0, 25, lab.shape)),
                       1, 60000)
    lab[rng.random(lab.shape) < 0.2] = np.nan
    X[1][rng.random(lab.shape) < 0.04] = np.nan
    frows, lrows = [], []
    for ix, iy in positions:
        sl = np.s_[iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        ftile = np.where(np.isnan(X[:, sl[0], sl[1]]), 0.0,
                         X[:, sl[0], sl[1]])
        frows.append({"cell_id": cid,
                      "bytes": codec.encode(ftile.astype(np.uint16),
                                            FMT),
                      "w": w, "h": h, "fmt": FMT, "nodata": NODATA})
        ltile = np.where(np.isnan(lab[sl]), -9999.0, lab[sl])[None]
        lrows.append({"cell_id": cid,
                      "bytes": codec.encode(
                          ltile.astype(np.float32), "rawf32"),
                      "w": w, "h": h, "fmt": "rawf32",
                      "nodata": -9999.0})
    return frows, lrows, X, lab


def test_distributed_fit_bit_identical_to_mosaic_and_repartition(spark):
    h = w = 16
    positions = [(0, 0), (1, 0), (0, 1), (1, 1)]
    frows, lrows, X, lab = _feature_tiles(h, w, positions)
    fdf = spark.createDataFrame(pd.DataFrame(frows), TILE_SCHEMA)
    ldf = spark.createDataFrame(pd.DataFrame(lrows), TILE_SCHEMA)
    want = supervised.fit_mlc_np(X, lab)
    got = supervised.fit_mlc(fdf, ldf)
    got2 = supervised.fit_mlc(fdf.repartition(7), ldf.repartition(3))
    assert set(got) == set(want) == set(got2)
    for c in want:
        assert got[c]["n"] == want[c]["n"]
        np.testing.assert_array_equal(got[c]["mean"], want[c]["mean"])
        np.testing.assert_array_equal(got[c]["cov"], want[c]["cov"])
        np.testing.assert_array_equal(got[c]["inv"], got2[c]["inv"])
        assert got[c]["logdet"] == got2[c]["logdet"]


def test_distributed_classify_matches_mosaic(spark):
    h = w = 16
    positions = [(0, 0), (1, 0), (0, 1), (1, 1)]
    frows, lrows, X, lab = _feature_tiles(h, w, positions)
    fdf = spark.createDataFrame(pd.DataFrame(frows), TILE_SCHEMA)
    ldf = spark.createDataFrame(pd.DataFrame(lrows), TILE_SCHEMA)
    out = supervised.mlc(fdf, ldf, broadcast_labels=True).collect()
    model = supervised.fit_mlc_np(X, lab)
    wantM = supervised.classify_np(X, model)
    assert all(r.fmt == "raw16" for r in out)
    for r in out:
        _z, _res, ix, iy = (int(v) for v in cells.decode_np(r.cell_id))
        dec = codec.decode(r.bytes, r.w, r.h, r.fmt)[0]
        want = wantM[iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        want = np.where(np.isnan(want), supervised.NODATA_CLASS,
                        want).astype(np.uint16)
        np.testing.assert_array_equal(dec, want)


def test_multiplane_labels_raise(spark):
    h = w = 8
    frows, lrows, _X, _lab = _feature_tiles(h, w, [(0, 0)])
    fdf = spark.createDataFrame(pd.DataFrame(frows), TILE_SCHEMA)
    with pytest.raises(Exception, match="planes"):
        supervised.fit_mlc(fdf, fdf)   # 3-band table as labels
