from __future__ import annotations

import numpy as np

import oracle
from vrtility_spark import datagen, schema, timeseries, warp


def test_hampel_basic_outlier():
    x = np.array([1.0, 1.1, 9.0, 1.2, 1.0, 1.1, 1.05])
    got = timeseries.hampel_np(x[:, None], k=2)[:, 0]
    exp = oracle.hampel_1(x, k=2)
    np.testing.assert_allclose(got, exp)
    assert got[2] != 9.0  # outlier replaced by window median
    assert got[0] == 1.0 and got[-1] == 1.05  # edges preserved


def test_hampel_with_nans_and_locf():
    rng = np.random.default_rng(11)
    X = rng.normal(100, 5, size=(12, 40))
    X[rng.random(X.shape) < 0.2] = np.nan
    X[3, :10] += 80  # spikes
    got = timeseries.hampel_np(X, k=2, t0=3.0, impute_na=True)
    exp = np.stack([oracle.hampel_1(X[:, p], 2, 3.0, True)
                    for p in range(X.shape[1])], axis=1)
    np.testing.assert_allclose(got, exp, equal_nan=True)


def test_hampel_short_series_untouched():
    x = np.array([5.0, 500.0, 5.0])  # n < 2k+1 for k=2
    got = timeseries.hampel_np(x[:, None], k=2)[:, 0]
    np.testing.assert_allclose(got, x)


def test_hampel_random_matches_oracle():
    rng = np.random.default_rng(12)
    for k in (1, 2, 3):
        X = rng.normal(0, 1, size=(15, 25))
        X[rng.random(X.shape) < 0.25] = np.nan
        got = timeseries.hampel_np(X, k=k, t0=2.0)
        exp = np.stack([oracle.hampel_1(X[:, p], k, 2.0)
                        for p in range(X.shape[1])], axis=1)
        np.testing.assert_allclose(got, exp, equal_nan=True)


def test_locf():
    X = np.array([[np.nan, 1.0], [2.0, np.nan], [np.nan, np.nan]])
    out = timeseries.locf_np(X)
    assert np.isnan(out[0, 0])  # leading NaN stays
    assert out[1, 0] == 2.0 and out[2, 0] == 2.0
    assert out[1, 1] == 1.0 and out[2, 1] == 1.0


def test_spark_m2m_hampel(spark, tiny_images):
    """Grouped m2m emits one row per timestep; filtered != input
    (test-singleband-m2m.R:61-64); captions survive."""
    df = warp.assign_cells(tiny_images, datagen.TILE_RES)
    out = timeseries.hampel(df, k=1, t0=1.0).toPandas()
    assert len(out) == tiny_images.count()
    assert set(out.image_id) == set(
        r.image_id for r in tiny_images.select("image_id").collect())
    src = {r.image_id: r for r in tiny_images.collect()}
    changed = any(bytes(out[out.image_id == iid].bytes.iloc[0]) != bytes(src[iid].bytes)
                  for iid in list(src)[:20])
    assert changed


def test_moving_mean_cumsum_matches_loop_oracle():
    """The cumsum-form moving mean must equal the naive per-timestep
    window loop (truncated edges, NaN-aware, NaN positions preserved)."""
    rng = np.random.default_rng(11)
    X = rng.normal(size=(37, 23))
    X[rng.random(X.shape) < 0.25] = np.nan
    X[:, 3] = np.nan  # an all-NaN series
    for half in (1, 2, 5, 40):  # 40 > T: full-series window
        got = timeseries.moving_mean_np(X, half)
        exp = np.full_like(X, np.nan)
        T = X.shape[0]
        for i in range(T):
            lo, hi = max(0, i - half), min(T, i + half + 1)
            with np.errstate(invalid="ignore"):
                import warnings
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore", RuntimeWarning)
                    exp[i] = np.nanmean(X[lo:hi], axis=0)
        exp[np.isnan(X)] = np.nan
        np.testing.assert_allclose(got, exp, rtol=1e-12, equal_nan=True)
