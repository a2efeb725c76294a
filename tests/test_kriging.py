"""Ordinary kriging: variogram model + WLS fit determinism, the
batched identity-padded OK solve vs a naive per-pixel oracle, the
exact-interpolation and pure-nugget closed forms, and the distributed
pair generation / tile products vs all-pairs and whole-kernel twins —
bit-identical under repartitioning via the decimal variogram sums."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import oracle
from vrtility_spark import cells, codec, kriging

RNG = np.random.default_rng(131)

PT_SCHEMA = ("point_id long, zone long, x double, y double, "
             "value double")


def _field(n=40, seed=7, span=900.0):
    rng = np.random.default_rng(seed)
    xs = np.round(rng.uniform(10, span, n), 3)
    ys = np.round(rng.uniform(10, span, n), 3)
    vs = np.round(100 + 40 * np.sin(xs / 200) + 30 * np.cos(ys / 150)
                  + rng.normal(0, 5, n), 3)
    return xs, ys, vs


VM = {"model": "spherical", "nugget": 2.0, "psill": 60.0,
      "range": 400.0}


# ----------------------------------------------------- kernel oracles ----

def test_variogram_model_shapes():
    h = np.array([0.0, 100.0, 400.0, 1000.0])
    g = kriging.variogram_np(h, 2.0, 60.0, 400.0, "spherical")
    assert g[0] == 0.0                       # exact zero at lag 0
    assert g[3] == pytest.approx(62.0)       # sill beyond the range
    assert 0 < g[1] < g[2] <= 62.0
    for m in ("exponential", "gaussian"):
        gm = kriging.variogram_np(h, 2.0, 60.0, 400.0, m)
        assert gm[0] == 0.0 and gm[1] > 2.0
    with pytest.raises(KeyError):
        kriging.variogram_np(h, 0, 1, 1, "cubic")


def test_fit_recovers_exact_model_on_grid():
    lags = np.linspace(50, 800, 12)
    gamma = kriging.variogram_np(lags, 3.0, 50.0, lags[6], "spherical")
    counts = np.full(12, 100)
    fit = kriging.fit_variogram_np(lags, gamma, counts, "spherical")
    assert fit["range"] == pytest.approx(lags[6])
    assert fit["nugget"] == pytest.approx(3.0, abs=1e-8)
    assert fit["psill"] == pytest.approx(50.0, abs=1e-8)


def test_fit_raises_on_flat_or_empty():
    with pytest.raises(ValueError, match="non-empty lag bins"):
        kriging.fit_variogram_np([100.0], [5.0], [10], "spherical")
    fit = kriging.fit_variogram_np(
        [100.0, 200.0, 300.0], [5.0, 5.0, 5.0], [10, 10, 10])
    assert fit["nugget"] == pytest.approx(5.0)  # flat -> pure nugget


def test_krige_kernel_matches_naive():
    xs, ys, vs = _field()
    got = kriging.krige_np(xs, ys, vs, 0.0, 0.0, 1000.0, 12, 10, VM,
                           radius=500.0, max_points=8, min_points=1)
    want = oracle.krige_naive(xs, ys, vs, 0.0, 0.0, 1000.0, 12, 10,
                              VM, radius=500.0, max_points=8,
                              min_points=1)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9,
                               equal_nan=True)


def test_krige_exact_interpolation_at_data_point():
    # nugget 0: the surface passes through its data (pixel center hit)
    xs = np.array([50.0, 350.0, 650.0, 850.0])
    ys = np.array([50.0, 250.0, 550.0, 750.0])
    vs = np.array([10.0, 40.0, 25.0, 70.0])
    vm = {"model": "exponential", "nugget": 0.0, "psill": 30.0,
          "range": 500.0}
    surf = kriging.krige_np(xs, ys, vs, 0.0, 0.0, 1000.0, 10, 10, vm,
                            radius=1500.0, max_points=4)
    # pixel centers at (i+0.5)*100: point 0 sits at pixel (0, 0)
    assert surf[0, 0, 0] == pytest.approx(10.0, abs=1e-9)
    assert surf[0, 2, 3] == pytest.approx(40.0, abs=1e-9)


def test_krige_pure_nugget_is_neighborhood_mean():
    xs, ys, vs = _field(n=12)
    vm = {"model": "spherical", "nugget": 5.0, "psill": 0.0,
          "range": 100.0}
    surf = kriging.krige_np(xs, ys, vs, 0.0, 0.0, 1000.0, 6, 6, vm,
                            radius=2000.0, max_points=12)
    # every pixel sees all 12 points; equal weights -> global mean
    np.testing.assert_allclose(surf[0], np.full((6, 6), vs.mean()),
                               rtol=1e-9)


def test_krige_min_points_and_empty():
    xs = np.array([500.0])
    ys = np.array([500.0])
    vs = np.array([42.0])
    surf = kriging.krige_np(xs, ys, vs, 0.0, 0.0, 1000.0, 4, 4, VM,
                            radius=200.0, min_points=1)
    assert np.isfinite(surf).sum() >= 1 and np.isnan(surf).sum() > 0
    surf2 = kriging.krige_np(xs, ys, vs, 0.0, 0.0, 1000.0, 4, 4, VM,
                             radius=200.0, min_points=2)
    assert np.isnan(surf2).all()
    surf3 = kriging.krige_np([], [], [], 0.0, 0.0, 1000.0, 4, 4, VM,
                             radius=200.0)
    assert np.isnan(surf3).all()


def test_duplicate_points_raise():
    xs = np.array([100.0, 100.0])
    ys = np.array([100.0, 100.0])
    vs = np.array([1.0, 2.0])
    with pytest.raises(ValueError, match="duplicate"):
        kriging.krige_np(xs, ys, vs, 0.0, 0.0, 1000.0, 4, 4, VM,
                         radius=2000.0)


# ------------------------------------------- distributed vs the oracle ----

def _demo_df(spark):
    from vrtility_spark.gridding import demo_grid_points
    return spark.createDataFrame(demo_grid_points(), PT_SCHEMA)


def test_empirical_variogram_matches_all_pairs(spark):
    from vrtility_spark.gridding import demo_grid_points
    pts = demo_grid_points()
    max_lag, n_lags = 60000.0, 8
    lags, gamma, counts = kriging.empirical_variogram(
        _demo_df(spark), max_lag, n_lags)
    # naive all-pairs per zone, merged (pairs never cross zones)
    sum_d = np.zeros(n_lags)
    sum_dv2 = np.zeros(n_lags)
    cnt = np.zeros(n_lags, np.int64)
    for zone in sorted({p[1] for p in pts}):
        zp = [p for p in pts if p[1] == zone]
        sd, sv, c = kriging.variogram_pairs_naive(
            [p[2] for p in zp], [p[3] for p in zp],
            [p[4] for p in zp], max_lag, n_lags)
        sum_d += sd
        sum_dv2 += sv
        cnt += c
    assert cnt.sum() > 50          # the setup genuinely pairs points
    np.testing.assert_array_equal(counts, cnt)
    want_g = np.where(cnt > 0, sum_dv2 / (2 * np.maximum(cnt, 1)),
                      np.nan)
    np.testing.assert_allclose(gamma, want_g, rtol=1e-12,
                               equal_nan=True)


def test_empirical_variogram_repartition_bit_identical(spark):
    df = _demo_df(spark)
    a = kriging.empirical_variogram(df, 60000.0, 8)
    b = kriging.empirical_variogram(df.repartition(13), 60000.0, 8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_krige_points_matches_kernel_per_tile(spark):
    from vrtility_spark import datagen
    from vrtility_spark.gridding import demo_grid_points
    radius = 60000.0
    out = kriging.krige_points(
        _demo_df(spark), datagen.TILE_RES, 16, 16, variogram=VM_BIG,
        radius=radius, max_points=8).collect()
    assert out
    pts = demo_grid_points()
    for r in out:
        zone, cres, ix, iy = (int(v) for v in cells.decode_np(
            r.cell_id))
        size = cells.cell_size(cres)
        zp = sorted((p for p in pts if p[1] == zone))
        want = kriging.krige_np(
            [p[2] for p in zp], [p[3] for p in zp],
            [p[4] for p in zp], ix * size, iy * size, size, 16, 16,
            VM_BIG, radius, max_points=8).astype(np.float32)
        got = codec.to_float_masked(
            codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
        np.testing.assert_allclose(
            got, np.where(np.isnan(want), np.nan, want), rtol=0,
            atol=0, equal_nan=True)


VM_BIG = {"model": "spherical", "nugget": 1.0, "psill": 400.0,
          "range": 80000.0}


def test_krige_points_autofit_runs_and_is_deterministic(spark):
    from vrtility_spark import datagen
    df = _demo_df(spark)
    a = kriging.krige_points(df, datagen.TILE_RES, 8, 8,
                             radius=40000.0, max_lag=60000.0,
                             max_points=8).collect()
    b = kriging.krige_points(df.repartition(11), datagen.TILE_RES,
                             8, 8, radius=40000.0, max_lag=60000.0,
                             max_points=8).collect()
    am = {r.cell_id: bytes(r.bytes) for r in a}
    bm = {r.cell_id: bytes(r.bytes) for r in b}
    assert am == bm and len(am) > 0
