"""Harmonic (seasonal) regression: deterministic-elimination solver vs
np.linalg.lstsq, exact recovery of a noiseless seasonal signal, the
trend K=0 degeneracy, and incremental-vs-stack Spark parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import codec, datagen, harmonic, trend, warp
from vrtility_spark.harmonic import (
    accumulate_np, design_np, harmonic_np, n_params, solve_normal_np)


def _naive_fit(ts_years, stack, K=1, period=1.0):
    """Loop oracle: per-pixel lstsq over valid observations only;
    NaN where n < p (mirrors the operator's contract)."""
    T, B, H, W = stack.shape
    p = n_params(K)
    F = p + 2 * K + 2
    out = np.full((B * F, H, W), np.nan)
    X = design_np(ts_years, K, period)
    for b in range(B):
        base = b * F
        for i in range(H):
            for j in range(W):
                y = stack[:, b, i, j]
                ok = ~np.isnan(y)
                n = int(ok.sum())
                out[base + F - 1, i, j] = n
                if n < p:
                    continue
                Xo = X[ok]
                if np.linalg.matrix_rank(Xo) < p:
                    continue
                beta, res, _, _ = np.linalg.lstsq(Xo, y[ok], rcond=None)
                out[base:base + 2, i, j] = beta[:2]
                for k in range(K):
                    s, c = beta[2 + 2 * k], beta[3 + 2 * k]
                    out[base + 2 + k, i, j] = s
                    out[base + 2 + K + k, i, j] = c
                    out[base + 2 + 2 * K + k, i, j] = np.hypot(s, c)
                    out[base + 2 + 3 * K + k, i, j] = np.arctan2(s, c)
                rss = float(((y[ok] - Xo @ beta) ** 2).sum())
                out[base + F - 2, i, j] = np.sqrt(max(rss, 0.0) / n)
    return out


def test_harmonic_np_matches_lstsq():
    rng = np.random.default_rng(3)
    T, B, H, W = 14, 2, 4, 5
    ts = np.sort(rng.uniform(3.0, 5.5, T))
    stack = rng.normal(500.0, 80.0, (T, B, H, W))
    stack[rng.random((T, B, H, W)) < 0.35] = np.nan
    got = harmonic_np(ts, stack, n_harmonics=1)
    want = _naive_fit(ts, stack, K=1)
    # the operator may NaN a few more near-singular pixels than lstsq
    # (deterministic pivot guard vs rcond); compare where both fit
    both = np.isfinite(got) & np.isfinite(want)
    assert both.any()
    np.testing.assert_allclose(got[both], want[both], rtol=1e-6,
                               atol=1e-6)
    # n_obs planes always agree exactly
    F = n_params(1) + 2 * 1 + 2
    for b in range(B):
        np.testing.assert_array_equal(got[b * F + F - 1],
                                      want[b * F + F - 1])


def test_recovers_noiseless_seasonal_signal():
    ts = np.linspace(3.0, 5.0, 9)
    a, b, s, c = 120.0, 6.0, 25.0, -10.0
    w = 2 * np.pi
    y = a + b * ts + s * np.sin(w * ts) + c * np.cos(w * ts)
    stack = y[:, None, None, None] * np.ones((9, 1, 2, 2))
    out = harmonic_np(ts, stack, n_harmonics=1)
    np.testing.assert_allclose(out[0], a, rtol=1e-8)
    np.testing.assert_allclose(out[1], b, rtol=1e-8)
    np.testing.assert_allclose(out[2], s, rtol=1e-8)
    np.testing.assert_allclose(out[3], c, rtol=1e-8)
    np.testing.assert_allclose(out[4], np.hypot(s, c), rtol=1e-8)
    np.testing.assert_allclose(out[5], np.arctan2(s, c), rtol=1e-8)
    np.testing.assert_allclose(out[6], 0.0, atol=1e-6)  # rmse
    assert (out[7] == 9).all()


def test_k0_degenerates_to_trend():
    rng = np.random.default_rng(5)
    ts = np.sort(rng.uniform(3.0, 5.5, 8))
    stack = rng.normal(100.0, 20.0, (8, 1, 3, 3))
    stack[rng.random(stack.shape) < 0.2] = np.nan
    h = harmonic_np(ts, stack, n_harmonics=0)     # planes: a,b,rmse,n
    t = trend.trend_np(ts, stack)                 # planes: slope,icept,n
    both = np.isfinite(h[1]) & np.isfinite(t[0])
    np.testing.assert_allclose(h[1][both], t[0][both], rtol=1e-7)
    np.testing.assert_allclose(h[0][both], t[1][both], rtol=1e-7)
    np.testing.assert_array_equal(h[3], t[2])


def test_degenerate_pixels_and_solver_guard():
    # repeated single timestamp → singular design → NaN fit, n kept
    ts = np.array([4.0, 4.0, 4.0, 4.0])
    stack = np.ones((4, 1, 1, 2)) * 7.0
    out = harmonic_np(ts, stack, n_harmonics=1)
    assert np.isnan(out[0:6]).all()
    assert (out[7] == 4).all()
    # solver flags singular systems instead of diverging
    M = np.zeros((2, 3, 3))
    M[0] = np.eye(3)
    x, ok = solve_normal_np(M, np.ones((2, 3)))
    assert ok[0] and not ok[1]
    np.testing.assert_allclose(x[0], 1.0)
    assert np.isnan(x[1]).all()


def test_accumulate_then_finalize_equals_direct():
    # folding scenes in two chunks then summing the accumulators is
    # exactly the whole-stack accumulation (decomposability)
    rng = np.random.default_rng(9)
    ts = np.sort(rng.uniform(3.0, 5.0, 10))
    stack = rng.normal(50.0, 10.0, (10, 1, 3, 3))
    stack[rng.random(stack.shape) < 0.3] = np.nan
    X = design_np(ts, 1, 1.0)
    whole = accumulate_np(X, stack)
    split = (accumulate_np(X[:4], stack[:4])
             + accumulate_np(X[4:], stack[4:]))
    np.testing.assert_allclose(whole, split, rtol=1e-12, atol=1e-9)


def test_router_validation():
    with pytest.raises(ValueError, match="n_harmonics"):
        harmonic.harmonic(None, n_harmonics=-1)
    with pytest.raises(ValueError, match="period_years"):
        harmonic.harmonic(None, period_years=0.0)
    with pytest.raises(KeyError, match="unknown harmonic mode"):
        harmonic.harmonic(None, mode="bogus")


# ------------------------------------------------- distributed paths ----

@pytest.fixture(scope="module")
def celled(spark, tiny_images):
    return warp.assign_cells(tiny_images, datagen.TILE_RES).cache()


def _decode_map(rows):
    return {r.cell_id: (codec.decode(r.bytes, r.w, r.h, r.fmt), r)
            for r in rows}


def test_harmonic_stack_matches_local_kernel(spark, celled,
                                             tiny_images_pdf):
    got = _decode_map(harmonic.harmonic_stack(celled).collect())
    pdf = tiny_images_pdf.copy()
    cx, cy = (pdf.xmin + pdf.xmax) / 2, (pdf.ymin + pdf.ymax) / 2
    from vrtility_spark import cells
    pdf["cell_id"] = cells.xy_to_cell_np(
        pdf.zone.values, cx.values, cy.values, datagen.TILE_RES)
    assert len(got) == pdf.cell_id.nunique()
    for cid, grp in pdf.groupby("cell_id"):
        grp = grp.sort_values("datetime", kind="mergesort")
        nd = np.asarray(grp.iloc[0].band_nodata, dtype=np.float64)
        stack = np.stack([
            codec.to_float_masked(
                codec.decode(r.bytes, r.w, r.h, r.fmt), nd)
            for r in grp.itertuples(index=False)])
        ts = trend.t_years(grp.datetime.values.astype("datetime64[ns]")
                           .astype(np.int64))
        want = codec.from_float(harmonic_np(ts, stack),
                                trend.OUT_NODATA, "float32")
        arr, row = got[int(cid)]
        np.testing.assert_array_equal(arr, want)
        assert row.n_scenes == len(grp)


@pytest.fixture(scope="module")
def seasonal_series(spark):
    """24 scenes over two full years on 2 cells — a WELL-CONDITIONED
    seasonal design (the tiny 5-dates-in-9-months fixture is a
    worst-case cond(XᵀX), where normal-equation fits are legitimately
    hypersensitive to summation order)."""
    from vrtility_spark import cells
    rng = np.random.default_rng(21)
    rows = []
    dates = pd.date_range("2023-01-15", periods=24, freq="MS")
    for ci, (ix, iy) in enumerate([(3, 4), (4, 4)]):
        cid = int(cells.encode_np(0, datagen.TILE_RES, ix, iy))
        for d in dates:
            t = float(trend.t_years(np.int64(d.value)))
            base = (900 + 90 * t + 180 * np.sin(2 * np.pi * t)
                    + 120 * np.cos(2 * np.pi * t))
            arr = np.round(base + rng.normal(0, 25, (2, 8, 8)))
            arr[rng.random(arr.shape) < 0.15] = 0.0  # nodata holes
            rows.append({"cell_id": cid,
                         "bytes": codec.encode(
                             np.clip(arr, 0, 4000).astype(np.uint16),
                             "raw16"),
                         "w": 8, "h": 8, "fmt": "raw16", "nodata": 0.0,
                         "datetime": d})
    return spark.createDataFrame(pd.DataFrame(rows)).cache()


def test_harmonic_incremental_matches_stack(spark, seasonal_series):
    a = _decode_map(
        harmonic.harmonic_incremental(seasonal_series).collect())
    b = _decode_map(harmonic.harmonic_stack(seasonal_series).collect())
    assert set(a) == set(b) and len(a) == 2
    for cid in a:
        x = np.where(a[cid][0] == trend.OUT_NODATA, np.nan,
                     a[cid][0].astype(np.float64))
        y = np.where(b[cid][0] == trend.OUT_NODATA, np.nan,
                     b[cid][0].astype(np.float64))
        # summation order differs between the paths; on a
        # well-conditioned design that is invisible at f32 precision
        np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-4,
                                   equal_nan=True)
        assert a[cid][1].n_scenes == b[cid][1].n_scenes == 24
    # and the fit planes actually recovered the seasonal signal:
    # band-0 amplitude plane (index 4) ≈ hypot(180, 120) ≈ 216
    amp = np.where(a[cid][0][4] == trend.OUT_NODATA, np.nan,
                   a[cid][0][4].astype(np.float64))
    assert abs(np.nanmedian(amp) - np.hypot(180, 120)) < 30
    assert np.isfinite(amp).mean() > 0.95


def test_harmonic_incremental_early_flush_parity(spark, seasonal_series):
    tight = _decode_map(harmonic.harmonic_incremental(
        seasonal_series, max_active_cells=1).collect())
    loose = _decode_map(
        harmonic.harmonic_incremental(seasonal_series).collect())
    assert set(tight) == set(loose)
    for cid in tight:
        np.testing.assert_array_equal(tight[cid][0], loose[cid][0])


def test_pipeline_harmonic_verb_and_bundle(spark, tiny_images, tmp_path):
    from vrtility_spark.pipeline import Pipeline
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .harmonic(n_harmonics=1, mode="stack"))
    rows = p.df.collect()
    assert len(rows) == 12
    F = n_params(1) + 2 * 1 + 2
    arr = codec.decode(rows[0].bytes, rows[0].w, rows[0].h, rows[0].fmt)
    assert arr.shape[0] % F == 0
    bundle = p.to_bundle(str(tmp_path / "b.json"))
    assert any(v["verb"] == "harmonic" for v in bundle["verbs"])
    replay = Pipeline.from_bundle(str(tmp_path / "b.json"), tiny_images)
    got = {r.cell_id: r.bytes for r in replay.df.collect()}
    assert got == {r.cell_id: r.bytes for r in rows}
