"""Mann–Kendall + Theil–Sen: naive per-pixel double-loop oracle
parity (incl. the tie-corrected variance), closed-form monotone /
constant / outlier series, chunk-size invariance, degenerate pixels,
and the distributed grouped path vs the local kernel."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import codec, datagen, mktrend, trend, warp


def _naive_mk(ts_years, stack):
    """Deliberately-naive oracle: per-pixel double loop over pairs,
    np.unique tie counting — no shared code with mk_np's vectorized
    pass beyond the formulas themselves."""
    T, B, H, W = stack.shape
    out = np.full((4 * B, H, W), np.nan)
    for b in range(B):
        for i in range(H):
            for j in range(W):
                y = stack[:, b, i, j]
                ok = ~np.isnan(y)
                n = int(ok.sum())
                out[3 * B + b, i, j] = n
                if n < 2:
                    continue
                s = 0.0
                usable = 0
                slopes = []
                for p in range(T):
                    for q in range(p + 1, T):
                        if np.isnan(y[p]) or np.isnan(y[q]) \
                                or ts_years[q] == ts_years[p]:
                            continue
                        s += np.sign(y[q] - y[p])
                        usable += 1
                        slopes.append((y[q] - y[p])
                                      / (ts_years[q] - ts_years[p]))
                _, counts = np.unique(y[ok], return_counts=True)
                tie = sum(g * (g - 1) * (2 * g + 5) for g in counts)
                var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
                if usable:
                    out[B + b, i, j] = s / usable
                if var > 0 and usable == n * (n - 1) / 2:
                    out[2 * B + b, i, j] = (s - np.sign(s)) / np.sqrt(var)
                if slopes:
                    out[b, i, j] = np.median(slopes)
    return out


# ------------------------------------------------------ kernel units ----

def test_mk_np_matches_naive():
    rng = np.random.default_rng(11)
    T, B, H, W = 8, 2, 5, 6
    ts = np.sort(rng.uniform(3.0, 5.5, T))
    stack = rng.normal(100.0, 25.0, (T, B, H, W))
    stack[rng.random((T, B, H, W)) < 0.3] = np.nan
    # force value ties so the tie correction is actually exercised
    stack = np.round(stack / 10.0) * 10.0
    got = mktrend.mk_np(ts, stack)
    want = _naive_mk(ts, stack)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10,
                               equal_nan=True)


def test_mk_np_monotone_and_constant():
    ts = np.array([4.0, 4.25, 4.5, 5.0, 5.5])
    up = (12.0 * ts[:, None, None, None] + 3.0) * np.ones((5, 1, 2, 2))
    out = mktrend.mk_np(ts, up)
    np.testing.assert_allclose(out[0], 12.0, rtol=1e-12)   # sen exact
    np.testing.assert_allclose(out[1], 1.0)                # tau = +1
    assert (out[2] > 0).all()
    assert (out[3] == 5).all()
    down = mktrend.mk_np(ts, -up)
    np.testing.assert_allclose(down[1], -1.0)
    const = mktrend.mk_np(ts, np.ones((5, 1, 2, 2)) * 7.0)
    np.testing.assert_allclose(const[0], 0.0)              # sen = 0
    np.testing.assert_allclose(const[1], 0.0)              # tau = 0
    assert np.isnan(const[2]).all()   # Var(S)=0: z undefined, nodata


def test_mk_sen_outlier_robust_where_ols_is_not():
    # one wild scene: OLS slope moves materially, Sen does not
    ts = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    y = 2.0 * ts
    y_bad = y.copy()
    y_bad[6] += 1000.0  # at the end of the window: maximal OLS leverage
    shape = (len(ts), 1, 1, 1)
    sen = mktrend.mk_np(ts, y_bad.reshape(shape))[0, 0, 0]
    ols = trend.trend_np(ts, y_bad.reshape(shape))[0, 0, 0]
    assert abs(sen - 2.0) < 1e-9
    assert abs(ols - 2.0) > 10.0


def test_mk_np_degenerate_and_chunking():
    ts = np.array([4.0, 4.5, 5.0])
    stack = np.ones((3, 1, 2, 2)) * 5.0
    stack[:, 0, 0, 0] = np.nan          # 0 valid
    stack[1:, 0, 0, 1] = np.nan         # 1 valid
    out = mktrend.mk_np(ts, stack)
    assert np.isnan(out[0, 0, 0]) and np.isnan(out[0, 0, 1])
    assert np.isnan(out[1, 0, 0]) and np.isnan(out[2, 0, 1])
    assert out[3, 0, 0] == 0 and out[3, 0, 1] == 1
    # chunk_bytes tiny → many row chunks, identical result
    rng = np.random.default_rng(3)
    big = rng.normal(0, 1, (6, 2, 9, 7))
    big[rng.random(big.shape) < 0.2] = np.nan
    tt = np.arange(6, dtype=float)
    np.testing.assert_array_equal(
        mktrend.mk_np(tt, big),
        mktrend.mk_np(tt, big, chunk_bytes=1))


def test_mk_np_excludes_tied_time_pairs():
    # two scenes at the SAME instant: the cross pair at equal t must
    # not contribute to S or Sen regardless of their value order
    ts = np.array([1.0, 2.0, 2.0, 3.0])
    y = np.array([0.0, 5.0, 1.0, 6.0]).reshape(4, 1, 1, 1)
    out = mktrend.mk_np(ts, y)
    want = _naive_mk(ts, y)
    np.testing.assert_allclose(out, want, equal_nan=True)
    # 5 usable pairs, all increasing ((5→1) at equal t excluded):
    # S=5 over 5 usable pairs → tau=1; z is nodata (the variance
    # formula assumes one observation per instant)
    np.testing.assert_allclose(out[1, 0, 0], 1.0)
    assert np.isnan(out[2, 0, 0])


def test_mk_np_nonfinite_is_invalid():
    # an inf (ratio scene_fn dividing by zero) must count as invalid
    ts = np.array([0.0, 1.0, 2.0])
    y = np.array([1.0, 2.0, np.inf]).reshape(3, 1, 1, 1)
    out = mktrend.mk_np(ts, y)
    assert out[3, 0, 0] == 2                    # n excludes the inf
    np.testing.assert_allclose(out[1, 0, 0], 1.0)   # tau from 1 pair
    np.testing.assert_allclose(out[0, 0, 0], 1.0)   # sen finite
    assert np.isfinite(out[2, 0, 0])


# ------------------------------------------------- distributed path ----

@pytest.fixture(scope="module")
def celled(spark, tiny_images):
    return warp.assign_cells(tiny_images, datagen.TILE_RES).cache()


def test_mk_trend_matches_local_kernel(spark, celled, tiny_images_pdf):
    got = {r.cell_id: (codec.decode(r.bytes, r.w, r.h, r.fmt), r)
           for r in mktrend.mk_trend(celled).collect()}
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
        want = codec.from_float(mktrend.mk_np(ts, stack),
                                trend.OUT_NODATA, "float32")
        arr, row = got[int(cid)]
        np.testing.assert_array_equal(arr, want)
        assert row.n_scenes == len(grp)
        assert row.nodata == trend.OUT_NODATA


def test_mk_trend_stack_budget_guard(spark, celled):
    with pytest.raises(Exception, match="max_stack_bytes"):
        mktrend.mk_trend(celled, max_stack_bytes=64).collect()


def test_mk_trend_pipeline_mask_fusion_and_bundle(spark, tiny_images,
                                                  tmp_path):
    from vrtility_spark.pipeline import Pipeline
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .mk_trend())
    rows = p.df.collect()
    assert rows and all(r.fmt == "rawf32" for r in rows)
    # masks fused into decode: masked pixels shrink per-pixel n below
    # the scene count somewhere
    dec = codec.decode(rows[0].bytes, rows[0].w, rows[0].h, rows[0].fmt)
    nb4 = dec.shape[0] // 4
    nplane = dec[3 * nb4:]
    assert (nplane[nplane != trend.OUT_NODATA] <= rows[0].n_scenes).all()
    assert (nplane[nplane != trend.OUT_NODATA]
            < rows[0].n_scenes).any()
    path = str(tmp_path / "mk_bundle.json")
    p.to_bundle(path)
    p2 = Pipeline.from_bundle(path, tiny_images)
    a = sorted((r.cell_id, bytes(r.bytes)) for r in rows)
    b = sorted((r.cell_id, bytes(r.bytes)) for r in p2.df.collect())
    assert a == b
