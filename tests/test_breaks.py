"""Break detection: the vectorized prefix-sum kernel matches a naive
per-pixel per-candidate polyfit loop, planted breaks are recovered
exactly, NaN/min_seg semantics hold, and the distributed grouped path
matches the kernel byte-for-byte through the codec round trip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import breaks, cells, codec
from vrtility_spark.trend import TREND_EPOCH, t_years

RNG = np.random.default_rng(23)


def _naive_pixel(t, y, min_seg):
    """Per-pixel oracle: brute-force every candidate with lstsq fits."""
    v = np.isfinite(y)
    n = int(v.sum())

    def sse(ts, ys):
        if len(ys) == 0:
            return 0.0
        if len(ys) == 1 or np.ptp(ts) == 0.0:
            return float(((ys - ys.mean()) ** 2).sum())
        A = np.vstack([ts, np.ones_like(ts)]).T
        coef, *_ = np.linalg.lstsq(A, ys, rcond=None)
        return float(((A @ coef - ys) ** 2).sum())

    def fit_at(ts, ys, at):
        if len(ys) == 1 or np.ptp(ts) == 0.0:
            return float(ys.mean())
        A = np.vstack([ts, np.ones_like(ts)]).T
        coef, *_ = np.linalg.lstsq(A, ys, rcond=None)
        return float(coef[0] * at + coef[1])

    null = sse(t[v], y[v])
    best = (np.inf, -1)
    for k in range(1, len(t)):
        lv = v[:k]
        rv = v[k:]
        if lv.sum() < min_seg or rv.sum() < min_seg:
            continue
        s = sse(t[:k][lv], y[:k][lv]) + sse(t[k:][rv], y[k:][rv])
        if s < best[0]:
            best = (s, k)
    if best[1] < 0:
        return (np.nan, np.nan, np.nan, n)
    k = best[1]
    tb = t[k]
    lv, rv = v[:k], v[k:]
    mag = (fit_at(t[k:][rv], y[k:][rv], tb)
           - fit_at(t[:k][lv], y[:k][lv], tb))
    score = 1.0 - best[0] / null if null > 0 else np.nan
    return (tb, mag, score, n)


def test_kernel_matches_naive_loop():
    T, B, H, W = 9, 2, 3, 4
    t = np.sort(RNG.uniform(0, 4, T))
    Y = RNG.normal(0, 5, (T, B, H, W))
    Y[5:, 0] += 30.0                      # planted break, band 0
    Y[RNG.random((T, B, H, W)) < 0.2] = np.nan
    out = breaks.breaks_np(t, Y, min_seg=2)
    for b in range(B):
        for yy in range(H):
            for xx in range(W):
                want = _naive_pixel(t, Y[:, b, yy, xx], 2)
                got = tuple(out[4 * b + p, yy, xx] for p in range(4))
                np.testing.assert_allclose(
                    got, want, rtol=1e-8, atol=1e-8, equal_nan=True,
                    err_msg=f"pixel b={b} y={yy} x={xx}")


def test_planted_break_recovered_exactly():
    T = 14
    t = np.linspace(0, 3.5, T)
    Y = np.full((T, 1, 2, 2), 7.0)
    Y[9:] += 100.0
    out = breaks.breaks_np(t, Y, min_seg=3)
    np.testing.assert_allclose(out[0], t[9])
    np.testing.assert_allclose(out[1], 100.0, rtol=1e-9)
    np.testing.assert_allclose(out[2], 1.0, rtol=1e-9)
    np.testing.assert_allclose(out[3], T)


def test_min_seg_and_sparse_pixels():
    T = 8
    t = np.arange(T, dtype=float)
    Y = RNG.normal(0, 1, (T, 1, 2, 2))
    Y[:, 0, 0, 0] = np.nan
    Y[:3, 0, 0, 1] = np.nan
    Y[4:, 0, 0, 1] = np.nan              # single valid obs
    out = breaks.breaks_np(t, Y, min_seg=4)
    assert np.isnan(out[0, 0, 0]) and out[3, 0, 0] == 0
    assert np.isnan(out[0, 0, 1]) and out[3, 0, 1] == 1
    # min_seg=4 over T=8 leaves exactly one candidate (k=4) for full
    # pixels
    assert np.isfinite(out[0, 1, 0]) and out[0, 1, 0] == t[4]
    with pytest.raises(ValueError, match="min_seg"):
        breaks.breaks_np(t, Y, min_seg=1)
    with pytest.raises(ValueError, match="do not match"):
        breaks.breaks_np(t[:4], Y)


def test_distributed_matches_kernel(spark):
    T, B, H, W = 7, 2, 8, 8
    zone, res = 70, 3
    dts = pd.date_range("2023-01-01", periods=T, freq="60D")
    rows, stacks = [], {}
    for ix, iy in [(0, 0), (1, 0)]:
        cid = int(cells.encode_np(zone, res, ix, iy))
        st = np.round(RNG.uniform(10, 4000, (T, B, H, W)))
        st[3:, 0, : H // 2] += 2000.0    # spatially varying break
        st[RNG.random(st.shape) < 0.08] = 0.0
        for i in range(T):
            rows.append({
                "cell_id": cid, "image_id": f"s{cid}_{i}",
                "datetime": dts[i],
                "bytes": codec.encode(st[i].astype(np.uint16), "raw16"),
                "w": W, "h": H, "fmt": "raw16", "nodata": 0.0})
        A = st.astype(np.float64)
        A[A == 0.0] = np.nan
        stacks[cid] = A
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = {r.cell_id: r for r in
           breaks.breaks_stack(df, min_seg=2).collect()}
    ts = t_years(dts.values.astype("datetime64[ns]").astype(np.int64))
    for cid, A in stacks.items():
        r = out[cid]
        assert r.fmt == "rawf32" and r.nodata == -9999.0
        assert r.n_scenes == T
        got = codec.to_float_masked(
            codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
        want = breaks.breaks_np(ts, A, min_seg=2).astype(np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-6,
                                   equal_nan=True)
    # break_t decodes back to a real acquisition date
    got0 = codec.to_float_masked(
        codec.decode(out[next(iter(stacks))].bytes, W, H, "rawf32"),
        -9999.0)
    bt = got0[0][np.isfinite(got0[0])]
    dates = set(np.round(ts, 5))
    assert set(np.round(bt.astype(np.float64), 5)) <= dates


def test_pipeline_verb_and_bundle(spark, tiny_images, tmp_path):
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline

    def run(p):
        return (p.set_maskfun("int", datagen.S2_MASK_VALUES)
                .warp(cell_res=datagen.TILE_RES)
                .break_detect(min_seg=2))

    ran = run(Pipeline(tiny_images))
    rows = {r.cell_id: r for r in ran.df.collect()}
    assert len(rows) == 12
    one = next(iter(rows.values()))
    dec = codec.decode(one.bytes, one.w, one.h, one.fmt)
    assert dec.shape[0] == 4 * 5  # 4 planes per input band (incl. SCL)
    path = str(tmp_path / "breaks_bundle.json")
    ran.to_bundle(path)
    replay = {r.cell_id: r for r in
              Pipeline.from_bundle(path, tiny_images).df.collect()}
    assert set(replay) == set(rows)
    for cid in rows:
        assert replay[cid].bytes == rows[cid].bytes
