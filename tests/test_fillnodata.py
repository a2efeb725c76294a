"""fillnodata (spatial IDW gap-fill, the gdal_fillnodata twin):
kernel vs a brute-force per-hole loop, closed forms, and the
distributed halo path vs the assembled mosaic — fills and smoothing
must cross tile seams exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, fillnodata
from vrtility_spark.fillnodata import (fillnodata_np, required_pad)
from vrtility_spark.pipeline import Pipeline

RNG = np.random.default_rng(23)

ZONE, RES = 30, 3
FMT, NODATA = "raw16", 0.0
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def _padded(G, pad):
    B, H, W = G.shape
    P = np.full((B, H + 2 * pad, W + 2 * pad), np.nan)
    P[:, pad:-pad, pad:-pad] = G
    return P


def loop_fill(G, max_dist, power=2.0):
    """Deliberately-naive per-hole IDW (no smoothing)."""
    B, H, W = G.shape
    out = G.copy()
    r = int(np.ceil(max_dist))
    for b in range(B):
        for i in range(H):
            for j in range(W):
                if np.isfinite(G[b, i, j]):
                    continue
                num = den = 0.0
                for di in range(-r, r + 1):
                    for dj in range(-r, r + 1):
                        if di == 0 and dj == 0:
                            continue
                        d = float(np.hypot(di, dj))
                        if d > max_dist:
                            continue
                        y, x = i + di, j + dj
                        if 0 <= y < H and 0 <= x < W and \
                                np.isfinite(G[b, y, x]):
                            num += G[b, y, x] * d ** -power
                            den += d ** -power
                if den > 0:
                    out[b, i, j] = num / den
    return out


@pytest.mark.parametrize("md,power", [(1.5, 2.0), (3.0, 2.0), (4.2, 1.0)])
def test_kernel_matches_loop_oracle(md, power):
    G = np.round(RNG.uniform(1, 200, size=(2, 11, 13)))
    G[RNG.random(G.shape) < 0.15] = np.nan
    pad = required_pad(md)
    got = fillnodata_np(_padded(G, pad), md, power=power, pad=pad)
    want = loop_fill(G, md, power=power)
    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


def test_closed_forms_and_contract():
    # constant field: any fill is the constant
    G = np.full((1, 8, 8), 5.0)
    G[0, 3, 3] = np.nan
    pad = required_pad(2.0)
    out = fillnodata_np(_padded(G, pad), 2.0, pad=pad)
    assert out[0, 3, 3] == 5.0
    # symmetric pair: hole midway between equal-distance values a, b
    # fills to their mean regardless of power
    G = np.full((1, 5, 9), np.nan)
    G[0, 2, 0], G[0, 2, 4] = 10.0, 30.0
    pad = required_pad(2.0)
    out = fillnodata_np(_padded(G, pad), 2.0, pad=pad)
    assert out[0, 2, 2] == 20.0
    # nearer value dominates with power > 0
    G = np.full((1, 3, 9), np.nan)
    G[0, 1, 0], G[0, 1, 3] = 100.0, 0.0
    pad = required_pad(3.0)
    out = fillnodata_np(_padded(G, pad), 3.0, pad=pad)
    assert out[0, 1, 2] < 50.0  # distance 2 from 100, 1 from 0
    # valid pixels bit-exact, unreachable holes stay NaN
    G = np.round(RNG.uniform(1, 9, size=(1, 12, 12)))
    G[0, :, 6:] = np.nan
    pad = required_pad(2.0)
    out = fillnodata_np(_padded(G, pad), 2.0, pad=pad)
    m = np.isfinite(G)
    assert np.array_equal(out[m], G[m])
    assert np.isnan(out[0, :, 9:]).all()      # > 2 px from any data
    assert np.isfinite(out[0, :, 6:8]).all()  # within reach
    # guards
    with pytest.raises(ValueError, match="max_dist"):
        fillnodata_np(np.zeros((1, 5, 5)), 0.5)
    with pytest.raises(ValueError, match="smoothing"):
        fillnodata_np(np.zeros((1, 5, 5)), 2.0, smoothing=-1)


def test_smoothing_touches_filled_only_and_converges():
    G = np.round(RNG.uniform(1, 200, size=(1, 10, 10)))
    G[0, 4:7, 4:7] = np.nan
    pad = required_pad(3.0, 2)
    P = _padded(G, pad)
    base = fillnodata_np(P, 3.0, pad=pad)
    sm = fillnodata_np(P, 3.0, smoothing=2, pad=pad)
    m = np.isfinite(G)
    assert np.array_equal(sm[m], G[m])          # originals untouched
    holes = ~m & np.isfinite(base)
    assert not np.allclose(sm[holes], base[holes])  # relaxed
    # smoothing never extends the footprint
    assert np.array_equal(np.isfinite(sm), np.isfinite(base))


# ------------------------------------------------- distributed paths ----

def _tiles(h, w, positions, hole_frac=0.2, seed=5):
    rng = np.random.default_rng(seed)
    nx = max(p[0] for p in positions) + 1
    ny = max(p[1] for p in positions) + 1
    G = np.full((2, ny * h, nx * w), np.nan)
    rows = []
    for ix, iy in positions:
        arr = np.round(rng.uniform(1, 400, size=(2, h, w)))
        arr[rng.random(arr.shape) < hole_frac] = NODATA
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(np.uint16), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": NODATA})
        A = arr.astype(np.float64)
        A[A == NODATA] = np.nan
        G[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w] = A
    return rows, G


@pytest.mark.parametrize("positions,smoothing", [
    ([(ix, iy) for ix in range(3) for iy in range(3)], 0),  # full grid
    ([(0, 0), (1, 0), (0, 1)], 1),                          # hole at (1,1)
])
def test_distributed_matches_mosaic(spark, positions, smoothing):
    h = w = 12
    md = 3.5
    rows, G = _tiles(h, w, positions)
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    got = {r["cell_id"]:
           (codec.decode(r["bytes"], r["w"], r["h"], r["fmt"]), r)
           for r in fillnodata.fillnodata(
               df, md, smoothing=smoothing).collect()}
    pad = required_pad(md, smoothing)
    # mosaic reference with the honest coverage mask: True only where
    # a tile EXISTS — the pad ring and the missing-tile quadrant are
    # void, never filled, never feeding a smoothing mean
    cov = np.zeros((G.shape[1] + 2 * pad, G.shape[2] + 2 * pad), bool)
    for ix, iy in positions:
        cov[pad + iy * h:pad + (iy + 1) * h,
            pad + ix * w:pad + (ix + 1) * w] = True
    full = fillnodata_np(_padded(G, pad), md, smoothing=smoothing,
                         pad=pad, coverage=cov)
    for ix, iy in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        arr, row = got[cid]
        assert row["fmt"] == FMT and row["nodata"] == NODATA
        want = full[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        enc = codec.from_float(want, float(NODATA), "uint16")
        np.testing.assert_array_equal(arr, enc)
    # seams genuinely exercised: some fill near a tile edge
    assert any(
        (codec.to_float_masked(got[int(cells.encode_np(ZONE, RES, ix,
                                                       iy))][0],
                               NODATA) !=
         np.where(np.isnan(G[:, iy * h:(iy + 1) * h,
                             ix * w:(ix + 1) * w]), np.nan,
                  G[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]))
        [:, :, 0].any() for ix, iy in positions if ix > 0)


def test_void_never_feeds_smoothing(spark):
    """Coverage-edge regression (review finding): with smoothing >= 1
    the old kernel IDW-filled the void halo past the coverage edge and
    let those fabricated values enter boundary pixels' 3x3 means. Now
    a lone tile's output must equal filling that tile as its OWN
    raster (coverage = the tile only) — NOT the old fill-the-pad-ring
    reference, which must now disagree somewhere on the boundary."""
    h = w = 12
    md, smoothing = 3.5, 2
    rows, G = _tiles(h, w, [(0, 0)], hole_frac=0.35, seed=11)
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    [r] = fillnodata.fillnodata(df, md, smoothing=smoothing).collect()
    arr = codec.decode(r["bytes"], r["w"], r["h"], r["fmt"])
    pad = required_pad(md, smoothing)
    cov = np.zeros((h + 2 * pad, w + 2 * pad), bool)
    cov[pad:-pad, pad:-pad] = True
    want = fillnodata_np(_padded(G, pad), md, smoothing=smoothing,
                         pad=pad, coverage=cov)
    np.testing.assert_array_equal(
        arr, codec.from_float(want, float(NODATA), "uint16"))
    old = fillnodata_np(_padded(G, pad), md, smoothing=smoothing,
                        pad=pad)  # no coverage: pad ring fillable
    assert not np.array_equal(
        codec.from_float(old, float(NODATA), "uint16"), arr)


def test_pipeline_verb_and_bundle(spark, tmp_path, tiny_images):
    from vrtility_spark import datagen
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .composite("median")
         .fillnodata(2.5, smoothing=1))
    path = str(tmp_path / "b.json")
    p.to_bundle(path)
    p2 = Pipeline.from_bundle(path, tiny_images)
    a = {r.cell_id: r.bytes for r in p.df.collect()}
    b = {r.cell_id: r.bytes for r in p2.df.collect()}
    assert a == b and len(a) > 0
    with pytest.raises(ValueError, match="max_dist"):
        fillnodata.fillnodata(p.df, 0.2)
