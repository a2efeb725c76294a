"""GLCM texture: integral-image kernel vs a from-scratch per-pixel
Counter oracle, closed forms, and the distributed halo-exchange
product vs one assembled mosaic."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, texture
from vrtility_spark.pipeline import Pipeline

RNG = np.random.default_rng(41)

R, LEVELS, LO, HI = 2, 4, 0.0, 10.0
OFFS = texture._expand_offsets(texture.OFFSETS_4, True)
OM = 1


def _padded(G, reach):
    B, H, W = G.shape
    P = np.full((B, H + 2 * reach, W + 2 * reach), np.nan)
    P[:, reach:-reach, reach:-reach] = G
    return P


def glcm_loop(Pp, metric, r=R, levels=LEVELS, lo=LO, hi=HI, offs=OFFS):
    """From-scratch per-pixel oracle: quantize, tally a Counter per
    window, evaluate the metric on the normalized matrix."""
    q = texture.quantize_np(Pp, lo, hi, levels)
    reach = r + max(max(abs(dy), abs(dx)) for dy, dx in offs)
    B, Hp, Wp = Pp.shape
    H, W = Hp - 2 * reach, Wp - 2 * reach
    out = np.full((B, H, W), np.nan)
    for b in range(B):
        for oy in range(H):
            for ox in range(W):
                cm = Counter()
                cy, cx = oy + reach, ox + reach
                for wy in range(cy - r, cy + r + 1):
                    for wx in range(cx - r, cx + r + 1):
                        for dy, dx in offs:
                            a = q[b, wy, wx]
                            c = q[b, wy + dy, wx + dx]
                            if a >= 0 and c >= 0:
                                cm[(int(a), int(c))] += 1
                n = sum(cm.values())
                if n == 0:
                    continue
                p = {k: v / n for k, v in cm.items()}
                if metric == "contrast":
                    v = sum(pv * (i - j) ** 2 for (i, j), pv in p.items())
                elif metric == "dissimilarity":
                    v = sum(pv * abs(i - j) for (i, j), pv in p.items())
                elif metric == "homogeneity":
                    v = sum(pv / (1 + (i - j) ** 2)
                            for (i, j), pv in p.items())
                elif metric == "energy":
                    v = sum(pv * pv for pv in p.values())
                else:
                    v = -sum(pv * np.log2(pv) for pv in p.values())
                out[b, oy, ox] = v
    return out


@pytest.mark.parametrize("metric", texture.GLCM_METRICS)
def test_glcm_matches_counter_oracle(metric):
    G = RNG.uniform(0, 10, (2, 9, 11))
    G[RNG.random(G.shape) < 0.15] = np.nan
    Pp = _padded(G, R + OM)
    got = texture.glcm_np(Pp, R, LEVELS, LO, HI, metric)
    exp = glcm_loop(Pp, metric)
    np.testing.assert_allclose(got, exp, rtol=1e-10, atol=1e-12,
                               equal_nan=True)


def test_glcm_closed_forms_and_guards():
    # constant plane: one code pairs only with itself -> contrast 0,
    # dissimilarity 0, homogeneity 1, energy 1, entropy 0
    flat = np.full((1, 8, 8), 3.0)
    Pp = _padded(flat, R + OM)
    for metric, want in (("contrast", 0.0), ("dissimilarity", 0.0),
                         ("homogeneity", 1.0), ("energy", 1.0),
                         ("entropy", 0.0)):
        out = texture.glcm_np(Pp, R, LEVELS, LO, HI, metric)
        assert np.isfinite(out).any()
        np.testing.assert_allclose(out[np.isfinite(out)], want,
                                   atol=1e-12), metric
    # vertical stripes of alternating codes at offset (0,1): every
    # horizontal pair jumps |i-j| = 1 -> contrast 1 everywhere interior
    x = np.arange(12)
    stripes = np.where(x % 2 == 0, 1.0, 3.6)[None, None, :].repeat(12, 1)
    Pp = _padded(stripes, R + 1)
    c = texture.glcm_np(Pp, R, LEVELS, LO, HI, "contrast",
                        offsets=((0, 1),), symmetric=True)
    inner = c[0, R:-R, R:-R]
    np.testing.assert_allclose(inner, 1.0, atol=1e-12)
    # all-NaN window -> NaN
    hole = np.full((1, 8, 8), np.nan)
    out = texture.glcm_np(_padded(hole, R + OM), R, LEVELS, LO, HI,
                          "contrast")
    assert np.isnan(out).all()
    with pytest.raises(KeyError):
        texture.glcm_np(Pp, R, LEVELS, LO, HI, "nope")
    with pytest.raises(ValueError):
        texture.quantize_np(stripes, 5.0, 5.0, 4)
    with pytest.raises(ValueError):
        texture._expand_offsets(((0, 0),), True)
    with pytest.raises(ValueError):
        texture._expand_offsets(((0, 1), (0, -1)), True)


def test_quantize_clips_and_masks():
    q = texture.quantize_np(
        np.array([[-5.0, 0.0, 2.5, 9.99, 50.0, np.nan]]), 0.0, 10.0, 4)
    assert q.tolist() == [[0, 0, 1, 3, 3, -1]]


# ------------------------------------------- distributed halo product ----

ZONE, RES = 50, 3
FMT, NODATA = "raw16", 0.0
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def _grid_tiles(h, w, positions, nan_frac=0.1, seed=13):
    rng = np.random.default_rng(seed)
    nx = max(p[0] for p in positions) + 1
    ny = max(p[1] for p in positions) + 1
    G = np.full((1, ny * h, nx * w), np.nan)
    rows = []
    for ix, iy in positions:
        arr = np.round(rng.uniform(1, 500, size=(1, h, w)))
        arr[rng.random(arr.shape) < nan_frac] = NODATA
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(np.uint16), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": NODATA})
        A = arr.astype(np.float64)
        A[A == NODATA] = np.nan
        G[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w] = A
    return rows, G


@pytest.mark.parametrize("metric", ["contrast", "entropy"])
def test_distributed_matches_global_mosaic(spark, metric):
    h = w = 16
    positions = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0)]
    rows, G = _grid_tiles(h, w, positions)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    out = {r.cell_id: r for r in texture.glcm_texture(
        df, metric, radius=R, levels=LEVELS, lo=1.0, hi=500.0).collect()}
    assert len(out) == len(positions)
    want_all = texture.glcm_np(_padded(G, R + OM), R, LEVELS, 1.0,
                               500.0, metric)
    for (ix, iy) in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        r = out[cid]
        assert r.fmt == "rawf32" and r.nodata == -9999.0
        got = codec.to_float_masked(
            codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
        want = want_all[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        # fill=False keeps the input footprint: nodata centers stay
        # nodata even when their window holds valid pairs
        src = G[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        want = np.where(np.isfinite(src), want, np.nan)
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-6, equal_nan=True)


def test_texture_pipeline_verb_and_bundle(spark, tmp_path):
    rows, _ = _grid_tiles(8, 8, [(0, 0), (1, 0)])
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    p = Pipeline(df).texture("homogeneity", radius=1, levels=4,
                             lo=1.0, hi=500.0)
    got = {r.cell_id: bytes(r.bytes) for r in p.df.collect()}
    bpath = str(tmp_path / "texture_bundle.json")
    p.to_bundle(bpath)
    replay = Pipeline.from_bundle(bpath, df)
    got2 = {r.cell_id: bytes(r.bytes) for r in replay.df.collect()}
    assert got == got2 and len(got) == 2
