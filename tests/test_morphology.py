"""Morphology: offset-accumulated kernels vs per-pixel loops, algebra
identities (duality, idempotence, containment), and the fused
two-stage ops vs sequential single-stage halo exchanges — one 2r-halo
open must equal erode→dilate run as two distributed passes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, morphology
from vrtility_spark.morphology import (MORPH_OPS, OUT_NODATA, morph_np,
                                       pad_for, morphology as morph)

RNG = np.random.default_rng(47)

ZONE, RES = 31, 3
FMT = "raw16"
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def naive_minmax(A, r, shape, use_min):
    """Per-pixel loop over the structuring element (naive oracle);
    A is the padded array, output unpadded."""
    B, Hp, Wp = A.shape
    H, W = Hp - 2 * r, Wp - 2 * r
    out = np.full((B, H, W), np.nan)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                vals = []
                for dy in range(-r, r + 1):
                    for dx in range(-r, r + 1):
                        if shape == "disk" and dy * dy + dx * dx > r * r:
                            continue
                        v = A[b, y + r + dy, x + r + dx]
                        if np.isfinite(v):
                            vals.append(v)
                if vals:
                    out[b, y, x] = min(vals) if use_min else max(vals)
    return out


@pytest.mark.parametrize("shape", ["square", "disk"])
@pytest.mark.parametrize("r", [1, 2])
def test_erode_dilate_match_naive(shape, r):
    A = RNG.integers(0, 9, (2, 11, 13)).astype(float)
    A[RNG.random(A.shape) < 0.12] = np.nan
    np.testing.assert_array_equal(
        morph_np(A, "erode", r, shape), naive_minmax(A, r, shape, True))
    np.testing.assert_array_equal(
        morph_np(A, "dilate", r, shape), naive_minmax(A, r, shape, False))


@pytest.mark.parametrize("shape", ["square", "disk"])
def test_composite_ops_identities(shape):
    r = 1
    pad = pad_for("open", r)
    A = RNG.integers(0, 9, (1, 14, 14)).astype(float)
    Ap = np.pad(A, ((0, 0), (pad, pad), (pad, pad)),
                constant_values=np.nan)
    opened = morph_np(Ap, "open", r, shape)
    closed = morph_np(Ap, "close", r, shape)
    # open = dilate(erode), close = erode(dilate) — by construction
    er = naive_minmax(Ap, r, shape, True)
    np.testing.assert_array_equal(
        opened, naive_minmax(
            np.pad(er, ((0, 0), (0, 0), (0, 0))), r, shape, False))
    # duality: erode(P) == -dilate(-P)
    np.testing.assert_array_equal(
        morph_np(Ap, "erode", r, shape),
        -morph_np(-Ap, "dilate", r, shape))
    # containment on the interior: open <= P <= close
    C = A[:, 1:-1, 1:-1]
    assert np.all(opened[:, 1:-1, 1:-1][np.isfinite(C)]
                  <= C[np.isfinite(C)])
    assert np.all(closed[:, 1:-1, 1:-1][np.isfinite(C)]
                  >= C[np.isfinite(C)])
    # gradient/tophat/blackhat compose from the same parts
    g = morph_np(np.pad(A, ((0, 0), (r, r), (r, r)),
                        constant_values=np.nan), "gradient", r, shape)
    assert np.nanmin(g) >= 0
    th = morph_np(Ap, "tophat", r, shape)
    bh = morph_np(Ap, "blackhat", r, shape)
    np.testing.assert_array_equal(th, A - opened)
    np.testing.assert_array_equal(bh, closed - A)


def test_open_idempotent_and_binary_speckle():
    # opening a binary mask kills speckles smaller than the element
    M = np.zeros((1, 15, 15))
    M[0, 7, 7] = 1.0                       # lone speckle
    M[0, 2:6, 2:6] = 1.0                   # solid 4x4 block survives
    pad = pad_for("open", 1)
    Mp = np.pad(M, ((0, 0), (pad, pad), (pad, pad)),
                constant_values=np.nan)
    o1 = morph_np(Mp, "open", 1, "square")
    assert o1[0, 7, 7] == 0.0
    assert o1[0, 3:5, 3:5].min() == 1.0
    # idempotence: open(open(P)) == open(P)
    o1p = np.pad(o1, ((0, 0), (pad, pad), (pad, pad)),
                 constant_values=np.nan)
    np.testing.assert_array_equal(morph_np(o1p, "open", 1, "square"), o1)


def test_validation():
    A = np.zeros((1, 8, 8))
    with pytest.raises(KeyError, match="unknown morphology"):
        morph_np(A, "wat", 1)
    with pytest.raises(KeyError, match="unknown shape"):
        morph_np(A, "erode", 1, shape="hex")
    with pytest.raises(ValueError, match="radius"):
        morph_np(A, "erode", 0)


# ------------------------------------------------- distributed paths ----

def _tiles(h, w, positions, seed=3, nb=1):
    rng = np.random.default_rng(seed)
    nx = max(p[0] for p in positions) + 1
    ny = max(p[1] for p in positions) + 1
    G = np.full((nb, ny * h, nx * w), np.nan)
    rows = []
    for ix, iy in positions:
        arr = rng.integers(1, 9, (nb, h, w)).astype(float)
        arr[0][rng.random((h, w)) < 0.05] = 0  # nodata (value 0)
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(np.uint16), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": 0.0})
        dec = codec.to_float_masked(
            codec.decode(rows[-1]["bytes"], w, h, FMT), 0.0)
        G[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w] = dec
    return rows, G


def _collect(df):
    return {r["cell_id"]:
            (codec.decode(r["bytes"], r["w"], r["h"], r["fmt"]), r)
            for r in df.collect()}


@pytest.mark.parametrize("op", ["erode", "dilate", "open", "close",
                                "gradient", "tophat"])
def test_distributed_matches_mosaic(spark, op):
    h = w = 10
    positions = [(0, 0), (1, 0), (0, 1), (1, 1)]
    rows, G = _tiles(h, w, positions)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    r = 1
    got = _collect(morph(df, op=op, radius=r, shape="disk"))
    pad = pad_for(op, r)
    Gp = np.pad(G, ((0, 0), (pad, pad), (pad, pad)),
                constant_values=np.nan)
    WANT = morph_np(Gp, op, r, "disk")
    # default fill=False: output nodata where input was nodata
    WANT[np.isnan(G)] = np.nan
    diff = op in ("gradient", "tophat")
    for ix, iy in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        arr, row = got[cid]
        want = WANT[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        if diff:
            assert row["fmt"] == "rawf32"
            enc = codec.from_float(want, OUT_NODATA, "float32")
        else:
            assert row["fmt"] == FMT
            enc = codec.from_float(want, 0.0, "uint16")
        np.testing.assert_array_equal(arr, enc)


def test_fused_open_equals_two_distributed_passes(spark):
    # fused open (one 2r halo) vs erode→dilate (two r halos): equal on
    # the fully-surrounded center tile wherever both are valid (the
    # paths legitimately differ at DOMAIN edges — fused erodes the
    # out-of-tile ring from partial windows, two-pass sees no neighbor
    # tile — and in their nodata masks: fused keeps the input mask,
    # two-pass keeps the intermediate's)
    h = w = 10
    positions = [(ix, iy) for ix in range(3) for iy in range(3)]
    rows, _ = _tiles(h, w, positions, seed=9)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    fused_df = morph(df, op="open", radius=1)
    two_df = morph(morph(df, op="erode", radius=1, fill=True),
                   op="dilate", radius=1, fill=True)
    fused, two = _collect(fused_df), _collect(two_df)
    cid = int(cells.encode_np(ZONE, RES, 1, 1))
    a = codec.to_float_masked(fused[cid][0], 0.0)
    b = codec.to_float_masked(two[cid][0], 0.0)
    both = np.isfinite(a) & np.isfinite(b)
    assert both.sum() > 0.7 * a.size
    np.testing.assert_array_equal(a[both], b[both])
    # and the fusion is the point: one halo exchange, not two
    fp = fused_df._jdf.queryExecution().executedPlan().toString()
    tp = two_df._jdf.queryExecution().executedPlan().toString()
    assert fp.count("Exchange") < tp.count("Exchange")
