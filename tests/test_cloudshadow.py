"""Cloud-shadow projection: the shift geometry against closed forms,
the vectorized kernel against the naive per-pixel oracle, and the
distributed halo product against one assembled mosaic."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import oracle
from vrtility_spark import cells, codec, masks

RNG = np.random.default_rng(53)

ZONE, RES = 52, 3
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def _pad(G, r):
    B, H, W = G.shape
    P = np.full((B, H + 2 * r, W + 2 * r), np.nan)
    P[:, r:-r, r:-r] = G
    return P


# ----------------------------------------------------------- geometry ----

def test_shift_closed_forms():
    # sun due WEST (az 270), elevation 45, h = one pixel length:
    # d = h, shadow falls due EAST -> (dy, dx) = (0, +1)
    assert masks.shadow_shifts(270.0, 45.0, 10.0, 10.0, 10.0) == [(0, 1)]
    # sun due SOUTH (az 180): shadow due north -> (+1, 0)
    assert masks.shadow_shifts(180.0, 45.0, 10.0, 10.0, 10.0) == [(1, 0)]
    # doubling the height doubles the displacement
    assert masks.shadow_shifts(270.0, 45.0, 20.0, 10.0, 10.0) == [(0, 2)]
    # lower sun lengthens shadows: tan(26.565) = 0.5 -> d = 2h
    (dy, dx), = masks.shadow_shifts(270.0, np.degrees(np.arctan(0.5)),
                                    10.0, 10.0, 10.0)
    assert (dy, dx) == (0, 2)
    # a height RANGE sweeps every intermediate pixel along the ray
    got = masks.shadow_shifts(270.0, 45.0, (10.0, 50.0), 10.0, 10.0)
    assert got == [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5)]


def test_shift_validation():
    with pytest.raises(ValueError, match="elevation"):
        masks.shadow_shifts(135.0, 0.0, 100.0, 10.0, 10.0)
    with pytest.raises(ValueError, match="elevation"):
        masks.shadow_shifts(135.0, 90.0, 100.0, 10.0, 10.0)
    with pytest.raises(ValueError, match="height"):
        masks.shadow_shifts(135.0, 45.0, -5.0, 10.0, 10.0)


def test_kernel_matches_walk():
    G = (RNG.random((2, 11, 13)) < 0.2).astype(np.float64)
    G[RNG.random(G.shape) < 0.1] = np.nan
    shifts = masks.shadow_shifts(300.0, 35.0, (30.0, 90.0), 10.0, 10.0)
    r = max(max(abs(a), abs(b)) for a, b in shifts)
    for union in (False, True):
        got = masks.cloud_shadow_np(_pad(G, r), shifts, r, union=union)
        want = oracle.cloud_shadow_walk(G, shifts, union=union)
        # kernel output has no NaN re-imposition (the focal driver
        # does that) -> compare on the finite geography
        fin = np.isfinite(G)
        np.testing.assert_allclose(got[fin], want[fin])


def test_single_cloud_pixel_ray():
    G = np.zeros((1, 9, 9))
    G[0, 4, 4] = 1.0
    shifts = [(0, 1), (0, 2)]
    out = masks.cloud_shadow_np(_pad(G, 2), shifts, 2)
    want = np.zeros((1, 9, 9))
    want[0, 4, 5] = want[0, 4, 6] = 1.0
    np.testing.assert_allclose(out, want)
    # union adds the cloud pixel itself
    out_u = masks.cloud_shadow_np(_pad(G, 2), shifts, 2, union=True)
    want[0, 4, 4] = 1.0
    np.testing.assert_allclose(out_u, want)


def test_shift_beyond_radius_raises():
    G = np.zeros((1, 5, 5))
    with pytest.raises(ValueError, match="radius"):
        masks.cloud_shadow_np(_pad(G, 1), [(0, 2)], 1)


# ------------------------------------------- distributed vs the mosaic ----

def _cloud_tiles(h, w, positions, seed=29):
    rng = np.random.default_rng(seed)
    nx = max(p[0] for p in positions) + 1
    ny = max(p[1] for p in positions) + 1
    G = np.full((1, ny * h, nx * w), np.nan)
    rows = []
    for ix, iy in positions:
        arr = (rng.random((1, h, w)) < 0.15).astype(np.float64)
        arr[rng.random(arr.shape) < 0.05] = np.nan
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(
                         codec.from_float(arr, -9999.0, "float32"),
                         "rawf32"),
                     "w": w, "h": h, "fmt": "rawf32",
                     "nodata": -9999.0})
        G[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w] = arr
    return rows, G


def test_distributed_matches_global_mosaic(spark):
    h = w = 16
    positions = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 1)]
    rows, G = _cloud_tiles(h, w, positions)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    size = cells.cell_size(RES)
    sx, sy = size / w, size / h
    az, el, hgt = 135.0, 30.0, (2.0 * sx, 6.0 * sx)
    out = {r.cell_id: r for r in masks.cloud_shadow(
        df, az, el, hgt, union=True).collect()}
    shifts = masks.shadow_shifts(az, el, hgt, sx, sy)
    r_h = max(max(abs(a), abs(b)) for a, b in shifts)
    want_all = masks.cloud_shadow_np(_pad(G, r_h), shifts, r_h,
                                     union=True)
    want_all = np.where(np.isnan(G), np.nan, want_all)
    assert len(out) == len(positions)
    for ix, iy in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        row = out[cid]
        assert row.fmt == "rawf32" and row.nodata == -9999.0
        got = codec.to_float_masked(
            codec.decode(row.bytes, row.w, row.h, row.fmt), row.nodata)
        want = want_all[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   equal_nan=True)


def test_explicit_pixel_size_and_empty_input(spark):
    rows, _ = _cloud_tiles(8, 8, [(0, 0)])
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    out = masks.cloud_shadow(df, 270.0, 45.0, 16.0,
                             pixel_size=8.0).collect()
    assert out[0].fmt == "rawf32"
    with pytest.raises(ValueError, match="empty"):
        masks.cloud_shadow(df.where("cell_id < 0"), 270.0, 45.0, 16.0)


def test_pipeline_verb_and_bundle(spark, tmp_path, tiny_images):
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .composite("median")
         .classify([5500.0], band=0)
         .cloud_shadow(135.0, 30.0, (5000.0, 14000.0), union=True))
    rows = p.df.collect()
    assert len(rows) == 12 and rows[0].fmt == "rawf32"
    bp = str(tmp_path / "shadow.json")
    p.to_bundle(bp)
    replay = Pipeline.from_bundle(bp, tiny_images)
    a = {r.cell_id: bytes(r.bytes) for r in rows}
    b = {r.cell_id: bytes(r.bytes) for r in replay.df.collect()}
    assert a == b
