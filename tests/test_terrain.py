"""Terrain derivatives: Horn kernels vs naive loops and closed forms,
and the distributed halo-exchange product vs one assembled mosaic."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, terrain
from vrtility_spark.pipeline import Pipeline

RNG = np.random.default_rng(31)


def _pad(G):
    B, H, W = G.shape
    P = np.full((B, H + 2, W + 2), np.nan)
    P[:, 1:-1, 1:-1] = G
    return P


# ------------------------------------------------------- loop oracle ----

def horn_loop(G, sx, sy):
    B, H, W = G.shape
    P = _pad(G)
    dzdx = np.full((B, H, W), np.nan)
    dzdy = np.full((B, H, W), np.nan)
    for b in range(B):
        for i in range(H):
            for j in range(W):
                win = P[b, i:i + 3, j:j + 3]
                if np.isnan(win).any():
                    continue
                # row 0 of the window is SOUTH (lower y)
                dzdx[b, i, j] = ((win[2, 2] + 2 * win[1, 2] + win[0, 2])
                                 - (win[2, 0] + 2 * win[1, 0] + win[0, 0])
                                 ) / (8 * sx)
                dzdy[b, i, j] = ((win[2, 0] + 2 * win[2, 1] + win[2, 2])
                                 - (win[0, 0] + 2 * win[0, 1] + win[0, 2])
                                 ) / (8 * sy)
    return dzdx, dzdy


def test_horn_matches_loop():
    G = np.round(RNG.uniform(0, 500, size=(2, 9, 11)))
    G[RNG.random(G.shape) < 0.1] = np.nan
    gx, gy = terrain.horn_gradients_np(_pad(G), 3.0, 5.0)
    lx, ly = horn_loop(G, 3.0, 5.0)
    np.testing.assert_allclose(gx, lx, rtol=1e-12, equal_nan=True)
    np.testing.assert_allclose(gy, ly, rtol=1e-12, equal_nan=True)


def test_slope_aspect_on_inclined_plane():
    # z = 2x + 0y at pixel size 1: dz/dx = 2, slope = atan(2),
    # downslope points west (azimuth 270)
    H = W = 8
    x = np.arange(W) + 0.5
    G = np.tile(2.0 * x, (H, 1))[None]
    interior = (slice(1, -1), slice(1, -1))
    s = terrain.slope_np(_pad(G), 1.0, 1.0)[0][interior]
    np.testing.assert_allclose(s, np.degrees(np.arctan(2.0)), rtol=1e-12)
    a = terrain.aspect_np(_pad(G), 1.0, 1.0)[0][interior]
    np.testing.assert_allclose(a, 270.0, rtol=1e-12)
    # z rising with y: downslope faces south (180)
    Gy = np.tile((np.arange(H) + 0.5)[:, None], (1, W))[None]
    ay = terrain.aspect_np(_pad(Gy), 1.0, 1.0)[0][interior]
    np.testing.assert_allclose(ay, 180.0, rtol=1e-12)
    # percent units
    sp = terrain.slope_np(_pad(G), 1.0, 1.0, units="percent")[0][interior]
    np.testing.assert_allclose(sp, 200.0, rtol=1e-12)


def test_flat_and_hillshade_closed_form():
    G = np.full((1, 6, 6), 42.0)
    interior = (slice(1, -1), slice(1, -1))
    s = terrain.slope_np(_pad(G), 1.0, 1.0)[0]
    np.testing.assert_allclose(s[interior], 0.0, atol=1e-12)
    a = terrain.aspect_np(_pad(G), 1.0, 1.0)[0]
    assert np.isnan(a[interior]).all()  # flat → NaN aspect
    hs = terrain.hillshade_np(_pad(G), 1.0, 1.0, altitude=45.0)[0]
    np.testing.assert_allclose(
        hs[interior], 255.0 * np.cos(np.radians(45.0)), rtol=1e-12)
    # edge ring (window leaves the domain) is NaN everywhere
    assert np.isnan(s[0, :]).all() and np.isnan(hs[:, 0]).all()


def test_hole_poisons_neighbors():
    G = np.round(RNG.uniform(0, 100, size=(1, 7, 7)))
    G[0, 3, 3] = np.nan
    s = terrain.slope_np(_pad(G), 1.0, 1.0)[0]
    assert np.isnan(s[2:5, 2:5]).all()  # all 9 windows touching it
    assert np.isfinite(s[1, 1])


def test_unknown_ops_raise():
    with pytest.raises(KeyError):
        terrain.terrain_np(np.ones((1, 4, 4)), "ruggedness2", 1.0, 1.0)
    with pytest.raises(ValueError):
        terrain.slope_np(np.ones((1, 4, 4)), 1.0, 1.0, units="radians")
    with pytest.raises(ValueError):
        terrain.tri_np(np.ones((1, 4, 4)), alg="renner")


# --------------------------------------- 3x3 neighborhood indices ----
# (gdaldem tpi / tri / roughness; loop oracles + closed forms)

def _loop_index_oracle(G, op, alg="riley"):
    """Per-pixel 3x3 index with plain loops (strict any-NaN window)."""
    B, H, W = G.shape
    P = _pad(G)
    out = np.full((B, H, W), np.nan)
    for b in range(B):
        for i in range(H):
            for j in range(W):
                win = P[b, i:i + 3, j:j + 3]
                if np.isnan(win).any():
                    continue
                z = win[1, 1]
                nb = np.delete(win.ravel(), 4)
                if op == "tpi":
                    out[b, i, j] = z - nb.mean()
                elif op == "tri" and alg == "riley":
                    out[b, i, j] = np.sqrt(((nb - z) ** 2).sum())
                elif op == "tri" and alg == "wilson":
                    out[b, i, j] = np.abs(nb - z).mean()
                elif op == "roughness":
                    out[b, i, j] = win.max() - win.min()
    return out


@pytest.mark.parametrize("op,kw", [
    ("tpi", {}), ("tri", {"alg": "riley"}), ("tri", {"alg": "wilson"}),
    ("roughness", {}),
])
def test_index_kernels_match_loop_oracle(op, kw):
    G = np.round(RNG.uniform(0, 300, size=(2, 7, 9)))
    G[0, 2, 3] = np.nan
    got = terrain.terrain_np(_pad(G), op, 1.0, 1.0, **kw)
    want = _loop_index_oracle(G, op, **kw)
    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


def test_index_closed_forms():
    # inclined plane z = 2x: TPI is exactly 0 on any plane (center =
    # neighbor mean by symmetry); roughness = z-range of the window =
    # 2*2; TRI riley = sqrt(6 * dz^2) with dz=2 per column offset
    x = np.arange(8, dtype=np.float64)
    plane = np.tile(2.0 * x, (8, 1))[None]
    interior = (slice(1, -1), slice(1, -1))
    tpi = terrain.tpi_np(_pad(plane))[0][interior]
    np.testing.assert_allclose(tpi, 0.0, atol=1e-12)
    rough = terrain.roughness_np(_pad(plane))[0][interior]
    np.testing.assert_allclose(rough, 4.0)
    # 3 neighbors at dz=-2, 2 at dz=0, 3 at dz=+2:
    tri_r = terrain.tri_np(_pad(plane), alg="riley")[0][interior]
    np.testing.assert_allclose(tri_r, np.sqrt(24.0))  # sqrt(6 * 2^2)
    tri_w = terrain.tri_np(_pad(plane), alg="wilson")[0][interior]
    np.testing.assert_allclose(tri_w, 1.5)  # 12 / 8
    # flat: every index is 0
    flat = np.full((1, 6, 6), 7.0)
    for op in ("tpi", "tri", "roughness"):
        v = terrain.terrain_np(_pad(flat), op, 1.0, 1.0)[0][interior]
        np.testing.assert_allclose(v, 0.0)
    # a single peak: TPI positive at the peak, negative beside it
    peak = np.zeros((1, 5, 5))
    peak[0, 2, 2] = 8.0
    tp = terrain.tpi_np(_pad(peak))[0]
    assert tp[2, 2] == 8.0 and tp[2, 1] == -1.0
    assert terrain.roughness_np(_pad(peak))[0][2, 2] == 8.0


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


@pytest.mark.parametrize("op", ["slope", "hillshade", "hillshade_md",
                                "tpi", "tri", "roughness"])
def test_distributed_matches_global_mosaic(spark, op):
    h = w = 16
    positions = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0)]
    rows, G = _grid_tiles(h, w, positions)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    size = cells.cell_size(RES)
    sx, sy = size / w, size / h
    out = {r.cell_id: r for r in terrain.terrain(df, op).collect()}
    assert len(out) == len(positions)
    want_all = terrain.terrain_np(_pad(G), op, sx, sy)
    for (ix, iy) in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        r = out[cid]
        assert r.fmt == "rawf32" and r.nodata == -9999.0
        got = codec.to_float_masked(
            codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
        want = want_all[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        # mosaic positions with a neighbor tile MISSING are NaN in G
        # already, so the global crop is exactly the halo semantics
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-6, equal_nan=True)


def test_explicit_pixel_size_and_chaining(spark):
    rows, G = _grid_tiles(8, 8, [(0, 0)])
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    out = terrain.terrain(df, "slope", pixel_size=2.0).collect()[0]
    got = codec.to_float_masked(
        codec.decode(out.bytes, out.w, out.h, out.fmt), out.nodata)
    want = terrain.slope_np(_pad(G), 2.0, 2.0).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6, equal_nan=True)
    # rawf32 output is itself a valid tile table: slope of slope runs
    df2 = spark.createDataFrame(
        pd.DataFrame([out.asDict(recursive=True)]), TILE_SCHEMA)
    out2 = terrain.terrain(df2, "slope", pixel_size=2.0).collect()
    assert out2[0].fmt == "rawf32"


def test_terrain_pipeline_verb_and_bundle(spark, tmp_path, tiny_images):
    from vrtility_spark import datagen
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .composite("median")
         .terrain("hillshade", azimuth=135.0))
    rows = p.df.collect()
    assert len(rows) == 12 and rows[0].fmt == "rawf32"
    bp = str(tmp_path / "ter.json")
    p.to_bundle(bp)
    replay = Pipeline.from_bundle(bp, tiny_images)
    a = {r.cell_id: bytes(r.bytes) for r in rows}
    b = {r.cell_id: bytes(r.bytes) for r in replay.df.collect()}
    assert a == b


# --------------------------------------------------- D8 flow direction ----

def flowdir_loop(G, sx, sy):
    """Naive per-pixel D8 oracle over the unpadded (B, H, W) array."""
    B, H, W = G.shape
    out = np.full((B, H, W), np.nan)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                win_ok = True
                best, code = -np.inf, 0.0
                for c, dy, dx in terrain.D8_CODES:
                    ny, nx = y + dy, x + dx
                    if not (0 <= ny < H and 0 <= nx < W) or \
                            np.isnan(G[b, ny, nx]):
                        win_ok = False
                        break
                    drop = (G[b, y, x] - G[b, ny, nx]) / \
                        float(np.hypot(dx * sx, dy * sy))
                    if drop > best:
                        best, code = drop, float(c)
                if win_ok and not np.isnan(G[b, y, x]):
                    out[b, y, x] = code if best > 0 else 0.0
    return out


def test_flowdir_matches_loop_oracle():
    rng = np.random.default_rng(19)
    G = rng.uniform(100, 200, (2, 9, 11))
    G[rng.random(G.shape) < 0.08] = np.nan
    got = terrain.flow_direction_np(_pad(G), 30.0, 30.0)
    want = flowdir_loop(G, 30.0, 30.0)
    np.testing.assert_array_equal(np.nan_to_num(got, nan=-1),
                                  np.nan_to_num(want, nan=-1))


def test_flowdir_closed_forms():
    yy, xx = np.mgrid[0:8, 0:8].astype(float)
    # z rises to the NE → water flows SW (code 8) everywhere interior
    plane = (xx + yy)[None]
    out = terrain.flow_direction_np(_pad(plane), 10.0, 10.0)
    assert (out[0, 1:-1, 1:-1] == 8.0).all()
    # bowl: the minimum is a SINK (code 0)
    bowl = ((xx - 4) ** 2 + (yy - 4) ** 2)[None]
    out = terrain.flow_direction_np(_pad(bowl), 10.0, 10.0)
    assert out[0, 4, 4] == 0.0
    assert (np.nan_to_num(out[0], nan=99)[1:-1, 1:-1] != 99).all()
    # flat terrain: all sinks
    flat = np.full((1, 6, 6), 42.0)
    out = terrain.flow_direction_np(_pad(flat), 10.0, 10.0)
    assert (out[0, 1:-1, 1:-1] == 0.0).all()
    # pure north-rising ramp drains due south (cardinal beats the
    # diagonals because their √2 length halves nothing here)
    ramp = yy[None]
    out_iso = terrain.flow_direction_np(_pad(ramp), 10.0, 10.0)
    assert (out_iso[0, 1:-1, 1:-1] == 4.0).all()  # due south


def test_flowdir_distributed_matches_mosaic(spark):
    h = w = 12
    positions = [(0, 0), (1, 0), (0, 1)]
    rows, G = _grid_tiles(h, w, positions, seed=23)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    size = cells.cell_size(RES)
    out = {r.cell_id: r
           for r in terrain.terrain(df, "flowdir").collect()}
    want_all = terrain.flow_direction_np(_pad(G), size / w, size / h)
    for (ix, iy) in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        r = out[cid]
        got = codec.to_float_masked(
            codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
        want = want_all[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        np.testing.assert_array_equal(
            np.nan_to_num(got, nan=-1),
            np.nan_to_num(want.astype(np.float32), nan=-1))


# --------------------------------------------------- color relief ----
# (gdaldem color-relief: ramp LUT; loop oracle + distributed map)

RAMP = [(0.0, 0, 0, 128), (100.0, 0, 255, 0), (300.0, 255, 255, 255)]


def test_color_relief_np_oracle_and_modes():
    A = np.array([[np.nan, 0.0, 50.0], [100.0, 200.0, 999.0]])
    got = terrain.color_relief_np(A, RAMP, nv_color=(9, 9, 9))
    # loop oracle: per-pixel per-channel np.interp with clamping
    for i in range(2):
        for j in range(3):
            v = A[i, j]
            if np.isnan(v):
                np.testing.assert_array_equal(got[:, i, j], [9, 9, 9])
                continue
            for c in range(3):
                xs = [e[0] for e in RAMP]
                ys = [e[1 + c] for e in RAMP]
                assert got[c, i, j] == np.interp(v, xs, ys)
    # clamping outside the ramp
    np.testing.assert_array_equal(got[:, 1, 2], [255, 255, 255])
    # nearest mode snaps to entries (149 → 100-entry, 201 → 300-entry)
    near = terrain.color_relief_np(
        np.array([[149.0, 201.0]]), RAMP, interpolate=False)
    np.testing.assert_array_equal(near[:, 0, 0], [0, 255, 0])
    np.testing.assert_array_equal(near[:, 0, 1], [255, 255, 255])
    # guards
    with pytest.raises(ValueError, match="ramp"):
        terrain.color_relief_np(A, RAMP[:1])
    with pytest.raises(ValueError, match="distinct"):
        terrain.color_relief_np(A, [(0, 0, 0, 0), (0.0, 1, 1, 1)])


def test_color_relief_distributed(spark):
    h = w = 10
    rows, G = _grid_tiles(h, w, [(0, 0), (1, 0)], nan_frac=0.15, seed=31)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    out = {r.cell_id: r
           for r in terrain.color_relief(df, RAMP, band=0).collect()}
    for ix, iy in [(0, 0), (1, 0)]:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        r = out[cid]
        assert r.fmt == "raw16" and r.nodata == 65535.0
        arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
        assert arr.shape == (3, h, w)
        A = G[0, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        want = codec.from_float(
            terrain.color_relief_np(A, RAMP), 65535.0, "uint16")
        np.testing.assert_array_equal(arr, want)
    # out-of-range band errors loudly
    with pytest.raises(Exception):
        terrain.color_relief(df, RAMP, band=7).collect()


def test_color_relief_pipeline_chain_and_bundle(spark, tmp_path,
                                                tiny_images):
    from vrtility_spark import datagen
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .composite("median")
         .terrain("slope")
         .color_relief([(0.0, 0, 0, 128), (90.0, 255, 0, 0)]))
    rows = p.df.collect()
    assert rows and all(r.fmt == "raw16" for r in rows)
    path = str(tmp_path / "cr.json")
    p.to_bundle(path)
    p2 = Pipeline.from_bundle(path, tiny_images)
    a = {r.cell_id: r.bytes for r in rows}
    b = {r.cell_id: r.bytes for r in p2.df.collect()}
    assert a == b


def test_hillshade_md_is_weighted_blend():
    """The multidirectional product IS the sin²-weighted half-sum of
    the four directional hillshades (weights sum to 2 exactly)."""
    rng = np.random.default_rng(8)
    P = rng.uniform(0, 500, (1, 9, 9))
    P[0, 2, 3] = np.nan
    sx = sy = 10.0
    got = terrain.hillshade_md_np(P, sx, sy)
    dzdx, dzdy = terrain.horn_gradients_np(P, sx, sy)
    with np.errstate(invalid="ignore"):
        aspect = np.arctan2(-dzdx, -dzdy)
    acc = np.zeros_like(got)
    wsum = np.zeros_like(got)
    for az in (225.0, 270.0, 315.0, 360.0):
        wgt = np.sin(aspect - np.radians(az)) ** 2
        acc += wgt * terrain.hillshade_np(P, sx, sy, azimuth=az)
        wsum += wgt
    np.testing.assert_allclose(wsum[np.isfinite(wsum)], 2.0, rtol=1e-12)
    np.testing.assert_allclose(got, acc / 2.0, rtol=1e-12, equal_nan=True)
    valid = np.isfinite(got)
    assert (got[valid] >= 0).all() and (got[valid] <= 255).all()
    # flat ground: slope 0 → every azimuth shades cos(zen) identically
    F0 = np.full((1, 5, 5), 100.0)
    flat = terrain.hillshade_md_np(F0, sx, sy)
    np.testing.assert_allclose(
        flat[0, 1:-1, 1:-1], 255.0 * np.cos(np.radians(45.0)),
        rtol=1e-12)


def test_illumination_is_unscaled_hillshade():
    # hillshade == 255 * clip(illumination, 0, 1) by construction, and
    # a flat DEM's illumination is exactly sin(altitude)
    rng = np.random.default_rng(21)
    P = np.pad(rng.uniform(100, 900, (1, 6, 6)),
               ((0, 0), (1, 1), (1, 1)), constant_values=np.nan)
    il = terrain.illumination_np(P, 10.0, 10.0, azimuth=200.0,
                                 altitude=35.0)
    hs = terrain.hillshade_np(P, 10.0, 10.0, azimuth=200.0,
                              altitude=35.0)
    np.testing.assert_allclose(hs, 255.0 * np.clip(il, 0.0, 1.0),
                               equal_nan=True)
    flat = np.pad(np.full((1, 5, 5), 42.0), ((0, 0), (1, 1), (1, 1)),
                  constant_values=np.nan)
    il_flat = terrain.illumination_np(flat, 3.0, 3.0, altitude=35.0)
    np.testing.assert_allclose(il_flat[np.isfinite(il_flat)],
                               np.sin(np.radians(35.0)), rtol=1e-12)


# --------------------------- Zevenbergen-Thorne curvature products ----

def _loop_curvature_oracle(G, sx, sy, mode):
    """Per-pixel Z&T curvature with plain loops (strict any-NaN
    window; Esri sign/x100 conventions, flat profile/plan -> 0)."""
    B, H, W = G.shape
    P = _pad(G)
    out = np.full((B, H, W), np.nan)
    for b in range(B):
        for i in range(H):
            for j in range(W):
                win = P[b, i:i + 3, j:j + 3]
                if np.isnan(win).any():
                    continue
                z = win[1, 1]
                zS, zN = win[0, 1], win[2, 1]          # row 0 = south
                zW, zE = win[1, 0], win[1, 2]
                zSW, zSE = win[0, 0], win[0, 2]
                zNW, zNE = win[2, 0], win[2, 2]
                D = ((zW + zE) / 2 - z) / sx ** 2
                E = ((zN + zS) / 2 - z) / sy ** 2
                Fc = (-zNW + zNE + zSW - zSE) / (4 * sx * sy)
                Gx = (zE - zW) / (2 * sx)
                Hy = (zN - zS) / (2 * sy)
                if mode == "total":
                    out[b, i, j] = -200.0 * (D + E)
                    continue
                den = Gx * Gx + Hy * Hy
                if den == 0:
                    out[b, i, j] = 0.0
                elif mode == "profile":
                    out[b, i, j] = 200.0 * (D * Gx ** 2 + E * Hy ** 2
                                            + Fc * Gx * Hy) / den
                else:
                    out[b, i, j] = -200.0 * (D * Hy ** 2 + E * Gx ** 2
                                             - Fc * Gx * Hy) / den
    return out


@pytest.mark.parametrize("mode", ["total", "profile", "plan"])
def test_curvature_matches_loop_oracle(mode):
    G = np.round(RNG.uniform(0, 400, size=(2, 7, 9)))
    G[0, 3, 4] = np.nan
    got = terrain.curvature_np(_pad(G), 3.0, 5.0, mode=mode)
    want = _loop_curvature_oracle(G, 3.0, 5.0, mode)
    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


def test_curvature_closed_forms():
    # paraboloid z = x^2 + y^2 at unit pixel size (a bowl): D = E = 1
    # exactly (the quadratic is reproduced exactly by central
    # differences), so total = -400 everywhere; along the +x axis
    # (y = 0) the slope line is the x axis: profile = +200 (upwardly
    # concave, flow decelerating outward), plan = -200 (converging).
    H = W = 9
    y, x = np.mgrid[0:H, 0:W].astype(np.float64)
    x -= W // 2
    y -= H // 2
    bowl = (x * x + y * y)[None]
    interior = (slice(1, -1), slice(1, -1))
    tot = terrain.curvature_np(_pad(bowl), 1.0, 1.0, "total")
    np.testing.assert_allclose(tot[0][interior], -400.0, rtol=1e-12)
    prof = terrain.curvature_np(_pad(bowl), 1.0, 1.0, "profile")
    plan = terrain.curvature_np(_pad(bowl), 1.0, 1.0, "plan")
    mid = H // 2
    assert prof[0, mid, mid + 2] == pytest.approx(200.0)
    assert plan[0, mid, mid + 2] == pytest.approx(-200.0)
    # an inclined PLANE has zero curvature of every kind
    plane = np.tile(3.0 * np.arange(W, dtype=np.float64), (H, 1))[None]
    for mode in ("total", "profile", "plan"):
        v = terrain.curvature_np(_pad(plane), 1.0, 1.0, mode)
        np.testing.assert_allclose(v[0][interior], 0.0, atol=1e-10)
    # flat ground: profile/plan take the 0 convention (not NaN)
    flat = np.full((1, 6, 6), 5.0)
    for mode in ("profile", "plan"):
        v = terrain.curvature_np(_pad(flat), 1.0, 1.0, mode)
        np.testing.assert_allclose(v[0][interior], 0.0)
    with pytest.raises(ValueError):
        terrain.curvature_np(_pad(flat), 1.0, 1.0, "tangential")


def test_curvature_yflip_invariant():
    # the products may not depend on which row the engine calls south:
    # F and H flip sign together under a y-flip and every term is
    # even in (F, H) jointly
    G = np.round(RNG.uniform(0, 400, size=(1, 8, 8)))
    for mode in ("total", "profile", "plan"):
        a = terrain.curvature_np(_pad(G), 2.0, 3.0, mode)
        b = terrain.curvature_np(_pad(G[:, ::-1, :]), 2.0, 3.0, mode)
        np.testing.assert_allclose(a, b[:, ::-1, :], rtol=1e-12,
                                   equal_nan=True)


@pytest.mark.parametrize("op", ["curvature", "profile_curvature",
                                "plan_curvature"])
def test_curvature_distributed_matches_mosaic(spark, op):
    h = w = 16
    positions = [(0, 0), (1, 0), (0, 1), (1, 1)]
    rows, G = _grid_tiles(h, w, positions, seed=47)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    size = cells.cell_size(RES)
    sx, sy = size / w, size / h
    out = {r.cell_id: r for r in terrain.terrain(df, op).collect()}
    want_all = terrain.terrain_np(_pad(G), op, sx, sy)
    for (ix, iy) in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        r = out[cid]
        got = codec.to_float_masked(
            codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
        want = want_all[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-6, equal_nan=True)
