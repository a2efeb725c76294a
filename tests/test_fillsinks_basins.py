"""Depression filling + watershed basins: the priority-flood /
pointer-doubling kernels vs naive oracles (Jacobi fixpoint, per-pixel
walking), closed forms on constructed terrain, and the distributed
strip-exchange / boundary-graph products vs one assembled mosaic
(including depressions and drainage paths spanning several seams)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import oracle
from vrtility_spark import cells, codec, hydrology, terrain

RNG = np.random.default_rng(61)

ZONE, RES = 51, 3
FMT, NODATA = "raw16", 0.0
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def _pad(G):
    B, H, W = G.shape
    P = np.full((B, H + 2, W + 2), np.nan)
    P[:, 1:-1, 1:-1] = G
    return P


# ----------------------------------------------------- kernel oracles ----

def test_fill_kernel_matches_jacobi_on_random_terrain():
    G = np.round(RNG.uniform(0, 500, size=(2, 10, 12)))
    G[RNG.random(G.shape) < 0.08] = np.nan
    got = hydrology.fill_sinks_np(G)
    want = oracle.fill_sinks_jacobi(G)
    np.testing.assert_allclose(got, want, rtol=0, atol=0, equal_nan=True)


def test_fill_kernel_matches_jacobi_with_eps():
    G = np.round(RNG.uniform(0, 500, size=(1, 9, 9)))
    got = hydrology.fill_sinks_np(G, eps=0.5)
    want = oracle.fill_sinks_jacobi(G, eps=0.5)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12,
                               equal_nan=True)


def test_fill_bowl_rises_to_spill_and_ramp_is_identity():
    H = W = 9
    y, x = np.mgrid[0:H, 0:W]
    bowl = ((y - 4.0) ** 2 + (x - 4.0) ** 2)[None]
    f = hydrology.fill_sinks_np(bowl)
    assert f[0, 4, 4] == 16.0  # min border value of the paraboloid
    assert np.all(f >= bowl)
    ramp = np.tile(np.arange(9.0), (9, 1))[None]
    np.testing.assert_array_equal(hydrology.fill_sinks_np(ramp), ramp)


def test_fill_nodata_pond_drains_into_hole():
    # a deep pit ringed by high ground BUT touching a nodata hole:
    # nodata is an outlet, so nothing fills
    G = np.full((1, 5, 5), 100.0)
    G[0, 2, 2] = 1.0
    G[0, 2, 3] = np.nan
    f = hydrology.fill_sinks_np(G)
    assert f[0, 2, 2] == 1.0


def test_basins_kernel_matches_walk_on_random_terrain():
    G = np.round(RNG.uniform(0, 500, size=(2, 12, 14)))
    G[RNG.random(G.shape) < 0.08] = np.nan
    codes = terrain.flow_direction_np(_pad(G), 2.0, 3.0)
    got = hydrology.basins_np(codes, oy=5, ox=9)
    want = oracle.basins_walk(codes, oy=5, ox=9,
                              span=hydrology.BASIN_SPAN)
    np.testing.assert_allclose(got, want, rtol=0, atol=0, equal_nan=True)


def test_basins_single_sink_is_one_basin():
    H = W = 9
    y, x = np.mgrid[0:H, 0:W]
    G = ((y - H // 2) ** 2 + (x - W // 2) ** 2).astype(np.float64)[None]
    codes = terrain.flow_direction_np(_pad(G), 1.0, 1.0)
    lab = hydrology.basins_np(codes)[0]
    v = lab[np.isfinite(lab)]
    assert len(np.unique(v)) == 1
    assert v[0] == (H // 2) * hydrology.BASIN_SPAN + (W // 2)


def test_basin_label_overflow_raises():
    with pytest.raises(ValueError, match="overflow"):
        hydrology._basin_label(np.array([hydrology.BASIN_SPAN]),
                               np.array([0]))


# ------------------------------------------- distributed vs the mosaic ----

def _dem_tiles(h, w, positions, seed=31, pit=None):
    rng = np.random.default_rng(seed)
    nx = max(p[0] for p in positions) + 1
    ny = max(p[1] for p in positions) + 1
    G = np.full((1, ny * h, nx * w), np.nan)
    rows = []
    for ix, iy in positions:
        arr = np.round(rng.uniform(100, 500, size=(1, h, w)))
        arr[rng.random(arr.shape) < 0.05] = NODATA
        rows.append({"cell_id": int(cells.encode_np(ZONE, RES, ix, iy)),
                     "bytes": None, "w": w, "h": h, "fmt": FMT,
                     "nodata": NODATA, "_arr": arr})
        A = arr.astype(np.float64)
        A[A == NODATA] = np.nan
        G[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w] = A
    if pit is not None:
        # carve a cross-seam depression: a low trench spanning tiles
        y0, x0, ln, depth = pit
        G[0, y0, x0:x0 + ln] = depth
        for r in rows:
            cid = r["cell_id"]
            _z, _res, ix, iy = (int(v) for v in cells.decode_np(cid))
            tile = G[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
            arr = np.where(np.isnan(tile), NODATA, tile)
            r["_arr"] = arr
    for r in rows:
        r["bytes"] = codec.encode(r.pop("_arr").astype(np.uint16), FMT)
    return rows, G


def _collect_tiles(df_rows):
    return {r.cell_id: codec.to_float_masked(
        codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
        for r in df_rows}


def _assert_tiles(out, positions, want_all, h, w, f32=True):
    assert len(out) == len(positions)
    for ix, iy in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        want = want_all[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        if f32:
            want = want.astype(np.float32)
        np.testing.assert_allclose(out[cid], want, rtol=0, atol=0,
                                   equal_nan=True)


def test_fill_distributed_matches_global_mosaic(spark):
    h = w = 16
    positions = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0)]
    rows, G = _dem_tiles(h, w, positions)
    df = spark.createDataFrame(
        pd.DataFrame(rows), TILE_SCHEMA)
    out = _collect_tiles(hydrology.fill_sinks(df).collect())
    _assert_tiles(out, positions, hydrology.fill_sinks_np(G), h, w)


def test_fill_cross_seam_depression_needs_rounds(spark):
    # a trench crossing 3 seams: its spill level is set 3 tiles away,
    # so strips must propagate across multiple rounds
    h = w = 8
    positions = [(0, 0), (1, 0), (2, 0), (3, 0)]
    rows, G = _dem_tiles(h, w, positions, pit=(4, 2, 26, 10.0))
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    want = hydrology.fill_sinks_np(G)
    assert np.nanmax(want - G) > 0  # the trench genuinely fills
    out = _collect_tiles(hydrology.fill_sinks(df).collect())
    _assert_tiles(out, positions, want, h, w)
    with pytest.raises(ValueError, match="did not converge"):
        hydrology.fill_sinks(df, max_rounds=1).count()


def test_fill_eps_distributed(spark):
    h = w = 8
    positions = [(0, 0), (1, 0)]
    rows, G = _dem_tiles(h, w, positions, pit=(3, 2, 12, 50.0))
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    out = _collect_tiles(hydrology.fill_sinks(df, eps=0.25).collect())
    _assert_tiles(out, positions, hydrology.fill_sinks_np(G, eps=0.25),
                  h, w)


def test_basins_distributed_matches_global_mosaic(spark):
    h = w = 16
    positions = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0)]
    rows, G = _dem_tiles(h, w, positions)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    codes_df = terrain.terrain(df, "flowdir")
    size = cells.cell_size(RES)
    codesM = terrain.flow_direction_np(_pad(G), size / w, size / h)
    want = hydrology.basins_np(codesM)
    rows_out = hydrology.basins(codes_df).collect()
    assert all(r.fmt == "rawf64" for r in rows_out)
    out = _collect_tiles(rows_out)
    _assert_tiles(out, positions, want, h, w, f32=False)


def test_basins_long_chain_crosses_three_seams(spark):
    # east-draining ramp: every path runs to the east edge of the
    # 4-tile strip, exercising multi-hop pointer jumping
    h = w = 8
    positions = [(0, 0), (1, 0), (2, 0), (3, 0)]
    nx = 4
    G = np.full((1, h, nx * w), np.nan)
    rows = []
    for ix, _ in positions:
        xs = np.arange(ix * w, (ix + 1) * w, dtype=np.float64)
        arr = np.tile(5000.0 - 3.0 * xs, (h, 1))[None]
        rows.append({"cell_id": int(cells.encode_np(ZONE, RES, ix, 0)),
                     "bytes": codec.encode(arr.astype(np.uint16), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": NODATA})
        G[:, :, ix * w:(ix + 1) * w] = arr
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    codes_df = terrain.terrain(df, "flowdir")
    size = cells.cell_size(RES)
    codesM = terrain.flow_direction_np(_pad(G), size / w, size / h)
    want = hydrology.basins_np(codesM)
    out = _collect_tiles(hydrology.basins(codes_df).collect())
    _assert_tiles(out, positions, want, h, w, f32=False)


def test_basins_cross_tile_cycle_diagnosed(spark):
    A = np.full((1, 8, 8), -9999.0, np.float32)
    B = np.full((1, 8, 8), -9999.0, np.float32)
    A[0, 3, 7], B[0, 3, 0] = 1.0, 16.0  # E into B, W back into A
    rows = [
        {"cell_id": int(cells.encode_np(ZONE, RES, ix, 0)),
         "bytes": codec.encode(arr, "rawf32"), "w": 8, "h": 8,
         "fmt": "rawf32", "nodata": -9999.0}
        for ix, arr in ((0, A), (1, B))]
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    with pytest.raises(ValueError, match="CYCLE"):
        hydrology.basins(df, max_rounds=4).count()


def test_missing_column_raises(spark):
    df = spark.createDataFrame(pd.DataFrame({"cell_id": [1]}),
                               "cell_id long")
    with pytest.raises(ValueError, match="missing column"):
        hydrology.fill_sinks(df)
    with pytest.raises(ValueError, match="missing column"):
        hydrology.basins(df)


def test_rawf64_codec_roundtrip():
    arr = np.array([[[1.5, -9999.0], [2.0 ** 52 + 3.0, 0.25]]])
    buf = codec.encode(arr, "rawf64")
    assert len(buf) == 4 * 8
    back = codec.decode(buf, 2, 2, "rawf64")
    np.testing.assert_array_equal(back, arr)
    assert codec.plane_count(buf, 2, 2, "rawf64") == 1
    assert codec.dtype_for("rawf64") == "float64"


def test_pipeline_verbs_and_bundle(spark, tmp_path, tiny_images):
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .composite("median")
         .fill_sinks()
         .terrain("flowdir")
         .basins())
    rows = p.df.collect()
    assert len(rows) == 12 and rows[0].fmt == "rawf64"
    bp = str(tmp_path / "basins.json")
    p.to_bundle(bp)
    replay = Pipeline.from_bundle(bp, tiny_images)
    a = {r.cell_id: bytes(r.bytes) for r in rows}
    b = {r.cell_id: bytes(r.bytes) for r in replay.df.collect()}
    assert a == b
