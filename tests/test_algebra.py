"""Raster algebra between tile collections: kernels vs loops/closed
forms, NaN/sentinel propagation, and the join-shaped distributed path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import algebra, cells, codec

RNG = np.random.default_rng(47)

ZONE, RES = 70, 3
FMT, NODATA = "raw16", 0.0
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def _rand(shape, nan_frac=0.15):
    a = np.round(RNG.uniform(1, 4000, size=shape))
    a[RNG.random(shape) < nan_frac] = np.nan
    return a


def test_algebra_np_ops():
    A, B = _rand((2, 6, 6)), _rand((2, 6, 6))
    np.testing.assert_allclose(algebra.algebra_np(A, B, "diff"), A - B,
                               equal_nan=True)
    np.testing.assert_allclose(algebra.algebra_np(A, B, "abs_diff"),
                               np.abs(A - B), equal_nan=True)
    r = algebra.algebra_np(A, B, "ratio")
    nd = algebra.algebra_np(A, B, "ndiff")
    for i in range(2):
        for y in range(6):
            for x in range(6):
                a, b = A[i, y, x], B[i, y, x]
                if np.isnan(a) or np.isnan(b):
                    assert np.isnan(r[i, y, x]) and np.isnan(nd[i, y, x])
                else:
                    assert r[i, y, x] == a / b
                    np.testing.assert_allclose(nd[i, y, x],
                                               (a - b) / (a + b))
    # zero denominators -> NaN
    Z = np.zeros((1, 2, 2))
    O = np.ones((1, 2, 2))
    assert np.isnan(algebra.algebra_np(O, Z, "ratio")).all()
    assert np.isnan(algebra.algebra_np(Z, Z, "ndiff")).all()
    # callable + shape/op errors
    got = algebra.algebra_np(A, B, lambda a, b: np.full_like(a, 7.0))
    assert (got == 7.0).all()
    with pytest.raises(ValueError, match="shapes disagree"):
        algebra.algebra_np(A, B[:, :3], "diff")
    with pytest.raises(KeyError, match="unknown algebra op"):
        algebra.algebra_np(A, B, "xor")


def _tiles(positions, seed, h=8, w=8, dtype=np.uint16):
    rng = np.random.default_rng(seed)
    rows, arrs = [], {}
    for ix, iy in positions:
        arr = np.round(rng.uniform(1, 4000, size=(2, h, w)))
        arr[rng.random(arr.shape) < 0.1] = NODATA
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(dtype), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": NODATA})
        A = arr.astype(np.float64)
        A[A == NODATA] = np.nan
        arrs[cid] = A
    return rows, arrs


@pytest.mark.parametrize("broadcast_right", [False, True])
def test_tile_algebra_distributed(spark, broadcast_right):
    rowsL, L = _tiles([(0, 0), (1, 0), (0, 1)], seed=1)
    rowsR, R = _tiles([(0, 0), (1, 0), (2, 2)], seed=2)
    left = spark.createDataFrame(pd.DataFrame(rowsL), TILE_SCHEMA)
    right = spark.createDataFrame(pd.DataFrame(rowsR), TILE_SCHEMA)
    out = {r.cell_id: r for r in algebra.tile_algebra(
        left, right, "ndiff", broadcast_right=broadcast_right).collect()}
    # inner join: only the two shared cells survive
    assert set(out) == set(L) & set(R)
    for cid, r in out.items():
        assert r.fmt == "rawf32" and r.nodata == -9999.0
        got = codec.to_float_masked(
            codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
        want = algebra.algebra_np(L[cid], R[cid], "ndiff")
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-6, equal_nan=True)


def test_tile_algebra_chains_and_errors(spark):
    rowsL, L = _tiles([(0, 0)], seed=3)
    left = spark.createDataFrame(pd.DataFrame(rowsL), TILE_SCHEMA)
    # diff with itself is all-zero (valid pixels) / NaN (holes)
    out = algebra.tile_algebra(left, left, "diff").collect()[0]
    got = codec.to_float_masked(
        codec.decode(out.bytes, out.w, out.h, out.fmt), out.nodata)
    cid = rowsL[0]["cell_id"]
    assert np.nanmax(np.abs(got)) == 0.0
    np.testing.assert_array_equal(np.isnan(got), np.isnan(L[cid]))
    # the rawf32 output chains: abs_diff against the original
    out_df = algebra.tile_algebra(left, left, "diff")
    chained = algebra.tile_algebra(out_df, left, "abs_diff").collect()
    assert chained[0].fmt == "rawf32"
    with pytest.raises(KeyError, match="unknown algebra op"):
        algebra.tile_algebra(left, left, "min")
    with pytest.raises(ValueError, match="missing column"):
        algebra.tile_algebra(left.drop("nodata"), left)


def test_algebra_pipeline_verb(spark, tiny_images):
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline

    def comp(lo, hi):
        return (Pipeline(tiny_images)
                .set_maskfun("int", datagen.S2_MASK_VALUES)
                .date_range(lo, hi)
                .warp(cell_res=datagen.TILE_RES)
                .composite("median"))

    early = comp("2024-01-01", "2024-04-15")
    late = comp("2024-04-15", "2024-12-31").df
    change = early.algebra(late, "diff")
    rows = change.df.collect()
    assert len(rows) == 12 and rows[0].fmt == "rawf32"
    # unbundleable: to_bundle must refuse
    with pytest.raises(ValueError):
        change.to_bundle("/tmp/should_not_exist_bundle.json")


# --------------------------------------------------- z-score anomaly ----

def _anomaly_fixture(spark, tiny_images):
    from vrtility_spark import datagen, masks, warp
    celled = warp.assign_cells(tiny_images, datagen.TILE_RES)
    return masks.vrt_set_maskfun(celled, "int", datagen.S2_MASK_VALUES)


def test_zscore_anomaly_matches_naive_replication(spark, tiny_images):
    """Distributed chain == a Spark-free replication of the exact same
    arithmetic (masked scenes → u16-quantized mean/std climatology →
    diff → ratio through the rawf32 round trips)."""
    from vrtility_spark import composite, datagen
    masked = _anomaly_fixture(spark, tiny_images)
    got = {(r.cell_id, r.image_id): bytes(r.bytes)
           for r in algebra.zscore_anomaly(masked).collect()}
    pdf = masked.toPandas()
    for cell_id, grp in pdf.groupby("cell_id"):
        nd = np.asarray(grp.iloc[0].band_nodata, dtype=np.float64)
        scenes = {r.image_id: codec.to_float_masked(
            codec.decode(r.bytes, r.w, r.h, r.fmt), nd)
            for r in grp.itertuples(index=False)}
        stack = np.stack(list(scenes.values()))
        mean_u16 = codec.from_float(
            composite.REDUCERS["mean"](stack).astype(np.float32),
            nd, "uint16")
        std_u16 = codec.from_float(
            composite.REDUCERS["std"](stack).astype(np.float32),
            nd, "uint16")
        Bm = codec.to_float_masked(mean_u16, nd)
        Bs = codec.to_float_masked(std_u16, nd)
        for iid, A in scenes.items():
            d32 = codec.from_float(A - Bm, -9999.0, "float32")
            A2 = codec.to_float_masked(
                d32.astype(np.float64), -9999.0)
            z = A2 / Bs
            z[Bs == 0] = np.nan
            want = codec.encode(
                codec.from_float(z, -9999.0, "float32"), "rawf32")
            assert got[(int(cell_id), iid)] == want


def test_zscore_anomaly_stats_shape_and_reuse(spark, tiny_images):
    """Precomputed climatology path == self-computed; z is finite
    exactly where scene, mean and std are valid and std > 0."""
    from vrtility_spark import composite
    masked = _anomaly_fixture(spark, tiny_images)
    mean_df = composite.composite(masked, "mean")
    std_df = composite.composite(masked, "std")
    a = {(r.cell_id, r.image_id): bytes(r.bytes)
         for r in algebra.zscore_anomaly(masked).collect()}
    b = {(r.cell_id, r.image_id): bytes(r.bytes)
         for r in algebra.zscore_anomaly(
             masked, mean_df=mean_df, std_df=std_df,
             broadcast_stats=True).collect()}
    assert a == b
    rows = algebra.zscore_anomaly(masked).collect()
    r0 = rows[0]
    z = codec.to_float_masked(
        codec.decode(r0.bytes, r0.w, r0.h, r0.fmt), -9999.0)
    assert np.isfinite(z).any()  # some anomaly signal exists
    assert r0.fmt == "rawf32" and r0.nodata == -9999.0


def test_zscore_anomaly_requires_both_stats(spark, tiny_images):
    from vrtility_spark import composite
    masked = _anomaly_fixture(spark, tiny_images)
    with pytest.raises(ValueError, match="both mean_df and std_df"):
        algebra.zscore_anomaly(
            masked, mean_df=composite.composite(masked, "mean"))


# ------------------------------------------------ topographic correction

def test_topo_correct_flat_terrain_identity(spark):
    # a flat DEM: cos(i) = cos(zenith) = sin(altitude) everywhere, so
    # the correction factor is exactly 1 and bands pass through
    rowsL, L = _tiles([(0, 0), (1, 0)], seed=11)
    illum_rows = []
    for r in rowsL:
        il = np.full((1, r["h"], r["w"]), np.sin(np.radians(50.0)),
                     dtype=np.float32)
        illum_rows.append({**r, "bytes": codec.encode(il, "rawf32"),
                           "fmt": "rawf32", "nodata": -9999.0})
    left = spark.createDataFrame(pd.DataFrame(rowsL), TILE_SCHEMA)
    illum = spark.createDataFrame(pd.DataFrame(illum_rows), TILE_SCHEMA)
    out = {r.cell_id: r for r in algebra.topo_correct(
        left, illum, altitude=50.0, c=0.5).collect()}
    for cid, r in out.items():
        got = codec.to_float_masked(
            codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
        np.testing.assert_allclose(got, L[cid].astype(np.float32),
                                   rtol=1e-6, equal_nan=True)


def test_topo_correct_formula_and_plane_broadcast(spark):
    # 2-band tiles against a SINGLE-plane illumination raster: the
    # callable plane-broadcast path; values match the Teillet formula
    rowsL, L = _tiles([(0, 0)], seed=12)
    cid = rowsL[0]["cell_id"]
    rng = np.random.default_rng(1)
    il = rng.uniform(0.2, 1.0, (1, 8, 8)).astype(np.float32)
    il[0, 0, 0] = np.nan                       # invalid illum pixel
    illum_rows = [{**rowsL[0], "bytes": codec.encode(il, "rawf32"),
                   "fmt": "rawf32", "nodata": -9999.0}]
    left = spark.createDataFrame(pd.DataFrame(rowsL), TILE_SCHEMA)
    illum = spark.createDataFrame(pd.DataFrame(illum_rows), TILE_SCHEMA)
    r = algebra.topo_correct(left, illum, altitude=30.0, c=0.2,
                             broadcast_illum=True).collect()[0]
    got = codec.to_float_masked(
        codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
    cosz = np.sin(np.radians(30.0))
    want = L[cid] * (cosz + 0.2) / (il.astype(np.float64) + 0.2)
    want[:, np.isnan(il[0])] = np.nan
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6,
                               equal_nan=True)
    assert got.shape[0] == 2                   # per-band planes kept
    # named ops keep the strict shape contract
    with pytest.raises(ValueError, match="shapes disagree"):
        algebra.algebra_np(L[cid], il.astype(np.float64), "diff")


def test_topo_correct_against_terrain_illumination(spark):
    # end-to-end: inclined-plane DEM -> terrain illumination -> correct
    # a constant band; on the plane's interior cos(i) is constant, so
    # the corrected band is constant with the closed-form value
    from vrtility_spark import terrain
    h = w = 8
    cid = int(cells.encode_np(ZONE, RES, 0, 0))
    size = cells.cell_size(RES)
    sx = sy = size / w
    yy, xx = np.mgrid[0:h, 0:w]
    dem = (300.0 * xx * sx / (w * sx) * w + 1000.0).reshape(1, h, w)
    dem_rows = [{"cell_id": cid,
                 "bytes": codec.encode(dem.astype(np.float32), "rawf32"),
                 "w": w, "h": h, "fmt": "rawf32", "nodata": -9999.0}]
    dem_df = spark.createDataFrame(pd.DataFrame(dem_rows), TILE_SCHEMA)
    illum = terrain.terrain(dem_df, "illumination", azimuth=90.0,
                            altitude=45.0)
    band = np.full((1, h, w), 2000.0, dtype=np.float32)
    band_rows = [{**dem_rows[0], "bytes": codec.encode(band, "rawf32")}]
    band_df = spark.createDataFrame(pd.DataFrame(band_rows), TILE_SCHEMA)
    r = algebra.topo_correct(band_df, illum, altitude=45.0,
                             c=0.0).collect()[0]
    got = codec.to_float_masked(
        codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
    # slope of the ramp: dz/dx = 300 / sx per pixel-metre
    slope_r = np.arctan(300.0 / sx)
    zen = np.radians(45.0)
    # aspect faces the sun (azimuth 90 = +x downslope east... the ramp
    # rises with x, so the sunlit closed form uses cos(az - aspect)=±1;
    # just compare against illumination_np on the same padded array
    P = np.full((1, h + 2, w + 2), np.nan)
    P[:, 1:-1, 1:-1] = dem
    il = terrain.illumination_np(P, sx, sy, azimuth=90.0, altitude=45.0)
    want = 2000.0 * np.cos(zen) / il
    np.testing.assert_allclose(
        got[np.isfinite(got)], want.astype(np.float32)[np.isfinite(got)],
        rtol=1e-5)
    assert np.isfinite(slope_r)
