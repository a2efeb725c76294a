"""Overview pyramids: block-reduce kernels vs naive loops, and the
distributed level builder vs a single assembled mosaic (each level must
equal downsampling the WHOLE mosaic, not each tile in isolation)."""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, overviews
from vrtility_spark.pipeline import Pipeline

RNG = np.random.default_rng(11)


# ------------------------------------------------------- loop oracle ----

def downsample_loop(A: np.ndarray, methods) -> np.ndarray:
    """Deliberately-naive per-block factor-2 reduce of (B, 2H, 2W)."""
    B, H2, W2 = A.shape
    out = np.full((B, H2 // 2, W2 // 2), np.nan)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        for b in range(B):
            m = methods if isinstance(methods, str) else methods[b]
            for y in range(H2 // 2):
                for x in range(W2 // 2):
                    blk = A[b, 2 * y:2 * y + 2, 2 * x:2 * x + 2].ravel()
                    if m == "nearest":
                        out[b, y, x] = blk[0]
                        continue
                    v = blk[np.isfinite(blk)]
                    if len(v) == 0:
                        continue
                    if m == "average":
                        out[b, y, x] = v.mean()
                    elif m == "min":
                        out[b, y, x] = v.min()
                    elif m == "max":
                        out[b, y, x] = v.max()
                    elif m == "mode":
                        vals, counts = np.unique(v, return_counts=True)
                        out[b, y, x] = vals[counts.argmax()]
    return out


def _rand(shape, nan_frac=0.25):
    a = np.round(RNG.normal(1000, 200, size=shape))
    a[RNG.random(shape) < nan_frac] = np.nan
    return a


@pytest.mark.parametrize("method", list(overviews.OVERVIEW_METHODS))
def test_downsample2_matches_loop(method):
    A = _rand((3, 10, 14))
    got = overviews.downsample2_np(A, method)
    want = downsample_loop(A, method)
    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


def test_downsample2_per_plane_methods():
    A = _rand((3, 8, 8))
    methods = ["average", "max", "mode"]
    got = overviews.downsample2_np(A, methods)
    want = downsample_loop(A, methods)
    np.testing.assert_allclose(got, want, rtol=1e-12, equal_nan=True)


def test_mode_tie_breaks_to_smallest_and_all_nan():
    A = np.full((1, 4, 4), np.nan)
    A[0, 0:2, 0:2] = [[7, 7], [3, 3]]        # tie 7 vs 3 -> 3
    A[0, 0:2, 2:4] = [[5, np.nan], [5, 9]]   # 5 wins over 9
    A[0, 2:4, 0:2] = [[np.nan, 4],
                      [np.nan, np.nan]]      # single valid -> 4
    out = overviews.downsample2_np(A, "mode")
    assert out[0, 0, 0] == 3
    assert out[0, 0, 1] == 5
    assert out[0, 1, 0] == 4
    assert np.isnan(out[0, 1, 1])


def test_nearest_is_positional_even_when_nan():
    A = np.ones((1, 2, 2))
    A[0, 0, 0] = np.nan
    out = overviews.downsample2_np(A, "nearest")
    assert np.isnan(out[0, 0, 0])  # picks (0,0) regardless of validity


def test_downsample2_rejects_bad_shapes_and_methods():
    with pytest.raises(ValueError, match="not even-sized"):
        overviews.downsample2_np(np.ones((1, 3, 4)), "average")
    with pytest.raises(KeyError, match="unknown overview method"):
        overviews.downsample2_np(np.ones((1, 4, 4)), "cubic")
    with pytest.raises(ValueError, match="methods for"):
        overviews.downsample2_np(np.ones((2, 4, 4)), ["average"])


# ------------------------------------------------- distributed levels ----

ZONE, RES = 30, 3
FMT, NODATA = "raw16", 0.0

TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double, n_scenes int")


def _grid_tiles(h, w, positions, nan_frac=0.15, seed=5, res=RES):
    rng = np.random.default_rng(seed)
    nx = max(p[0] for p in positions) + 1
    ny = max(p[1] for p in positions) + 1
    G = np.full((2, ny * h, nx * w), np.nan)
    rows = []
    for i, (ix, iy) in enumerate(positions):
        arr = np.round(rng.uniform(1, 4000, size=(2, h, w)))
        arr[rng.random(arr.shape) < nan_frac] = NODATA
        cid = int(cells.encode_np(ZONE, res, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(np.uint16), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": NODATA,
                     "n_scenes": i + 1})
        A = arr.astype(np.float64)
        A[A == NODATA] = np.nan
        G[:, iy * h:(iy + 1) * h, ix * w:(ix + 1) * w] = A
    return rows, G


@pytest.mark.parametrize("method", ["average", "mode"])
def test_build_level_matches_global_mosaic(spark, method):
    # full 4x4 grid -> 4 parents; each parent tile must equal the
    # factor-2 reduce of the corresponding mosaic quadrant
    positions = [(ix, iy) for ix in range(4) for iy in range(4)]
    rows, G = _grid_tiles(16, 16, positions)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    out = overviews.build_level(df, method=method).collect()
    assert len(out) == 4
    want_all = downsample_loop(G, method)
    for r in out:
        zone, res, ix, iy = (int(v) for v in cells.decode_np(r.cell_id))
        assert (zone, res) == (ZONE, RES - 1)
        got = codec.to_float_masked(
            codec.decode(r.bytes, r.w, r.h, r.fmt), NODATA)
        want = want_all[:, iy * 16:(iy + 1) * 16, ix * 16:(ix + 1) * 16]
        enc = codec.from_float(want, NODATA, "uint16")
        np.testing.assert_array_equal(
            got, codec.to_float_masked(enc, NODATA))


def test_build_level_missing_child_and_metadata(spark):
    # 3 of 4 children: the hole stays NaN in the canvas; n_scenes sums;
    # pass-through metadata comes from the child with most scenes
    positions = [(0, 0), (1, 0), (0, 1)]
    rows, G = _grid_tiles(8, 8, positions)
    Gp = np.full((2, 16, 16), np.nan)
    Gp[:, :G.shape[1], :G.shape[2]] = G
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    out = overviews.build_level(df, method="average").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_scenes == 1 + 2 + 3
    got = codec.to_float_masked(
        codec.decode(r.bytes, r.w, r.h, r.fmt), NODATA)
    want = downsample_loop(Gp, "average")
    enc = codec.from_float(want, NODATA, "uint16")
    np.testing.assert_array_equal(got, codec.to_float_masked(enc, NODATA))


def test_build_pyramid_levels_and_counts(spark):
    positions = [(ix, iy) for ix in range(4) for iy in range(4)]
    rows, G = _grid_tiles(8, 8, positions)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    pyr = overviews.build_pyramid(df, 2, method="average")
    counts = {r.level: r["count"] for r in
              pyr.groupBy("level").count().collect()}
    assert counts == {0: 16, 1: 4, 2: 1}
    # level 2 == two successive factor-2 reduces of the full mosaic
    top = pyr.filter("level = 2").collect()[0]
    zone, res, ix, iy = (int(v) for v in cells.decode_np(top.cell_id))
    assert (zone, res, ix, iy) == (ZONE, RES - 2, 0, 0)
    got = codec.to_float_masked(
        codec.decode(top.bytes, top.w, top.h, top.fmt), NODATA)
    l1 = downsample_loop(G, "average")
    l1q = codec.to_float_masked(
        codec.from_float(l1, NODATA, "uint16"), NODATA)  # re-quantized
    want = downsample_loop(l1q, "average")
    enc = codec.from_float(want, NODATA, "uint16")
    np.testing.assert_array_equal(got, codec.to_float_masked(enc, NODATA))
    # exclude_base variant drops level 0
    pyr2 = overviews.build_pyramid(df, 1, include_base=False)
    assert pyr2.select("level").distinct().collect()[0].level == 1


def test_build_level_per_band_nodata(spark):
    # per-band sentinels route through row_band_meta, not the scalar
    rows, G = _grid_tiles(8, 8, [(0, 0), (1, 1)])
    pdf = pd.DataFrame(rows)
    pdf["band_nodata"] = [[0.0, 65535.0]] * len(pdf)
    # re-encode plane 1 with 65535 holes instead of 0
    new_rows = []
    for i, r in enumerate(pdf.itertuples(index=False)):
        arr = codec.decode(r.bytes, r.w, r.h, r.fmt).astype(np.float64)
        arr[1][arr[1] == NODATA] = 65535.0
        d = r._asdict()
        d["bytes"] = codec.encode(arr.astype(np.uint16), FMT)
        new_rows.append(d)
    df = spark.createDataFrame(
        pd.DataFrame(new_rows),
        TILE_SCHEMA + ", band_nodata array<double>")
    out = overviews.build_level(df, method="average").collect()
    assert len(out) == 1
    got = codec.decode(out[0].bytes, out[0].w, out[0].h, out[0].fmt)
    Gp = np.full((2, 16, 16), np.nan)
    Gp[:, :8, :8] = G[:, :8, :8]
    Gp[:, 8:, 8:] = G[:, 8:, 8:]
    want = codec.from_float(downsample_loop(Gp, "average"),
                            np.asarray([0.0, 65535.0]), "uint16")
    np.testing.assert_array_equal(got, want)


def test_build_level_errors(spark):
    rows, _ = _grid_tiles(8, 8, [(0, 0)])
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    with pytest.raises(KeyError, match="unknown overview method"):
        overviews.build_level(df, method="lanczos")
    with pytest.raises(ValueError, match="missing column"):
        overviews.build_level(df.drop("nodata"))
    # duplicate rows for one cell
    dup = spark.createDataFrame(pd.DataFrame(rows + rows), TILE_SCHEMA)
    with pytest.raises(Exception, match="one row per"):
        overviews.build_level(dup).collect()
    # res 0 has no parent
    r0, _ = _grid_tiles(8, 8, [(0, 0)], res=0)
    df0 = spark.createDataFrame(pd.DataFrame(r0), TILE_SCHEMA)
    with pytest.raises(Exception, match="res 0"):
        overviews.build_level(df0).collect()
    # sibling shape mismatch
    rows2, _ = _grid_tiles(8, 8, [(0, 0), (1, 0)])
    arr = np.ones((2, 4, 4), dtype=np.uint16)
    rows2[1].update({"bytes": codec.encode(arr, FMT), "w": 4, "h": 4})
    dfm = spark.createDataFrame(pd.DataFrame(rows2), TILE_SCHEMA)
    with pytest.raises(Exception, match="disagree on w/h/fmt"):
        overviews.build_level(dfm).collect()
    with pytest.raises(ValueError, match="levels must be"):
        overviews.build_pyramid(df, 0)
    # sibling nodata disagreement: every tile in a 2x2 group is decoded
    # with one sentinel, so silent mis-masking must raise instead
    rows3, _ = _grid_tiles(8, 8, [(0, 0), (1, 0)])
    rows3[1]["nodata"] = NODATA + 1
    dfn = spark.createDataFrame(pd.DataFrame(rows3), TILE_SCHEMA)
    with pytest.raises(Exception, match="disagree on nodata"):
        overviews.build_level(dfn).collect()
    # per-band sentinel disagreement raises the same way
    rows4, _ = _grid_tiles(8, 8, [(0, 0), (1, 0)])
    bn = [[float(NODATA), 0.0], [float(NODATA), 65535.0]]
    for r, b in zip(rows4, bn):
        r["band_nodata"] = b
    dfb = spark.createDataFrame(
        pd.DataFrame(rows4), TILE_SCHEMA + ", band_nodata array<double>")
    with pytest.raises(Exception, match="disagree on nodata"):
        overviews.build_level(dfb).collect()


def test_overviews_pipeline_verb_and_bundle(spark, tmp_path, tiny_images):
    from vrtility_spark import datagen
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .composite("median")
         .overviews(1, method="average"))
    got = {r.level: r["count"] for r in
           p.df.groupBy("level").count().collect()}
    # 2x2 tiles per zone x 3 zones -> 12 base, 3 level-1
    assert got == {0: 12, 1: 3}
    bp = str(tmp_path / "ov.json")
    p.to_bundle(bp)
    replay = Pipeline.from_bundle(bp, tiny_images)
    a = {(r.level, r.cell_id): bytes(r.bytes)
         for r in p.df.collect()}
    b = {(r.level, r.cell_id): bytes(r.bytes)
         for r in replay.df.collect()}
    assert a == b
