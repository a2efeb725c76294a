from __future__ import annotations

import numpy as np

from vrtility_spark import codec, datagen, schema, warp


def test_nearest_identity():
    rng = np.random.default_rng(20)
    a = rng.integers(0, 100, (8, 8)).astype(float)
    assert (warp.resample_plane(a, 8, 8, "nearest") == a).all()


def test_bilinear_constant_preserved():
    a = np.full((8, 8), 42.0)
    out = warp.resample_plane(a, 16, 16, "bilinear")
    np.testing.assert_allclose(out, 42.0)


def test_bilinear_gradient_upsample():
    a = np.tile(np.arange(8, dtype=float), (8, 1))
    out = warp.resample_plane(a, 8, 16, "bilinear")
    # monotone along x, endpoints preserved-ish
    assert (np.diff(out[0]) >= 0).all()


def test_average_downsample_exact():
    a = np.arange(16, dtype=float).reshape(4, 4)
    out = warp.resample_plane(a, 2, 2, "average")
    np.testing.assert_allclose(out, [[2.5, 4.5], [10.5, 12.5]])


def test_mask_plane_uses_nearest():
    """Byte/class planes must never be interpolated
    (R/vrt-warp.R:449-456)."""
    arr = np.stack([
        np.tile(np.arange(8, dtype=float), (8, 1)) * 100,
        np.where(np.add.outer(np.arange(8), np.arange(8)) % 2 == 0, 4, 9),
    ])
    out = warp.warp_np(arr, 16, 16, "bilinear")
    assert set(np.unique(out[1])) <= {4.0, 9.0}  # class codes intact
    assert len(np.unique(out[0])) > len(np.unique(arr[0]))  # interpolated


def test_warp_to_grid_spark(spark, tiny_images):
    out = warp.warp_to_grid(tiny_images.limit(4), 8, 8, "bilinear").toPandas()
    for _, r in out.iterrows():
        arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
        assert arr.shape == (5, 8, 8)
        assert set(np.unique(arr[-1])) <= {0, 4, 5, 8, 9, 10, 11}


def test_assign_cells_deterministic(spark, tiny_images, tiny_images_pdf):
    df = warp.assign_cells(tiny_images, datagen.TILE_RES).select(
        "image_id", "cell_id", "cell_prefix").toPandas()
    from vrtility_spark import cells
    for _, r in df.sample(10, random_state=0).iterrows():
        src = tiny_images_pdf[tiny_images_pdf.image_id == r.image_id].iloc[0]
        exp = cells.xy_to_cell_np(src.zone, (src.xmin + src.xmax) / 2,
                                  (src.ymin + src.ymax) / 2, datagen.TILE_RES)
        assert r.cell_id == exp
        assert r.cell_prefix == cells.parent_np(exp, 2)


def test_conv_kernels_preserve_constants():
    """Normalized kernels are a partition of unity: constants invariant
    under cubic/cubicspline/lanczos at any scale factor."""
    a = np.full((8, 8), 42.0)
    for m in ("cubic", "cubicspline", "lanczos"):
        np.testing.assert_allclose(warp.resample_plane(a, 16, 16, m), 42.0)
        np.testing.assert_allclose(warp.resample_plane(a, 5, 7, m), 42.0)


def test_cubic_reproduces_linear_ramp():
    """Catmull-Rom is an interpolating kernel: exact on linear signals
    (away from the clipped border)."""
    a = np.tile(np.arange(16, dtype=float), (16, 1))
    out = warp.resample_plane(a, 16, 31, "cubic")
    f = (np.arange(31) + 0.5) * 16 / 31 - 0.5
    np.testing.assert_allclose(out[8, 4:-4], f[4:-4], atol=1e-9)


def test_lanczos_sharper_than_bspline():
    """cubicspline smooths (non-interpolating); lanczos preserves an
    edge more sharply — the expected kernel ordering."""
    a = np.zeros((8, 16))
    a[:, 8:] = 100.0
    lz = warp.resample_plane(a, 8, 32, "lanczos")
    bs = warp.resample_plane(a, 8, 32, "cubicspline")
    assert np.abs(np.diff(lz[0])).max() > np.abs(np.diff(bs[0])).max()


def test_block_aggregate_reducers_exact():
    a = np.arange(16, dtype=float).reshape(4, 4)
    cases = {
        "sum": [[10.0, 18.0], [42.0, 50.0]],
        "min": [[0.0, 2.0], [8.0, 10.0]],
        "max": [[5.0, 7.0], [13.0, 15.0]],
        "med": [[2.5, 4.5], [10.5, 12.5]],
        "rms": np.sqrt([[10.5, 24.5], [114.5, 160.5]]),
    }
    for m, exp in cases.items():
        np.testing.assert_allclose(warp.resample_plane(a, 2, 2, m), exp)
    q1 = warp.resample_plane(a, 2, 2, "q1")
    q3 = warp.resample_plane(a, 2, 2, "q3")
    med = warp.resample_plane(a, 2, 2, "med")
    assert (q1 <= med).all() and (med <= q3).all()


def test_mode_downsample_ties_and_majority():
    a = np.array([[4, 4, 9, 9],
                  [4, 5, 9, 5],
                  [7, 7, 1, 1],
                  [7, 2, 1, 3]], dtype=float)
    out = warp.resample_plane(a, 2, 2, "mode")
    np.testing.assert_allclose(out, [[4, 9], [7, 1]])
    # tie → smallest value (deterministic)
    t = np.array([[1, 2], [2, 1]], dtype=float)
    np.testing.assert_allclose(warp.resample_plane(t, 1, 1, "mode"), [[1.0]])


def test_block_aggregate_non_divisible_grid():
    a = np.arange(25, dtype=float).reshape(5, 5)
    out = warp.resample_plane(a, 2, 2, "max")
    assert out.shape == (2, 2)
    assert out[1, 1] == 24.0


def test_nodata_aware_bilinear_does_not_blend_sentinel():
    """GDAL srcNodata contract: a nodata sentinel next to valid pixels
    must not leak into interpolated values — weights renormalize over
    the valid contributors; all-invalid regions stay NaN."""
    a = np.full((8, 8), 4000.0)
    a[:, :4] = np.nan  # nodata half (already sentinel->NaN)
    out = warp.resample_plane_masked(a, 8, 16, "bilinear")
    valid = ~np.isnan(out)
    # every valid output equals 4000 exactly (no 0-blend would give 2000)
    np.testing.assert_allclose(out[valid], 4000.0)
    assert np.isnan(out[:, :6]).all()  # deep inside the nodata half


def test_nodata_aware_block_aggs_ignore_invalid():
    a = np.array([[np.nan, 10.0], [20.0, np.nan]])
    assert warp.resample_plane_masked(a, 1, 1, "average") == 15.0
    assert warp.resample_plane_masked(a, 1, 1, "max") == 20.0
    allna = np.full((2, 2), np.nan)
    assert np.isnan(warp.resample_plane_masked(allna, 1, 1, "med"))


def test_warp_to_grid_respects_sentinels(spark, tiny_images):
    """End-to-end: masked payloads warp without sentinel blending —
    every data value in the output is either the sentinel or a blend of
    VALID inputs (here: within the original valid range)."""
    from vrtility_spark import masks
    masked = masks.vrt_set_maskfun(tiny_images.limit(4), "int",
                                   datagen.S2_MASK_VALUES)
    out = warp.warp_to_grid(masked, 8, 8, "bilinear").toPandas()
    for _, r in out.iterrows():
        arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
        data = arr[:-1].astype(np.float64)
        valid = data != r.nodata
        # sentinel is 0 and valid S2 radiances are >= 1: any blend with
        # a sentinel would drag values into (0, min_valid)
        if valid.any():
            assert data[valid].min() >= 1.0


def test_warp_mask_plane_flag(spark, tiny_images):
    """After drop_mask_band the last plane is DATA: mask_plane=False
    must interpolate it like the others (no silent nearest)."""
    from vrtility_spark import masks
    dropped = masks.vrt_set_maskfun(tiny_images.limit(2), "int",
                                    datagen.S2_MASK_VALUES,
                                    drop_mask_band=True)
    out = warp.warp_to_grid(dropped, 32, 32, "bilinear",
                            mask_plane=False).toPandas()
    r = out.iloc[0]
    arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
    assert arr.shape[0] == 4  # mask plane gone
    # upsampled data plane has interpolated (non-input) values
    src = codec.decode(
        masks.vrt_set_maskfun(tiny_images.limit(2), "int",
                              datagen.S2_MASK_VALUES, drop_mask_band=True)
        .toPandas().iloc[0].bytes, 16, 16, r.fmt)
    assert len(np.unique(arr[-1])) > len(np.unique(src[-1]))


def test_per_band_resampling_and_name_keyed_class_rule(spark):
    """Per-band resampling choices (R/vrt-warp.R:418-491) and the
    name/dtype-keyed nearest rule (R/vrt-warp.R:404-415): a class
    plane is protected wherever it sits — NOT only in last position —
    while data planes get their own kernels."""
    import pandas as pd

    from vrtility_spark import schema as S

    rng = np.random.default_rng(3)
    b04 = rng.integers(100, 5000, (8, 8)).astype(np.uint16)
    scl = rng.choice([4, 5, 9], size=(8, 8)).astype(np.uint16)  # middle!
    b08 = rng.integers(100, 5000, (8, 8)).astype(np.uint16)
    arr = np.stack([b04, scl, b08])
    pdf = pd.DataFrame([{
        "image_id": "pbr_0", "bytes": codec.encode(arr, "raw16"),
        "w": 8, "h": 8, "fmt": "raw16", "caption": "per-band resample",
        "phash": 0, "datetime": datagen.date_for(0), "srs": "ZONE:30",
        "zone": 30, "xmin": 0.0, "ymin": 0.0,
        "xmax": datagen.TILE_SPAN, "ymax": datagen.TILE_SPAN,
        "res_x": datagen.TILE_SPAN / 8, "res_y": datagen.TILE_SPAN / 8,
        "bands": ["B04", "SCL", "B08"], "nodata": 0.0,
        "scale": 1.0, "offset": 0.0,
        "band_scale": [1.0, 1.0, 1.0], "band_offset": [0.0, 0.0, 0.0],
        "band_nodata": [0.0, 0.0, 0.0],
        "cloud_cover": 0.0, "platform": "t", "orbit_state": "ascending",
    }])
    df = S.images_df(spark, pdf)

    out = warp.warp_to_grid(
        warp.assign_cells(df, datagen.TILE_RES), 4, 4,
        resampling={"B08": "cubic", "*": "bilinear"},
        mask_plane=False).toPandas().iloc[0]
    got = codec.decode(out.bytes, 4, 4, "raw16")

    def expect(plane, method):
        f = warp.resample_plane_masked(
            codec.to_float_masked(plane[None], 0.0)[0], 4, 4, method)
        return codec.from_float(f[None], 0.0, "uint16")[0]

    np.testing.assert_array_equal(got[0], expect(b04, "bilinear"))
    np.testing.assert_array_equal(got[2], expect(b08, "cubic"))
    # SCL sits in the MIDDLE and mask_plane=False — only the
    # name-keyed rule protects it: nearest, raw codes preserved
    np.testing.assert_array_equal(got[1], scl[::2, ::2])
    assert set(np.unique(got[1])) <= {4, 5, 9}


def test_sample_plane_masked_properties():
    """Property guards for the regrid sampling kernel: bilinear output
    is a convex combination of VALID inputs (bounded by their min/max,
    constants stay constant), outside-extent points return NaN, and
    nearest matches a manual gather."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 2**31 - 1), st.floats(-3, 3), st.floats(-3, 3))
    def check(seed, offy, offx):
        rng = np.random.default_rng(seed)
        a = rng.uniform(10, 100, (5, 7))
        a[rng.random((5, 7)) < 0.2] = np.nan
        fy = np.arange(6) * 0.9 + offy
        fx = np.arange(8) * 0.8 + offx
        bil = warp.sample_plane_masked(a, fy, fx, "bilinear")
        fin = bil[np.isfinite(bil)]
        if len(fin):
            assert fin.min() >= np.nanmin(a) - 1e-9
            assert fin.max() <= np.nanmax(a) + 1e-9
        out_y = (fy < -1) | (fy > 5)
        assert np.isnan(bil[out_y]).all()
        const = np.full((5, 7), 42.0)
        cb = warp.sample_plane_masked(const, fy, fx, "bilinear")
        assert np.all(np.isnan(cb) | (np.abs(cb - 42.0) < 1e-9))
        near = warp.sample_plane_masked(a, fy, fx, "nearest")
        yi = np.round(fy).astype(int)
        xi = np.round(fx).astype(int)
        for i, y in enumerate(yi):
            for j, x in enumerate(xi):
                if 0 <= y < 5 and 0 <= x < 7:
                    v = a[y, x]
                    assert (np.isnan(near[i, j]) and np.isnan(v)) \
                        or near[i, j] == v
                else:
                    assert np.isnan(near[i, j])

    check()
