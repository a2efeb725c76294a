"""Per-band scale/offset/nodata (F2/F3 upgrade): the reference carries
scale/offset PER BAND (/root/reference/R/vrt-collect.R:139-148) and
type-dependent nodata per band (R/gdalraster-tools.R:118-135). A mixed
profile — HLS-style 1e-4-scaled reflectance next to an unscaled DN band
and a raw class plane, each with its own sentinel — must mask and scale
per plane, not with one row-level scalar."""

from __future__ import annotations

import numpy as np
import pandas as pd

from vrtility_spark import bands, codec, composite, datagen, masks, schema, warp

W = H = 8
MIX_BANDS = ["REFL", "DN", "SCL"]
ND = [-9999.0, 0.0, 0.0]
SC = [1e-4, 1.0, 1.0]
OF = [0.1, 0.0, 0.0]


def _mixed_pdf(n_scenes=4, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for t in range(n_scenes):
        refl = rng.integers(1, 10000, (H, W)).astype(np.int16)
        dn = rng.integers(1, 30000, (H, W)).astype(np.int16)
        scl = np.full((H, W), 4, dtype=np.int16)
        scl[rng.random((H, W)) < 0.2] = 9  # cloud class
        refl[rng.random((H, W)) < 0.15] = -9999  # REFL's own sentinel
        dn[rng.random((H, W)) < 0.15] = 0        # DN's own sentinel
        arr = np.stack([refl, dn, scl])
        dt = datagen.date_for(t)
        rows.append({
            "image_id": f"mix_{t}", "bytes": codec.encode(arr, "raw16s"),
            "w": W, "h": H, "fmt": "raw16s", "caption": f"mix scene {t}",
            "phash": t, "datetime": dt, "srs": "ZONE:30", "zone": 30,
            "xmin": 0.0, "ymin": 0.0,
            "xmax": datagen.TILE_SPAN, "ymax": datagen.TILE_SPAN,
            "res_x": datagen.TILE_SPAN / W, "res_y": datagen.TILE_SPAN / H,
            "bands": MIX_BANDS, "nodata": -9999.0,
            "scale": 1.0, "offset": 0.0,
            "band_scale": SC, "band_offset": OF, "band_nodata": ND,
            "cloud_cover": 10.0, "platform": "mix", "orbit_state": "ascending",
        })
    return pd.DataFrame(rows)


def test_derived_band_per_band_scale_offset_nodata(spark):
    pdf = _mixed_pdf()
    df = schema.images_df(spark, pdf)
    out = bands.derived_band(
        df, "RATIO", lambda b: b["REFL"] / b["DN"]).toPandas()
    for _, row in out.iterrows():
        src = pdf[pdf.image_id == row.image_id].iloc[0]
        raw = codec.decode(src.bytes, W, H, "raw16s")
        got = codec.decode(row.bytes, W, H, "rawf32")
        refl = np.where(raw[0] == -9999, np.nan,
                        raw[0].astype(np.float32) * np.float32(1e-4)
                        + np.float32(0.1))
        dn = np.where(raw[1] == 0, np.nan, raw[1].astype(np.float32))
        np.testing.assert_allclose(got[0], refl, rtol=1e-6)      # REFL plane
        np.testing.assert_allclose(got[1], dn, rtol=1e-6)        # DN plane
        with np.errstate(invalid="ignore"):
            np.testing.assert_allclose(got[2], refl / dn, rtol=1e-6)
        np.testing.assert_array_equal(got[3], raw[2])            # SCL raw
        assert list(row.bands) == ["REFL", "DN", "RATIO", "SCL"]
        assert row.band_scale is None  # physical units now


def test_composite_per_band_nodata(spark):
    """Masked median over the mixed profile: each plane excludes ITS
    OWN sentinel (REFL=-9999, DN=0), not one row-level value — exact
    vs a per-plane NumPy oracle."""
    pdf = _mixed_pdf()
    df = schema.images_df(spark, pdf)
    masked = masks.vrt_set_maskfun(df, "int", [9])
    celled = warp.assign_cells(masked, datagen.TILE_RES)
    got = composite.composite(celled, "median", compute_dtype="float64") \
        .toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert list(row.band_nodata) == ND

    stack = []
    for _, r in pdf.sort_values("datetime", kind="mergesort").iterrows():
        arr = codec.decode(r.bytes, W, H, "raw16s").astype(np.float64)
        cloud = arr[2] == 9
        arr[0][cloud] = -9999  # set_mask writes each plane's OWN sentinel
        arr[1][cloud] = 0.0
        arr[0][arr[0] == -9999] = np.nan
        arr[1][arr[1] == 0] = np.nan
        arr[2][arr[2] == 0] = np.nan  # SCL plane sentinel is 0
        stack.append(arr)
    with np.errstate(all="ignore"):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            med = np.nanmedian(np.stack(stack), axis=0)
    exp = codec.from_float(med, np.asarray(ND), "int16")
    np.testing.assert_array_equal(
        codec.decode(row.bytes, W, H, "raw16s"), exp)


def test_subset_and_move_permute_band_meta(spark):
    pdf = _mixed_pdf(n_scenes=1)
    df = schema.images_df(spark, pdf)
    sub = bands.subset_bands(df, ["DN", "SCL"]).toPandas().iloc[0]
    assert list(sub.bands) == ["DN", "SCL"]
    assert list(sub.band_nodata) == [0.0, 0.0]
    assert list(sub.band_scale) == [1.0, 1.0]
    assert list(sub.band_offset) == [0.0, 0.0]
    mv = bands.move_band(df, "DN", 1).toPandas().iloc[0]
    assert list(mv.bands) == ["DN", "REFL", "SCL"]
    assert list(mv.band_scale) == [1.0, 1e-4, 1.0]
    add = bands.add_empty_band(df, "EXTRA").toPandas().iloc[0]
    assert list(add.bands) == MIX_BANDS + ["EXTRA"]
    assert list(add.band_nodata) == ND + [-9999.0]
    assert list(add.band_scale) == SC + [1.0]


def test_warp_to_grid_per_band_sentinels(spark):
    """Nodata-aware resampling must honor each plane's own sentinel:
    REFL's -9999 and DN's 0 pixels may not bleed into valid values."""
    pdf = _mixed_pdf(n_scenes=1)
    df = schema.images_df(spark, pdf)
    out = warp.warp_to_grid(warp.assign_cells(df, datagen.TILE_RES),
                            4, 4, resampling="average").toPandas().iloc[0]
    raw = codec.decode(pdf.iloc[0].bytes, W, H, "raw16s")
    got = codec.decode(out.bytes, 4, 4, "raw16s")
    for b, nd in ((0, -9999), (1, 0)):
        plane = raw[b].astype(np.float64)
        plane[plane == nd] = np.nan
        blocks = plane.reshape(4, 2, 4, 2).transpose(0, 2, 1, 3) \
            .reshape(4, 4, 4)
        with np.errstate(all="ignore"):
            import warnings
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                exp = np.nanmean(blocks, axis=-1)
        exp = np.where(np.isnan(exp), nd, np.round(exp))
        np.testing.assert_array_equal(got[b].astype(np.float64), exp)
    np.testing.assert_array_equal(  # mask plane: nearest, raw codes
        got[2], raw[2][::2, ::2])  # src = round((dst+.5)*2-.5) = 2*dst


def test_set_scale_and_nodata_sequences(spark):
    pdf = _mixed_pdf(n_scenes=1)
    df = schema.images_df(spark, pdf)
    out = bands.set_scale(df, [2.0, 3.0, 1.0], [0.5, 0.0, 0.0])
    out = bands.set_nodata(out, [-1.0, -2.0, 0.0]).toPandas().iloc[0]
    assert list(out.band_scale) == [2.0, 3.0, 1.0]
    assert list(out.band_offset) == [0.5, 0.0, 0.0]
    assert list(out.band_nodata) == [-1.0, -2.0, 0.0]
    # scalar form still sets the row-level columns
    s = bands.set_scale(df, 5.0, 1.0).toPandas().iloc[0]
    assert s.scale == 5.0 and s.offset == 1.0


def test_scalar_set_meta_is_authoritative(spark):
    """Scalar set_scale/set_nodata must beat stale per-band arrays:
    every decode path prefers band_* arrays, so the scalar forms clear
    them — otherwise set_nodata(df, -1.0) on a standard frame is
    silently ignored."""
    pdf = _mixed_pdf()
    df = schema.images_df(spark, pdf)
    s = bands.set_scale(df, 2.0, 0.5).toPandas().iloc[0]
    assert s.scale == 2.0 and s.offset == 0.5
    assert s.band_scale is None and s.band_offset is None
    n = bands.set_nodata(df, -1.0).toPandas().iloc[0]
    assert n.nodata == -1.0 and n.band_nodata is None

    # behavioral: with the scalar sentinel -1.0 declared, REFL's -9999
    # pixels are real data again and survive into the composite
    base = composite.composite(
        warp.assign_cells(df, datagen.TILE_RES), "median",
        compute_dtype="float64").toPandas().iloc[0]
    redecl = composite.composite(
        warp.assign_cells(bands.set_nodata(df, -1.0), datagen.TILE_RES),
        "median", compute_dtype="float64").toPandas().iloc[0]
    assert bytes(redecl.bytes) != bytes(base.bytes)
    assert redecl.nodata == -1.0 and redecl.band_nodata is None
