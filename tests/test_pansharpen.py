"""Pan-sharpening: closed-form kernels, identity/ratio invariants, NaN
poisoning, the fidelity claim (sharpened beats naive upsample against
a high-res truth), and the distributed join semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, pansharpen
from vrtility_spark.pansharpen import OUT_NODATA, pansharpen_np
from vrtility_spark.warp import resample_plane_masked

RNG = np.random.default_rng(23)

ZONE, RES = 30, 3
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def test_constant_bands_closed_form():
    ms = np.stack([np.full((4, 4), v) for v in (30.0, 60.0, 90.0)])
    pan = np.full((8, 8), 120.0)
    out = pansharpen_np(ms, pan, "brovey")
    # intensity = 60, ratio = 2 → bands double
    np.testing.assert_allclose(out[0], 60.0)
    np.testing.assert_allclose(out[2], 180.0)
    add = pansharpen_np(ms, pan, "additive")
    np.testing.assert_allclose(add[1], 60.0 + (120.0 - 60.0))


def test_pan_equals_intensity_is_identity():
    ms = RNG.uniform(100, 4000, (3, 6, 6))
    up = np.stack([resample_plane_masked(p, 12, 12, "bilinear")
                   for p in ms])
    pan = up.mean(axis=0)
    for method in ("brovey", "additive"):
        out = pansharpen_np(ms, pan, method)
        np.testing.assert_allclose(out, up, rtol=1e-12)


def test_nan_poisoning_and_guards():
    ms = np.ones((2, 4, 4)) * 100.0
    ms[0, 0, 0] = np.nan
    pan = np.ones((8, 8)) * 50.0
    pan[7, 7] = np.nan
    out = pansharpen_np(ms, pan, "brovey")
    assert np.isnan(out[:, 7, 7]).all()       # pan hole poisons all
    assert np.isnan(out[0, 0, 0])             # ms hole upsamples to NaN
    zero = pansharpen_np(np.zeros((2, 4, 4)), pan, "brovey")
    assert np.isnan(zero).all()               # zero intensity → NaN
    with pytest.raises(KeyError, match="method"):
        pansharpen_np(ms, pan, "ihs")
    with pytest.raises(ValueError, match="coarser"):
        pansharpen_np(ms, np.ones((2, 2)))
    with pytest.raises(ValueError, match="weights"):
        pansharpen_np(ms, pan, weights=[1.0, 2.0, 3.0])


def test_sharpened_beats_naive_upsample():
    """Each method against the signal model it assumes: brovey wants
    bands ∝ intensity (ratio injection); additive wants a shared
    offset + detail (difference injection). In both cases the
    sharpened result must beat plain bilinear upsampling by a wide
    margin against the high-res truth."""
    yy, xx = np.mgrid[0:16, 0:16] / 16.0
    base = 1000 + 900 * np.sin(2 * np.pi * (xx + yy) / 1.7)
    # proportional bands → brovey's model
    truth_p = np.stack([base * (0.6 + 0.3 * b) for b in range(3)])
    # offset bands → additive's model
    truth_a = np.stack([base + 200.0 * b for b in range(3)])
    for truth, method in ((truth_p, "brovey"), (truth_a, "additive")):
        ms = truth.reshape(3, 8, 2, 8, 2).mean(axis=(2, 4))
        pan = truth.mean(axis=0)
        out = pansharpen_np(ms, pan, method)
        naive = np.stack([resample_plane_masked(p, 16, 16, "bilinear")
                          for p in ms])
        err_s = float(((out - truth) ** 2).mean())
        err_n = float(((naive - truth) ** 2).mean())
        assert err_s < err_n * 0.1, (method, err_s, err_n)


def test_distributed_join_and_encoding(spark):
    h = w = 8
    H = W = 16
    rows_ms, rows_pan, want = [], [], {}
    for ix in (1, 2):
        cid = int(cells.encode_np(ZONE, RES, ix, 1))
        ms = np.round(RNG.uniform(100, 4000, (3, h, w)))
        panp = np.round(RNG.uniform(100, 4000, (1, H, W)))
        rows_ms.append({"cell_id": cid,
                        "bytes": codec.encode(ms.astype(np.uint16),
                                              "raw16"),
                        "w": w, "h": h, "fmt": "raw16", "nodata": 0.0})
        if ix == 1:  # second cell has no pan tile → drops
            rows_pan.append({"cell_id": cid,
                             "bytes": codec.encode(
                                 panp.astype(np.uint16), "raw16"),
                             "w": W, "h": H, "fmt": "raw16",
                             "nodata": 0.0})
            A = codec.to_float_masked(ms.astype(np.uint16), 0.0)
            P = codec.to_float_masked(panp.astype(np.uint16), 0.0)[0]
            want[cid] = codec.from_float(
                pansharpen_np(A, P, "brovey"), OUT_NODATA, "float32")
    ms_df = spark.createDataFrame(pd.DataFrame(rows_ms), TILE_SCHEMA)
    pan_df = spark.createDataFrame(pd.DataFrame(rows_pan), TILE_SCHEMA)
    got = {r["cell_id"]: (codec.decode(r["bytes"], r["w"], r["h"],
                                       r["fmt"]), r)
           for r in pansharpen.pansharpen(ms_df, pan_df).collect()}
    assert set(got) == set(want)  # inner-join: unmatched cell dropped
    for cid, arr in want.items():
        np.testing.assert_array_equal(got[cid][0], arr)
        row = got[cid][1]
        assert (row["w"], row["h"], row["fmt"]) == (16, 16, "rawf32")
        assert row["nodata"] == OUT_NODATA


def test_distributed_ms_band_subset(spark):
    h, H = 4, 8
    cid = int(cells.encode_np(ZONE, RES, 3, 3))
    ms = np.round(RNG.uniform(100, 4000, (5, h, h)))
    panp = np.round(RNG.uniform(100, 4000, (1, H, H)))
    ms_df = spark.createDataFrame(pd.DataFrame([{
        "cell_id": cid, "bytes": codec.encode(ms.astype(np.uint16),
                                              "raw16"),
        "w": h, "h": h, "fmt": "raw16", "nodata": 0.0}]), TILE_SCHEMA)
    pan_df = spark.createDataFrame(pd.DataFrame([{
        "cell_id": cid, "bytes": codec.encode(panp.astype(np.uint16),
                                              "raw16"),
        "w": H, "h": H, "fmt": "raw16", "nodata": 0.0}]), TILE_SCHEMA)
    out = pansharpen.pansharpen(ms_df, pan_df, ms_bands=[0, 1, 2],
                                method="additive").collect()[0]
    dec = codec.decode(out["bytes"], out["w"], out["h"], out["fmt"])
    assert dec.shape == (3, 8, 8)
    A = codec.to_float_masked(ms.astype(np.uint16), 0.0)[:3]
    P = codec.to_float_masked(panp.astype(np.uint16), 0.0)[0]
    np.testing.assert_array_equal(
        dec, codec.from_float(pansharpen_np(A, P, "additive"),
                              OUT_NODATA, "float32"))


def test_pipeline_pansharpen_verb_unbundleable(spark, tiny_images, tmp_path):
    import pytest as _pytest
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline
    comp = (Pipeline(tiny_images)
            .warp(cell_res=datagen.TILE_RES).composite("median"))
    pan = comp.df.selectExpr(
        "cell_id", "bytes", "w", "h", "fmt", "nodata")
    p = comp.pansharpen(pan, method="additive", ms_bands=[0, 1, 2])
    rows = p.df.collect()
    assert len(rows) == 12 and rows[0].fmt == "rawf32"
    with _pytest.raises(ValueError):
        p.to_bundle(str(tmp_path / "b.json"))


def test_band_metadata_subset_and_pan_fallback(spark):
    h, H = 4, 8
    cid = int(cells.encode_np(ZONE, RES, 2, 2))
    ms = np.round(RNG.uniform(100, 4000, (4, h, h)))
    panp = np.round(RNG.uniform(100, 4000, (1, H, H)))
    sch = (TILE_SCHEMA + ", bands array<string>, "
           "band_scale array<double>, band_nodata array<double>")
    ms_df = spark.createDataFrame(pd.DataFrame([{
        "cell_id": cid, "bytes": codec.encode(ms.astype(np.uint16),
                                              "raw16"),
        "w": h, "h": h, "fmt": "raw16", "nodata": 0.0,
        "bands": ["B02", "B03", "B04", "B08"],
        "band_scale": [1e-4] * 4, "band_nodata": [0.0] * 4}]), sch)
    # pan band_nodata array MISALIGNED with its plane count → the
    # scalar fallback applies instead of a broadcast crash
    pan_df = spark.createDataFrame(pd.DataFrame([{
        "cell_id": cid, "bytes": codec.encode(panp.astype(np.uint16),
                                              "raw16"),
        "w": H, "h": H, "fmt": "raw16", "nodata": 0.0,
        "bands": None, "band_scale": None,
        "band_nodata": [0.0, 0.0, 0.0]}]), sch)
    out = pansharpen.pansharpen(ms_df, pan_df, ms_bands=[0, 2],
                                method="additive").collect()[0]
    assert out["bands"] == ["B02", "B04"]   # names follow the subset
    assert out["band_scale"] is None        # stale scales nulled
    assert out["band_nodata"] is None
    dec = codec.decode(out["bytes"], out["w"], out["h"], out["fmt"])
    assert dec.shape == (2, 8, 8)
