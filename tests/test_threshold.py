"""Automatic thresholding: Otsu vs the naive split-scan oracle,
IsoData's fixpoint property, bimodal closed forms, the exact
distributed histogram vs its single-array twin (repartition
bit-identity), and the classify application end-to-end."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import oracle
from vrtility_spark import cells, codec, threshold

RNG = np.random.default_rng(151)

ZONE, RES = 54, 3
FMT, NODATA = "raw16", 0.0
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def _bimodal(n=4000, seed=3, lo=100, hi=400):
    rng = np.random.default_rng(seed)
    a = np.round(rng.normal(lo, 15, n // 2))
    b = np.round(rng.normal(hi, 20, n - n // 2))
    return np.clip(np.concatenate([a, b]), 1, 60000)


def test_otsu_matches_naive_and_splits_modes():
    vals = _bimodal()
    u, c = threshold.histogram_naive(vals)
    t = threshold.otsu_np(u, c)
    assert t == oracle.otsu_naive(u, c)
    assert 150 < t < 350           # the cut lands between the modes


def test_isodata_fixpoint_property():
    vals = _bimodal(seed=9)
    u, c = threshold.histogram_naive(vals)
    t = threshold.isodata_np(u, c)
    below = u <= t
    mu0 = (c[below] * u[below]).sum() / c[below].sum()
    mu1 = (c[~below] * u[~below]).sum() / c[~below].sum()
    assert t == pytest.approx((mu0 + mu1) / 2.0)
    assert 150 < t < 350


def test_two_value_histogram_closed_form():
    # exactly two values: Otsu cuts at the midpoint regardless of mass
    t = threshold.otsu_np(np.array([10.0, 30.0]),
                          np.array([5, 500]))
    assert t == 20.0
    with pytest.raises(ValueError, match=">= 2 distinct"):
        threshold.otsu_np(np.array([7.0]), np.array([3]))
    with pytest.raises(ValueError, match=">= 2 distinct"):
        threshold.isodata_np(np.array([7.0]), np.array([3]))


# ------------------------------------------- distributed vs the mosaic ----

def _tiles(h, w, positions, seed=19):
    rng = np.random.default_rng(seed)
    rows, planes = [], []
    for ix, iy in positions:
        arr = np.where(rng.random((1, h, w)) < 0.5,
                       np.round(rng.normal(150, 15, (1, h, w))),
                       np.round(rng.normal(420, 25, (1, h, w))))
        arr = np.clip(arr, 1, 60000)
        arr[rng.random(arr.shape) < 0.05] = NODATA
        rows.append({"cell_id": int(cells.encode_np(ZONE, RES, ix, iy)),
                     "bytes": codec.encode(arr.astype(np.uint16), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": NODATA})
        A = arr.astype(np.float64)
        A[A == NODATA] = np.nan
        planes.append(A[0])
    return rows, np.concatenate([p.ravel() for p in planes])


def test_band_histogram_matches_naive_and_repartition(spark):
    rows, flat = _tiles(16, 16, [(0, 0), (1, 0), (0, 1)])
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    u, c = threshold.band_histogram(df, 0)
    wu, wc = threshold.histogram_naive(flat)
    np.testing.assert_array_equal(u, wu)
    np.testing.assert_array_equal(c, wc)
    u2, c2 = threshold.band_histogram(df.repartition(7), 0)
    np.testing.assert_array_equal(u, u2)
    np.testing.assert_array_equal(c, c2)


def test_auto_threshold_distributed_equals_kernel(spark):
    rows, flat = _tiles(16, 16, [(0, 0), (1, 0)])
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    wu, wc = threshold.histogram_naive(flat)
    assert threshold.auto_threshold(df, 0, "otsu") \
        == threshold.otsu_np(wu, wc)
    assert threshold.auto_threshold(df, 0, "isodata") \
        == threshold.isodata_np(wu, wc)
    with pytest.raises(KeyError):
        threshold.auto_threshold(df, 0, "yen")


def test_binned_float_histogram(spark):
    # rawf32 tiles run through the binned path: counts match a manual
    # quantization of the same planes
    h = w = 8
    rng = np.random.default_rng(33)
    plane = rng.uniform(0.0, 1.0, (1, h, w)).astype(np.float32)
    rows = [{"cell_id": int(cells.encode_np(ZONE, RES, 0, 0)),
             "bytes": codec.encode(plane, "rawf32"), "w": w, "h": h,
             "fmt": "rawf32", "nodata": -9999.0}]
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    u, c = threshold.band_histogram(df, 0, bins=16)
    assert len(u) <= 16 and c.sum() == h * w
    P = plane.astype(np.float64)[0]
    lo, hi = P.min(), P.max()
    width = (hi - lo) / 16
    idx = np.minimum((P - lo) / width, 15).astype(np.int64)
    wu, wc = np.unique(lo + (idx + 0.5) * width, return_counts=True)
    np.testing.assert_array_equal(u, wu)
    np.testing.assert_array_equal(c, wc)


def test_threshold_classify_end_to_end(spark):
    rows, flat = _tiles(16, 16, [(0, 0), (1, 0)])
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    out = threshold.threshold_classify(df, 0, "otsu").collect()
    wu, wc = threshold.histogram_naive(flat)
    t = threshold.otsu_np(wu, wc)
    assert all(r.threshold == t for r in out)
    orig = {r["cell_id"]: codec.to_float_masked(
        codec.decode(r["bytes"], r["w"], r["h"], r["fmt"]), NODATA)
        for r in rows}
    for r in out:
        cls = codec.to_float_masked(
            codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
        src = orig[r.cell_id]
        want = np.where(np.isnan(src), np.nan,
                        (src > t).astype(float))
        np.testing.assert_array_equal(cls, want)


def test_pipeline_verb_and_bundle(spark, tmp_path, tiny_images):
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .composite("median")
         .auto_threshold(band=0, method="otsu"))
    rows = p.df.collect()
    assert rows and all(r.fmt == "rawf32" for r in rows)
    ts = {r.threshold for r in rows}
    assert len(ts) == 1                  # one global cut
    bp = str(tmp_path / "otsu.json")
    p.to_bundle(bp)
    replay = Pipeline.from_bundle(bp, tiny_images)
    a = {r.cell_id: bytes(r.bytes) for r in rows}
    b = {r.cell_id: bytes(r.bytes) for r in replay.df.collect()}
    assert a == b
