"""Classify + contour polygons: classify_np vs a per-pixel loop, the
distributed classify map vs the mosaic, and contour_polygons vs
labeling the classified mosaic (levels crossing tile seams)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vrtility_spark import cells, codec
from vrtility_spark.algebra import classify, classify_np
from vrtility_spark.regions import PID_RADIX, contour_polygons, label_np

ZONE, RES = 41, 3
W = H = 8
FMT, NODATA = "raw16", 0.0
SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
          "nodata double")
BREAKS = [1000.0, 2000.0, 3000.0]


def _tiles(seed=3, positions=((0, 0), (1, 0), (0, 1), (1, 1))):
    rng = np.random.default_rng(seed)
    nx = max(p[0] for p in positions) + 1
    ny = max(p[1] for p in positions) + 1
    G = np.full((ny * H, nx * W), np.nan)
    rows = []
    for ix, iy in positions:
        # smooth-ish field so levels form multi-tile regions
        yy, xx = np.mgrid[0:H, 0:W]
        base = 2000 + 1500 * np.sin((xx + ix * W) / 5.0) \
            + 900 * np.cos((yy + iy * H) / 4.0)
        arr = np.round(base + rng.normal(0, 50, (H, W)))
        arr = np.clip(arr, 1, 4000)
        arr[rng.random(arr.shape) < 0.1] = NODATA
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(
                         arr[None].astype(np.uint16), FMT),
                     "w": W, "h": H, "fmt": FMT, "nodata": NODATA})
        A = arr.astype(float)
        A[A == NODATA] = np.nan
        G[iy * H:(iy + 1) * H, ix * W:(ix + 1) * W] = A
    return rows, G


def test_classify_np_matches_loop():
    rng = np.random.default_rng(1)
    A = rng.uniform(0, 4000, (2, 6, 6))
    A[0, 0, 0] = np.nan
    got = classify_np(A, BREAKS)
    for b in range(2):
        for i in range(6):
            for j in range(6):
                v = A[b, i, j]
                if np.isnan(v):
                    assert np.isnan(got[b, i, j])
                    continue
                k = sum(v >= br for br in BREAKS)
                assert got[b, i, j] == k
    with pytest.raises(ValueError):
        classify_np(A, [])
    with pytest.raises(ValueError):
        classify_np(A, [3.0, 1.0])


def test_classify_distributed_matches_mosaic(spark):
    rows, G = _tiles()
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["cell_id"]: r for r in classify(df, BREAKS).collect()}
    exp = classify_np(G[None], BREAKS)[0]
    for r in rows:
        _, _, ix, iy = (int(v) for v in cells.decode_np(r["cell_id"]))
        o = out[r["cell_id"]]
        A = codec.to_float_masked(
            codec.decode(o["bytes"], W, H, o["fmt"]), o["nodata"])[0]
        np.testing.assert_array_equal(
            A, exp[iy * H:(iy + 1) * H, ix * W:(ix + 1) * W])
        assert o["fmt"] == "rawf32" and o["nodata"] == -9999.0


def test_classify_no_exchange(spark):
    rows, _ = _tiles()
    df = spark.createDataFrame(rows, SCHEMA)
    plan = classify(df, BREAKS)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def _mosaic_contours(G):
    C = classify_np(G[None], BREAKS)[0]
    valid = np.isfinite(C)
    L = label_np(np.where(valid, C, np.nan), valid)
    rows = []
    for lb in np.unique(L[L >= 0]):
        ys, xs = np.nonzero(L == lb)
        pids = []
        for y, x in zip(ys, xs):
            cid = int(cells.encode_np(ZONE, RES, x // W, y // H))
            pids.append(cid * PID_RADIX + (y % H) * W + (x % W))
        lvl = int(C[ys[0], xs[0]])
        rows.append((min(pids), len(ys), lvl,
                     BREAKS[lvl - 1] if lvl >= 1 else None,
                     BREAKS[lvl] if lvl < len(BREAKS) else None))
    return sorted(rows)


def test_contour_matches_mosaic(spark):
    rows, G = _tiles()
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted((r["region_id"], r["pixel_count"], r["level"],
                  r["level_min"], r["level_max"])
                 for r in contour_polygons(df, BREAKS).collect())
    exp = _mosaic_contours(G)
    assert got == exp
    # the fixture must actually produce open-ended and seam regions
    levels = {g[2] for g in got}
    assert 0 in levels or len(BREAKS) in levels
    assert any(g[3] is None or g[4] is None for g in got)


def test_pipeline_classify_contour_sample_verbs(spark, tiny_images,
                                                tmp_path):
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline

    base = (Pipeline(tiny_images)
            .set_maskfun("int", datagen.S2_MASK_VALUES)
            .warp(cell_res=datagen.TILE_RES)
            .composite("median"))
    # classify chains and bundles
    p = base.classify([2000.0, 3500.0, 5000.0], band=0)
    rows = p.df.collect()
    assert rows and all(r["fmt"] == "rawf32" for r in rows)
    bundle = p.to_bundle(str(tmp_path / "b.json"))
    assert bundle["verbs"][-1]["verb"] == "classify"
    rebuilt = Pipeline.from_bundle(str(tmp_path / "b.json"), tiny_images)
    assert {r["cell_id"] for r in rebuilt.df.collect()} \
        == {r["cell_id"] for r in rows}
    # contour is terminal and matches composing the pieces
    regs = base.contour([2000.0, 3500.0, 5000.0], band=0)
    assert "level_min" in regs.columns and regs.count() > 0
    # sample_points is terminal
    pts = spark.createDataFrame(
        [(0, 30, 40000.0, 40000.0)],
        "point_id long, zone long, x double, y double")
    vals = base.sample_points(pts, method="bilinear")
    assert vals.count() == 5  # one row per band
