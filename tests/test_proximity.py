"""Proximity (capped exact EDT): separable kernel vs a brute-force
min-over-targets loop, and the distributed halo path vs the assembled
mosaic — distances must cross tile seams exactly up to the cap."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import oracle
from vrtility_spark import cells, codec, proximity
from vrtility_spark.proximity import OUT_NODATA, proximity_np

RNG = np.random.default_rng(17)

ZONE, RES = 30, 3
FMT = "raw16"
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def brute_edt(P: np.ndarray, values, max_dist: float) -> np.ndarray:
    """min over every target pixel (the deliberately-naive oracle)."""
    B, H, W = P.shape
    out = np.full((B, H, W), np.inf)
    for b in range(B):
        tys, txs = np.nonzero(np.isin(P[b], list(values)))
        if len(tys) == 0:
            continue
        for y in range(H):
            for x in range(W):
                d = np.sqrt((tys - y) ** 2.0 + (txs - x) ** 2.0).min()
                if d <= max_dist:
                    out[b, y, x] = d
    return out


@pytest.mark.parametrize("md", [2.0, 4.5, 7.0])
def test_proximity_np_matches_brute(md):
    P = RNG.integers(0, 4, (2, 13, 17)).astype(float)
    P[RNG.random(P.shape) < 0.1] = np.nan
    got = proximity_np(P, [2.0], md)
    want = brute_edt(P, [2.0], md)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_proximity_np_single_target_field():
    P = np.zeros((1, 9, 9))
    P[0, 4, 4] = 1.0
    got = proximity_np(P, [1.0], 4.0)
    yy, xx = np.mgrid[0:9, 0:9]
    want = np.hypot(yy - 4.0, xx - 4.0)
    want[want > 4.0] = np.inf
    np.testing.assert_allclose(got[0], want, rtol=1e-12)
    assert got[0, 4, 4] == 0.0


def test_proximity_np_no_targets_and_guard():
    assert np.isinf(proximity_np(np.zeros((1, 5, 5)), [9.0], 3.0)).all()
    with pytest.raises(ValueError, match="max_dist"):
        proximity_np(np.zeros((1, 5, 5)), [1.0], 0.4)


# ------------------------------------------------- distributed paths ----

def _tiles(h, w, positions, seed=3):
    rng = np.random.default_rng(seed)
    nx = max(p[0] for p in positions) + 1
    ny = max(p[1] for p in positions) + 1
    G = np.full((ny * h, nx * w), np.nan)
    rows = []
    for ix, iy in positions:
        # sparse targets (class 7) so distances genuinely cross seams
        arr = rng.integers(0, 2, (1, h, w)).astype(float) * 3.0
        hits = rng.random((h, w)) < 0.02
        arr[0][hits] = 7.0
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(np.uint16), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": 999.0})
        G[iy * h:(iy + 1) * h, ix * w:(ix + 1) * w] = arr[0]
    return rows, G


def _collect(df):
    return {r["cell_id"]:
            (codec.decode(r["bytes"], r["w"], r["h"], r["fmt"]), r)
            for r in df.collect()}


@pytest.mark.parametrize("positions", [
    [(ix, iy) for ix in range(3) for iy in range(3)],   # full grid
    [(0, 0), (1, 0), (0, 1)],                           # hole at (1,1)
])
def test_distributed_matches_mosaic(spark, positions):
    h = w = 12
    md = 5.0
    rows, G = _tiles(h, w, positions)
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    got = _collect(proximity.proximity(df, band=0, values=[7.0],
                                       max_dist=md))
    # mosaic oracle: the missing tile is NaN in G → no targets there,
    # exactly what the absent halo strips mean distributedly
    D = brute_edt(G[None], [7.0], md)[0]
    D = np.where(np.isinf(D), md, D)  # beyond="clip"
    for ix, iy in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        arr, row = got[cid]
        assert row["fmt"] == "rawf32" and row["nodata"] == OUT_NODATA
        want = D[iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        enc = codec.from_float(want[None].astype(np.float64), OUT_NODATA,
                               "float32")
        np.testing.assert_array_equal(arr, enc)
    assert any((got[int(cells.encode_np(ZONE, RES, ix, iy))][0] > 0).any()
               for ix, iy in positions)


def test_geo_units_and_nodata_beyond(spark):
    h = w = 10
    rows, G = _tiles(h, w, [(0, 0)], seed=9)
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    px = _collect(proximity.proximity(df, values=[7.0], max_dist=4.0))
    geo = _collect(proximity.proximity(df, values=[7.0], max_dist=4.0,
                                       units="geo"))
    cid = next(iter(px))
    _, _, size = cells.cell_frame_np(cid)
    scale = float(size) / w
    a = px[cid][0].astype(np.float64)
    g = geo[cid][0].astype(np.float64)
    m = a != OUT_NODATA
    np.testing.assert_allclose(g[m], (a[m] * scale).astype(np.float32),
                               rtol=1e-6)
    nd = _collect(proximity.proximity(df, values=[7.0], max_dist=4.0,
                                      beyond="nodata"))[cid][0]
    clip = px[cid][0]
    # beyond-cap pixels (true distance > 4) are sentinel under
    # "nodata" and exactly 4.0 under "clip"; a REAL distance of 4.0
    # stays a value under both, so compare against the brute mask
    rows, G = _tiles(h, w, [(0, 0)], seed=9)
    over = np.isinf(brute_edt(G[None], [7.0], 4.0))
    assert ((nd == OUT_NODATA) == over).all()
    assert (clip[over] == np.float32(4.0)).all()
    both = ~over
    np.testing.assert_array_equal(nd[both], clip[both])


def test_proximity_validation(spark):
    h = w = 8
    rows, _ = _tiles(h, w, [(0, 0)])
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    with pytest.raises(KeyError, match="beyond"):
        proximity.proximity(df, beyond="wat")
    with pytest.raises(KeyError, match="units"):
        proximity.proximity(df, units="furlongs")
    with pytest.raises(Exception, match="out of range"):
        proximity.proximity(df, band=5, values=[7.0],
                            max_dist=3.0).collect()


def test_pipeline_proximity_verb_and_bundle(spark, tiny_images, tmp_path):
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline
    p = (Pipeline(tiny_images)
         .warp(cell_res=datagen.TILE_RES)
         .composite("first")
         .proximity(band=-1, values=[9.0], max_dist=4.0))
    rows = p.df.collect()
    assert len(rows) == 12 and rows[0].fmt == "rawf32"
    bundle = p.to_bundle(str(tmp_path / "b.json"))
    assert any(v["verb"] == "proximity" for v in bundle["verbs"])
    from vrtility_spark.pipeline import Pipeline as P2
    replay = P2.from_bundle(str(tmp_path / "b.json"), tiny_images)
    got = {r.cell_id: r.bytes for r in replay.df.collect()}
    assert got == {r.cell_id: r.bytes for r in rows}


def test_positive_band_index_and_nonsquare_guard(spark):
    # regression: band > 0 used to double-apply the subset and raise
    h = w = 10
    rng = np.random.default_rng(31)
    arr = np.zeros((3, h, w))
    arr[2] = rng.integers(0, 2, (h, w)) * 7.0  # targets live in plane 2
    cid = int(cells.encode_np(ZONE, RES, 1, 1))
    df = spark.createDataFrame(pd.DataFrame([{
        "cell_id": cid, "bytes": codec.encode(arr.astype(np.uint16), FMT),
        "w": w, "h": h, "fmt": FMT, "nodata": 999.0}]), TILE_SCHEMA)
    got = _collect(proximity.proximity(df, band=2, values=[7.0],
                                       max_dist=3.0))[cid][0]
    D = brute_edt(arr[2][None], [7.0], 3.0)[0]
    want = codec.from_float(np.where(np.isinf(D), 3.0, D)[None],
                            OUT_NODATA, "float32")
    np.testing.assert_array_equal(got, want)
    # non-square pixels → loud error, not silently non-Euclidean output
    df2 = spark.createDataFrame(pd.DataFrame([{
        "cell_id": cid,
        "bytes": codec.encode(np.zeros((1, 4, 8), np.uint16), FMT),
        "w": 8, "h": 4, "fmt": FMT, "nodata": 999.0}]), TILE_SCHEMA)
    with pytest.raises(Exception, match="non-square"):
        proximity.proximity(df2, values=[7.0], max_dist=2.0).collect()


# ------------------------------------------------- euclidean allocation ----

def test_allocation_kernel_matches_walk_oracle():
    rng = np.random.default_rng(77)
    P = np.where(rng.random((12, 14)) < 0.08, 1.0, 0.0)
    V = np.round(rng.uniform(10, 99, (12, 14)))
    got = proximity.allocation_np(P, V, (1.0,), 5.0)
    want = oracle.allocation_walk(P, V, (1.0,), 5.0)
    np.testing.assert_array_equal(got, want)


def test_allocation_two_seeds_split_plane():
    # two seeds at opposite ends: the plane splits at the midline,
    # ties (equidistant) go to the northern/leftmost seed
    P = np.zeros((5, 9))
    P[2, 0] = P[2, 8] = 1.0
    V = np.zeros((5, 9))
    V[2, 0], V[2, 8] = 7.0, 9.0
    out = proximity.allocation_np(P, V, (1.0,), 10.0)
    assert (out[:, :4] == 7.0).all()
    assert (out[:, 5:] == 9.0).all()
    assert (out[:, 4] == 7.0).all()     # exact midline: left seed wins


def test_allocation_cap_and_empty():
    P = np.zeros((6, 6))
    P[0, 0] = 1.0
    V = np.full((6, 6), 3.0)
    out = proximity.allocation_np(P, V, (1.0,), 2.0)
    assert out[0, 0] == 3.0 and np.isnan(out[5, 5])
    out2 = proximity.allocation_np(np.zeros((4, 4)), V[:4, :4],
                                   (1.0,), 2.0)
    assert np.isnan(out2).all()


def test_allocation_distributed_matches_mosaic(spark):
    # seeds near seams: strips must carry BOTH planes so the value of
    # a cross-seam nearest seed propagates
    h = w = 8
    positions = [(0, 0), (1, 0), (0, 1), (1, 1)]
    rng = np.random.default_rng(55)
    cls = np.where(rng.random((16, 16)) < 0.06, 1.0, 0.0)
    cls[7, 8] = cls[8, 7] = 1.0          # seam-adjacent seeds
    val = np.round(rng.uniform(10, 99, (16, 16)))
    rows = []
    for ix, iy in positions:
        sl = np.s_[iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        tile = np.stack([cls[sl] + 1.0, val[sl]])  # +1: keep 0 valid
        rows.append({"cell_id": int(cells.encode_np(ZONE, RES, ix, iy)),
                     "bytes": codec.encode(tile.astype(np.uint16),
                                           "raw16"),
                     "w": w, "h": h, "fmt": "raw16", "nodata": 0.0})
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    out = proximity.allocation(df, band=0, value_band=1,
                               values=(2.0,), max_dist=4.0)
    got = {r.cell_id: codec.to_float_masked(
        codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
        for r in out.collect()}
    r = 4
    padP = np.full((16 + 2 * r, 16 + 2 * r), np.nan)
    padV = padP.copy()
    padP[r:-r, r:-r] = cls + 1.0
    padV[r:-r, r:-r] = val
    wantM = proximity.allocation_np(padP, padV, (2.0,), 4.0)[
        r:-r, r:-r]
    for ix, iy in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        want = wantM[iy * h:(iy + 1) * h,
                     ix * w:(ix + 1) * w].astype(np.float32)[None]
        np.testing.assert_allclose(got[cid], want, rtol=0, atol=0,
                                   equal_nan=True)


def test_allocation_pipeline_verb_and_bundle(spark, tmp_path,
                                             tiny_images):
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .composite("median")
         .auto_threshold(band=1)          # 0/1 seed plane
         .allocation(band=0, values=(1.0,), max_dist=3.0))
    rows = p.df.collect()
    assert rows and all(r.fmt == "rawf32" for r in rows)
    bp = str(tmp_path / "alloc.json")
    p.to_bundle(bp)
    replay = Pipeline.from_bundle(bp, tiny_images)
    a = {r.cell_id: bytes(r.bytes) for r in rows}
    b = {r.cell_id: bytes(r.bytes) for r in replay.df.collect()}
    assert a == b
