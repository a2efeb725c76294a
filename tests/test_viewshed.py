"""Viewshed: vectorized R3 line-of-sight kernel vs a per-pixel Python
loop, analytic shapes (flat plane, wall shadow, NaN holes), and the
distributed observer-disk path vs the assembled mosaic — visibility
must cross tile seams exactly up to the cap."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, viewshed
from vrtility_spark.viewshed import OUT_NODATA, viewshed_np

RNG = np.random.default_rng(23)

ZONE, RES = 31, 3  # zone 31: nonzero world origin — catches origin/zone-local mixups
FMT = "raw16"
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def naive_viewshed(dem, oc, orow, obs_h, tgt_h, md):
    """Per-pixel Python restatement of the DDA spec (the deliberately-
    naive oracle)."""
    H, W = dem.shape
    out = np.full((H, W), OUT_NODATA)
    o_ci = int(math.floor(oc + 0.5))
    o_ri = int(math.floor(orow + 0.5))
    if not (0 <= o_ri < H and 0 <= o_ci < W) or np.isnan(dem[o_ri, o_ci]):
        return out
    z_obs = dem[o_ri, o_ci] + obs_h
    for r in range(H):
        for c in range(W):
            dx, dy = c - oc, r - orow
            d = math.hypot(dx, dy)
            if d > md or np.isnan(dem[r, c]):
                continue
            if d == 0:
                out[r, c] = 1.0
                continue
            st = (dem[r, c] + tgt_h - z_obs) / d
            n = int(math.ceil(max(abs(dx), abs(dy))))
            vis = 1.0
            for k in range(1, n):
                t = k / n
                si = int(math.floor(oc + t * dx + 0.5))
                sr = int(math.floor(orow + t * dy + 0.5))
                if (si, sr) in ((c, r), (o_ci, o_ri)):
                    continue
                z = dem[sr, si]
                if np.isnan(z):
                    continue
                if (z - z_obs) / (t * d) >= st:
                    vis = 0.0
                    break
            out[r, c] = vis
    return out


@pytest.mark.parametrize("obs,heights", [
    ((8.2, 6.7), (2.0, 0.0)),
    ((3.0, 3.0), (0.5, 1.5)),
    ((15.9, 0.1), (10.0, 0.0)),
])
def test_viewshed_np_matches_naive(obs, heights):
    dem = RNG.integers(0, 40, (13, 17)).astype(float)
    dem[RNG.random(dem.shape) < 0.08] = np.nan
    oc, orow = obs
    oh, th = heights
    got = viewshed_np(dem, oc, orow, oh, th, 9.5)
    want = naive_viewshed(dem, oc, orow, oh, th, 9.5)
    np.testing.assert_array_equal(got, want)


def test_viewshed_np_flat_plane_all_visible():
    dem = np.full((11, 11), 7.0)
    got = viewshed_np(dem, 5.0, 5.0, 2.0, 0.0, 4.0)
    yy, xx = np.mgrid[0:11, 0:11]
    inside = np.hypot(yy - 5.0, xx - 5.0) <= 4.0
    assert (got[inside] == 1.0).all()
    assert (got[~inside] == OUT_NODATA).all()


def test_viewshed_np_wall_shadow_and_nan_hole():
    dem = np.zeros((9, 9))
    dem[:, 5] = 100.0                       # wall east of the observer
    got = viewshed_np(dem, 2.0, 4.0, 1.0, 0.0, 8.0)
    assert (got[:, 6:][got[:, 6:] != OUT_NODATA] == 0.0).all()
    assert got[4, 5] == 1.0                 # the wall face itself
    assert (got[:, :5][got[:, :5] != OUT_NODATA] == 1.0).all()
    # the same wall as NaN: unknown elevation never blocks, and the
    # NaN pixels themselves always come back OUT_NODATA
    dem2 = np.zeros((9, 9))
    dem2[:, 5] = np.nan
    got2 = viewshed_np(dem2, 2.0, 4.0, 1.0, 0.0, 8.0)
    assert (got2[:, 5] == OUT_NODATA).all()
    assert (got2[:, 6:][got2[:, 6:] != OUT_NODATA] == 1.0).all()
    assert (got2[:, 6:] == 1.0).any()  # beyond-the-hole pixels exist


def test_viewshed_np_unknown_observer_ground():
    dem = np.zeros((5, 5))
    dem[2, 2] = np.nan
    assert (viewshed_np(dem, 2.0, 2.0, 2.0, 0.0, 3.0) == OUT_NODATA).all()
    assert (viewshed_np(dem, 40.0, 2.0, 2.0, 0.0, 3.0) == OUT_NODATA).all()


# ------------------------------------------------- distributed paths ----

def _dem_tiles(h, w, positions, seed=5):
    rng = np.random.default_rng(seed)
    nx = max(p[0] for p in positions) + 1
    ny = max(p[1] for p in positions) + 1
    G = np.full((ny * h, nx * w), np.nan)
    rows = []
    for ix, iy in positions:
        # a few tall spikes so shadows genuinely cross seams
        arr = rng.integers(0, 30, (1, h, w)).astype(float)
        spikes = rng.random((h, w)) < 0.03
        arr[0][spikes] += 400.0
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(np.uint16), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": 60000.0})
        G[iy * h:(iy + 1) * h, ix * w:(ix + 1) * w] = arr[0]
    return rows, G


def _collect(df):
    return {(r["obs_id"], r["cell_id"]):
            (codec.decode(r["bytes"], r["w"], r["h"], r["fmt"]), r)
            for r in df.collect()}


@pytest.mark.parametrize("positions", [
    [(ix, iy) for ix in range(3) for iy in range(3)],   # full grid
    [(0, 0), (1, 0), (0, 1), (1, 1), (2, 1)],           # ragged cover
])
def test_distributed_matches_mosaic(spark, positions):
    h = w = 12
    size = cells.cell_size(RES)
    px = size / w
    rows, G = _dem_tiles(h, w, positions)
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    md = 14.0 * px                       # world units; crosses seams
    obs_pdf = pd.DataFrame([
        {"obs_id": 0, "zone": ZONE,
         "x": 11.3 * px, "y": 12.8 * px},
        {"obs_id": 1, "zone": ZONE,
         "x": 20.0 * px, "y": 6.0 * px},
    ])
    observers = spark.createDataFrame(obs_pdf)
    got = _collect(viewshed.viewshed(df, observers, max_dist=md,
                                     obs_height=3.0, target_height=1.0))
    have = {int(cells.encode_np(ZONE, RES, ix, iy))
            for ix, iy in positions}
    # the output key set is pinned EXACTLY: bbox cover ∩ present tiles
    expected = set()
    for o in obs_pdf.itertuples(index=False):
        cov = cells.cover_bbox_np(ZONE, o.x - md, o.y - md,
                                  o.x + md, o.y + md, RES)
        expected |= {(o.obs_id, int(c)) for c in cov if int(c) in have}
    assert set(got) == expected
    for o in obs_pdf.itertuples(index=False):
        oc = o.x / px - 0.5
        orow = o.y / px - 0.5
        want = viewshed_np(G, oc, orow, 3.0, 1.0, 14.0)
        for oid, cid in expected:
            if oid != o.obs_id:
                continue
            _, _, ix, iy = (int(v) for v in cells.decode_np(cid))
            arr, row = got[(oid, cid)]
            assert row["fmt"] == "raw16" and row["nodata"] == OUT_NODATA
            w_t = want[iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
            np.testing.assert_array_equal(
                arr[0].astype(np.float64), w_t)
    # some pixel somewhere must actually be hidden (spikes cast shadows)
    assert any((a[0] == 0.0).any() for a, _ in got.values())
    assert any((a[0] == 1.0).any() for a, _ in got.values())


def test_observer_over_missing_tile_emits_unknown(spark):
    h = w = 10
    size = cells.cell_size(RES)
    rows, _ = _dem_tiles(h, w, [(0, 0)])
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    # observer stands in the (absent) (1, 0) tile but its disk reaches
    # the present (0, 0) tile → rows exist, all 255 (unknown ground)
    obs = spark.createDataFrame(pd.DataFrame([
        {"obs_id": 7, "zone": ZONE,
         "x": size + 2.0 * (size / w), "y": size / 2}]))
    got = _collect(viewshed.viewshed(df, obs, max_dist=5.0 * (size / w)))
    assert len(got) == 1
    (arr, row), = got.values()
    assert (arr == OUT_NODATA).all()


def test_grid_param_skips_probe_and_matches(spark):
    h = w = 10
    rows, _ = _dem_tiles(h, w, [(0, 0), (1, 0)])
    size = cells.cell_size(RES)
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    obs = spark.createDataFrame(pd.DataFrame([
        {"obs_id": 0, "zone": ZONE, "x": size * 0.9,
         "y": size * 0.4}]))
    md = 6.0 * (size / w)
    a = _collect(viewshed.viewshed(df, obs, max_dist=md))
    b = _collect(viewshed.viewshed(df, obs, max_dist=md,
                                   grid=(RES, w, h)))
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k][0], b[k][0])


def test_viewshed_validation(spark):
    h, w = 4, 8
    cid = int(cells.encode_np(ZONE, RES, 0, 0))
    df = spark.createDataFrame(pd.DataFrame([{
        "cell_id": cid,
        "bytes": codec.encode(np.zeros((1, h, w), np.uint16), FMT),
        "w": w, "h": h, "fmt": FMT, "nodata": 999.0}]), TILE_SCHEMA)
    obs = spark.createDataFrame(viewshed.demo_observers(1, zone=ZONE))
    with pytest.raises(ValueError, match="square"):
        viewshed.viewshed(df, obs, max_dist=10.0)
    with pytest.raises(ValueError, match="max_dist"):
        viewshed.viewshed(df, obs, max_dist=0.0)
    # duplicate rows per cell → loud error
    sq = spark.createDataFrame(pd.DataFrame([{
        "cell_id": cid,
        "bytes": codec.encode(np.zeros((1, 8, 8), np.uint16), FMT),
        "w": 8, "h": 8, "fmt": FMT, "nodata": 999.0}] * 2), TILE_SCHEMA)
    size = cells.cell_size(RES)
    obs2 = spark.createDataFrame(pd.DataFrame([
        {"obs_id": 0, "zone": ZONE, "x": size / 2,
         "y": size / 2}]))
    with pytest.raises(Exception, match="multiple rows"):
        viewshed.viewshed(sq, obs2, max_dist=size / 4).collect()
    # duplicate obs_id at different positions → loud error, not a
    # silently merged disk
    one = spark.createDataFrame(pd.DataFrame([{
        "cell_id": cid,
        "bytes": codec.encode(np.zeros((1, 8, 8), np.uint16), FMT),
        "w": 8, "h": 8, "fmt": FMT, "nodata": 999.0}]), TILE_SCHEMA)
    dup_obs = spark.createDataFrame(pd.DataFrame([
        {"obs_id": 0, "zone": ZONE, "x": size * 0.3, "y": size * 0.3},
        {"obs_id": 0, "zone": ZONE, "x": size * 0.7, "y": size * 0.6},
    ]))
    with pytest.raises(Exception, match="duplicate obs_id"):
        viewshed.viewshed(one, dup_obs, max_dist=size / 4).collect()
