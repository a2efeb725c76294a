"""Cost-distance accumulation: the multi-source Dijkstra kernel vs
the naive Bellman-Ford fixpoint oracle, closed forms (octile metric on
uniform friction, walls forcing detours), and the distributed
strip-exchange product vs one assembled mosaic — including optimal
paths crossing several tile seams."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import oracle
from vrtility_spark import cells, codec, costdist

RNG = np.random.default_rng(73)

ZONE, RES = 52, 3
FMT, NODATA = "raw16", 0.0
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")

#: source-band convention used throughout: 10 marks a source, 1 a
#: plain pixel, 0 is the nodata sentinel (barrier)
SRC_ON, SRC_OFF, THR = 10.0, 1.0, 5.0


# ----------------------------------------------------- kernel oracles ----

def test_kernel_matches_bellman_on_random_friction():
    cost = np.round(RNG.uniform(1, 50, size=(9, 11)))
    cost[RNG.random(cost.shape) < 0.08] = np.nan
    src = RNG.random(cost.shape) < 0.06
    got = costdist.cost_distance_np(cost, src)
    want = oracle.cost_distance_bellman(cost, src)
    np.testing.assert_allclose(got, want, rtol=0, atol=0,
                               equal_nan=True)


def test_kernel_octile_metric_on_uniform_friction():
    # friction 1 everywhere, single source: accumulated cost is the
    # octile distance max(dy,dx) + (sqrt(2)-1)*min(dy,dx)
    H = W = 11
    cost = np.ones((H, W))
    src = np.zeros((H, W), bool)
    src[5, 5] = True
    acc = costdist.cost_distance_np(cost, src)
    y, x = np.mgrid[0:H, 0:W]
    dy, dx = np.abs(y - 5), np.abs(x - 5)
    lo = np.minimum(dy, dx)
    want = np.maximum(dy, dx) - lo + np.sqrt(2.0) * lo
    np.testing.assert_allclose(acc, want, rtol=0, atol=1e-9)


def test_kernel_wall_forces_detour_and_blocks():
    # a barrier wall with one gap: cost routes through the gap; a
    # sealed chamber stays unreachable (+inf)
    H = W = 7
    cost = np.ones((H, W))
    cost[3, :] = np.nan          # full wall...
    cost[3, 6] = 1.0             # ...with a gap at the east end
    src = np.zeros((H, W), bool)
    src[0, 0] = True
    acc = costdist.cost_distance_np(cost, src)
    assert np.isfinite(acc[6, 0])           # reachable via the gap
    direct = 6.0                            # what a straight run costs
    assert acc[6, 0] > direct               # the detour is longer
    cost2 = cost.copy()
    cost2[3, 6] = np.nan                    # seal the gap
    acc2 = costdist.cost_distance_np(cost2, src)
    assert np.isposinf(acc2[6, 0])          # now unreachable
    assert np.isnan(acc2[3, 0])             # the wall itself: barrier


def test_kernel_high_friction_is_avoided():
    # a cheap corridor around an expensive block beats the straight
    # line: check against the oracle AND that the straight-line cost
    # through friction-100 is strictly worse than the detour cost
    cost = np.ones((5, 9))
    cost[1:4, 3:6] = 100.0
    src = np.zeros((5, 9), bool)
    src[2, 0] = True
    acc = costdist.cost_distance_np(cost, src)
    want = oracle.cost_distance_bellman(cost, src)
    np.testing.assert_allclose(acc, want, rtol=0, atol=0,
                               equal_nan=True)
    straight = 3.0 + 50.5 + 100.0 * 2 + 50.5   # through the block
    assert acc[2, 8] < straight


def test_nonpositive_friction_raises():
    cost = np.ones((4, 4))
    cost[1, 1] = 0.0
    with pytest.raises(ValueError, match="strictly positive"):
        costdist.cost_distance_np(cost, np.zeros((4, 4), bool))


def test_no_sources_all_unreachable():
    cost = np.ones((3, 3))
    acc = costdist.cost_distance_np(cost, np.zeros((3, 3), bool))
    assert np.isposinf(acc).all()


# ------------------------------------------- distributed vs the mosaic ----

def _cd_tiles(h, w, positions, seed=41, sources=(), walls=()):
    """Two-band tiles: band 0 = integer friction (1..50), band 1 = the
    SRC_ON/SRC_OFF/0 source marker. ``sources`` lists global (gy, gx)
    source pixels; ``walls`` lists (gy, gx) barrier pixels (nodata in
    BOTH bands). Returns (rows, cost_mosaic, src_mosaic)."""
    rng = np.random.default_rng(seed)
    nx = max(p[0] for p in positions) + 1
    ny = max(p[1] for p in positions) + 1
    cost = np.round(rng.uniform(1, 50, size=(ny * h, nx * w)))
    srcplane = np.full((ny * h, nx * w), SRC_OFF)
    for gy, gx in sources:
        srcplane[gy, gx] = SRC_ON
    for gy, gx in walls:
        cost[gy, gx] = np.nan
        srcplane[gy, gx] = np.nan
    rows = []
    present = np.zeros((ny * h, nx * w), bool)
    for ix, iy in positions:
        sl = np.s_[iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        present[sl] = True
        tile = np.stack([np.where(np.isnan(cost[sl]), 0.0, cost[sl]),
                         np.where(np.isnan(srcplane[sl]), 0.0,
                                  srcplane[sl])])
        rows.append({"cell_id": int(cells.encode_np(ZONE, RES, ix, iy)),
                     "bytes": codec.encode(tile.astype(np.uint16), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": NODATA})
    cost[~present] = np.nan
    srcplane[~present] = np.nan
    return rows, cost, srcplane


def _want_mosaic(cost, srcplane):
    c = np.where(np.isfinite(srcplane), cost, np.nan)
    src = np.isfinite(srcplane) & (srcplane >= THR)
    acc = costdist.cost_distance_np(c, src)
    return np.where(np.isfinite(acc), acc, np.nan)


def _collect_tiles(df_rows):
    return {r.cell_id: codec.to_float_masked(
        codec.decode(r.bytes, r.w, r.h, r.fmt), r.nodata)
        for r in df_rows}


def _assert_tiles(out, positions, want_all, h, w):
    assert len(out) == len(positions)
    for ix, iy in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        want = want_all[iy * h:(iy + 1) * h,
                        ix * w:(ix + 1) * w].astype(np.float32)[None]
        np.testing.assert_allclose(out[cid], want, rtol=0, atol=0,
                                   equal_nan=True)


def test_distributed_matches_global_mosaic(spark):
    h = w = 16
    positions = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0)]
    rows, cost, srcp = _cd_tiles(h, w, positions,
                                 sources=[(3, 3), (20, 4)])
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    got = _collect_tiles(
        costdist.cost_distance(df, source_threshold=THR).collect())
    _assert_tiles(got, positions, _want_mosaic(cost, srcp), h, w)


def test_distributed_source_in_one_tile_reaches_all(spark):
    # single source in the west tile of a 4-tile strip: every optimal
    # path crosses up to 3 seams, forcing multi-round strip exchange
    h = w = 8
    positions = [(0, 0), (1, 0), (2, 0), (3, 0)]
    rows, cost, srcp = _cd_tiles(h, w, positions, sources=[(4, 1)])
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    want = _want_mosaic(cost, srcp)
    assert np.isfinite(want[4, 30])      # the far tile is reached
    got = _collect_tiles(
        costdist.cost_distance(df, source_threshold=THR).collect())
    _assert_tiles(got, positions, want, h, w)
    with pytest.raises(ValueError, match="did not converge"):
        costdist.cost_distance(df, source_threshold=THR,
                               max_rounds=1).count()


def test_distributed_wall_detour_bounces_between_tiles(spark):
    # a wall across the south tile forces optimal paths to leave the
    # tile, run through its NORTH neighbor, and re-enter — the
    # bouncing-path case that needs re-relaxation of an already
    #-solved tile
    h = w = 8
    positions = [(0, 0), (0, 1), (1, 0), (1, 1)]
    walls = [(12, gx) for gx in range(0, 15)]   # row 12, gap at gx=15
    rows, cost, srcp = _cd_tiles(h, w, positions, sources=[(14, 1)],
                                 walls=walls)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    want = _want_mosaic(cost, srcp)
    assert np.isfinite(want[10, 1])     # above the wall: reachable
    got = _collect_tiles(
        costdist.cost_distance(df, source_threshold=THR).collect())
    _assert_tiles(got, positions, want, h, w)


def test_distributed_no_source_everything_sentinel(spark):
    h = w = 8
    positions = [(0, 0), (1, 0)]
    rows, cost, srcp = _cd_tiles(h, w, positions, sources=[])
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    out = costdist.cost_distance(df, source_threshold=THR).collect()
    for r in out:
        dec = codec.decode(r.bytes, r.w, r.h, r.fmt)
        valid_in = (codec.decode(
            next(x for x in rows
                 if x["cell_id"] == r.cell_id)["bytes"],
            w, h, FMT)[0] != 0)
        assert (dec[0][valid_in] == np.float32(-9999.0)).all()


def test_missing_column_and_band_raise(spark):
    df = spark.createDataFrame(pd.DataFrame({"cell_id": [1]}),
                               "cell_id long")
    with pytest.raises(ValueError, match="missing column"):
        costdist.cost_distance(df)
    one_band = np.ones((1, 4, 4), np.uint16)
    pdf = pd.DataFrame([{
        "cell_id": int(cells.encode_np(ZONE, RES, 0, 0)),
        "bytes": codec.encode(one_band, FMT), "w": 4, "h": 4,
        "fmt": FMT, "nodata": NODATA}])
    df1 = spark.createDataFrame(pdf, TILE_SCHEMA)
    with pytest.raises(Exception, match="bands"):
        costdist.cost_distance(df1).count()


def test_cost_scale_offset_applied(spark):
    # friction = band0 * 0.5 + 0.25: check one uniform tile against
    # the rescaled kernel
    h = w = 8
    tile = np.stack([np.full((h, w), 4.0),
                     np.full((h, w), SRC_OFF)])
    tile[1, 2, 2] = SRC_ON
    pdf = pd.DataFrame([{
        "cell_id": int(cells.encode_np(ZONE, RES, 0, 0)),
        "bytes": codec.encode(tile.astype(np.uint16), FMT),
        "w": w, "h": h, "fmt": FMT, "nodata": NODATA}])
    df = spark.createDataFrame(pdf, TILE_SCHEMA)
    got = _collect_tiles(costdist.cost_distance(
        df, source_threshold=THR, cost_scale=0.5,
        cost_offset=0.25).collect())
    src = np.zeros((h, w), bool)
    src[2, 2] = True
    want = costdist.cost_distance_np(
        np.full((h, w), 4.0 * 0.5 + 0.25), src).astype(np.float32)
    cid = int(cells.encode_np(ZONE, RES, 0, 0))
    np.testing.assert_allclose(got[cid][0], want, rtol=0, atol=0)


def test_pipeline_verb_and_bundle(spark, tmp_path, tiny_images):
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .composite("median")
         .cost_distance(cost_band=0, source_band=1,
                        source_threshold=600.0,
                        cost_scale=1.0 / 256.0, cost_offset=1.0))
    rows = p.df.collect()
    assert rows and all(r.fmt == "rawf32" for r in rows)
    bp = str(tmp_path / "costdist.json")
    p.to_bundle(bp)
    replay = Pipeline.from_bundle(bp, tiny_images)
    a = {r.cell_id: bytes(r.bytes) for r in rows}
    b = {r.cell_id: bytes(r.bytes) for r in replay.df.collect()}
    assert a == b


# ------------------------------------------------- backlink / allocation ----

def test_backlink_predecessor_property():
    # for every reachable non-source pixel p with backlink code c:
    # acc[q] + step(q, p) == acc[p] EXACTLY (same float expression)
    from vrtility_spark.terrain import D8_CODES
    cost = np.round(RNG.uniform(1, 50, size=(10, 12)))
    cost[RNG.random(cost.shape) < 0.08] = np.nan
    src = RNG.random(cost.shape) < 0.06
    src &= np.isfinite(cost)
    if not src.any():
        src[0, 0] = True
    acc = costdist.cost_distance_np(cost, src)
    bl = costdist.backlink_np(cost, acc)
    code_map = {c: (dy, dx) for c, dy, dx in D8_CODES}
    H, W = cost.shape
    checked = 0
    for y in range(H):
        for x in range(W):
            if not np.isfinite(bl[y, x]) or bl[y, x] == 0:
                continue
            dy, dx = code_map[int(bl[y, x])]
            qy, qx = y + dy, x + dx
            assert 0 <= qy < H and 0 <= qx < W
            d = np.sqrt(2.0) if (dy and dx) else 1.0
            assert acc[qy, qx] + d * (cost[qy, qx] + cost[y, x]) / 2.0 \
                == acc[y, x]
            checked += 1
    assert checked > 20
    # sources are 0, barriers NaN, unreachable NaN
    assert (bl[src] == 0).all()
    assert np.isnan(bl[~np.isfinite(cost)]).all()


def test_backlink_uniform_points_at_source():
    # single source, friction 1: the pixel due east of the source
    # walks WEST (code 16), the one due north walks SOUTH (code 64)
    cost = np.ones((5, 5))
    src = np.zeros((5, 5), bool)
    src[2, 2] = True
    acc = costdist.cost_distance_np(cost, src)
    bl = costdist.backlink_np(cost, acc)
    assert bl[2, 2] == 0
    assert bl[2, 3] == 16.0   # east neighbor -> points west
    assert bl[2, 1] == 1.0    # west neighbor -> points east
    assert bl[1, 2] == 64.0   # north neighbor -> points south (dy=+1)
    assert bl[3, 2] == 4.0    # south neighbor -> points north
    assert bl[1, 1] == 128.0  # NW corner -> points SE


def test_distributed_backlink_matches_mosaic(spark):
    h = w = 8
    positions = [(0, 0), (1, 0), (0, 1), (1, 1)]
    rows, cost, srcp = _cd_tiles(h, w, positions,
                                 sources=[(2, 2), (13, 11)])
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    c = np.where(np.isfinite(srcp), cost, np.nan)
    src = np.isfinite(srcp) & (srcp >= THR)
    accM = costdist.cost_distance_np(c, src)
    blM = costdist.backlink_np(c, accM)
    out = costdist.cost_distance(df, source_threshold=THR,
                                 backlink=True).collect()
    assert all(r.fmt == "rawf32" for r in out)
    got = _collect_tiles(out)
    for ix, iy in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        assert got[cid].shape[0] == 2
        wantA = np.where(np.isfinite(accM), accM, np.nan)[
            iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        np.testing.assert_allclose(
            got[cid][0], wantA.astype(np.float32), rtol=0, atol=0,
            equal_nan=True)
        wantB = blM[iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        np.testing.assert_allclose(
            got[cid][1], wantB.astype(np.float32), rtol=0, atol=0,
            equal_nan=True)


def test_cost_allocation_via_basins(spark):
    # ArcGIS CostAllocation as a composition: backlink plane -> basins
    # labels every pixel by the zone-global id of the source pixel its
    # backlink walk reaches — compare against basins_np on the mosaic
    from vrtility_spark import hydrology
    from vrtility_spark.bands import subset_band_index
    h = w = 8
    positions = [(0, 0), (1, 0)]
    rows, cost, srcp = _cd_tiles(h, w, positions,
                                 sources=[(3, 2), (5, 13)])
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    c = np.where(np.isfinite(srcp), cost, np.nan)
    src = np.isfinite(srcp) & (srcp >= THR)
    accM = costdist.cost_distance_np(c, src)
    blM = costdist.backlink_np(c, accM)
    want = hydrology.basins_np(blM[None])
    cd = costdist.cost_distance(df, source_threshold=THR,
                                backlink=True)
    alloc = hydrology.basins(subset_band_index(cd, 1))
    got = _collect_tiles(alloc.collect())
    for ix, iy in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        np.testing.assert_allclose(
            got[cid], want[:, iy * h:(iy + 1) * h,
                           ix * w:(ix + 1) * w],
            rtol=0, atol=0, equal_nan=True)
    # every reachable pixel is allocated to an actual source pixel
    sy, sx = np.nonzero(src)
    src_labels = {float(y * hydrology.BASIN_SPAN + x)
                  for y, x in zip(sy.tolist(), sx.tolist())}
    lab = want[0][np.isfinite(want[0])]
    assert set(np.unique(lab)) <= src_labels
