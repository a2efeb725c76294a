"""Point sampling: the distributed stencil-partial pipeline is
value-identical to sample_np on the assembled mosaic (seam-crossing
bilinear included), nearest matches direct indexing, nodata pixels
renormalize, coverage holes yield NULL, and mixed grids raise."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vrtility_spark import cells, codec, pointsample

ZONE, RES = 40, 3
FMT, NODATA = "raw16", 0.0
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")
W = H = 16
SIZE = cells.cell_size(RES)
PX = SIZE / W
NGLOB = (1 << RES) * W


def _tiles(positions, seed=5):
    rng = np.random.default_rng(seed)
    rows = {}
    for ix, iy in positions:
        arr = np.round(rng.uniform(1, 4000, size=(3, H, W)))
        arr[rng.random(arr.shape) < 0.2] = NODATA
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        rows[cid] = arr.astype(np.uint16)
    return rows


def _mosaic(rows):
    """NaN-masked mosaic of a 2x2 tile block anchored at (0,0)."""
    ixs = [int(cells.decode_np(c)[2]) for c in rows]
    iys = [int(cells.decode_np(c)[3]) for c in rows]
    gx, gy = max(ixs) + 1, max(iys) + 1
    G = np.full((3, gy * H, gx * W), np.nan)
    for cid, arr in rows.items():
        _, _, ix, iy = (int(v) for v in cells.decode_np(cid))
        A = codec.to_float_masked(arr, NODATA)
        G[:, iy * H:(iy + 1) * H, ix * W:(ix + 1) * W] = A
    return G


def _df(spark, rows):
    return spark.createDataFrame(
        [{"cell_id": c, "bytes": codec.encode(a, FMT), "w": W, "h": H,
          "fmt": FMT, "nodata": NODATA} for c, a in rows.items()],
        TILE_SCHEMA)


def _points(spark, pts):
    return spark.createDataFrame(
        [(i, ZONE, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "point_id long, zone long, x double, y double")


def _got(df):
    out = {}
    for r in df.collect():
        out[(r["point_id"], r["band"])] = r["value"]
    return out


SEAM_PTS = [
    (0.31 * SIZE, 0.77 * SIZE),          # interior of tile (0,0)
    (1.0 * SIZE, 0.5 * SIZE),            # exactly on the vertical seam
    (1.0 * SIZE - 0.1, 1.0 * SIZE - 0.1),  # corner: 4 tiles in stencil
    (0.5 * PX, 0.5 * PX),                # first pixel center
    (0.1, 0.1),                          # zone-edge clamp
    (1.97 * SIZE, 1.97 * SIZE),          # near coverage edge (tiles end)
]


@pytest.mark.parametrize("method", ["nearest", "bilinear"])
def test_matches_mosaic_twin(spark, method):
    rows = _tiles([(ix, iy) for ix in range(2) for iy in range(2)])
    G = _mosaic(rows)
    xs = [p[0] for p in SEAM_PTS]
    ys = [p[1] for p in SEAM_PTS]
    exp = pointsample.sample_np(G, NGLOB, xs, ys, PX, method)
    got = _got(pointsample.point_sample(
        _df(spark, rows), _points(spark, SEAM_PTS), method))
    for i in range(len(SEAM_PTS)):
        for b in range(3):
            g = got[(i, b)]
            if np.isnan(exp[i, b]):
                assert g is None, (i, b)
            else:
                assert g == pytest.approx(exp[i, b], rel=1e-12), (i, b)


def test_nearest_is_direct_indexing(spark):
    rows = _tiles([(0, 0)])
    arr = codec.to_float_masked(next(iter(rows.values())), NODATA)
    pts = [(3.5 * PX, 7.5 * PX), (0.2 * PX, 15.9 * PX)]
    got = _got(pointsample.point_sample(
        _df(spark, rows), _points(spark, pts), "nearest"))
    for i, (x, y) in enumerate(pts):
        px, py = int(x // PX), int(y // PX)
        for b in range(3):
            v = arr[b, py, px]
            if np.isnan(v):
                assert got[(i, b)] is None
            else:
                assert got[(i, b)] == pytest.approx(v)


def test_coverage_hole_is_null(spark):
    rows = _tiles([(0, 0)])
    # deep inside tile (3,3): every stencil pixel over missing tiles
    pts = [(3.5 * SIZE, 3.5 * SIZE)]
    for method in ("nearest", "bilinear"):
        got = _got(pointsample.point_sample(
            _df(spark, rows), _points(spark, pts), method))
        assert all(v is None for v in got.values())


def test_bilinear_renormalizes_over_valid(spark):
    # hand-built tile: one stencil pixel nodata → weights renormalize
    arr = np.full((1, H, W), 100, dtype=np.uint16)
    arr[0, 5, 5] = 0          # nodata
    arr[0, 5, 6] = 200
    arr[0, 6, 5] = 300
    arr[0, 6, 6] = 400
    cid = int(cells.encode_np(ZONE, RES, 0, 0))
    rows = {cid: arr}
    # point between pixel centers (5,5).. (6,6), closer to (5,5)
    x = (5.75 + 0.0) * PX
    y = (5.75 + 0.0) * PX
    got = _got(pointsample.point_sample(
        _df(spark, rows), _points(spark, [(x, y)]), "bilinear"))
    # manual: corners (5,5)w=.5625 invalid, (6,5)w=.1875 v=200,
    # (5,6)w=.1875 v=300, (6,6)w=.0625 v=400
    exp = (0.1875 * 200 + 0.1875 * 300 + 0.0625 * 400) / 0.4375
    assert got[(0, 0)] == pytest.approx(exp)


def test_sample_np_origin_is_absolute_frame():
    """A sub-mosaic anchored mid-zone must sample exactly like the
    zero-origin full mosaic that is NaN outside the sub-mosaic: the
    clamp happens in the ZONE frame, so pixels just outside the
    sub-array are excluded (missing tiles), never replicated from the
    sub-array's own column 0."""
    rows = _tiles([(1, 1)])
    A = codec.to_float_masked(next(iter(rows.values())), NODATA)
    G_sub = A
    G_full = np.full((3, 2 * H, 2 * W), np.nan)
    G_full[:, H:, W:] = A
    # points straddling the sub-mosaic's low edges (x just below SIZE)
    pts = [(SIZE - 0.3 * PX, 1.5 * SIZE), (1.5 * SIZE, SIZE - 0.3 * PX),
           (SIZE + 0.2 * PX, SIZE + 0.2 * PX), (1.3 * SIZE, 1.7 * SIZE)]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    for method in ("nearest", "bilinear"):
        exp = pointsample.sample_np(G_full, NGLOB, xs, ys, PX, method)
        got = pointsample.sample_np(G_sub, NGLOB, xs, ys, PX, method,
                                    origin=(SIZE, SIZE))
        np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_out_of_zone_point_is_null(spark):
    """A point whose coordinate lies outside the zone frame is NULL
    (gdallocationinfo's 'location off this file') even when the
    clamped stencil would land on a real tile; a point just inside the
    zone edge still gets edge replication."""
    edge = NGLOB // W - 1  # last cell index on each axis at RES
    rows = _tiles([(edge, edge)])
    span = NGLOB * PX
    pts = [(span + 100.0, span - 0.5 * PX),   # x beyond the zone
           (-5.0, span - 0.5 * PX),           # x below the zone
           (span - 0.1, span - 0.1)]          # inside: edge replication
    # mosaic twin agrees: NaN off-zone, value at the inside point
    G = codec.to_float_masked(next(iter(rows.values())), NODATA)
    exp = pointsample.sample_np(
        G, NGLOB, [p[0] for p in pts], [p[1] for p in pts], PX,
        "bilinear", origin=((NGLOB - W) * PX, (NGLOB - W) * PX))
    assert np.isnan(exp[0]).all() and np.isnan(exp[1]).all()
    got = _got(pointsample.point_sample(
        _df(spark, rows), _points(spark, pts), "bilinear"))
    for b in range(3):
        assert got[(0, b)] is None
        assert got[(1, b)] is None
        if np.isnan(exp[2, b]):
            assert got[(2, b)] is None
        else:
            assert got[(2, b)] == pytest.approx(exp[2, b], rel=1e-12)


def test_mixed_grid_raises(spark):
    rows = _tiles([(0, 0)])
    bad = dict(rows)
    arr = np.round(np.random.default_rng(3).uniform(
        1, 10, size=(3, 8, 8))).astype(np.uint16)
    bad_rows = [{"cell_id": int(cells.encode_np(ZONE, RES, 1, 0)),
                 "bytes": codec.encode(arr, FMT), "w": 8, "h": 8,
                 "fmt": FMT, "nodata": NODATA}]
    df = _df(spark, bad).union(spark.createDataFrame(bad_rows, TILE_SCHEMA))
    pts = _points(spark, [(0.99 * SIZE, 0.5 * SIZE)])  # seam stencil
    with pytest.raises(Exception, match="regrid"):
        pointsample.point_sample(df, pts, "bilinear").collect()


def test_unknown_method_raises(spark):
    rows = _tiles([(0, 0)])
    with pytest.raises(KeyError):
        pointsample.point_sample(_df(spark, rows),
                                 _points(spark, [(1.0, 1.0)]), "cubic")


def test_tiles_never_shuffle(spark):
    rows = _tiles([(0, 0), (1, 0)])
    df = pointsample.point_sample(
        _df(spark, rows), _points(spark, SEAM_PTS), "bilinear")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_grid_param_skips_probe_and_matches(spark):
    rows = _tiles([(ix, iy) for ix in range(2) for iy in range(2)])
    df, pts = _df(spark, rows), _points(spark, SEAM_PTS)
    probed = _got(pointsample.point_sample(df, pts, "bilinear"))
    given = _got(pointsample.point_sample(
        df, pts, "bilinear", grid=(RES, W, H, 3)))
    assert probed == given
    # a wrong grid is caught by the in-kernel check
    import pytest as _pytest
    with _pytest.raises(Exception, match="probe said|regrid"):
        pointsample.point_sample(
            df, pts, "bilinear", grid=(RES, 8, 8, 3)).collect()
