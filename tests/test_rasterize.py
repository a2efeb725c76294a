"""Vector→raster: burn kernel vs naive per-pixel loops, deterministic
overlap merges, and the clip path's agreement with zonal statistics
(the raster↔vector closure invariants)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, rasterize, zonal
from vrtility_spark.join import parse_wkt_polygon, points_in_polygon_np

RNG = np.random.default_rng(41)

ZONE, RES = 60, 3
FMT, NODATA = "raw16", 0.0
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")
AOI_SCHEMA = ("aoi_id string, zone long, geom_wkt string, xmin double, "
              "ymin double, xmax double, ymax double")


def _rect_wkt(x0, y0, x1, y1):
    return (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
            f"{x0} {y1}, {x0} {y0}))")


def _aoi_row(aoi_id, zone, wkt, burn=None):
    from vrtility_spark.datagen import _wkt_coords
    xs, ys = _wkt_coords(wkt)
    d = {"aoi_id": aoi_id, "zone": zone, "geom_wkt": wkt,
         "xmin": min(xs), "ymin": min(ys), "xmax": max(xs),
         "ymax": max(ys)}
    if burn is not None:
        d["burn"] = burn
    return d


def _inside(wkt, w, h, x0, y0, size):
    gx, gy = rasterize._pixel_centers(w, h, x0, y0, size)
    return points_in_polygon_np(gx, gy, parse_wkt_polygon(wkt))


def test_rasterize_burn_matches_loop(spark):
    size = cells.cell_size(RES)
    aoi_rows = [
        _aoi_row("r", ZONE, _rect_wkt(0.2 * size, 0.1 * size,
                                      1.6 * size, 0.8 * size)),
        _aoi_row("L", ZONE, (
            f"POLYGON (({0.5*size} {0.3*size}, {1.2*size} {0.3*size}, "
            f"{1.2*size} {1.4*size}, {0.9*size} {1.4*size}, "
            f"{0.9*size} {0.6*size}, {0.5*size} {0.6*size}, "
            f"{0.5*size} {0.3*size}))")),
    ]
    aoi = spark.createDataFrame(pd.DataFrame(aoi_rows), AOI_SCHEMA)
    out = {r.cell_id: r for r in
           rasterize.rasterize_aoi(aoi, RES, 16, 16).collect()}
    # expected cover: union of both bboxes' cells
    want_cells = set()
    for a in aoi_rows:
        for cid in cells.cover_bbox_np(ZONE, a["xmin"], a["ymin"],
                                       a["xmax"], a["ymax"], RES):
            want_cells.add(int(cid))
    assert set(out) == want_cells
    for cid, r in out.items():
        assert r.fmt == "rawf32" and r.nodata == 0.0
        got = codec.decode(r.bytes, r.w, r.h, r.fmt)[0]
        _, _, ix, iy = (int(v) for v in cells.decode_np(cid))
        want = np.zeros((16, 16))
        for a in aoi_rows:
            m = _inside(a["geom_wkt"], 16, 16, ix * size, iy * size,
                        size)
            want[m] = 1.0
        np.testing.assert_array_equal(got, want.astype(np.float32))


def test_rasterize_merge_rules_and_burn_column(spark):
    size = cells.cell_size(RES)
    # two overlapping rects with burn values 5 and 9
    aoi_rows = [
        _aoi_row("a", ZONE, _rect_wkt(0.1 * size, 0.1 * size,
                                      0.6 * size, 0.6 * size), burn=9.0),
        _aoi_row("b", ZONE, _rect_wkt(0.4 * size, 0.4 * size,
                                      0.9 * size, 0.9 * size), burn=5.0),
    ]
    aoi = spark.createDataFrame(
        pd.DataFrame(aoi_rows), AOI_SCHEMA + ", burn double")
    _, _, ix, iy = 0, 0, 0, 0
    ia = _inside(aoi_rows[0]["geom_wkt"], 16, 16, 0, 0, size)
    ib = _inside(aoi_rows[1]["geom_wkt"], 16, 16, 0, 0, size)
    both = ia & ib
    assert both.any()  # the overlap is real
    for merge, overlap_val in (("max", 9.0), ("min", 5.0), ("last", 9.0)):
        r = {x.cell_id: x for x in rasterize.rasterize_aoi(
            aoi, RES, 16, 16, burn="burn", merge=merge).collect()}
        cid = int(cells.encode_np(ZONE, RES, 0, 0))
        got = codec.decode(r[cid].bytes, 16, 16, "rawf32")[0]
        assert r[cid].n_parts == 2
        # "last" = highest burn last in the deterministic order
        np.testing.assert_array_equal(got[both], overlap_val)
        np.testing.assert_array_equal(got[ia & ~ib], 9.0)
        np.testing.assert_array_equal(got[ib & ~ia], 5.0)
        np.testing.assert_array_equal(got[~ia & ~ib], 0.0)


def test_rasterize_errors(spark):
    aoi = spark.createDataFrame(
        pd.DataFrame([_aoi_row("a", ZONE, _rect_wkt(0, 0, 10, 10))]),
        AOI_SCHEMA)
    with pytest.raises(ValueError, match="unknown merge"):
        rasterize.rasterize_aoi(aoi, RES, 8, 8, merge="sum")
    with pytest.raises(ValueError, match="burn column"):
        rasterize.rasterize_aoi(aoi, RES, 8, 8, burn="weight")


# --------------------------------------------------------------- clip ----

def _tiles(h, w, positions, seed=7):
    size = cells.cell_size(RES)
    rng = np.random.default_rng(seed)
    rows, arrs = [], {}
    for ix, iy in positions:
        arr = np.round(rng.uniform(1, 4000, size=(2, h, w)))
        arr[rng.random(arr.shape) < 0.1] = NODATA
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(np.uint16), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": NODATA})
        arrs[cid] = arr
    return rows, arrs


@pytest.mark.parametrize("invert", [False, True])
def test_clip_matches_loop(spark, invert):
    size = cells.cell_size(RES)
    rows, arrs = _tiles(16, 16, [(0, 0), (1, 0), (0, 1), (2, 2)])
    tiles = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    aoi_rows = [
        _aoi_row("u1", ZONE, _rect_wkt(0.3 * size, 0.2 * size,
                                       1.5 * size, 0.7 * size)),
        _aoi_row("u2", ZONE, _rect_wkt(0.1 * size, 0.9 * size,
                                       0.8 * size, 1.6 * size)),
    ]
    aoi = spark.createDataFrame(pd.DataFrame(aoi_rows), AOI_SCHEMA)
    out = {r.cell_id: r for r in
           rasterize.clip_tiles(tiles, aoi, RES, invert=invert).collect()}
    # tile (2,2) is outside every AOI bbox -> dropped (even inverted:
    # clip is a cutline crop, the complement applies within coverage)
    assert int(cells.encode_np(ZONE, RES, 2, 2)) not in out
    assert len(out) == 3
    for cid, r in out.items():
        _, _, ix, iy = (int(v) for v in cells.decode_np(cid))
        inside = np.zeros((16, 16), dtype=bool)
        for a in aoi_rows:
            inside |= _inside(a["geom_wkt"], 16, 16, ix * size,
                              iy * size, size)
        keep = ~inside if invert else inside
        want = arrs[cid].copy()
        want[:, ~keep] = NODATA
        got = codec.decode(r.bytes, r.w, r.h, r.fmt)
        np.testing.assert_array_equal(got, want.astype(np.uint16))


def test_clip_then_zonal_equals_zonal(spark):
    # the closure invariant: clipping to an AOI must not change that
    # AOI's zonal statistics
    size = cells.cell_size(RES)
    rows, _ = _tiles(16, 16, [(0, 0), (1, 0), (0, 1), (1, 1)])
    tiles = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    aoi_rows = [_aoi_row("z", ZONE, (
        f"POLYGON (({0.2*size} {0.2*size}, {1.7*size} {0.2*size}, "
        f"{1.7*size} {1.1*size}, {0.8*size} {1.1*size}, "
        f"{0.8*size} {1.8*size}, {0.2*size} {1.8*size}, "
        f"{0.2*size} {0.2*size}))"))]
    aoi = spark.createDataFrame(pd.DataFrame(aoi_rows), AOI_SCHEMA)
    base = {(r.aoi_id, r.band): r.asDict()
            for r in zonal.zonal_stats(tiles, aoi, RES).collect()}
    clipped = rasterize.clip_tiles(tiles, aoi, RES)
    after = {(r.aoi_id, r.band): r.asDict()
             for r in zonal.zonal_stats(clipped, aoi, RES).collect()}
    assert base == after


def test_rasterize_then_zonal_is_all_ones(spark):
    size = cells.cell_size(RES)
    aoi_rows = [_aoi_row("m", ZONE, _rect_wkt(0.2 * size, 0.2 * size,
                                              1.4 * size, 1.3 * size))]
    aoi = spark.createDataFrame(pd.DataFrame(aoi_rows), AOI_SCHEMA)
    mask = rasterize.rasterize_aoi(aoi, RES, 16, 16,
                                   background=-1.0).drop("n_parts")
    zs = zonal.zonal_stats(mask, aoi, RES).collect()
    assert len(zs) == 1
    r = zs[0]
    # every pixel center inside the polygon was burned to exactly 1
    assert r.px_count == r.valid_count and r.mean == 1.0 and r.std == 0.0


def test_clip_aoi_filter_and_missing_column(spark):
    size = cells.cell_size(RES)
    rows, arrs = _tiles(16, 16, [(0, 0)])
    tiles = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    aoi_rows = [
        _aoi_row("keep", ZONE, _rect_wkt(0.1 * size, 0.1 * size,
                                         0.5 * size, 0.5 * size)),
        _aoi_row("other", ZONE, _rect_wkt(0.6 * size, 0.6 * size,
                                          0.9 * size, 0.9 * size)),
    ]
    aoi = spark.createDataFrame(pd.DataFrame(aoi_rows), AOI_SCHEMA)
    r = rasterize.clip_tiles(tiles, aoi, RES, aoi_id="keep").collect()[0]
    cid = r.cell_id
    _, _, ix, iy = (int(v) for v in cells.decode_np(cid))
    inside = _inside(aoi_rows[0]["geom_wkt"], 16, 16, ix * size,
                     iy * size, size)
    got = codec.decode(r.bytes, r.w, r.h, r.fmt)
    want = arrs[cid].copy()
    want[:, ~inside] = NODATA
    np.testing.assert_array_equal(got, want.astype(np.uint16))
    with pytest.raises(ValueError, match="missing column"):
        rasterize.clip_tiles(tiles.drop("fmt"), aoi, RES)
