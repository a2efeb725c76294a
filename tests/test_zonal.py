"""Zonal statistics: partial-moment kernel vs naive per-pixel loops
(and a closed-form rectangle check), and the distributed broadcast-join
pipeline vs a single-machine reduction over the assembled mosaic."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, zonal
from vrtility_spark.join import parse_wkt_polygon, points_in_polygon_np

RNG = np.random.default_rng(23)

ZONE, RES = 40, 3
FMT, NODATA = "raw16", 0.0
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")
AOI_SCHEMA = ("aoi_id string, zone long, geom_wkt string, xmin double, "
              "ymin double, xmax double, ymax double")


def _rect_wkt(x0, y0, x1, y1):
    return (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
            f"{x0} {y1}, {x0} {y0}))")


# ------------------------------------------------------- loop oracle ----

def zonal_loop(A, ring, xmin, ymin, xmax, ymax):
    """Deliberately-naive per-pixel accumulation (point-at-a-time PIP)."""
    B, H, W = A.shape
    out = []
    for b in range(B):
        n_in = nv = 0
        s = s2 = 0.0
        mn, mx = np.inf, -np.inf
        for i in range(H):
            for j in range(W):
                cx = xmin + (j + 0.5) * (xmax - xmin) / W
                cy = ymin + (i + 0.5) * (ymax - ymin) / H
                if not points_in_polygon_np(
                        np.array([cx]), np.array([cy]), ring)[0]:
                    continue
                n_in += 1
                v = A[b, i, j]
                if np.isfinite(v):
                    nv += 1
                    s += v
                    s2 += v * v
                    mn, mx = min(mn, v), max(mx, v)
        out.append((n_in, nv, s, s2, mn, mx))
    return out


def _rand(shape, nan_frac=0.2):
    a = np.round(RNG.uniform(1, 4000, size=shape))
    a[RNG.random(shape) < nan_frac] = np.nan
    return a


def test_partials_match_loop_concave():
    A = _rand((2, 12, 12))
    ring = parse_wkt_polygon(
        "POLYGON ((1 1, 9 1, 9 4, 5 4, 5 10, 1 10, 1 1))")  # L-shape
    got = zonal.zonal_partials_np(A, ring, 0.0, 0.0, 12.0, 12.0)
    want = zonal_loop(A, ring, 0.0, 0.0, 12.0, 12.0)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-12)


def test_partials_rect_closed_form():
    # axis-aligned rect: inside-pixels are exactly an index slice, an
    # independent check of the pixel-center grid convention
    A = _rand((1, 16, 16), nan_frac=0.0)
    ring = parse_wkt_polygon(_rect_wkt(4.0, 2.0, 11.0, 9.0))
    got = zonal.zonal_partials_np(A, ring, 0.0, 0.0, 16.0, 16.0)
    sub = A[0, 2:9, 4:11]  # centers at j+0.5 in [4,11) -> j in 4..10
    assert got[0][0] == sub.size
    assert got[0][1] == sub.size
    assert got[0][2] == sub.sum()
    assert got[0][4] == sub.min() and got[0][5] == sub.max()


def test_partials_empty_and_all_nodata():
    A = np.full((1, 4, 4), np.nan)
    ring = parse_wkt_polygon(_rect_wkt(0.0, 0.0, 4.0, 4.0))
    n_in, nv, s, s2, mn, mx = zonal.zonal_partials_np(
        A, ring, 0.0, 0.0, 4.0, 4.0)[0]
    assert (n_in, nv, s, s2) == (16, 0, 0.0, 0.0)
    assert mn == np.inf and mx == -np.inf
    # polygon entirely off-tile
    far = parse_wkt_polygon(_rect_wkt(50.0, 50.0, 60.0, 60.0))
    assert zonal.zonal_partials_np(
        np.ones((1, 4, 4)), far, 0.0, 0.0, 4.0, 4.0)[0][0] == 0


# ------------------------------------------------- distributed stats ----

def _tiles(h, w, positions, seed=9, zone=ZONE, res=RES):
    size = cells.cell_size(res)
    rng = np.random.default_rng(seed)
    rows, mosaics = [], {}
    for ix, iy in positions:
        arr = np.round(rng.uniform(1, 4000, size=(2, h, w)))
        arr[rng.random(arr.shape) < 0.15] = NODATA
        cid = int(cells.encode_np(zone, res, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(np.uint16), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": NODATA})
        A = arr.astype(np.float64)
        A[A == NODATA] = np.nan
        mosaics[cid] = (A, ix * size, iy * size, (ix + 1) * size,
                        (iy + 1) * size)
    return rows, mosaics


def _expected(mosaics, aoi_rows):
    """Driver-side reduction with the loop-gated partial kernel."""
    agg = {}
    for a in aoi_rows:
        ring = parse_wkt_polygon(a["geom_wkt"])
        for cid, (A, x0, y0, x1, y1) in mosaics.items():
            zone = int(cells.decode_np(cid)[0])
            if zone != a["zone"]:
                continue
            # bbox prefilter (cover-cell analogue)
            if (x1 <= a["xmin"] or x0 >= a["xmax"]
                    or y1 <= a["ymin"] or y0 >= a["ymax"]):
                continue
            for b, p in enumerate(
                    zonal.zonal_partials_np(A, ring, x0, y0, x1, y1)):
                if p[0] == 0:
                    continue
                k = (a["aoi_id"], b)
                c = agg.setdefault(k, [0, 0, 0.0, 0.0, np.inf, -np.inf])
                c[0] += p[0]; c[1] += p[1]; c[2] += p[2]; c[3] += p[3]
                c[4] = min(c[4], p[4]); c[5] = max(c[5], p[5])
    return agg


@pytest.mark.parametrize("broadcast_aoi", [True, False])
def test_zonal_matches_driver_reduction(spark, broadcast_aoi):
    size = cells.cell_size(RES)
    rows, mosaics = _tiles(16, 16, [(ix, iy) for ix in range(3)
                                    for iy in range(2)])
    aoi_rows = [
        {"aoi_id": "rect", "zone": ZONE,
         "geom_wkt": _rect_wkt(0.3 * size, 0.2 * size,
                               2.4 * size, 1.7 * size)},
        {"aoi_id": "L", "zone": ZONE,
         "geom_wkt": (f"POLYGON (({0.1*size} {0.1*size}, "
                      f"{2.8*size} {0.1*size}, {2.8*size} {0.9*size}, "
                      f"{1.1*size} {0.9*size}, {1.1*size} {1.9*size}, "
                      f"{0.1*size} {1.9*size}, {0.1*size} {0.1*size}))")},
        {"aoi_id": "miss", "zone": ZONE,
         "geom_wkt": _rect_wkt(50 * size, 50 * size,
                               51 * size, 51 * size)},
        {"aoi_id": "otherzone", "zone": ZONE + 1,
         "geom_wkt": _rect_wkt(0.0, 0.0, 3 * size, 2 * size)},
    ]
    for a in aoi_rows:
        from vrtility_spark.datagen import _wkt_coords
        xs, ys = _wkt_coords(a["geom_wkt"])
        a.update(xmin=min(xs), ymin=min(ys), xmax=max(xs), ymax=max(ys))
    tiles = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    aoi = spark.createDataFrame(pd.DataFrame(aoi_rows), AOI_SCHEMA)
    got = {(r.aoi_id, r.band): r for r in
           zonal.zonal_stats(tiles, aoi, RES,
                             broadcast_aoi=broadcast_aoi).collect()}
    want = _expected(mosaics, aoi_rows)
    assert set(got) == set(want)
    assert {k[0] for k in got} == {"rect", "L"}  # miss/otherzone absent
    for k, (n_in, nv, s, s2, mn, mx) in want.items():
        r = got[k]
        assert r.px_count == n_in and r.valid_count == nv
        np.testing.assert_allclose(r.px_sum, s, rtol=1e-12)
        np.testing.assert_allclose(r.mean, s / nv, rtol=1e-12)
        np.testing.assert_allclose(
            r.std, np.sqrt(max(0.0, s2 / nv - (s / nv) ** 2)), rtol=1e-9)
        assert r.px_min == mn and r.px_max == mx


def test_zonal_multipart_and_per_band_nodata(spark):
    size = cells.cell_size(RES)
    rows, mosaics = _tiles(8, 8, [(0, 0)])
    rows2, mosaics2 = _tiles(8, 8, [(0, 0)], seed=10, zone=ZONE + 1)
    # plane 1 of the second zone's tile uses sentinel 65535
    arr = codec.decode(rows2[0]["bytes"], 8, 8, FMT).astype(np.float64)
    arr[1][arr[1] == NODATA] = 65535.0
    rows2[0]["bytes"] = codec.encode(arr.astype(np.uint16), FMT)
    rows2[0]["band_nodata"] = [0.0, 65535.0]
    rows[0]["band_nodata"] = None
    aoi_rows = [  # one multipart AOI, one part per zone
        {"aoi_id": "xz", "zone": ZONE,
         "geom_wkt": _rect_wkt(0.0, 0.0, 0.6 * size, size)},
        {"aoi_id": "xz", "zone": ZONE + 1,
         "geom_wkt": _rect_wkt(0.4 * size, 0.0, size, size)},
    ]
    for a in aoi_rows:
        from vrtility_spark.datagen import _wkt_coords
        xs, ys = _wkt_coords(a["geom_wkt"])
        a.update(xmin=min(xs), ymin=min(ys), xmax=max(xs), ymax=max(ys))
    tiles = spark.createDataFrame(
        pd.DataFrame(rows + rows2),
        TILE_SCHEMA + ", band_nodata array<double>")
    aoi = spark.createDataFrame(pd.DataFrame(aoi_rows), AOI_SCHEMA)
    got = {(r.aoi_id, r.band): r for r in
           zonal.zonal_stats(tiles, aoi, RES).collect()}
    # with band_nodata [0, 65535] the engine's decoded view of the
    # second tile equals the pre-rewrite mosaic: the 0-holes became
    # 65535-holes and both decode to NaN (values in [1, 4000] collide
    # with neither sentinel); a scalar-nodata bug would instead count
    # the 65535s as valid and mismatch
    want = _expected(mosaics, aoi_rows[:1])
    for k, v in _expected(mosaics2, aoi_rows[1:]).items():
        c = want.setdefault(k, [0, 0, 0.0, 0.0, np.inf, -np.inf])
        c[0] += v[0]; c[1] += v[1]; c[2] += v[2]; c[3] += v[3]
        c[4] = min(c[4], v[4]); c[5] = max(c[5], v[5])
    assert set(got) == set(want)
    for k, (n_in, nv, s, s2, mn, mx) in want.items():
        r = got[k]
        assert (r.px_count, r.valid_count) == (n_in, nv)
        np.testing.assert_allclose(r.px_sum, s, rtol=1e-12)


def test_zonal_missing_column_raises(spark):
    rows, _ = _tiles(8, 8, [(0, 0)])
    tiles = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    with pytest.raises(ValueError, match="missing column"):
        zonal.zonal_stats(tiles.drop("nodata"), tiles, RES)


# ----------------------------------------------------------- histogram ----

def test_histogram_np_matches_loop_and_clamps():
    A = _rand((2, 10, 10), nan_frac=0.2)
    A[0, 0, 0] = -500.0   # below lo -> clamps into bin 0
    A[0, 0, 1] = 9999.0   # above hi -> clamps into last bin
    ring = parse_wkt_polygon(_rect_wkt(1.0, 1.0, 9.0, 9.0))
    lo, hi, nb = 0.0, 4000.0, 8
    got = zonal.histogram_np(A, ring, 0.0, 0.0, 10.0, 10.0, lo, hi, nb)
    width = (hi - lo) / nb
    want = np.zeros((2, nb), dtype=np.int64)
    for b in range(2):
        for i in range(10):
            for j in range(10):
                cx, cy = j + 0.5, i + 0.5
                if not points_in_polygon_np(
                        np.array([cx]), np.array([cy]), ring)[0]:
                    continue
                v = A[b, i, j]
                if not np.isfinite(v):
                    continue
                want[b, int(np.clip((v - lo) // width, 0, nb - 1))] += 1
    np.testing.assert_array_equal(got, want)


def test_zonal_histogram_distributed_and_mass_invariant(spark):
    size = cells.cell_size(RES)
    rows, mosaics = _tiles(16, 16, [(ix, iy) for ix in range(2)
                                    for iy in range(2)])
    aoi_rows = [
        {"aoi_id": "h1", "zone": ZONE,
         "geom_wkt": _rect_wkt(0.2 * size, 0.3 * size,
                               1.8 * size, 1.6 * size)},
        {"aoi_id": "h2", "zone": ZONE,
         "geom_wkt": _rect_wkt(0.0, 0.0, 0.7 * size, 0.7 * size)},
    ]
    for a in aoi_rows:
        from vrtility_spark.datagen import _wkt_coords
        xs, ys = _wkt_coords(a["geom_wkt"])
        a.update(xmin=min(xs), ymin=min(ys), xmax=max(xs), ymax=max(ys))
    tiles = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    aoi = spark.createDataFrame(pd.DataFrame(aoi_rows), AOI_SCHEMA)
    lo, hi, nb = 0.0, 4096.0, 8
    got = {(r.aoi_id, r.band, r.bin): r["count"] for r in
           zonal.zonal_histogram(tiles, aoi, RES, lo, hi, nb).collect()}
    # driver-side merge with the loop-gated kernel
    want: dict = {}
    for a in aoi_rows:
        ring = parse_wkt_polygon(a["geom_wkt"])
        for cid, (A, x0, y0, x1, y1) in mosaics.items():
            if (x1 <= a["xmin"] or x0 >= a["xmax"]
                    or y1 <= a["ymin"] or y0 >= a["ymax"]):
                continue
            hb = zonal.histogram_np(A, ring, x0, y0, x1, y1, lo, hi, nb)
            for b in range(hb.shape[0]):
                for k in range(nb):
                    if hb[b, k]:
                        key = (a["aoi_id"], b, k)
                        want[key] = want.get(key, 0) + int(hb[b, k])
    assert got == want
    # mass invariant: bin counts sum to zonal_stats' valid_count
    vc = {(r.aoi_id, r.band): r.valid_count for r in
          zonal.zonal_stats(tiles, aoi, RES).collect()}
    for (aid, b), n in vc.items():
        assert sum(c for (a2, b2, _), c in got.items()
                   if (a2, b2) == (aid, b)) == n
    with pytest.raises(ValueError, match="nbins"):
        zonal.zonal_histogram(tiles, aoi, RES, 0.0, 0.0, 4)


def test_value_counts_np_matches_loop():
    size = cells.cell_size(RES)
    rows, mosaics = _tiles(8, 8, [(0, 0)], seed=3)
    A, x0, y0, x1, y1 = next(iter(mosaics.values()))
    # coarse classes so counts are non-trivial
    A = np.where(np.isfinite(A), np.floor(A / 1000.0), np.nan)
    ring = parse_wkt_polygon(_rect_wkt(0.1 * size, 0.1 * size,
                                       0.8 * size, 0.9 * size))
    got = zonal.value_counts_np(A, ring, x0, y0, x1, y1)
    want: dict = {}
    H, W = A.shape[1], A.shape[2]
    for b in range(A.shape[0]):
        for i in range(H):
            for j in range(W):
                cx = x0 + (j + 0.5) * (x1 - x0) / W
                cy = y0 + (i + 0.5) * (y1 - y0) / H
                if not points_in_polygon_np(
                        np.array([cx]), np.array([cy]), ring)[0]:
                    continue
                v = A[b, i, j]
                if np.isfinite(v):
                    want[(b, float(v))] = want.get((b, float(v)), 0) + 1
    assert {(b, v): c for b, v, c in got} == want


def test_zonal_majority_distributed(spark):
    size = cells.cell_size(RES)
    rows, mosaics = _tiles(16, 16, [(ix, iy) for ix in range(2)
                                    for iy in range(2)], seed=7)
    # quantize payloads into classes INSIDE the tiles themselves
    import vrtility_spark.codec as codec_mod
    class_rows = []
    class_mosaics = {}
    for r, (cid, (A, x0, y0, x1, y1)) in zip(rows, mosaics.items()):
        arr = codec_mod.decode(r["bytes"], r["w"], r["h"], r["fmt"])
        cls = np.where(arr == NODATA, 0, arr // 800 + 1).astype(np.uint16)
        class_rows.append({**r, "bytes": codec_mod.encode(cls, FMT)})
        Ac = np.where(np.isfinite(A), np.floor(A / 800.0) + 1, np.nan)
        class_mosaics[cid] = (Ac, x0, y0, x1, y1)
    aoi_rows = [
        {"aoi_id": "m1", "zone": ZONE,
         "geom_wkt": _rect_wkt(0.2 * size, 0.3 * size,
                               1.7 * size, 1.9 * size)},
        {"aoi_id": "m2", "zone": ZONE,
         "geom_wkt": _rect_wkt(0.1 * size, 0.1 * size,
                               0.6 * size, 0.5 * size)},
    ]
    for a in aoi_rows:
        from vrtility_spark.datagen import _wkt_coords
        xs, ys = _wkt_coords(a["geom_wkt"])
        a.update(xmin=min(xs), ymin=min(ys), xmax=max(xs), ymax=max(ys))
    tiles = spark.createDataFrame(pd.DataFrame(class_rows), TILE_SCHEMA)
    aoi = spark.createDataFrame(pd.DataFrame(aoi_rows), AOI_SCHEMA)
    got = {(r.aoi_id, r.band): (r.value, r["count"], r.total)
           for r in zonal.zonal_majority(tiles, aoi, RES).collect()}
    # driver-side merge of the loop-gated per-tile counts
    agg: dict = {}
    for a in aoi_rows:
        ring = parse_wkt_polygon(a["geom_wkt"])
        for cid, (A, x0, y0, x1, y1) in class_mosaics.items():
            if (x1 <= a["xmin"] or x0 >= a["xmax"]
                    or y1 <= a["ymin"] or y0 >= a["ymax"]):
                continue
            for b, v, c in zonal.value_counts_np(A, ring, x0, y0, x1, y1):
                k = (a["aoi_id"], b, v)
                agg[k] = agg.get(k, 0) + c
    want = {}
    for (aid, b, v), c in agg.items():
        tot = sum(c2 for (a2, b2, _), c2 in agg.items()
                  if (a2, b2) == (aid, b))
        cur = want.get((aid, b))
        # argmax with ties to the smallest value
        if cur is None or c > cur[1] or (c == cur[1] and v < cur[0]):
            want[(aid, b)] = (v, c, tot)
    assert got == want
    # majority count never exceeds the total, and totals match stats
    for (aid, b), (v, c, tot) in got.items():
        assert 0 < c <= tot


def test_zonal_percentile_distributed(spark):
    """Exact interpolated percentiles ≡ np.percentile(method='linear')
    on the per-AOI inside-pixel multiset; median of a tiny AOI; guard
    paths."""
    size = cells.cell_size(RES)
    rows, mosaics = _tiles(16, 16, [(ix, iy) for ix in range(2)
                                    for iy in range(2)], seed=11)
    aoi_rows = [
        {"aoi_id": "p1", "zone": ZONE,
         "geom_wkt": _rect_wkt(0.2 * size, 0.3 * size,
                               1.7 * size, 1.9 * size)},
        {"aoi_id": "p2", "zone": ZONE,
         "geom_wkt": _rect_wkt(0.1 * size, 0.1 * size,
                               0.6 * size, 0.5 * size)},
    ]
    for a in aoi_rows:
        from vrtility_spark.datagen import _wkt_coords
        xs, ys = _wkt_coords(a["geom_wkt"])
        a.update(xmin=min(xs), ymin=min(ys), xmax=max(xs), ymax=max(ys))
    tiles = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    aoi = spark.createDataFrame(pd.DataFrame(aoi_rows), AOI_SCHEMA)
    qs = (0.0, 0.25, 0.5, 0.9, 1.0)
    got = {(r.aoi_id, r.band, r.q): (r.value, r.total)
           for r in zonal.zonal_percentile(tiles, aoi, RES,
                                           qs=qs).collect()}
    # driver-side multiset twin
    vals: dict = {}
    for a in aoi_rows:
        ring = parse_wkt_polygon(a["geom_wkt"])
        for cid, (A, x0, y0, x1, y1) in mosaics.items():
            if (x1 <= a["xmin"] or x0 >= a["xmax"]
                    or y1 <= a["ymin"] or y0 >= a["ymax"]):
                continue
            for b, v, c in zonal.value_counts_np(A, ring, x0, y0,
                                                 x1, y1):
                vals.setdefault((a["aoi_id"], b), []).extend([v] * c)
    assert len(got) == len(vals) * len(qs)
    for (aid, b), pix in vals.items():
        arr = np.asarray(pix)
        for q in qs:
            v, tot = got[(aid, b, q)]
            assert tot == arr.size
            np.testing.assert_allclose(
                v, np.percentile(arr, q * 100, method="linear"),
                rtol=1e-9, atol=1e-9)
    # q=0 / q=1 are exact min/max
    for (aid, b), pix in vals.items():
        assert got[(aid, b, 0.0)][0] == min(pix)
        assert got[(aid, b, 1.0)][0] == max(pix)
    with pytest.raises(ValueError, match="fractions"):
        zonal.zonal_percentile(tiles, aoi, RES, qs=(1.5,))
    with pytest.raises(ValueError, match="duplicate"):
        zonal.zonal_percentile(tiles, aoi, RES, qs=(0.5, 0.5))
    with pytest.raises(ValueError, match="fractions"):
        zonal.zonal_percentile(tiles, aoi, RES, qs=())
