"""Gridding: grid_np vs a naive per-pixel loop for every algorithm,
chunked accumulation invariance, and the distributed cover-explosion
pipeline vs direct per-tile evaluation (radius crossing tile seams,
reshard determinism, nodata where min_points fails)."""

from __future__ import annotations

import numpy as np
import pytest

from vrtility_spark import cells, codec, gridding

ZONE, RES = 40, 3
W = H = 8
SIZE = cells.cell_size(RES)
PX = SIZE / W

RNG = np.random.default_rng(11)
N = 60
XS = np.round(RNG.uniform(0.0, 2 * SIZE, N), 1)
YS = np.round(RNG.uniform(0.0, 2 * SIZE, N), 1)
VS = np.round(RNG.uniform(10, 99, N), 2)
RADIUS = 1.6 * PX


def grid_loop(xs, ys, vs, x0, y0, size, w, h, algorithm, radius,
              power=2.0, smoothing=0.0, min_points=1):
    """Deliberately-naive per-pixel, per-point evaluation."""
    out = np.full((h, w), np.nan)
    for i in range(h):
        for j in range(w):
            cx = x0 + (j + 0.5) * size / w
            cy = y0 + (i + 0.5) * size / h
            cand = []
            for x, y, v in zip(xs, ys, vs):
                d2 = (cx - x) ** 2 + (cy - y) ** 2
                if d2 <= radius ** 2:
                    cand.append((d2, v))
            if algorithm == "count":
                out[i, j] = float(len(cand))
                continue
            if len(cand) < min_points or not cand:
                continue
            if algorithm == "invdist":
                exact = [v for d2, v in cand if d2 + smoothing ** 2 == 0]
                if exact:
                    out[i, j] = float(np.mean(exact))
                else:
                    wts = [(d2 + smoothing ** 2) ** (-power / 2)
                           for d2, _ in cand]
                    out[i, j] = (sum(wt * v for wt, (_, v) in zip(wts, cand))
                                 / sum(wts))
            elif algorithm == "average":
                out[i, j] = float(np.mean([v for _, v in cand]))
            elif algorithm == "min":
                out[i, j] = min(v for _, v in cand)
            elif algorithm == "max":
                out[i, j] = max(v for _, v in cand)
            elif algorithm == "nearest":
                out[i, j] = min(cand, key=lambda t: t[0])[1]
    return out


@pytest.mark.parametrize("algorithm", gridding.ALGORITHMS)
def test_grid_np_matches_loop(algorithm):
    got = gridding.grid_np(XS, YS, VS, 0.0, 0.0, SIZE, W, H,
                           algorithm, RADIUS, smoothing=0.5 * PX
                           if algorithm == "invdist" else 0.0)[0]
    exp = grid_loop(XS, YS, VS, 0.0, 0.0, SIZE, W, H, algorithm, RADIUS,
                    smoothing=0.5 * PX if algorithm == "invdist" else 0.0)
    np.testing.assert_allclose(got, exp, rtol=1e-12, equal_nan=True)


def test_exact_hit_dominates():
    # a point ON a pixel center with smoothing 0: its value verbatim
    x = 0.5 * PX
    got = gridding.grid_np([x, x + 0.1], [x, x], [7.0, 1000.0],
                           0.0, 0.0, SIZE, W, H, "invdist", RADIUS)[0]
    assert got[0, 0] == 7.0


def test_min_points_gate():
    got = gridding.grid_np(XS[:3], YS[:3], VS[:3], 0.0, 0.0, SIZE, W, H,
                           "average", RADIUS, min_points=2)[0]
    loop = grid_loop(XS[:3], YS[:3], VS[:3], 0.0, 0.0, SIZE, W, H,
                     "average", RADIUS, min_points=2)
    np.testing.assert_allclose(got, loop, equal_nan=True)
    assert np.isnan(got).any()


def test_chunking_is_invariant(monkeypatch):
    full = gridding.grid_np(XS, YS, VS, 0.0, 0.0, SIZE, W, H,
                            "invdist", RADIUS)
    monkeypatch.setattr(gridding, "_CHUNK", 7)
    chunked = gridding.grid_np(XS, YS, VS, 0.0, 0.0, SIZE, W, H,
                               "invdist", RADIUS)
    np.testing.assert_array_equal(full, chunked)


def test_chunk_adapts_to_tile_area():
    """Review finding: a fixed 4096-point chunk made (P, h, w)
    temporaries multi-GB on big tiles. The chunk now shrinks with tile
    area (deterministically — it depends only on the dims), keeping the
    historical 4096 for the 256-px fixture tiles so constants stand."""
    assert gridding._chunk_points(16, 16) == 4096
    assert gridding._chunk_points(256, 256) == \
        gridding._CHUNK_ELEMS // (256 * 256) == 64
    assert gridding._chunk_points(4096, 4096) == 1  # floor, never 0
    big = gridding.grid_np(XS, YS, VS, 0.0, 0.0, SIZE, 128, 128,
                           "invdist", RADIUS)
    assert big.shape == (1, 128, 128)  # runs under the shrunk chunk


def test_bad_params():
    with pytest.raises(KeyError):
        gridding.grid_np(XS, YS, VS, 0, 0, SIZE, W, H, "kriging", RADIUS)
    with pytest.raises(ValueError):
        gridding.grid_np(XS, YS, VS, 0, 0, SIZE, W, H, "invdist", 0.0)


def _points_df(spark):
    return spark.createDataFrame(
        [(int(i), ZONE, float(x), float(y), float(v))
         for i, (x, y, v) in enumerate(zip(XS, YS, VS))],
        "pid long, zone long, x double, y double, value double")


def _decode_all(df):
    out = {}
    for r in df.collect():
        arr = codec.decode(r["bytes"], r["w"], r["h"], r["fmt"])
        A = codec.to_float_masked(arr, r["nodata"])
        out[r["cell_id"]] = (A[0], r["n_points"])
    return out


@pytest.mark.parametrize("algorithm", ["invdist", "nearest", "count"])
def test_distributed_matches_direct(spark, algorithm):
    got = _decode_all(gridding.grid_points(
        _points_df(spark), RES, W, H, algorithm, radius=RADIUS,
        id_col="pid"))
    # direct: for each covered cell, evaluate grid_np on the points
    # whose radius-bbox intersects the cell frame, in pid order
    exp_cells = set()
    for x, y in zip(XS, YS):
        for c in cells.cover_bbox_np(ZONE, x - RADIUS, y - RADIUS,
                                     x + RADIUS, y + RADIUS, RES):
            exp_cells.add(int(c))
    assert set(got) == exp_cells
    for cid in exp_cells:
        _, _, ix, iy = (int(v) for v in cells.decode_np(cid))
        x0, y0 = ix * SIZE, iy * SIZE
        sel = [(i, x, y, v) for i, (x, y, v) in
               enumerate(zip(XS, YS, VS))
               if (x0 - RADIUS <= x < x0 + SIZE + RADIUS
                   and y0 - RADIUS <= y < y0 + SIZE + RADIUS)]
        # mirror cells_cover's exclusive upper edge: drop points whose
        # bbox only touches the cell boundary
        sel = [t for t in sel if int(cid) in
               {int(c) for c in cells.cover_bbox_np(
                   ZONE, t[1] - RADIUS, t[2] - RADIUS,
                   t[1] + RADIUS, t[2] + RADIUS, RES)}]
        exp = gridding.grid_np(
            [t[1] for t in sel], [t[2] for t in sel], [t[3] for t in sel],
            x0, y0, SIZE, W, H, algorithm, RADIUS)[0]
        # storage round trip
        exp32 = codec.to_float_masked(codec.from_float(
            exp[None], gridding.OUT_NODATA, "float32"), gridding.OUT_NODATA)[0]
        A, npts = got[cid]
        assert npts == len(sel)
        np.testing.assert_array_equal(A, exp32, err_msg=f"cell {cid}")


def test_reshard_deterministic(spark):
    a = _decode_all(gridding.grid_points(
        _points_df(spark), RES, W, H, "invdist", radius=RADIUS,
        id_col="pid"))
    b = _decode_all(gridding.grid_points(
        _points_df(spark).repartition(13), RES, W, H, "invdist",
        radius=RADIUS, id_col="pid"))
    assert set(a) == set(b)
    for cid in a:
        np.testing.assert_array_equal(a[cid][0], b[cid][0])


def test_seam_influence(spark):
    # a single point 0.4 px from the right edge of tile (0,0) must
    # also shape tile (1,0)'s surface
    x = SIZE - 0.4 * PX
    pts = spark.createDataFrame(
        [(0, ZONE, float(x), float(0.5 * SIZE), 42.0)],
        "pid long, zone long, x double, y double, value double")
    got = _decode_all(gridding.grid_points(
        pts, RES, W, H, "invdist", radius=RADIUS, id_col="pid"))
    c0 = int(cells.encode_np(ZONE, RES, 0, 0))
    c1 = int(cells.encode_np(ZONE, RES, 1, 0))
    assert set(got) == {c0, c1}
    assert np.isfinite(got[c1][0]).any()
