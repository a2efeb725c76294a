"""Region extraction (polygonize): the runs-union-find labeler vs a
deliberately-naive BFS flood fill, and the distributed seam-merge vs
regions computed on the single assembled mosaic — the invariant a
tile-at-a-time port breaks for every region that crosses a boundary."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, regions
from vrtility_spark.regions import (PID_RADIX, label_np, polygonize,
                                    region_table_np)

RNG = np.random.default_rng(11)

ZONE, RES = 30, 3
FMT, NODATA = "raw16", 99.0
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


# ------------------------------------------------------- loop oracle ----

def bfs_labels(vals: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Naive stack-based flood fill, canonical min-pixel-index labels."""
    vals = np.asarray(vals, float)
    valid = np.asarray(valid, bool) & np.isfinite(vals)
    H, W = vals.shape
    L = np.full((H, W), -1, np.int64)
    seen = np.zeros((H, W), bool)
    for y in range(H):
        for x in range(W):
            if not valid[y, x] or seen[y, x]:
                continue
            stack, comp = [(y, x)], []
            seen[y, x] = True
            while stack:
                cy, cx = stack.pop()
                comp.append((cy, cx))
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ny, nx = cy + dy, cx + dx
                    if (0 <= ny < H and 0 <= nx < W and valid[ny, nx]
                            and not seen[ny, nx]
                            and vals[ny, nx] == vals[cy, cx]):
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            m = min(cy * W + cx for cy, cx in comp)
            for cy, cx in comp:
                L[cy, cx] = m
    return L


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_label_np_matches_bfs(seed):
    rng = np.random.default_rng(seed)
    for _ in range(8):
        H, W = rng.integers(1, 24, 2)
        vals = rng.integers(0, 3, (int(H), int(W))).astype(float)
        valid = rng.random((int(H), int(W))) > 0.25
        vals[~valid] = np.nan
        np.testing.assert_array_equal(label_np(vals, valid),
                                      bfs_labels(vals, valid))


def test_label_np_adversarial_shapes():
    ones = np.ones((8, 8), bool)
    cb = (np.indices((8, 8)).sum(0) % 2).astype(float)  # 64 components
    np.testing.assert_array_equal(label_np(cb, ones), bfs_labels(cb, ones))
    snake = np.ones((7, 7))  # serpentine single component
    snake[1, :6] = 0.0
    snake[3, 1:] = 0.0
    snake[5, :6] = 0.0
    np.testing.assert_array_equal(label_np(snake, np.ones((7, 7), bool)),
                                  bfs_labels(snake, np.ones((7, 7), bool)))
    u = np.ones((3, 3))  # U-shape: late union of two early branches
    u[0, 1] = 0.0
    u[1, 1] = 0.0
    np.testing.assert_array_equal(label_np(u, np.ones((3, 3), bool)),
                                  bfs_labels(u, np.ones((3, 3), bool)))
    empty = np.full((4, 4), np.nan)
    assert (label_np(empty, np.ones((4, 4), bool)) == -1).all()


def test_region_table_np_matches_loop():
    vals = RNG.integers(0, 2, (15, 13)).astype(float)
    valid = RNG.random((15, 13)) > 0.2
    L = label_np(vals, valid)
    lab, val, cnt, pxmin, pymin, pxmax, pymax = region_table_np(L, vals)
    assert (np.diff(lab) > 0).all()
    for i, lb in enumerate(lab):
        ys, xs = np.nonzero(L == lb)
        assert cnt[i] == len(ys)
        assert val[i] == vals[ys[0], xs[0]]
        assert (pxmin[i], pymin[i], pxmax[i], pymax[i]) == (
            xs.min(), ys.min(), xs.max(), ys.max())


# ------------------------------------------- distributed seam merge ----

def _class_tiles(h, w, positions, n_classes=3, nodata_frac=0.15, seed=5,
                 planes=1):
    """Class-valued tiles; returns (rows, mosaic) where the mosaic is
    the target plane (plane 0 unless planes>1, then the LAST plane)
    with NaN at holes and missing tiles."""
    rng = np.random.default_rng(seed)
    nx = max(p[0] for p in positions) + 1
    ny = max(p[1] for p in positions) + 1
    G = np.full((ny * h, nx * w), np.nan)
    rows = []
    for ix, iy in positions:
        arr = rng.integers(0, n_classes, (planes, h, w)).astype(float)
        arr[rng.random(arr.shape) < nodata_frac] = NODATA
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(np.uint16), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": NODATA})
        A = arr[-1].astype(float)
        A[A == NODATA] = np.nan
        G[iy * h:(iy + 1) * h, ix * w:(ix + 1) * w] = A
    return rows, G


def _mosaic_region_rows(G, h, w, values=None):
    """Independent oracle: BFS the assembled mosaic, then rebuild the
    operator's output rows (global min-pid ids, per-tile partial bboxes
    folded with min/max — the same float expressions, so equality is
    exact)."""
    valid = np.isfinite(G)
    if values is not None:
        valid &= np.isin(G, list(values))
    L = bfs_labels(np.where(valid, G, np.nan), valid)
    Hm, Wm = L.shape
    Pd = np.full((Hm + 2, Wm + 2), -2, dtype=np.int64)
    Pd[1:-1, 1:-1] = L
    rows = []
    for lb in np.unique(L[L >= 0]):
        ys, xs = np.nonzero(L == lb)
        perim = 0  # global exposed edges, counted on the MOSAIC
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            nb = Pd[1 + dy:1 + dy + Hm, 1 + dx:1 + dx + Wm]
            perim += int(((L == lb) & (nb != L)).sum())
        tiles = {}
        for y, x in zip(ys, xs):
            ix, iy = x // w, y // h
            tiles.setdefault((ix, iy), []).append((y % h, x % w))
        pids, bx0, by0, bx1, by1 = [], [], [], [], []
        for (ix, iy), pix in tiles.items():
            cid = int(cells.encode_np(ZONE, RES, ix, iy))
            pids.append(min(cid * PID_RADIX + py * w + px
                            for py, px in pix))
            x0, y0, size = cells.cell_frame_np(cid)
            x0, y0, size = float(x0), float(y0), float(size)
            lx = [px for _, px in pix]
            ly = [py for py, _ in pix]
            bx0.append(x0 + min(lx) * (size / w))
            bx1.append(x0 + (max(lx) + 1) * (size / w))
            by0.append(y0 + min(ly) * (size / h))
            by1.append(y0 + (max(ly) + 1) * (size / h))
        rows.append((min(pids), float(G[ys[0], xs[0]]), len(ys), perim,
                     len(tiles), min(bx0), min(by0), max(bx1), max(by1)))
    return sorted(rows)


def _collect_rows(df):
    return sorted((r["region_id"], r["value"], r["pixel_count"],
                   r["perimeter"], r["n_tiles"], r["xmin"], r["ymin"],
                   r["xmax"], r["ymax"]) for r in df.collect())


def test_distributed_matches_mosaic(spark):
    h = w = 12
    positions = [(ix, iy) for ix in range(3) for iy in range(3)]
    rows, G = _class_tiles(h, w, positions)
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    got = _collect_rows(polygonize(df))
    want = _mosaic_region_rows(G, h, w)
    assert got == want
    # the fixture must actually exercise the seam merge
    assert any(r[4] > 1 for r in want), "no region crosses a tile seam"


def test_missing_tile_and_values_filter(spark):
    h = w = 10
    positions = [(0, 0), (1, 0), (0, 1)]  # (1,1) missing
    rows, G = _class_tiles(h, w, positions, n_classes=2, seed=9)
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    assert _collect_rows(polygonize(df)) == _mosaic_region_rows(G, h, w)
    got = _collect_rows(polygonize(df, values=[1.0]))
    want = _mosaic_region_rows(G, h, w, values=[1.0])
    assert got == want and all(r[1] == 1.0 for r in got)


def test_band_selection_and_guards(spark):
    h = w = 8
    positions = [(0, 0), (1, 0)]
    rows, G = _class_tiles(h, w, positions, planes=2, seed=13)
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    # plane 1 (the mosaic helper tracks the LAST plane)
    assert _collect_rows(polygonize(df, band=1)) == \
        _mosaic_region_rows(G, h, w)
    with pytest.raises(Exception, match="band 7 out of range"):
        polygonize(df, band=7).collect()
    with pytest.raises(ValueError, match="missing column"):
        polygonize(df.drop("nodata"))


def test_single_tile_no_edges(spark):
    # isolated tiles: CC gets an empty edge set, labels pass through
    h = w = 6
    rows, G = _class_tiles(h, w, [(0, 0)], n_classes=2, seed=3)
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    got = _collect_rows(polygonize(df))
    assert got == _mosaic_region_rows(G, h, w)
    assert all(r[4] == 1 for r in got)


def test_pipeline_polygonize_verb(spark, tiny_images):
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline
    out = (Pipeline(tiny_images)
           .warp(cell_res=datagen.TILE_RES)
           .composite("first")
           .polygonize(band=-1))
    rows = out.collect()
    assert len(rows) > 0
    assert {f.name for f in out.schema.fields} == {
        "region_id", "value", "pixel_count", "perimeter", "n_tiles",
        "xmin", "ymin", "xmax", "ymax"}
    # SCL classes only; every region id decodes to a real cell
    scl = {float(v) for v in np.unique(
        [r["value"] for r in rows])}
    assert all(v == int(v) for v in scl)
    for r in rows:
        zone, res, _, _ = (int(x) for x in
                           cells.decode_np(r["region_id"] // PID_RADIX))
        assert res == datagen.TILE_RES
