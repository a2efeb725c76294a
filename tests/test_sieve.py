"""Sieve (small-region removal): distributed vs a mosaic oracle that
replicates the exact semantics (global sizes, pid-space tie-breaks,
largest-neighbor merge), plus nodata mode, orphan speckle, values
filter, and multi-round convergence."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, regions
from vrtility_spark.regions import PID_RADIX, sieve
from test_regions import ZONE, RES, NODATA, TILE_SCHEMA, _class_tiles, \
    bfs_labels


def mosaic_sieve(G, h, w, min_pixels, fill, values=None):
    """Oracle: BFS-label the mosaic, compute pid-space ids/sizes,
    build the adjacency graph, rewrite small regions."""
    valid = np.isfinite(G)
    if values is not None:
        valid &= np.isin(G, list(values))
    L = bfs_labels(np.where(valid, G, np.nan), valid)
    comp_of, size_c, val_c = {}, {}, {}
    for lb in np.unique(L[L >= 0]):
        ys, xs = np.nonzero(L == lb)
        pids = [int(cells.encode_np(ZONE, RES, x // w, y // h))
                * PID_RADIX + (y % h) * w + (x % w)
                for y, x in zip(ys, xs)]
        c = min(pids)
        comp_of[lb] = c
        size_c[c] = len(ys)
        val_c[c] = float(G[ys[0], xs[0]])
    nbrs = defaultdict(set)
    H, W = G.shape
    for y in range(H):
        for x in range(W):
            if L[y, x] < 0:
                continue
            for dy, dx in ((0, 1), (1, 0)):
                ny, nx = y + dy, x + dx
                if (ny < H and nx < W and L[ny, nx] >= 0
                        and L[ny, nx] != L[y, x]):
                    a, b = comp_of[L[y, x]], comp_of[L[ny, nx]]
                    nbrs[a].add(b)
                    nbrs[b].add(a)
    G2 = G.copy()
    for lb, c in comp_of.items():
        if size_c[c] >= min_pixels:
            continue
        if fill == "largest_neighbor":
            cands = sorted(nbrs[c], key=lambda n: (-size_c[n], n))
            if not cands:
                continue  # orphan speckle keeps its value
            newv = val_c[cands[0]]
        else:
            newv = np.nan
        G2[L == lb] = newv
    return G2


def _decode_plane(rows, got):
    out = {}
    for r in rows:
        cid = r["cell_id"]
        arr = codec.decode(got[cid]["bytes"], r["w"], r["h"], r["fmt"])
        out[cid] = codec.to_float_masked(arr, got[cid]["nodata"])[0]
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    return {r["cell_id"]: r.asDict() for r in sieve(df, **kw).collect()}


@pytest.mark.parametrize("fill", ["largest_neighbor", "nodata"])
def test_sieve_matches_mosaic_oracle(spark, fill):
    h = w = 12
    positions = [(ix, iy) for ix in range(3) for iy in range(3)]
    rows, G = _class_tiles(h, w, positions, n_classes=2, nodata_frac=0.05)
    got = _run(spark, rows, band=0, min_pixels=6, fill=fill)
    want = mosaic_sieve(G, h, w, 6, fill)
    planes = _decode_plane(rows, got)
    for ix, iy in positions:
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        tile = want[iy * h:(iy + 1) * h, ix * w:(ix + 1) * w]
        np.testing.assert_array_equal(planes[cid], tile)
    # the fixture must actually sieve something
    assert not np.array_equal(
        np.nan_to_num(want, nan=-1), np.nan_to_num(G, nan=-1))


def test_sieve_rounds_converge(spark):
    h = w = 12
    positions = [(ix, iy) for ix in range(2) for iy in range(2)]
    rows, G = _class_tiles(h, w, positions, n_classes=3,
                           nodata_frac=0.0, seed=7)

    def n_small(result_rows):
        df = spark.createDataFrame(
            pd.DataFrame([{**rows[i], "bytes": result_rows[
                rows[i]["cell_id"]]["bytes"]} for i in range(len(rows))]),
            schema=TILE_SCHEMA)
        reg = regions.polygonize(df, band=0).collect()
        return sum(1 for r in reg if r["pixel_count"] < 6)

    one = _run(spark, rows, band=0, min_pixels=6, rounds=1)
    two = _run(spark, rows, band=0, min_pixels=6, rounds=2)
    assert n_small(two) <= n_small(one)
    # round 2 on round-1 output == rounds=2 in one call
    df_one = spark.createDataFrame(
        pd.DataFrame([{**rows[i], "bytes": one[rows[i]["cell_id"]]
                       ["bytes"]} for i in range(len(rows))]),
        schema=TILE_SCHEMA)
    again = {r["cell_id"]: r.asDict()
             for r in sieve(df_one, band=0, min_pixels=6).collect()}
    for cid in two:
        assert two[cid]["bytes"] == again[cid]["bytes"]


def test_orphan_speckle_and_values_filter(spark):
    h = w = 10
    arr = np.full((1, h, w), NODATA)
    arr[0, 4:6, 4:6] = 3.0        # 4-px island in a nodata sea
    arr[0, 0:3, 0:8] = 5.0        # big region of an EXCLUDED class
    cid = int(cells.encode_np(ZONE, RES, 2, 2))
    rows = [{"cell_id": cid,
             "bytes": codec.encode(arr.astype(np.uint16), "raw16"),
             "w": w, "h": h, "fmt": "raw16", "nodata": NODATA}]
    # largest_neighbor: the island has NO neighbors → unchanged
    got = _run(spark, rows, band=0, min_pixels=9,
               fill="largest_neighbor", values=[3.0])
    plane = _decode_plane(rows, got)[cid]
    assert (plane[4:6, 4:6] == 3.0).all()
    # excluded class untouched even though it neighbors nothing valid
    arr2 = codec.decode(got[cid]["bytes"], w, h, "raw16")
    assert (arr2[0, 0:3, 0:8] == 5).all()
    # nodata mode: the island drops
    got = _run(spark, rows, band=0, min_pixels=9, fill="nodata",
               values=[3.0])
    plane = _decode_plane(rows, got)[cid]
    assert np.isnan(plane[4:6, 4:6]).all()


def test_sieve_validation(spark):
    h = w = 8
    rows, _ = _class_tiles(h, w, [(0, 0)])
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    with pytest.raises(KeyError, match="fill"):
        sieve(df, fill="wat")
    with pytest.raises(ValueError, match="min_pixels"):
        sieve(df, min_pixels=0)


def test_pipeline_sieve_verb_and_bundle(spark, tiny_images, tmp_path):
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline
    p = (Pipeline(tiny_images)
         .warp(cell_res=datagen.TILE_RES)
         .composite("first")
         .sieve(min_pixels=4, band=-1))
    rows = p.df.collect()
    assert len(rows) == 12
    bundle = p.to_bundle(str(tmp_path / "b.json"))
    assert any(v["verb"] == "sieve" for v in bundle["verbs"])
    replay = Pipeline.from_bundle(str(tmp_path / "b.json"), tiny_images)
    got = {r.cell_id: r.bytes for r in replay.df.collect()}
    assert got == {r.cell_id: r.bytes for r in rows}
    # sieving reduced (or kept) the number of sub-threshold regions
    before = regions.polygonize(
        Pipeline(tiny_images).warp(cell_res=datagen.TILE_RES)
        .composite("first").df, band=-1).collect()
    after = regions.polygonize(p.df, band=-1).collect()
    small_b = sum(1 for r in before if r["pixel_count"] < 4)
    small_a = sum(1 for r in after if r["pixel_count"] < 4)
    assert small_a < small_b


def test_nodata_fill_requires_finite_sentinel(spark):
    # integer payload + NULL nodata → loud error, not a NaN-cast crash
    h = w = 8
    arr = np.ones((1, h, w)); arr[0, 3, 3:5] = 0.0
    cid = int(cells.encode_np(ZONE, RES, 1, 1))
    df = spark.createDataFrame(
        pd.DataFrame([{"cell_id": cid,
                       "bytes": codec.encode(arr.astype(np.uint16),
                                             "raw16"),
                       "w": w, "h": h, "fmt": "raw16", "nodata": None}]),
        TILE_SCHEMA)
    with pytest.raises(Exception, match="finite nodata"):
        sieve(df, band=0, min_pixels=3, fill="nodata").collect()


def test_duplicate_tile_rows_fail_loudly(spark):
    h = w = 8
    rows, _ = _class_tiles(h, w, [(0, 0), (1, 0)], n_classes=1,
                           nodata_frac=0.0)
    dup = rows + [rows[0]]  # cell (0,0) twice
    df = spark.createDataFrame(pd.DataFrame(dup), schema=TILE_SCHEMA)
    with pytest.raises(Exception, match="one row per cell"):
        regions.polygonize(df, band=0).collect()


def test_mismatched_tile_dims_never_pair(spark):
    # a 16px tile next to an 8px tile: regions must NOT merge across
    # that seam (edge length is part of the seam key)
    rows = []
    for ix, size in ((0, 8), (1, 16)):
        arr = np.ones((1, size, size))
        cid = int(cells.encode_np(ZONE, RES, ix, 0))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(np.uint16),
                                           "raw16"),
                     "w": size, "h": size, "fmt": "raw16",
                     "nodata": NODATA})
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)
    got = regions.polygonize(df, band=0).collect()
    assert len(got) == 2 and all(r["n_tiles"] == 1 for r in got)


def test_incremental_rounds_relabel_only_patched_cells(spark, monkeypatch):
    """rounds=2 must re-run the decode+label emit stage on ONLY the
    cells round 1 patched; untouched tiles reuse their checkpointed
    partials (and the result stays byte-identical to chaining single
    rounds — pinned by test_sieve_rounds_converge)."""
    # 2x2 grid where ONLY tile (0,0) contains sub-threshold speckle:
    # uniform tiles are never patched, so round 2 must re-emit 1 cell
    h = w = 12
    from test_regions import FMT
    rows = []
    for ix, iy in [(0, 0), (1, 0), (0, 1), (1, 1)]:
        arr = np.full((1, h, w), 1.0)
        if (ix, iy) == (0, 0):
            arr[0, 5, 5] = 2.0  # 1-px speckle inside the big region
            arr[0, 8, 2:4] = 2.0  # 2-px speckle
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        rows.append({"cell_id": cid,
                     "bytes": codec.encode(arr.astype(np.uint16), FMT),
                     "w": w, "h": h, "fmt": FMT, "nodata": NODATA})
    df = spark.createDataFrame(pd.DataFrame(rows), schema=TILE_SCHEMA)

    emit_inputs = []
    orig = regions._emit_stage

    def spy(d, *a, **k):
        emit_inputs.append(d.count())
        return orig(d, *a, **k)

    monkeypatch.setattr(regions, "_emit_stage", spy)
    out = regions.sieve(df, band=0, min_pixels=6, rounds=2)
    got = {r["cell_id"]: r["bytes"] for r in out.collect()}
    monkeypatch.undo()
    assert len(got) == len(rows)
    assert len(emit_inputs) == 2
    assert emit_inputs[0] == len(rows)  # round 1: full corpus
    assert emit_inputs[1] == 1          # round 2: only the patched cell
    # and the speckle is gone
    speck = codec.decode(got[rows[0]["cell_id"]], h, w, FMT)
    np.testing.assert_array_equal(speck[0], np.full((h, w), 1))
