"""Feathered mosaics: analytic weights vs a per-pixel loop, blend vs a
per-pixel weighted-mean loop, single-scene identity, seam-ramp
property on constant scenes, and distributed ≡ kernel replication
through the regrid stage."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, feather

RNG = np.random.default_rng(31)


def test_weights_match_pixel_loop():
    size, w, h, cap = 64.0, 8, 4, 3.0
    cx0, cy0 = 128.0, 256.0
    fp = (cx0 - 10.0, cy0 + 8.0, cx0 + 40.0, cy0 + 70.0)
    W = feather.feather_weights_np(cx0, cy0, size, w, h, fp, cap)
    px, py = size / w, size / h
    for yy in range(h):
        for xx in range(w):
            x = cx0 + (xx + 0.5) * px
            y = cy0 + (yy + 0.5) * py
            d = min((x - fp[0]) / px, (fp[2] - x) / px,
                    (y - fp[1]) / py, (fp[3] - y) / py)
            want = min(max(d, feather.W_FLOOR), cap)
            np.testing.assert_allclose(W[yy, xx], want, rtol=1e-12)
    # fully-interior footprint: every weight at the cap
    big = (cx0 - 1e6, cy0 - 1e6, cx0 + 1e6, cy0 + 1e6)
    assert (feather.feather_weights_np(cx0, cy0, size, w, h, big, cap)
            == cap).all()


def test_blend_matches_pixel_loop_and_identity():
    T, B, H, W = 4, 2, 5, 6
    stack = RNG.uniform(0, 100, (T, B, H, W))
    stack[RNG.random(stack.shape) < 0.25] = np.nan
    wts = RNG.uniform(0.25, 8.0, (T, H, W))
    out = feather.feather_blend_np(stack, wts)
    for b in range(B):
        for yy in range(H):
            for xx in range(W):
                v = stack[:, b, yy, xx]
                m = np.isfinite(v)
                if not m.any():
                    assert np.isnan(out[b, yy, xx])
                else:
                    want = np.average(v[m], weights=wts[m, yy, xx])
                    np.testing.assert_allclose(out[b, yy, xx], want,
                                               rtol=1e-12)
    # one scene -> identity on its valid pixels
    one = feather.feather_blend_np(stack[:1], wts[:1])
    np.testing.assert_allclose(one, stack[0], equal_nan=True)
    with pytest.raises(ValueError, match="weights"):
        feather.feather_blend_np(stack, wts[:, :2])


def test_seam_is_a_monotone_ramp():
    """Two constant scenes overlapping in a band: the blend must move
    monotonically from one level to the other across the overlap."""
    size, w, h, cap = 64.0, 16, 16, 4.0
    cx0 = cy0 = 0.0
    # scene A covers x<..36, scene B covers x>..28 (8px overlap zone)
    fpA = (-1e3, -1e3, 36.0, 1e3)
    fpB = (28.0, -1e3, 1e3, 1e3)
    wA = feather.feather_weights_np(cx0, cy0, size, w, h, fpA, cap)
    wB = feather.feather_weights_np(cx0, cy0, size, w, h, fpB, cap)
    stack = np.stack([np.full((1, h, w), 100.0),
                      np.full((1, h, w), 200.0)])
    # outside each footprint the scene has no data
    xs = cx0 + (np.arange(w) + 0.5) * (size / w)
    stack[0][:, :, xs > fpA[2]] = np.nan
    stack[1][:, :, xs < fpB[0]] = np.nan
    out = feather.feather_blend_np(stack, np.stack([wA, wB]))[0]
    row = out[0]
    assert np.all(np.diff(row) >= -1e-9)      # monotone A -> B
    assert row[0] == 100.0 and row[-1] == 200.0
    mid = (xs > fpB[0]) & (xs < fpA[2])
    assert ((row[mid] > 100.0) & (row[mid] < 200.0)).all()


def test_distributed_matches_replication(spark):
    from vrtility_spark import datagen, schema
    from vrtility_spark.cells import cell_size, cover_bbox_np, decode_np
    from vrtility_spark.warp import sample_plane_masked

    pdf = datagen.offset_images_pandas()
    df = schema.images_df(spark, pdf)
    cap = 5.0
    got = {r.cell_id: r for r in feather.feather_mosaic(
        df, datagen.TILE_RES, 16, 16, cap_px=cap,
        resampling="nearest").collect()}

    size = cell_size(datagen.TILE_RES)
    tiles: dict[int, list] = {}
    for r in pdf.itertuples(index=False):
        arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
        nd = np.asarray(r.band_nodata, dtype=np.float64)
        res_x = (r.xmax - r.xmin) / r.w
        for cid in cover_bbox_np(r.zone, r.xmin, r.ymin, r.xmax,
                                 r.ymax, datagen.TILE_RES):
            _, _, ix, iy = decode_np(cid)
            cx0, cy0 = float(ix) * size, float(iy) * size
            if not (cx0 < r.xmax and cx0 + size > r.xmin
                    and cy0 < r.ymax and cy0 + size > r.ymin):
                continue
            fx = (cx0 + (np.arange(16) + 0.5) * (size / 16)
                  - r.xmin) / res_x - 0.5
            fy = (cy0 + (np.arange(16) + 0.5) * (size / 16)
                  - r.ymin) / res_x - 0.5
            planes = []
            for b in range(len(arr)):
                if b == len(arr) - 1:  # class plane: nearest raw
                    p = sample_plane_masked(
                        arr[b].astype(np.float64), fy, fx, "nearest")
                else:
                    p = sample_plane_masked(
                        codec.to_float_masked(arr[b][None],
                                              float(nd[b]))[0],
                        fy, fx, "nearest")
                planes.append(codec.from_float(p[None], float(nd[b]),
                                               "uint16")[0])
            wts = feather.feather_weights_np(
                cx0, cy0, size, 16, 16,
                (r.xmin, r.ymin, r.xmax, r.ymax), cap)
            tiles.setdefault(int(cid), []).append(
                (r.datetime, r.image_id, np.stack(planes), nd, wts))
    assert set(got) == set(tiles)
    for cid, entries in tiles.items():
        entries.sort(key=lambda e: (e[0], e[1]))
        nd = entries[0][3]
        stack = np.stack([codec.to_float_masked(e[2], nd)
                          for e in entries])
        wts = np.stack([e[4] for e in entries])
        want = codec.from_float(
            feather.feather_blend_np(stack, wts), nd, "uint16")
        r = got[cid]
        assert r.n_scenes == len(entries)
        np.testing.assert_array_equal(
            codec.decode(r.bytes, r.w, r.h, r.fmt), want,
            err_msg=f"cell {cid}")


def test_pipeline_verb_and_bundle(spark, tmp_path):
    from vrtility_spark import datagen, schema
    from vrtility_spark.pipeline import Pipeline
    df = schema.images_df(spark, datagen.offset_images_pandas())

    def run(p):
        return (p.set_maskfun("int", datagen.S2_MASK_VALUES)
                .feather(datagen.TILE_RES, 16, cap_px=4.0))

    ran = run(Pipeline(df))
    rows = {r.cell_id: r for r in ran.df.collect()}
    assert rows and all(r.fmt == "raw16" for r in rows.values())
    path = str(tmp_path / "feather_bundle.json")
    ran.to_bundle(path)
    replay = {r.cell_id: r for r in
              Pipeline.from_bundle(path, df).df.collect()}
    assert set(replay) == set(rows)
    for cid in rows:
        assert replay[cid].bytes == rows[cid].bytes
    with pytest.raises(ValueError, match="cap_px"):
        feather.feather_mosaic(df, datagen.TILE_RES, 16, cap_px=0.1)
