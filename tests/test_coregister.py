"""Co-registration: planted integer shifts are recovered exactly (to
subpixel refinement tolerance), NCC matches a per-shift loop oracle,
degenerate overlaps report NaN, the distributed shift table matches
the kernel, and apply_shifts restores a planted misalignment."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, coregister

RNG = np.random.default_rng(41)


def _ncc_loop(a, b):
    m = np.isfinite(a) & np.isfinite(b)
    av, bv = a[m] - a[m].mean(), b[m] - b[m].mean()
    den = np.sqrt((av ** 2).sum() * (bv ** 2).sum())
    return (av * bv).sum() / den


def test_planted_shifts_recovered():
    ref = RNG.uniform(0, 100, (32, 32))
    for dy, dx in [(0, 0), (2, 1), (-3, 0), (4, -4), (-1, 3)]:
        img = coregister.shift_np(ref[None], dy, dx)[0]
        gdy, gdx, peak, n = coregister.register_np(ref, img, 4)
        assert abs(gdy - dy) <= 0.5 and abs(gdx - dx) <= 0.5, (dy, dx)
        np.testing.assert_allclose(peak, 1.0, rtol=1e-9)
        assert n == (32 - abs(dy)) * (32 - abs(dx))
    # holes don't break recovery
    img = coregister.shift_np(ref[None], 2, -2)[0]
    img[RNG.random(img.shape) < 0.25] = np.nan
    gdy, gdx, peak, _ = coregister.register_np(ref, img, 4)
    assert abs(gdy - 2) <= 0.5 and abs(gdx + 2) <= 0.5


def test_score_matches_ncc_loop_and_determinism():
    ref = RNG.uniform(0, 50, (16, 16))
    img = RNG.uniform(0, 50, (16, 16))
    # zero-shift candidate must equal the straight NCC of the planes
    dy, dx, peak, n = coregister.register_np(ref, ref + 0.0, 1)
    assert (dy, dx) == (0.0, 0.0)
    # identical inputs twice -> identical output (pure function)
    a = coregister.register_np(ref, img, 3)
    b = coregister.register_np(ref, img, 3)
    assert a == b
    # the chosen peak really is the max over the candidate grid
    best = -np.inf
    for iy in range(-3, 4):
        for ix in range(-3, 4):
            ry0, ry1 = max(0, -iy), min(16, 16 - iy)
            rx0, rx1 = max(0, -ix), min(16, 16 - ix)
            c = _ncc_loop(ref[ry0:ry1, rx0:rx1],
                          img[ry0 + iy:ry1 + iy, rx0 + ix:rx1 + ix])
            best = max(best, c)
    np.testing.assert_allclose(a[2], best, rtol=1e-12)


def test_degenerate_cases():
    flat = np.zeros((8, 8))
    dy, dx, peak, n = coregister.register_np(flat, flat, 2,
                                             min_overlap=4)
    assert np.isnan(dy) and np.isnan(peak) and n == 64
    # too little overlap
    holey = np.full((8, 8), np.nan)
    holey[0, 0] = 1.0
    dy, dx, peak, _ = coregister.register_np(
        np.ones((8, 8)), holey, 2, min_overlap=4)
    assert np.isnan(dy)
    with pytest.raises(ValueError, match="shapes"):
        coregister.register_np(flat, np.zeros((4, 4)), 2)
    with pytest.raises(ValueError, match="max_shift"):
        coregister.register_np(flat, flat, 0)


def test_shift_np_roundtrip_and_rim():
    A = RNG.uniform(0, 9, (2, 6, 6))
    S = coregister.shift_np(A, 2, -1)
    assert np.isnan(S[:, :2, :]).all() and np.isnan(S[:, :, -1:]).all()
    np.testing.assert_array_equal(S[:, 2:, :-1], A[:, :-2, 1:])
    # inverse restores the interior
    B = coregister.shift_np(S, -2, 1)
    np.testing.assert_array_equal(B[:, :-2, 1:], A[:, :-2, 1:])


ZONE, RES = 70, 3
TILE_SCHEMA = ("cell_id long, image_id string, bytes binary, w int, "
               "h int, fmt string, nodata double")


def _scene_rows(spark):
    ref_rows, scene_rows, truth = [], [], {}
    for j, (ix, iy) in enumerate([(0, 0), (1, 0)]):
        cid = int(cells.encode_np(ZONE, RES, ix, iy))
        base = np.round(RNG.uniform(10, 4000, (2, 16, 16)))
        ref_rows.append({"cell_id": cid,
                         "bytes": codec.encode(
                             base.astype(np.uint16), "raw16"),
                         "w": 16, "h": 16, "fmt": "raw16",
                         "nodata": 0.0})
        for i, (dy, dx) in enumerate([(0, 0), (2, 1), (-1, -2)]):
            A = base.astype(np.float64)
            A[A == 0.0] = np.nan
            S = coregister.shift_np(A, dy, dx)
            sid = f"sc{j}_{i}"
            scene_rows.append({
                "cell_id": cid, "image_id": sid,
                "bytes": codec.encode(
                    codec.from_float(S, 0.0, "uint16"), "raw16"),
                "w": 16, "h": 16, "fmt": "raw16", "nodata": 0.0})
            truth[(sid, cid)] = (dy, dx)
    ref = spark.createDataFrame(
        pd.DataFrame(ref_rows),
        "cell_id long, bytes binary, w int, h int, fmt string, "
        "nodata double")
    scenes = spark.createDataFrame(pd.DataFrame(scene_rows),
                                   TILE_SCHEMA)
    return ref, scenes, truth


def test_distributed_shift_table_and_correction(spark):
    ref, scenes, truth = _scene_rows(spark)
    shifts = coregister.coregister(scenes, ref, band=0, max_shift=3)
    got = {(r.image_id, r.cell_id): r for r in shifts.collect()}
    assert set(got) == set(truth)
    for k, (dy, dx) in truth.items():
        r = got[k]
        assert abs(r.dy - dy) <= 0.5 and abs(r.dx - dx) <= 0.5, k
        assert r.peak > 0.99
    # correction: rolled-back scenes agree with the reference on the
    # surviving interior
    fixed = coregister.apply_shifts(scenes, shifts)
    ref_px = {r.cell_id: codec.to_float_masked(
        codec.decode(r.bytes, 16, 16, "raw16"), 0.0)
        for r in ref.collect()}
    for r in fixed.collect():
        A = codec.to_float_masked(
            codec.decode(r.bytes, 16, 16, "raw16"), 0.0)
        R = ref_px[r.cell_id]
        m = np.isfinite(A) & np.isfinite(R)
        assert m.sum() > 100
        np.testing.assert_allclose(A[m], R[m], rtol=1e-6,
                                   err_msg=r.image_id)
