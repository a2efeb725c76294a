"""Training-chip export: lossless slicing (chips reassemble to the
exact tile), valid_frac math, zero-shuffle plan, divisor validation,
min_valid filtering, reshard-proof hash splits, and bundle replay."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import chips, codec, datagen, schema, warp
from vrtility_spark.pipeline import Pipeline


def test_chip_rows_np_lossless_and_valid_frac():
    rng = np.random.default_rng(5)
    arr = rng.integers(1, 1000, (3, 16, 16)).astype(np.uint16)
    arr[0, :8, :8] = 0                       # nodata quadrant in band 0
    got = chips.chip_rows_np(arr, 0.0, 8)
    assert [(cx, cy) for cx, cy, _, _ in got] == \
        [(0, 0), (1, 0), (0, 1), (1, 1)]
    back = np.zeros_like(arr)
    for cx, cy, block, vf in got:
        back[:, cy * 8:(cy + 1) * 8, cx * 8:(cx + 1) * 8] = block
    np.testing.assert_array_equal(back, arr)
    # (0,0) chip: band 0 entirely nodata → no pixel all-bands-valid
    vf = {(cx, cy): v for cx, cy, _, v in got}
    assert vf[(0, 0)] == 0.0
    assert vf[(1, 1)] == 1.0


def test_chip_rows_np_divisor_guard():
    with pytest.raises(ValueError, match="must divide"):
        chips.chip_rows_np(np.zeros((1, 16, 16)), 0.0, 5)


@pytest.fixture(scope="module")
def composited(spark, tiny_images):
    return (Pipeline(tiny_images)
            .set_maskfun("int", datagen.S2_MASK_VALUES)
            .warp(cell_res=datagen.TILE_RES)
            .composite("median").df.cache())


def test_make_chips_matches_local_and_zero_shuffle(spark, composited):
    out = chips.make_chips(composited, chip=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    base = composited._jdf.queryExecution().executedPlan().toString()
    # pure narrow map: chips adds NO Exchange beyond the upstream
    # composite's own shuffle (cached lineage still prints it)
    assert plan.count("Exchange") == base.count("Exchange")
    got = {(r.cell_id, r.chip_x, r.chip_y): r for r in out.collect()}
    tiles = composited.collect()
    assert len(got) == 4 * len(tiles)
    for t in tiles:
        arr = codec.decode(t.bytes, t.w, t.h, t.fmt)
        nd = np.asarray(t.band_nodata, dtype=np.float64) \
            if t.band_nodata is not None else t.nodata
        for cx, cy, block, vf in chips.chip_rows_np(arr, nd, 8):
            r = got[(t.cell_id, cx, cy)]
            assert bytes(r.bytes) == codec.encode(block, t.fmt)
            assert r.w == r.h == 8 and r.fmt == t.fmt
            assert r.valid_frac == vf
            assert r.caption_agg == t.caption_agg   # metadata rides along
            assert r.n_scenes == t.n_scenes


def test_pipeline_chips_min_valid_and_splits(spark, tiny_images):
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .composite("median")
         .chips(chip=8, min_valid=0.5,
                splits={"train": 0.75, "val": 0.25}, seed=7))
    rows = p.df.collect()
    assert rows and all(r.valid_frac >= 0.5 for r in rows)
    assert {r.split for r in rows} <= {"train", "val"}
    assert {r.split for r in rows} == {"train", "val"}
    # reshard-proof: same assignment at a different partitioning
    re = {(r.cell_id, r.chip_x, r.chip_y): r.split
          for r in p.df.repartition(13).collect()}
    for r in rows:
        assert re[(r.cell_id, r.chip_x, r.chip_y)] == r.split


def test_pipeline_chips_bundle_replay(spark, tiny_images, tmp_path):
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .composite("median")
         .chips(chip=4, splits={"train": 0.9, "val": 0.1}))
    path = str(tmp_path / "chips_bundle.json")
    p.to_bundle(path)
    p2 = Pipeline.from_bundle(path, tiny_images)
    key = ["cell_id", "chip_x", "chip_y"]
    a = sorted((tuple(getattr(r, k) for k in key), bytes(r.bytes), r.split)
               for r in p.df.collect())
    b = sorted((tuple(getattr(r, k) for k in key), bytes(r.bytes), r.split)
               for r in p2.df.collect())
    assert a == b and len(a) == 12 * 16


# --------------------------------------------------- augmentation ----

def test_aug_np_exact_permutations():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 100, (2, 4, 4)).astype(np.uint16)
    np.testing.assert_array_equal(chips.aug_np(a, "orig"), a)
    np.testing.assert_array_equal(chips.aug_np(a, "fliph"),
                                  a[:, :, ::-1])
    np.testing.assert_array_equal(chips.aug_np(a, "flipv"),
                                  a[:, ::-1, :])
    np.testing.assert_array_equal(chips.aug_np(a, "rot90"),
                                  np.rot90(a, 1, axes=(1, 2)))
    # involutions / group structure: rot90 four times = identity
    b = a
    for _ in range(4):
        b = chips.aug_np(b, "rot90")
    np.testing.assert_array_equal(b, a)
    with pytest.raises(KeyError, match="unknown augmentation"):
        chips.aug_np(a, "zoom")


def test_augment_chips_all_and_hash(spark, composited):
    base = chips.make_chips(composited, chip=8)
    n = base.count()
    allv = chips.augment_chips(base, ("orig", "fliph", "flipv"),
                               mode="all")
    # no new Exchange beyond the upstream lineage (compare FRESH
    # plans: an executed AQE plan prints final+initial sections and
    # double-counts its Exchanges)
    fresh_base = chips.make_chips(composited, chip=8)
    fresh_aug = chips.augment_chips(fresh_base, ("orig", "fliph"),
                                    mode="all")
    assert fresh_aug._jdf.queryExecution().executedPlan().toString() \
        .count("Exchange") == fresh_base._jdf.queryExecution() \
        .executedPlan().toString().count("Exchange")
    got = allv.collect()
    assert len(got) == 3 * n
    # variant content is the exact permutation of the original chip
    orig = {(r.cell_id, r.chip_x, r.chip_y): r for r in base.collect()}
    for r in got:
        o = orig[(r.cell_id, r.chip_x, r.chip_y)]
        a = codec.decode(o.bytes, o.w, o.h, o.fmt)
        want = codec.encode(
            np.ascontiguousarray(chips.aug_np(a, r.variant)), o.fmt)
        assert bytes(r.bytes) == want, r.variant
    # hash mode: exactly one variant per chip, deterministic under
    # repartitioning
    one = chips.augment_chips(base, ("orig", "fliph", "flipv", "rot90"),
                              mode="hash", seed=3)
    rows = {(r.cell_id, r.chip_x, r.chip_y): r.variant
            for r in one.collect()}
    assert len(rows) == n
    re = {(r.cell_id, r.chip_x, r.chip_y): r.variant
          for r in one.repartition(9).collect()}
    assert re == rows
    assert len(set(rows.values())) > 1   # the hash actually varies
