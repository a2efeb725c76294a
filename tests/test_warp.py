from __future__ import annotations

import numpy as np

from vrtility_spark import codec, datagen, schema, warp


def test_nearest_identity():
    rng = np.random.default_rng(20)
    a = rng.integers(0, 100, (8, 8)).astype(float)
    assert (warp.resample_plane(a, 8, 8, "nearest") == a).all()


def test_bilinear_constant_preserved():
    a = np.full((8, 8), 42.0)
    out = warp.resample_plane(a, 16, 16, "bilinear")
    np.testing.assert_allclose(out, 42.0)


def test_bilinear_gradient_upsample():
    a = np.tile(np.arange(8, dtype=float), (8, 1))
    out = warp.resample_plane(a, 8, 16, "bilinear")
    # monotone along x, endpoints preserved-ish
    assert (np.diff(out[0]) >= 0).all()


def test_average_downsample_exact():
    a = np.arange(16, dtype=float).reshape(4, 4)
    out = warp.resample_plane(a, 2, 2, "average")
    np.testing.assert_allclose(out, [[2.5, 4.5], [10.5, 12.5]])


def test_mask_plane_uses_nearest():
    """Byte/class planes must never be interpolated
    (R/vrt-warp.R:449-456)."""
    arr = np.stack([
        np.tile(np.arange(8, dtype=float), (8, 1)) * 100,
        np.where(np.add.outer(np.arange(8), np.arange(8)) % 2 == 0, 4, 9),
    ])
    out = warp.warp_np(arr, 16, 16, "bilinear")
    assert set(np.unique(out[1])) <= {4.0, 9.0}  # class codes intact
    assert len(np.unique(out[0])) > len(np.unique(arr[0]))  # interpolated


def test_warp_to_grid_spark(spark, tiny_images):
    out = warp.warp_to_grid(tiny_images.limit(4), 8, 8, "bilinear").toPandas()
    for _, r in out.iterrows():
        arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
        assert arr.shape == (5, 8, 8)
        assert set(np.unique(arr[-1])) <= {0, 4, 5, 8, 9, 10, 11}


def test_assign_cells_deterministic(spark, tiny_images, tiny_images_pdf):
    df = warp.assign_cells(tiny_images, datagen.TILE_RES).select(
        "image_id", "cell_id", "cell_prefix").toPandas()
    from vrtility_spark import cells
    for _, r in df.sample(10, random_state=0).iterrows():
        src = tiny_images_pdf[tiny_images_pdf.image_id == r.image_id].iloc[0]
        exp = cells.xy_to_cell_np(src.zone, (src.xmin + src.xmax) / 2,
                                  (src.ymin + src.ymax) / 2, datagen.TILE_RES)
        assert r.cell_id == exp
        assert r.cell_prefix == cells.parent_np(exp, 2)
