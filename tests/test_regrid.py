"""regrid_to_cells: the GENERAL vrt_warp — arbitrary footprints onto
the canonical per-cell grid (R/vrt-warp.R:34-246). assign_cells +
warp_to_grid cover tile-aligned footprints; these tests pin the
no-assumption path: straddling scenes split into aligned tiles,
out-of-footprint pixels carry the plane's sentinel, and composites
over offset scenes match a NumPy oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

from vrtility_spark import cells, codec, composite, datagen, schema, warp

S = datagen.TILE_SPAN


def _scene(image_id, xmin, ymin, w=16, h=16, seed=1, extent=S):
    rng = np.random.default_rng(seed)
    data = rng.integers(1, 60000, (2, h, w)).astype(np.uint16)
    scl = np.full((h, w), 4, dtype=np.uint16)
    arr = np.concatenate([data, scl[None]])
    return {
        "image_id": image_id, "bytes": codec.encode(arr, "raw16"),
        "w": w, "h": h, "fmt": "raw16", "caption": f"s {image_id}",
        "phash": 0, "datetime": datagen.date_for(0), "srs": "ZONE:30",
        "zone": 30, "xmin": xmin, "ymin": ymin,
        "xmax": xmin + extent, "ymax": ymin + extent,
        "res_x": extent / w, "res_y": extent / h,
        "bands": ["B04", "B08", "SCL"], "nodata": 0.0,
        "scale": 1.0, "offset": 0.0,
        "band_scale": [1.0] * 3, "band_offset": [0.0] * 3,
        "band_nodata": [0.0] * 3,
        "cloud_cover": 0.0, "platform": "t", "orbit_state": "ascending",
    }, arr


def test_aligned_scene_regrid_equals_identity(spark):
    """A scene exactly on a tile, regridded at its own resolution,
    round-trips bit-exact (pixel centers coincide)."""
    row, arr = _scene("a", 2 * S, 3 * S)
    df = schema.images_df(spark, pd.DataFrame([row]))
    out = warp.regrid_to_cells(df, datagen.TILE_RES, 16, 16).toPandas()
    assert len(out) == 1
    got = codec.decode(out.iloc[0].bytes, 16, 16, "raw16")
    np.testing.assert_array_equal(got, arr)
    z, r, ix, iy = cells.decode_np(out.iloc[0].cell_id)
    assert (z, r, ix, iy) == (30, datagen.TILE_RES, 2, 3)
    assert out.iloc[0].xmin == 2 * S and out.iloc[0].ymin == 3 * S


def test_straddling_scene_splits_into_padded_tiles(spark):
    """A scene offset by half a tile covers 4 cells → 4 aligned tiles;
    each tile holds the correct quadrant (nearest at matching res is a
    pure shift) and sentinel elsewhere."""
    row, arr = _scene("b", 2 * S + S / 2, 3 * S + S / 2)
    df = schema.images_df(spark, pd.DataFrame([row]))
    out = warp.regrid_to_cells(df, datagen.TILE_RES, 16, 16,
                               resampling="nearest").toPandas()
    assert len(out) == 4
    for _, t in out.iterrows():
        z, r, ix, iy = cells.decode_np(t.cell_id)
        got = codec.decode(t.bytes, 16, 16, "raw16")
        # offsets of this tile's grid vs the scene's grid, in pixels
        dx = int((ix * S - row["xmin"]) / (S / 16))
        dy = int((iy * S - row["ymin"]) / (S / 16))
        exp = np.zeros_like(arr)
        sy0, sy1 = max(0, dy), min(16, 16 + dy)
        sx0, sx1 = max(0, dx), min(16, 16 + dx)
        exp[:, sy0 - dy: sy1 - dy, sx0 - dx: sx1 - dx] = \
            arr[:, sy0:sy1, sx0:sx1]
        np.testing.assert_array_equal(got, exp)
    # every scene pixel lands in exactly one tile
    total = sum(int((codec.decode(t.bytes, 16, 16, "raw16") > 0).sum())
                for _, t in out.iterrows())
    assert total == int((arr > 0).sum())


def test_offset_scenes_composite_matches_oracle(spark):
    """Scenes whose footprints do NOT tile the grid (quarter-tile
    offsets) regrid into aligned tiles whose masked median equals a
    per-pixel NumPy oracle built from the scene geometry."""
    rows, arrs = [], []
    offs = [(0.0, 0.0), (0.25, 0.0), (0.0, 0.25), (0.25, 0.25)]
    for i, (ox, oy) in enumerate(offs):
        r, a = _scene(f"c{i}", (1 + ox) * S, (2 + oy) * S, seed=10 + i)
        rows.append(r)
        arrs.append(a)
    df = schema.images_df(spark, pd.DataFrame(rows))
    tiles = warp.regrid_to_cells(df, datagen.TILE_RES, 16, 16,
                                 resampling="nearest")
    got = composite.composite(tiles, "median", compute_dtype="float64") \
        .toPandas().set_index("cell_id")

    # NumPy oracle: for each output cell pixel center, gather each
    # scene's nearest sample if the center falls inside its footprint
    px = S / 16
    cell_ids = set(got.index)
    for cid in cell_ids:
        _, _, ix, iy = cells.decode_np(cid)
        gx = ix * S + (np.arange(16) + 0.5) * px
        gy = iy * S + (np.arange(16) + 0.5) * px
        stack = []
        for r, a in zip(rows, arrs):
            fy = (gy - r["ymin"]) / px - 0.5
            fx = (gx - r["xmin"]) / px - 0.5
            yi, xi = np.round(fy).astype(int), np.round(fx).astype(int)
            vy = (yi >= 0) & (yi < 16)
            vx = (xi >= 0) & (xi < 16)
            plane = np.full((3, 16, 16), np.nan)
            v = vy[:, None] & vx[None, :]
            sub = a[:, np.clip(yi, 0, 15)[:, None], np.clip(xi, 0, 15)[None, :]]
            plane[:, v] = sub[:, v]
            if np.any(v):
                stack.append(plane)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            exp = np.nanmedian(np.stack(stack), axis=0)
        exp_q = codec.from_float(exp, 0.0, "uint16")
        row = got.loc[cid]
        assert row.n_scenes == len(stack)
        np.testing.assert_array_equal(
            codec.decode(row.bytes, 16, 16, "raw16"), exp_q)


def test_bilinear_regrid_renormalizes_at_footprint_edge(spark):
    """Bilinear sampling near the footprint boundary must renormalize
    over valid contributors — constant-valued scenes stay constant
    (no darkening at edges from zero-padding)."""
    row, arr = _scene("d", 2 * S + S / 4, 3 * S)
    const = np.full_like(arr, 1000)
    const[-1] = 4
    row["bytes"] = codec.encode(const, "raw16")
    df = schema.images_df(spark, pd.DataFrame([row]))
    out = warp.regrid_to_cells(df, datagen.TILE_RES, 16, 16,
                               resampling="bilinear").toPandas()
    for _, t in out.iterrows():
        got = codec.decode(t.bytes, 16, 16, "raw16")
        inside = got[0] != 0
        assert inside.any()
        assert (got[0][inside] == 1000).all()
        assert set(np.unique(got[-1])) <= {0, 4}  # SCL nearest raw


def test_pipeline_regrid_bundles(spark, tmp_path):
    from vrtility_spark.pipeline import Pipeline
    rows = [_scene("e0", 0.5 * S, 0.0)[0], _scene("e1", S, 0.0, seed=2)[0]]
    df = schema.images_df(spark, pd.DataFrame(rows))
    p = (Pipeline(df).set_maskfun("int", [9])
         .regrid(datagen.TILE_RES, 8, 8).composite("median"))
    bpath = str(tmp_path / "regrid.json")
    p.to_bundle(bpath)
    p2 = Pipeline.from_bundle(bpath, schema.images_df(spark, pd.DataFrame(rows)))
    a = p.df.orderBy("cell_id").toPandas()
    b = p2.df.orderBy("cell_id").toPandas()
    assert (a.cell_id == b.cell_id).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a.bytes, b.bytes))


def test_mask_regrid_fusion_equals_eager(spark):
    """Pipeline.set_maskfun + regrid fuses the mask into the regrid's
    decode; it must be byte-identical to the eager two-pass form."""
    from vrtility_spark import masks
    from vrtility_spark.pipeline import Pipeline
    pdf = datagen.offset_images_pandas()
    df = schema.images_df(spark, pdf)
    fused = (Pipeline(df).set_maskfun("int", datagen.S2_MASK_VALUES)
             .regrid(datagen.TILE_RES, 16, 16, resampling="nearest")
             .df).orderBy("cell_id", "image_id").toPandas()
    eager = warp.regrid_to_cells(
        masks.vrt_set_maskfun(df, "int", datagen.S2_MASK_VALUES),
        datagen.TILE_RES, 16, 16, resampling="nearest") \
        .orderBy("cell_id", "image_id").toPandas()
    assert len(fused) == len(eager)
    assert all(bytes(x) == bytes(y)
               for x, y in zip(fused.bytes, eager.bytes))


def test_regrid_per_band_sentinels_mixed_profile(spark):
    """regrid honors per-band sentinels: an offset HLS-style scene
    (int16, REFL sentinel -9999, DN sentinel 0) keeps each plane's own
    nodata in the padding and never bleeds sentinels into values."""
    from test_perband import _mixed_pdf

    pdf = _mixed_pdf(n_scenes=1)
    pdf = pdf.assign(xmin=pdf.xmin + S / 2, xmax=pdf.xmax + S / 2)
    df = schema.images_df(spark, pdf)
    out = warp.regrid_to_cells(df, datagen.TILE_RES, 8, 8,
                               resampling="nearest").toPandas()
    assert len(out) == 2
    raw = codec.decode(pdf.iloc[0].bytes, 8, 8, "raw16s")
    for _, t in out.iterrows():
        got = codec.decode(t.bytes, 8, 8, "raw16s")
        _, _, ix, _ = cells.decode_np(t.cell_id)
        # scene spans [S/2, 3S/2): cell ix=0 is live on the RIGHT half
        # (pad left), cell ix=1 live on the LEFT half (pad right)
        pad = slice(0, 4) if ix == 0 else slice(4, 8)
        live = slice(4, 8) if ix == 0 else slice(0, 4)
        src = slice(0, 4) if ix == 0 else slice(4, 8)
        assert (got[0][:, pad] == -9999).all()   # REFL's own sentinel
        assert (got[1][:, pad] == 0).all()       # DN's own sentinel
        assert (got[2][:, pad] == 0).all()       # SCL sentinel
        # live halves carry the source pixels (nearest at same res)
        np.testing.assert_array_equal(got[:, :, live], raw[:, :, src])


def test_out_of_zone_footprint_emits_no_clamped_tiles(spark):
    """cells_cover clamps indices to the zone range; a footprint pushed
    outside [0, ZONE_SPAN) (reproject_zone allows it) must NOT produce
    clamped edge cells — they would be all-sentinel tiles inflating
    n_scenes and caption_agg downstream."""
    span = cells.ZONE_SPAN
    fully_out, _ = _scene("out", span + 10.0, span + 10.0)
    straddle, _ = _scene("edge", span - S / 2, 0.0)  # half in, half out
    df = schema.images_df(spark, pd.DataFrame([fully_out, straddle]))
    tiles = warp.regrid_to_cells(df, datagen.TILE_RES, 8, 8,
                                 resampling="nearest").toPandas()
    # the fully-out scene contributes nothing
    assert not (tiles.image_id == "out").any()
    # the straddler yields exactly its one in-zone cell, no edge spray
    edge_tiles = tiles[tiles.image_id == "edge"]
    assert len(edge_tiles) == 1
    _, _, ix, _ = cells.decode_np(edge_tiles.cell_id.to_numpy())
    assert list(ix) == [(1 << datagen.TILE_RES) - 1]


def test_straddling_scene_caption_lands_in_every_covered_cell(spark):
    """Caption provenance contract (pinned): a scene straddling N cells
    contributes its caption to each of the N cells' composites exactly
    once — per-cell provenance, not a global one-of."""
    row, _ = _scene("straddler", S / 2, 0.0)     # straddles 2 cells in x
    base, _ = _scene("anchor", 0.0, 0.0, seed=2)  # aligned neighbour
    df = schema.images_df(spark, pd.DataFrame([row, base]))
    tiles = warp.regrid_to_cells(df, datagen.TILE_RES, 8, 8,
                                 resampling="nearest")
    comp = composite.composite(tiles, "median").toPandas()
    covered = comp[comp.caption_agg.str.contains("s straddler")]
    assert len(covered) == 2  # both covered cells list the straddler
    for agg in covered.caption_agg:
        assert agg.count("s straddler") == 1  # once per cell, not more


def test_regrid_plane_drop_trims_band_metadata(spark):
    """A mask spec with drop_mask_band fused into regrid must leave
    bands/band_* aligned with the (B-1)-plane payload — stale length-B
    arrays would silently disable per-band sentinels downstream."""
    from vrtility_spark.pipeline import Pipeline
    row, _ = _scene("meta", 0.0, 0.0)
    df = schema.images_df(spark, pd.DataFrame([row]))
    out = (Pipeline(df)
           .set_maskfun("int", [9], drop_mask_band=True)
           .regrid(datagen.TILE_RES, 8, 8, resampling="nearest")
           .df).toPandas().iloc[0]
    arr = codec.decode(out.bytes, out.w, out.h, out.fmt)
    assert len(arr) == 2  # SCL plane dropped
    assert list(out.bands) == ["B04", "B08"]
    assert len(out.band_nodata) == 2
    assert len(out.band_scale) == 2 and len(out.band_offset) == 2
