"""Cross-zone reprojection (J5): the reference's signature vrt_warp
capability — scenes spanning 3 CRS unify onto one target grid
(/root/reference/tests/testthat/test-vrt-pipelines.R:20-111,
R/vrt-warp.R:34-246) — re-expressed as the closed-form inter-zone
affine over the synthetic planar zones (SURVEY.md §6)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

import oracle
from vrtility_spark import cells, codec, composite, datagen, masks, schema, warp
from vrtility_spark.warp import reproject_zone


def test_zone_shift_roundtrip_and_parity(spark):
    zones = np.array([30, 31, 27, 0, 3], dtype=np.int64)
    dx, dy = cells.zone_shift_np(zones, 30)
    assert dx[0] == 0.0 and dy[0] == 0.0  # same zone → identity
    # a→b composed with b→a is the exact inverse (bit-exact: origins
    # are integer multiples of an exact binary float)
    for a, b in ((30, 31), (31, 27), (27, 30)):
        d1 = cells.zone_shift_np(a, b)
        d2 = cells.zone_shift_np(b, a)
        assert d1[0] + d2[0] == 0.0 and d1[1] + d2[1] == 0.0
    # Catalyst expression ≡ NumPy
    df = spark.createDataFrame([(int(z),) for z in zones], "zone long")
    cx, cy = cells.zone_shift_cols(F.col("zone"), 30)
    got = df.select(cx.alias("dx"), cy.alias("dy")).orderBy("dx", "dy")
    exp = np.stack([dx, dy], axis=1)
    exp = exp[np.lexsort((exp[:, 1], exp[:, 0]))]
    np.testing.assert_array_equal(got.toPandas().values, exp)


def test_reproject_shifts_wkt_and_bbox_consistently(spark):
    from vrtility_spark.join import parse_wkt_polygon
    aoi = schema.aoi_df(spark, datagen.aoi_pandas(nx=2, ny=2))
    rp = reproject_zone(aoi, 30, wkt_col="geom_wkt").toPandas()
    src = datagen.aoi_pandas(nx=2, ny=2)
    for (_, a), (_, b) in zip(src.iterrows(), rp.iterrows()):
        z = int(a.srs.split(":")[1])
        dx, dy = cells.zone_shift_np(z, 30)
        ra = parse_wkt_polygon(a.geom_wkt)
        rb = parse_wkt_polygon(b.geom_wkt)
        np.testing.assert_allclose(rb, ra + np.array([dx, dy]), rtol=0, atol=0)
        assert b.xmin == a.xmin + dx and b.ymax == a.ymax + dy
        assert b.srs == "ZONE:30" and b.zone == 30


def test_three_crs_unify_to_one_grid(spark):
    """The reference's 3-CRS pipeline fixture: three source CRS in
    (test-vrt-pipelines.R:20 asserts length(srs)==3), ONE unified grid
    out, with per-cell masked-median composites that merge scenes from
    different source zones — pixel-exact vs the NumPy oracle."""
    pdf = datagen.images_pandas(nx=4, ny=4, n_dates=2, w=16, h=16)
    images = schema.images_df(spark, pdf)
    assert images.select("srs").distinct().count() == 3  # 3 CRS in

    rp = reproject_zone(images, 30)
    assert rp.select("srs").distinct().count() == 1  # one grid out
    masked = masks.vrt_set_maskfun(rp, "int", datagen.S2_MASK_VALUES)
    celled = warp.assign_cells(masked, datagen.TILE_RES)
    got = composite.composite(celled, "median", compute_dtype="float64") \
        .toPandas().set_index("cell_id").sort_index()

    # NumPy oracle: shift footprints, regroup on the target grid,
    # masked median per cell
    dx, dy = cells.zone_shift_np(pdf.zone.values, 30)
    px = pdf.copy()
    px["cx"] = (px.xmin + px.xmax) / 2 + dx
    px["cy"] = (px.ymin + px.ymax) / 2 + dy
    px["cell_id"] = cells.xy_to_cell_np(30, px.cx.values, px.cy.values,
                                        datagen.TILE_RES)
    n_multi = 0
    for cell_id, grp in px.groupby("cell_id"):
        grp = grp.sort_values("datetime", kind="mergesort")
        stack = []
        for r in grp.itertuples(index=False):
            arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
            m01 = masks.build_intmask_np(arr[-1], datagen.S2_MASK_VALUES)
            data = masks.apply_mask_np(arr[:-1], m01, r.nodata)
            full = np.concatenate([data, arr[-1:]])
            stack.append(codec.to_float_masked(full, r.nodata))
        exp = oracle.composite_stack(np.stack(stack), "median")
        payload = codec.from_float(exp, 0.0, "uint16")
        row = got.loc[cell_id]
        assert row.n_scenes == len(grp)
        assert bytes(row.bytes) == codec.encode(payload, "raw16")
        if grp.zone.nunique() > 1:
            n_multi += 1
    assert len(got) == px.cell_id.nunique()
    # the point of the operator: cells where scenes born in DIFFERENT
    # source CRS really merged into one composite
    assert n_multi >= 5


def test_reproject_then_regrid_handles_unaligned_footprints(spark):
    """reproject + regrid = the full cross-CRS vrt_warp: scenes from 3
    zones, additionally shifted off the tile grid by a third of a tile,
    still unify into one deterministic set of aligned composites."""
    pdf = datagen.images_pandas(nx=2, ny=2, n_dates=2, w=16, h=16)
    shift = datagen.TILE_SPAN / 3.0  # deliberately NOT grid-aligned
    pdf = pdf.copy()
    for c in ("xmin", "xmax"):
        pdf[c] += shift
    images = schema.images_df(spark, pdf)
    rp = reproject_zone(images, 30)
    masked = masks.vrt_set_maskfun(rp, "int", datagen.S2_MASK_VALUES)
    tiles = warp.regrid_to_cells(masked, datagen.TILE_RES, 16, 16,
                                 resampling="nearest")
    out = composite.composite(tiles, "median").toPandas()
    # unaligned scenes straddle x-neighbour cells: more tiles than
    # scenes' home cells, scenes from several source zones merge
    assert len(out) > 0 and out.n_scenes.max() >= 4
    zones = {int(cells.decode_np(c)[0]) for c in out.cell_id}
    assert zones == {30}
    # deterministic: a second run is byte-identical
    out2 = composite.composite(
        warp.regrid_to_cells(masked, datagen.TILE_RES, 16, 16,
                             resampling="nearest"), "median").toPandas()
    a = out.sort_values("cell_id").reset_index(drop=True)
    b = out2.sort_values("cell_id").reset_index(drop=True)
    assert all(bytes(x) == bytes(y) for x, y in zip(a.bytes, b.bytes))


def test_wkt_shift_handles_holes_and_multipolygon(spark):
    """reproject_zone(wkt_col=...) must translate EVERY ring — interior
    rings (holes) and MULTIPOLYGON parts — not just the outer ring."""
    poly_hole = ("POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0), "
                 "(40 40, 60 40, 60 60, 40 60, 40 40))")
    multi = ("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), "
             "((20 20, 30 20, 30 30, 20 30, 20 20)))")
    df = spark.createDataFrame(
        [("h", 31, poly_hole), ("m", 31, multi)],
        "gid string, zone long, geom_wkt string")
    out = {r.gid: r.geom_wkt
           for r in reproject_zone(df, 30, wkt_col="geom_wkt").collect()}
    dx, dy = cells.zone_shift_np(31, 30)
    import re
    num = r"-?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?"
    for gid, src in (("h", poly_hole), ("m", multi)):
        src_pts = re.findall(rf"({num})\s+({num})", src)
        got_pts = re.findall(rf"({num})\s+({num})", out[gid])
        assert len(got_pts) == len(src_pts)
        for (sx, sy), (gx, gy) in zip(src_pts, got_pts):
            assert float(gx) == float(sx) + dx
            assert float(gy) == float(sy) + dy
        # ring structure preserved
        assert out[gid].count("(") == src.count("(")
