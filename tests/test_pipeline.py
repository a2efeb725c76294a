"""End-to-end: the README pipeline of the reference
(stac_query |> collect |> set_maskfun |> warp |> stack |> median |>
compute, /root/reference/README.md:136-150) recast as the Spark chain,
plus the async≡sync determinism invariant
(test-vrt-pipelines.R:132-146) at two parallelism levels."""

from __future__ import annotations

import numpy as np

import oracle
from vrtility_spark import codec, datagen, masks, schema
from vrtility_spark.pipeline import Pipeline
from vrtility_spark.session import get_spark


def _run(spark, pdf, out_dir):
    df = schema.images_df(spark, pdf)
    (Pipeline(df)
        .cloud_filter(60)
        .set_maskfun("int", datagen.S2_MASK_VALUES)
        .warp(cell_res=datagen.TILE_RES)
        .composite("median")
        .compute(out_dir))
    return (spark.read.parquet(out_dir)
            .orderBy("cell_id").toPandas())


def test_readme_pipeline_end_to_end(spark, tiny_images_pdf, tmp_path):
    out = _run(spark, tiny_images_pdf, str(tmp_path / "o1"))
    assert len(out) == 12
    # masked median must differ from unmasked median and reduce radiance
    row = out.iloc[3]
    arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
    assert arr[:-1].sum() > 0
    # composite carries the median acquisition date
    assert str(row.datetime_median.date()) == "2024-05-01"


def test_deterministic_across_parallelism(tiny_images_pdf, tmp_path):
    """local[2] vs local[8] → byte-identical output (the reference runs
    every pipeline with daemons on and off and asserts equality)."""
    s1 = get_spark("p1", cores=8, shuffle_partitions=8)
    out_a = _run(s1, tiny_images_pdf, str(tmp_path / "a"))
    out_b = _run(s1, tiny_images_pdf, str(tmp_path / "b"))
    assert out_a.equals(out_b)
    # different shuffle partitioning, same result
    s1.conf.set("spark.sql.shuffle.partitions", "3")
    out_c = _run(s1, tiny_images_pdf, str(tmp_path / "c"))
    s1.conf.set("spark.sql.shuffle.partitions", "8")
    for col in ("cell_id", "caption_agg", "n_scenes"):
        assert (out_a[col] == out_c[col]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(out_a.bytes, out_c.bytes))


def test_hls_bitmask_pipeline(spark, hls_images_pdf):
    df = schema.images_df(spark, hls_images_pdf)
    out = (Pipeline(df)
           .set_maskfun("bit", datagen.HLS_MASK_BITS)
           .warp(cell_res=datagen.TILE_RES)
           .composite("medoid")
           .df.toPandas())
    assert len(out) == 12
    row = out.iloc[0]
    arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
    assert arr.dtype == np.int16


def test_chained_pixfuns_relaxed(spark, tiny_images_pdf):
    """The reference cannot stack two pixel functions on one band
    without materializing between (one-pixfun-per-level,
    R/vrt-tools.R:116-127 — a GDAL limitation, not a semantic). Here
    chaining is free: two masks + a composite compose into ONE fused
    grouped pass, and the result is byte-identical to materializing
    each mask eagerly."""
    df = schema.images_df(spark, tiny_images_pdf)
    fused = (Pipeline(df)
             .set_maskfun("int", [0, 1])            # drop saturated/dark
             .set_maskfun("int", [8, 9, 10, 11], buffer_size=1)  # clouds
             .warp(cell_res=datagen.TILE_RES)
             .composite("median").df.orderBy("cell_id").toPandas())
    from vrtility_spark import warp as _warp
    from vrtility_spark.composite import composite as _comp
    eager = masks.vrt_set_maskfun(df, "int", [0, 1])
    eager = masks.vrt_set_maskfun(eager, "int", [8, 9, 10, 11], buffer_size=1)
    eager = _comp(_warp.assign_cells(eager, datagen.TILE_RES), "median") \
        .orderBy("cell_id").toPandas()
    assert len(fused) == len(eager)
    assert all(bytes(a) == bytes(b) for a, b in zip(fused.bytes, eager.bytes))


def test_bundle_roundtrip(spark, tiny_images_pdf, tmp_path):
    """vrt_save/vrt_bundle twin (R/vrt-save.R:51-109,
    R/vrt-bundle.R:19-143): serialize the verb chain, rebuild it
    elsewhere, recompute — identical output."""
    from vrtility_spark import schema as S

    p = (Pipeline(schema.images_df(spark, tiny_images_pdf))
         .cloud_filter(60)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .reproject(30)
         .warp(cell_res=datagen.TILE_RES)
         .composite("median"))
    bpath = str(tmp_path / "plan.json")
    bundle = p.to_bundle(bpath)
    assert [s["verb"] for s in bundle["verbs"]] == [
        "cloud_filter", "set_maskfun", "reproject", "warp", "composite"]
    p2 = Pipeline.from_bundle(bpath, S.images_df(spark, tiny_images_pdf))
    a = p.df.orderBy("cell_id").toPandas()
    b = p2.df.orderBy("cell_id").toPandas()
    for col in ("cell_id", "n_scenes", "caption_agg", "w", "h", "fmt"):
        assert (a[col] == b[col]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a.bytes, b.bytes))


def test_bundle_string_formula_matches_lambda(spark, tiny_images_pdf, tmp_path):
    from vrtility_spark import schema as S

    p = Pipeline(schema.images_df(spark, tiny_images_pdf)) \
        .derived_band("NDVI", "(B08 - B04) / (B08 + B04)")
    bpath = str(tmp_path / "formula.json")
    p.to_bundle(bpath)
    p2 = Pipeline.from_bundle(bpath, S.images_df(spark, tiny_images_pdf))
    lam = Pipeline(S.images_df(spark, tiny_images_pdf)).derived_band(
        "NDVI", lambda bd: (bd["B08"] - bd["B04"]) / (bd["B08"] + bd["B04"]))
    x = p2.df.orderBy("image_id").toPandas()
    y = lam.df.orderBy("image_id").toPandas()
    assert all(bytes(c) == bytes(d) for c, d in zip(x.bytes, y.bytes))


def test_bundle_refuses_unserializable(spark, tiny_images_pdf, tmp_path):
    import pytest

    from vrtility_spark import schema as S
    df = S.images_df(spark, tiny_images_pdf)
    p = Pipeline(df).warp(cell_res=datagen.TILE_RES).composite(lambda s: s[0])
    with pytest.raises(ValueError, match="composite"):
        p.to_bundle(str(tmp_path / "x.json"))


def test_bundle_carries_memory_policy_and_split(spark, tiny_images, tmp_path):
    """The RAM policy (mode/max_stack_bytes) and the sub-tiling knob are
    verbs: a replayed bundle keeps the same memory behavior."""
    from vrtility_spark import composite as C
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .split_cells(1)
         .composite("median", mode="stack", max_stack_bytes=16_000))
    path = str(tmp_path / "policy.json")
    p.to_bundle(path)
    replay = Pipeline.from_bundle(path, tiny_images)
    got = C.assemble_child_tiles(replay.df, 1).toPandas()
    want = C.assemble_child_tiles(p.df, 1).toPandas()
    key = lambda d: sorted((int(r.cell_id), bytes(r.bytes))
                           for _, r in d.iterrows())
    assert key(got) == key(want) and len(got) == 12


def test_bundle_rejects_non_transformation_verbs(spark, tiny_images, tmp_path):
    """Bundles are untrusted portable files: a hand-crafted bundle
    naming a sink verb (compute would overwrite an arbitrary path on
    load) must be rejected by the replay whitelist."""
    import json

    import pytest as _pt
    path = str(tmp_path / "evil.json")
    with open(path, "w") as f:
        json.dump({"format": "vrtility_spark.bundle", "version": 1,
                   "verbs": [{"verb": "compute",
                              "params": {"path": str(tmp_path / "x")}}]}, f)
    with _pt.raises(ValueError, match="not replayable"):
        Pipeline.from_bundle(path, tiny_images)


def test_mask_drop_flag_survives_flush(spark, tiny_images):
    """A drop_mask_band spec flushed by an intermediate verb must still
    inform later mask_plane defaults — the payload has no QA plane, so
    warp must NOT nearest-resample the last DATA band."""
    from vrtility_spark import codec
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES, drop_mask_band=True)
         .subset_bands(["B04", "B08"])   # flushes the mask spec
         .warp(cell_res=datagen.TILE_RES, out_w=8, out_h=8,
               resampling="average"))
    row = p.df.toPandas().iloc[0]
    arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
    assert len(arr) == 2
    # nearest on raw codes of a DATA band would reproduce exact source
    # pixels; 'average' downsampling of a non-constant band cannot.
    src = Pipeline(tiny_images).set_maskfun(
        "int", datagen.S2_MASK_VALUES, drop_mask_band=True) \
        .subset_bands(["B04", "B08"]).df.toPandas()
    s = src[src.image_id == row.image_id].iloc[0]
    sarr = codec.decode(s.bytes, s.w, s.h, s.fmt)
    nearest = sarr[1][::2, ::2][:8, :8]
    assert not np.array_equal(arr[1], nearest)
