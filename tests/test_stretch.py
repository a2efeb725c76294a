"""F7 percent-cut stretch: type-7 quantile identity vs np.quantile,
R-semantics normalize (clamp / NaN / degenerate band), distributed
integer path EXACT against a whole-collection NumPy oracle, rawf32
binned-path error bound, pipeline verb + bundle replay."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import cells, codec, stretch

ZONE, RES, NODATA, FMT = 30, 4, 0.0, "raw16"
TILE_SCHEMA = ("cell_id long, bytes binary, w int, h int, fmt string, "
               "nodata double")


def _tiles(spark, h=16, w=16, n=6, seed=3, fmt="raw16", bands=2,
           hole_frac=0.2, hi=4000):
    rng = np.random.default_rng(seed)
    rows, planes = [], []
    for i in range(n):
        arr = rng.uniform(1, hi, size=(bands, h, w))
        if fmt != "rawf32":
            arr = np.round(arr)
        arr[rng.random(arr.shape) < hole_frac] = NODATA
        cid = int(cells.encode_np(ZONE, RES, i % 4, i // 4))
        enc = arr.astype("float32" if fmt == "rawf32" else np.uint16)
        rows.append({"cell_id": cid, "bytes": codec.encode(enc, fmt),
                     "w": w, "h": h, "fmt": fmt, "nodata": NODATA})
        A = enc.astype(np.float64)
        A[A == NODATA] = np.nan
        planes.append(A)
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    return df, rows, planes


def test_hist_quantile_matches_np_type7():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 500, 10_000).astype(np.float64)
    vals, cnts = np.unique(x, return_counts=True)
    for p in (0.0, 0.02, 0.25, 0.5, 0.777, 0.98, 1.0):
        got = stretch.quantile_type7_from_hist(vals, cnts, p)
        want = float(np.quantile(x, p, method="linear"))  # R type 7
        assert got == pytest.approx(want, abs=0), p


def test_stretch_np_semantics():
    P = np.array([[[0.0, 5.0], [10.0, np.nan]],
                  [[7.0, 7.0], [7.0, np.nan]]])
    out = stretch.stretch_np(P, np.array([2.0, 7.0]),
                             np.array([8.0, 7.0]))
    # clamp below/above, linear inside, NaN preserved
    np.testing.assert_allclose(out[0], [[0.0, 0.5], [1.0, np.nan]])
    # degenerate band (hi == lo) -> NaN everywhere
    assert np.isnan(out[1][np.isfinite(P[1])]).all()
    with pytest.raises(ValueError, match="bands"):
        stretch.stretch_np(P, np.array([0.0]), np.array([1.0]))


def test_distributed_integer_exact(spark):
    df, rows, planes = _tiles(spark)
    got = {r["cell_id"]: r for r in
           stretch.stretch(df, pct_cut=(2, 98)).collect()}
    # collection-global per-band type-7 quantiles over VALID pixels
    allpix = np.concatenate([p.reshape(p.shape[0], -1) for p in planes],
                            axis=1)
    lo = np.array([np.quantile(b[np.isfinite(b)], 0.02, method="linear")
                   for b in allpix])
    hi = np.array([np.quantile(b[np.isfinite(b)], 0.98, method="linear")
                   for b in allpix])
    for r, P in zip(rows, planes):
        o = got[r["cell_id"]]
        assert o["fmt"] == "rawf32" and o["nodata"] == -9999.0
        dec = codec.decode(o["bytes"], o["w"], o["h"], o["fmt"])
        want = codec.from_float(stretch.stretch_np(P, lo, hi),
                                -9999.0, "float32")
        np.testing.assert_array_equal(dec, want)  # byte-exact


def test_minmax_and_global_paths(spark):
    df, rows, planes = _tiles(spark, n=4)
    # explicit scalar minmax: no stats pass, pure clamped rescale
    got = stretch.stretch(df, minmax=(1000.0, 3000.0)).collect()
    for o in got:
        dec = codec.decode(o["bytes"], o["w"], o["h"], o["fmt"])
        v = dec[np.isfinite(dec) & (dec != -9999.0)]
        assert v.size and (v >= 0).all() and (v <= 1).all()
    # no-args: global min/max -> outputs span exactly [0, 1]
    out = stretch.stretch(df).collect()
    allv = np.concatenate([
        codec.decode(o["bytes"], o["w"], o["h"], o["fmt"]).ravel()
        for o in out])
    allv = allv[allv != -9999.0]
    per_band = np.concatenate(
        [codec.decode(o["bytes"], o["w"], o["h"], o["fmt"])
         for o in out], axis=1)
    for b in range(per_band.shape[0]):
        v = per_band[b][per_band[b] != -9999.0]
        assert v.min() == 0.0 and v.max() == 1.0


def test_rawf32_binned_path_bounded(spark):
    df, rows, planes = _tiles(spark, fmt="rawf32", hi=1.0, seed=9)
    lo_hi = stretch.band_percentiles(df, (2, 98))
    allpix = np.concatenate([p.reshape(p.shape[0], -1) for p in planes],
                            axis=1)
    for q, p in zip(lo_hi, (0.02, 0.98)):
        want = np.array([np.quantile(b[np.isfinite(b)], p,
                                     method="linear") for b in allpix])
        span = np.array([np.nanmax(b) - np.nanmin(b) for b in allpix])
        # bin-midpoint representation: error <= one bin width
        assert (np.abs(q - want) <= span / stretch.N_BINS + 1e-12).all()


def test_pipeline_verb_and_bundle(spark, tmp_path, tiny_images):
    from vrtility_spark import datagen
    from vrtility_spark.pipeline import Pipeline
    p = (Pipeline(tiny_images)
         .set_maskfun("int", datagen.S2_MASK_VALUES)
         .warp(cell_res=datagen.TILE_RES)
         .composite("median")
         .stretch(pct_cut=(2, 98)))
    out = {r["cell_id"]: r["bytes"] for r in p.df.collect()}
    assert out
    bundle = p.to_bundle(str(tmp_path / "b.json"))
    assert any(v["verb"] == "stretch" for v in bundle["verbs"])
    replay = Pipeline.from_bundle(str(tmp_path / "b.json"), tiny_images)
    got = {r["cell_id"]: r["bytes"] for r in replay.df.collect()}
    assert got == out


def test_stretch_validation(spark):
    df, _, _ = _tiles(spark, n=2)
    with pytest.raises(ValueError, match="not both"):
        stretch.stretch(df, pct_cut=(2, 98), minmax=(0, 1))
    with pytest.raises(ValueError, match="bad pct_cut"):
        stretch.stretch(df, pct_cut=(98, 2))
    # the same argument-order mistake on the explicit-range path
    with pytest.raises(ValueError, match="lo > hi"):
        stretch.stretch(df, minmax=(3000.0, 1000.0))
    with pytest.raises(ValueError, match="lo > hi"):
        stretch.stretch(df, minmax=((0.0, 5000.0), (1.0, 4000.0)))
    empty = df.where("cell_id < 0")
    with pytest.raises(ValueError, match="no valid pixels"):
        stretch.stretch(empty, pct_cut=(2, 98))


def test_passthrough_underscore_columns(spark):
    # itertuples mangles leading-underscore / positional names; the
    # apply pass must carry such user metadata through untouched
    import pyspark.sql.functions as F
    df, rows, _ = _tiles(spark, n=4)
    df2 = df.withColumn("_src", F.concat(F.lit("s"), F.col("cell_id")))
    out = stretch.stretch(df2, minmax=(1000.0, 3000.0)).collect()
    assert {o["_src"] for o in out} == \
        {f"s{r['cell_id']}" for r in rows}
    assert all(o["fmt"] == "rawf32" for o in out)


def test_mixed_fmt_keeps_integer_contributions_exact(spark):
    # one rawf32 tile in an integer collection: float pixels bin to
    # midpoints, integer pixels stay EXACT histogram values — pinned
    # against a NumPy oracle that reproduces exactly that regime
    dfi, _, planes_i = _tiles(spark, n=4, seed=3)
    dff, _, planes_f = _tiles(spark, n=1, seed=11, fmt="rawf32",
                              hi=4000)
    mixed = dfi.unionByName(dff)
    q_lo, q_hi = stretch.band_percentiles(mixed, (2, 98))
    allpix = np.concatenate(
        [p.reshape(p.shape[0], -1) for p in planes_i + planes_f], axis=1)
    glo = np.array([np.nanmin(b) for b in allpix])
    gw = (np.array([np.nanmax(b) for b in allpix]) - glo) / stretch.N_BINS
    intpix = np.concatenate(
        [p.reshape(p.shape[0], -1) for p in planes_i], axis=1)
    fltpix = np.concatenate(
        [p.reshape(p.shape[0], -1) for p in planes_f], axis=1)
    for q, p in zip((q_lo, q_hi), (0.02, 0.98)):
        for b in range(allpix.shape[0]):
            xi = intpix[b][np.isfinite(intpix[b])]  # exact
            xf = fltpix[b][np.isfinite(fltpix[b])]
            idx = np.clip(((xf - glo[b]) / gw[b]).astype(np.int64),
                          0, stretch.N_BINS - 1)
            xf = glo[b] + (idx + 0.5) * gw[b]  # binned
            want = float(np.quantile(np.concatenate([xi, xf]), p,
                                     method="linear"))
            assert q[b] == pytest.approx(want, abs=1e-9)
