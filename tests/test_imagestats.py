"""Image quality statistics: kernels vs naive loop/Counter oracles,
constant/checkerboard closed forms, NaN-hole stencils, the distributed
pass vs the driver twin, and the all-bands-must-pass curation filter
(incl. the Spark NaN-ordering trap)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from vrtility_spark import codec, datagen, imagestats, schema

RNG = np.random.default_rng(91)


def _loop_laplacian_var(X):
    vals = []
    H, W = X.shape
    for y in range(1, H - 1):
        for x in range(1, W - 1):
            sten = [X[y - 1, x], X[y + 1, x], X[y, x - 1], X[y, x + 1],
                    X[y, x]]
            if all(np.isfinite(s) for s in sten):
                vals.append(sten[0] + sten[1] + sten[2] + sten[3]
                            - 4 * sten[4])
    if len(vals) < 2:
        return float("nan")
    return float(np.var(vals))


def _loop_entropy(v, lo, hi):
    c = Counter(min(int((x - lo) * 256 / (hi - lo)), 255)
                if x >= lo else 0 for x in np.clip(v, lo, None))
    h = 0.0
    for cnt in c.values():
        p = cnt / len(v)
        h -= p * np.log2(p)
    return h


def test_kernels_match_loops():
    X = np.round(RNG.uniform(0, 65535, (9, 11)))
    X[2, 3] = X[7, 7] = np.nan
    np.testing.assert_allclose(imagestats.laplacian_var_np(X),
                               _loop_laplacian_var(X), rtol=1e-12)
    v = X[np.isfinite(X)]
    np.testing.assert_allclose(imagestats.entropy_np(v, 0.0, 65535.0),
                               _loop_entropy(v, 0.0, 65535.0),
                               rtol=1e-12)
    stats = imagestats.quality_np(X[None], 0.0, 65535.0, 0.02)[0]
    assert stats[0] == v.size
    np.testing.assert_allclose(stats[1], v.size / X.size)
    np.testing.assert_allclose(stats[2], v.mean())
    np.testing.assert_allclose(stats[3], v.std())
    dark = 0.02 * 65535
    np.testing.assert_allclose(stats[6], (v <= dark).mean())
    np.testing.assert_allclose(stats[7], (v >= 65535 - dark).mean())


def test_closed_forms():
    # constant mid-range plane: zero entropy, zero blur, zero std,
    # no clipping
    C = np.full((1, 8, 8), 30000.0)
    n, vf, mean, std, blur, ent, dk, br = \
        imagestats.quality_np(C, 0.0, 65535.0, 0.02)[0]
    assert (n, vf, mean, std, blur, ent, dk, br) == \
        (64, 1.0, 30000.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    # 0/65535 checkerboard: exactly 1 bit of entropy, half dark, half
    # bright, and the Laplacian alternates +-4*65535 -> variance
    # (4*65535)^2 exactly (interior of an even board is balanced)
    yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    B = (((yy + xx) % 2) * 65535.0)[None]
    n, vf, mean, std, blur, ent, dk, br = \
        imagestats.quality_np(B, 0.0, 65535.0, 0.02)[0]
    np.testing.assert_allclose(ent, 1.0)
    np.testing.assert_allclose([dk, br], [0.5, 0.5])
    np.testing.assert_allclose(blur, (4.0 * 65535.0) ** 2)
    # all-nodata band: n_valid 0 and NaN stats
    E = np.full((1, 8, 8), np.nan)
    st = imagestats.quality_np(E, 0.0, 65535.0, 0.02)[0]
    assert st[0] == 0 and st[1] == 0.0
    assert all(np.isnan(s) for s in st[2:])
    # too-thin strip: blur NaN (no interior), other stats fine
    S = np.full((1, 2, 8), 5.0)
    st = imagestats.quality_np(S, 0.0, 65535.0, 0.02)[0]
    assert np.isnan(st[4]) and st[5] == 0.0


def test_distributed_matches_driver_twin(spark):
    pdf = datagen.images_pandas(nx=1, ny=1, w=16, h=16)
    df = schema.images_df(spark, pdf)
    got = {(r.image_id, r.band): r
           for r in imagestats.quality_stats(df).collect()}
    assert len(got) == len(pdf) * 5
    for _, row in pdf.iterrows():
        arr = codec.decode(row["bytes"], int(row.w), int(row.h),
                           row.fmt)
        nd = np.asarray(row.band_nodata, dtype=np.float64)
        A = codec.to_float_masked(arr, nd)
        for bi, want in enumerate(
                imagestats.quality_np(A, 0.0, 65535.0, 0.02)):
            r = got[(row.image_id, bi)]
            have = (r.n_valid, r.valid_frac, r.mean, r.std,
                    r.blur_var, r.entropy, r.dark_frac, r.bright_frac)
            np.testing.assert_allclose(have, want, rtol=1e-12,
                                       equal_nan=True)
    # guards
    with pytest.raises(ValueError, match="missing column"):
        imagestats.quality_stats(df.drop("nodata"))
    with pytest.raises(ValueError, match="value range"):
        imagestats.quality_stats(df, lo=10.0, hi=10.0)
    with pytest.raises(ValueError, match="clip_frac"):
        imagestats.quality_stats(df, clip_frac=0.7)


def test_quality_filter(spark):
    """Plant a blank scene and a half-nodata scene among noisy ones:
    entropy and valid-frac gates drop exactly the plants, every band
    must pass, and NaN statistics fail minimums (the Spark
    NaN-above-everything ordering must not leak a pass)."""
    def scene(image_id, arr):
        nd = [0.0] * arr.shape[0]
        return {"image_id": image_id,
                "bytes": codec.encode(arr.astype(np.uint16), "raw16"),
                "w": arr.shape[2], "h": arr.shape[1], "fmt": "raw16",
                "nodata": 0.0, "band_nodata": nd}

    noisy = np.round(RNG.uniform(1000, 60000, (3, 2, 16, 16)))
    blank = np.full((2, 16, 16), 30000.0)
    half = noisy[0].copy()
    half[:, :, 8:] = 0.0  # nodata sentinel
    one_band_blank = noisy[1].copy()
    one_band_blank[1] = 20000.0
    rows = [scene("good_a", noisy[0]), scene("good_b", noisy[1]),
            scene("blank", blank), scene("half", half),
            scene("oneband", one_band_blank)]
    sdf = spark.createDataFrame(pd.DataFrame(rows), (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "nodata double, band_nodata array<double>"))
    keep = imagestats.quality_filter(sdf, min_entropy=0.5)
    assert {r.image_id for r in keep.collect()} == \
        {"good_a", "good_b", "half"}
    # all bands must pass: oneband's flat band fails the entropy gate
    assert "oneband" not in \
        {r.image_id for r in keep.collect()}
    keep2 = imagestats.quality_filter(sdf, min_valid_frac=0.9)
    assert {r.image_id for r in keep2.collect()} == \
        {"good_a", "good_b", "blank", "oneband"}
    # NaN stats fail minimums: an all-nodata scene never passes
    allnd = scene("void", np.zeros((2, 16, 16)))
    sdf2 = sdf.unionByName(spark.createDataFrame(
        pd.DataFrame([allnd]), sdf.schema))
    keep3 = imagestats.quality_filter(sdf2, min_blur_var=0.0)
    assert "void" not in {r.image_id for r in keep3.collect()}
    with pytest.raises(ValueError, match="no thresholds"):
        imagestats.quality_filter(sdf)
    # bands selector: restricting the gate to the noisy band lets
    # oneband back through; bad selections raise
    keep4 = imagestats.quality_filter(sdf, min_entropy=0.5, bands=(0,))
    assert "oneband" in {r.image_id for r in keep4.collect()}
    got = imagestats.quality_stats(sdf, bands=(1,)).collect()
    assert {r.band for r in got} == {1}
    with pytest.raises(ValueError, match="invalid band"):
        imagestats.quality_stats(sdf, bands=(-1,))
    with pytest.raises(Exception, match="exceeds"):
        imagestats.quality_stats(sdf, bands=(9,)).collect()


def test_pipeline_quality_filter_bundles(spark, tmp_path):
    """The curation gate as a logged Pipeline verb: drops the planted
    blank scene, and the bundle replays to the identical scene set."""
    from vrtility_spark.pipeline import Pipeline

    pdf = datagen.images_pandas(nx=1, ny=1, w=16, h=16)
    blank = pdf.iloc[[0]].copy()
    blank["image_id"] = "blank_plant"
    blank["bytes"] = [codec.encode(
        np.full((len(pdf.iloc[0].band_nodata), 16, 16), 30000,
                dtype=np.uint16), "raw16")]
    df = schema.images_df(spark, pd.concat([pdf, blank],
                                           ignore_index=True))
    # gate the DATA bands only: the fixture's 5th plane is the S2
    # mask band, whose class codes all land in one 256-wide bin of
    # the full uint16 range (entropy 0) — gating it would drop every
    # scene, which is exactly why the bands selector exists
    p = Pipeline(df).quality_filter(min_entropy=0.5, bands=(0, 1, 2, 3))
    ids = {r.image_id for r in p.df.select("image_id").collect()}
    assert "blank_plant" not in ids
    assert len(ids) == len(pdf)
    path = str(tmp_path / "qf.json")
    p.to_bundle(path)
    replay = Pipeline.from_bundle(path, df)
    ids2 = {r.image_id for r in replay.df.select("image_id").collect()}
    assert ids2 == ids
