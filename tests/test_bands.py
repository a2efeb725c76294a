from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from vrtility_spark import bands, codec, datagen, mlmask, schema


def _decode_first(pdf_out, src_pdf=None):
    r = pdf_out.iloc[0]
    return codec.decode(r.bytes, r.w, r.h, r.fmt), list(r.bands)


def test_subset_and_reorder(spark, tiny_images):
    df = tiny_images.limit(3)
    out = bands.subset_bands(df, ["B04", "B02"]).toPandas()
    arr, names = _decode_first(out)
    assert names == ["B04", "B02"] and arr.shape[0] == 2
    src = df.toPandas().iloc[0]
    src_arr = codec.decode(src.bytes, src.w, src.h, src.fmt)
    assert (arr[0] == src_arr[2]).all() and (arr[1] == src_arr[0]).all()

    out2 = bands.move_band(df, "SCL", 1).toPandas()
    arr2, names2 = _decode_first(out2)
    assert names2[0] == "SCL" and (arr2[0] == src_arr[4]).all()


def test_add_empty_and_rename(spark, tiny_images):
    df = tiny_images.limit(2)
    out = bands.add_empty_band(df, "EMPTY").toPandas()
    arr, names = _decode_first(out)
    assert names[-1] == "EMPTY" and (arr[-1] == 0).all()
    ren = bands.set_band_names(df, ["a", "b", "c", "d", "e"]) \
        .select("bands").first()[0]
    assert ren == ["a", "b", "c", "d", "e"]


def test_derived_ndvi(spark, tiny_images):
    """NDVI semantics of the reference's derived-band tests
    (test-vrt-derived-block.R:33-52): values in (-1, 1), nodata
    propagates, and B04*0 == 0."""
    df = tiny_images.limit(4)
    ndvi = bands.derived_band(
        df, "NDVI", lambda b: (b["B08"] - b["B04"]) / (b["B08"] + b["B04"]))
    out = ndvi.toPandas()
    for _, r in out.iterrows():
        arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
        assert r.fmt == "rawf32" and r.scale == 1.0 and np.isnan(r.nodata)
        # mask plane stays LAST (raw class codes); derived just before
        assert list(r.bands)[-1] == "SCL" and list(r.bands)[-2] == "NDVI"
        plane = arr[-2]
        valid = ~np.isnan(arr[0])
        assert np.abs(plane[valid]).max() <= 1.0  # full [-1,1], no clip
        assert plane[valid].min() < 0 < plane[valid].max()  # negatives kept
        # nodata propagates as NaN in the derived plane
        assert np.isnan(plane[~valid]).all()

    # chaining composes exactly: a second derived band reads the first
    # in physical units (the one-pixfun-per-level relaxation)
    chained = bands.derived_band(ndvi, "NDVI2", lambda b: b["NDVI"] * 2.0)         .toPandas()
    for _, r in chained.iterrows():
        arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
        i_ndvi = list(r.bands).index("NDVI")
        i_2 = list(r.bands).index("NDVI2")
        v = ~np.isnan(arr[i_ndvi])
        np.testing.assert_allclose(arr[i_2][v], 2.0 * arr[i_ndvi][v],
                                   rtol=1e-6)

    zero = bands.derived_band(df, "Z", lambda b: b["B04"] * 0.0).toPandas()
    for _, r in zero.iterrows():
        arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
        plane = arr[list(r.bands).index("Z")]
        assert (plane[~np.isnan(plane)] == 0).all()


def test_scale_offset_semantics(spark, tiny_images):
    """F2: scaling metadata changes decoded physical values by exactly
    the scale factor (test-singleband-m2m.R:75-85 analogue)."""
    df = bands.set_scale(tiny_images.limit(1), 1e-4)
    row = df.first()
    assert row.scale == 1e-4
    arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
    physical = arr[0].astype(np.float64) * row.scale + row.offset
    assert physical.max() <= 6.5536  # 65535 * 1e-4


def test_stack_view(spark, tiny_images):
    from vrtility_spark import warp
    df = warp.assign_cells(tiny_images, datagen.TILE_RES)
    st = bands.stack(df).toPandas()
    assert len(st) == 12
    assert (st.n_scenes == 5).all()
    s = st.iloc[0].series
    times = [x["datetime"] for x in s]
    assert times == sorted(times)


def test_mlmask_fake(spark, tiny_images):
    df = tiny_images.limit(3)
    out = mlmask.create_mlmask(df, model="fake").toPandas()
    for _, r in out.iterrows():
        arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
        assert list(r.bands)[-1] == "MLMASK"
        mask = arr[-1]
        assert set(np.unique(mask)) <= {0, 1}
        assert 0.10 <= (mask == 0).mean() <= 0.20  # ~15% flagged
    # determinism
    out2 = mlmask.create_mlmask(df, model="fake").toPandas()
    assert all(bytes(a) == bytes(b) for a, b in zip(out.bytes, out2.bytes))


def test_mlmask_real_model_raises(spark, tiny_images):
    import pytest
    with pytest.raises((NotImplementedError, Exception)):
        mlmask.create_mlmask(tiny_images.limit(1), model="omnicloudmask")


def test_asof_and_range_join(spark):
    from vrtility_spark.join import asof_join, range_join
    left = spark.createDataFrame(
        [(1, "k", "2024-01-05"), (2, "k", "2024-01-01"), (3, "x", "2024-01-05")],
        "id int, k string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("k", "2024-01-02", 10.0), ("k", "2024-01-04", 20.0),
         ("x", "2024-01-06", 30.0)],
        "k string, rts string, v double"
    ).withColumn("rts", F.to_timestamp("rts"))
    got = asof_join(left, right, on="k", left_time="ts", right_time="rts",
                    left_id="id").select("id", "v").toPandas()
    assert dict(zip(got.id, got.v)) == {1: 20.0}  # id2: nothing before; id3: x after
    fwd = asof_join(left, right, on="k", left_time="ts", right_time="rts",
                    left_id="id", direction="forward") \
        .select("id", "v").toPandas()
    assert dict(zip(fwd.id, fwd.v)) == {2: 10.0, 3: 30.0}

    windows = spark.createDataFrame(
        [("k", "2024-01-01", "2024-01-03", "w1"),
         ("k", "2024-01-03", "2024-01-10", "w2")],
        "k string, lo string, hi string, wid string"
    ).withColumn("lo", F.to_timestamp("lo")).withColumn("hi", F.to_timestamp("hi"))
    for width in (None, 86400):
        rj = range_join(left, windows, on="k", ts="ts", lo="lo", hi="hi",
                        bucket_width_sec=width)
        pairs = sorted((r.id, r.wid) for r in rj.select("id", "wid").collect())
        assert pairs == [(1, "w2"), (2, "w1")], width


def test_formula_ast_rejects_escapes():
    """Bundles are portable JSON: a formula string must be DATA, not
    code. The AST whitelist rejects every eval-escape shape while
    accepting real band math."""
    import pytest
    for bad in (
        "().__class__.__mro__[1].__subclasses__()",  # classic escape
        "B04.__class__",                             # attribute access
        "getattr(B04, 'x')",                         # non-whitelisted call
        "B04[0]",                                    # subscript
        "(lambda: 1)()",                             # lambda
        "[b for b in (B04,)]",                       # comprehension
        "'text'",                                    # non-numeric constant
        "__import__",                                # dunder name
    ):
        with pytest.raises(ValueError):
            bands.compile_formula(bad)
    # the legitimate surface still compiles and evaluates
    f = bands.compile_formula("where(B08 > B04, sqrt(abs(B08 - B04)), 0.0)")
    env = {"B04": np.array([1.0, 9.0]), "B08": np.array([5.0, 5.0])}
    np.testing.assert_allclose(f(env), [2.0, 0.0])


def test_mlmask_callable_model_branch(spark, tiny_images):
    """The REAL inference branch (model = callable) must execute the
    supplied predictor through the batching path — here a NumPy stand-in
    so it runs everywhere."""
    def predict(planes):
        return (planes[0] > planes[0].mean()).astype("uint8")

    out = mlmask.create_mlmask(tiny_images, bands=("B04", "B03", "B08"),
                               model=predict).toPandas()
    row = out.iloc[0]
    arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
    assert list(row.bands)[-1] == "MLMASK"
    assert set(np.unique(arr[-1])) <= {0, 1}
    src = codec.decode(tiny_images.toPandas().iloc[0].bytes,
                       row.w, row.h, row.fmt)
    b04 = src[list(row.bands).index("B04")]
    np.testing.assert_array_equal(arr[-1],
                                  (b04 > b04.astype("float32").mean()))


def test_mlmask_real_torch_model(spark, tiny_images):
    """P11's non-fake branch with a REAL conv model — env-gated: runs
    wherever torch is installed (skipped in this sandbox), so the
    deployment path has an executing gate."""
    import pytest
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    torch.manual_seed(0)
    net = nn.Sequential(nn.Conv2d(3, 4, 3, padding=1), nn.ReLU(),
                        nn.Conv2d(4, 1, 1))
    net.eval()

    def predict(planes):
        with torch.no_grad():
            t = torch.from_numpy(planes[None] / 10000.0)
            logits = net(t)[0, 0].numpy()
        return (logits <= np.median(logits)).astype("uint8")

    out = mlmask.create_mlmask(tiny_images, model=predict).toPandas()
    arr = codec.decode(out.iloc[0].bytes, out.iloc[0].w, out.iloc[0].h,
                       out.iloc[0].fmt)
    assert set(np.unique(arr[-1])) <= {0, 1}
    assert list(out.iloc[0].bands)[-1] == "MLMASK"


def test_mlmask_vendored_weights_numpy(spark, tiny_images):
    """P11 run-it-for-real gate, runnable in ANY environment: the
    vendored tiny-conv-net weights (models/tinycloud.npz, fixed on
    disk) execute through create_mlmask's real-predictor branch via
    the NumPy forward — a real loaded-weights inference, not a
    derived-from-input fake. The resulting plane must be a mixed 0/1
    mask (the generator centered the logit on a sample scene) and be
    deterministic run to run."""
    predict = mlmask.tiny_conv_predictor(backend="numpy")
    out = mlmask.create_mlmask(tiny_images, bands=("B04", "B03", "B08"),
                               model=predict).toPandas()
    row = out.sort_values("image_id").iloc[0]
    arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
    assert list(row.bands)[-1] == "MLMASK"
    vals = set(np.unique(arr[-1]))
    assert vals == {0, 1}  # mixed mask: both classes present
    out2 = mlmask.create_mlmask(tiny_images, bands=("B04", "B03", "B08"),
                                model=mlmask.tiny_conv_predictor(
                                    backend="numpy")).toPandas()
    row2 = out2.sort_values("image_id").iloc[0]
    assert bytes(row.bytes) == bytes(row2.bytes)


def test_mlmask_vendored_weights_torch_parity(spark, tiny_images):
    """Torch backend of the SAME vendored weights must agree with the
    NumPy forward (env-gated; CI: pip install torch && pytest -k
    torch). Same weights + same math => same mask up to float
    associativity at the 0-logit boundary (none expected)."""
    import pytest
    pytest.importorskip("torch")
    pdf = tiny_images.limit(4).toPandas()
    np_pred = mlmask.tiny_conv_predictor(backend="numpy")
    t_pred = mlmask.tiny_conv_predictor(backend="torch")
    for _, row in pdf.iterrows():
        arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
        names = list(row.bands)
        planes = arr[[names.index(b) for b in ("B04", "B03", "B08")]]
        a, b = np_pred(planes), t_pred(planes)
        assert (a == b).mean() >= 0.999, "torch/numpy forward disagree"


# ---------------------------------------------------- spectral indices

def test_index_formula_renders_and_validates():
    from vrtility_spark import bands
    f = bands.index_formula("ndvi", nir="B08", red="B04")
    assert f == "((B08) - (B04)) / ((B08) + (B04))"
    # every template renders into an AST-valid formula
    roles = dict(nir="B08", red="B04", green="B03", blue="B02",
                 swir1="B11", swir2="B12", rededge="B05")
    for idx in bands.SPECTRAL_INDICES:
        bands.compile_formula(bands.index_formula(idx, **roles))
    import pytest as _pt
    with _pt.raises(KeyError):
        bands.index_formula("nope", nir="B08")
    with _pt.raises(ValueError):
        bands.index_formula("ndvi", nir="B08")          # missing red
    with _pt.raises(ValueError):
        bands.index_formula("ndvi", nir="B08", red="B04-bad")


def test_spectral_index_matches_hand_formula(spark, tiny_images):
    from vrtility_spark import bands
    via_preset = bands.spectral_index(
        tiny_images, "ndvi", nir="B08", red="B04").toPandas()
    via_formula = bands.derived_band(
        tiny_images, "ndvi",
        "((B08) - (B04)) / ((B08) + (B04))").toPandas()
    assert list(via_preset.bands.iloc[0]) == list(via_formula.bands.iloc[0])
    a = {r.image_id: bytes(r.bytes) for r in via_preset.itertuples()}
    b = {r.image_id: bytes(r.bytes) for r in via_formula.itertuples()}
    assert a == b
    # savi closed form on a known pixel pair: nir=.8, red=.2 -> 0.6
    import numpy as np
    f = bands.compile_formula(bands.index_formula(
        "savi", nir="N", red="R"))
    v = f({"N": np.array([0.8]), "R": np.array([0.2])})
    np.testing.assert_allclose(v, 1.5 * 0.6 / 1.5)
    f2 = bands.compile_formula(bands.index_formula(
        "msavi", nir="N", red="R"))
    v2 = f2({"N": np.array([0.8]), "R": np.array([0.2])})
    want = (2 * 0.8 + 1 - np.sqrt((2 * 0.8 + 1) ** 2
                                  - 8 * (0.8 - 0.2))) / 2
    np.testing.assert_allclose(v2, want)


def test_spectral_index_pipeline_bundles(spark, tiny_images, tmp_path):
    from vrtility_spark.pipeline import Pipeline
    p = Pipeline(tiny_images).spectral_index("ndvi", nir="B08", red="B04")
    bpath = str(tmp_path / "ndvi_bundle.json")
    p.to_bundle(bpath)
    replay = Pipeline.from_bundle(bpath, tiny_images)
    a = {r.image_id: bytes(r.bytes) for r in p.df.collect()}
    b = {r.image_id: bytes(r.bytes) for r in replay.df.collect()}
    assert a == b and len(a) > 0
