"""Mask kernels: oracle parity, dual-path equivalence, monotonicity."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from vrtility_spark import codec, datagen, masks, schema


def test_intmask_semantics():
    band = np.array([[0, 4], [8, 5]])
    m = masks.build_intmask_np(band, datagen.S2_MASK_VALUES)
    assert (m == np.array([[0, 1], [0, 1]])).all()


def test_bitmask_semantics():
    band = np.array([[0b0100, 0b0001], [0b1000, 0b1100]])
    m = masks.build_bitmask_np(band, [2, 3])
    assert (m == np.array([[0, 1], [0, 0]])).all()


def test_dilation_matches_manual():
    m = np.zeros((5, 5), dtype=bool)
    m[2, 2] = True
    d1 = masks.binary_dilation_np(m, 1)
    assert d1.sum() == 9 and d1[1:4, 1:4].all()
    d2 = masks.binary_dilation_np(m, 2)
    assert d2.sum() == 25


def test_masking_monotonicity(tiny_images_pdf):
    """sum(no_mask) > sum(masked) > sum(masked, buffer)
    (test-vrt-set-mask.R:75-98)."""
    row = tiny_images_pdf.iloc[7]
    arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
    m01 = masks.build_intmask_np(arr[-1], datagen.S2_MASK_VALUES)
    assert 0 < m01.mean() < 1, "fixture must have partial cloud"
    plain = masks.apply_mask_np(arr[:-1], m01, 0)
    buffered = masks.apply_mask_np(arr[:-1], m01, 0, buffer_size=2)
    assert arr[:-1].sum() > plain.sum() > buffered.sum()


def test_dual_path_equivalence(spark, tiny_images_pdf):
    """NumPy mask path ≡ Catalyst Column expression path, exactly
    (the reference's python-vs-muparser test, test-vrt-set-mask.R:270-282)."""
    row = tiny_images_pdf.iloc[3]
    arr = codec.decode(row.bytes, row.w, row.h, row.fmt)
    scl = arr[-1].ravel()
    pdf = pd.DataFrame({"scl": scl.astype(np.int64),
                        "b02": arr[0].ravel().astype(np.int64)})
    df = spark.createDataFrame(pdf)
    got = df.select(
        masks.set_mask_col(
            F.col("b02"),
            masks.intmask_col(F.col("scl"), datagen.S2_MASK_VALUES),
            0.0).alias("v")
    ).toPandas().v.values
    m01 = masks.build_intmask_np(scl, datagen.S2_MASK_VALUES)
    expected = np.where(m01 > 0, arr[0].ravel(), 0)
    assert (got == expected).all()

    # bitmask dual-path on HLS-style flags
    flags = np.arange(16)
    df2 = spark.createDataFrame(pd.DataFrame({"f": flags}))
    got2 = df2.select(masks.bitmask_col(F.col("f"), [2, 3]).alias("m")) \
              .toPandas().m.values
    assert (got2 == masks.build_bitmask_np(flags, [2, 3])).all()


def test_vrt_set_maskfun_spark(spark, tiny_images_pdf):
    df = schema.images_df(spark, tiny_images_pdf.head(10))
    out = masks.vrt_set_maskfun(df, "int", datagen.S2_MASK_VALUES,
                                buffer_size=0).toPandas()
    assert len(out) == 10
    for _, r in out.iterrows():
        src = tiny_images_pdf[tiny_images_pdf.image_id == r.image_id].iloc[0]
        arr_in = codec.decode(src.bytes, src.w, src.h, src.fmt)
        arr_out = codec.decode(r.bytes, r.w, r.h, r.fmt)
        m01 = masks.build_intmask_np(arr_in[-1], datagen.S2_MASK_VALUES)
        assert (arr_out[:-1] == masks.apply_mask_np(arr_in[:-1], m01, 0)).all()
        assert (arr_out[-1] == arr_in[-1]).all()  # mask plane kept
