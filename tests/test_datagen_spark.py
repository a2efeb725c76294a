from __future__ import annotations

import pandas as pd

from vrtility_spark import datagen


def test_images_spark_matches_pandas(spark):
    """Distributed generation must be byte-identical to the driver-side
    generator (the determinism contract that lets the oracle regenerate
    any partition's pixels)."""
    exp = datagen.images_pandas(nx=2, ny=2, w=16, h=16)
    got = datagen.images_spark(spark, nx=2, ny=2, w=16, h=16).toPandas()
    assert len(got) == len(exp) == 60
    e = exp.sort_values("image_id").reset_index(drop=True)
    g = got.sort_values("image_id").reset_index(drop=True)
    assert list(g.image_id) == list(e.image_id)
    assert all(bytes(a) == bytes(b) for a, b in zip(g.bytes, e.bytes))
    assert (g.phash.values == e.phash.values).all()
    assert (g.cloud_cover.values == e.cloud_cover.values).all()
    assert list(g.caption) == list(e.caption)
