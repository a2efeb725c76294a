"""Cell index: numpy / Spark-Column / SQL paths must agree exactly."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from vrtility_spark import cells


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    zone = rng.integers(0, 60, 1000)
    res = 7
    ix = rng.integers(0, 1 << res, 1000)
    iy = rng.integers(0, 1 << res, 1000)
    cid = cells.encode_np(zone, res, ix, iy)
    z2, r2, x2, y2 = cells.decode_np(cid)
    assert (z2 == zone).all() and (r2 == res).all()
    assert (x2 == ix).all() and (y2 == iy).all()


def test_parent_is_prefix():
    cid = cells.xy_to_cell_np(30, 123456.7, 98765.4, 10)
    p = cells.parent_np(cid, 3)
    z, r, ix, iy = cells.decode_np(p)
    assert r == 7
    # the parent's extent contains the child's point
    size = cells.cell_size(7)
    assert ix * size <= 123456.7 < (ix + 1) * size
    assert iy * size <= 98765.4 < (iy + 1) * size


def test_cover_bbox_edges():
    # bbox touching a cell boundary must not spill into the next cell
    size = cells.cell_size(4)
    cover = cells.cover_bbox_np(30, 0.0, 0.0, size, size, 4)
    assert len(cover) == 1
    cover2 = cells.cover_bbox_np(30, 0.0, 0.0, size + 1e-3, size, 4)
    assert len(cover2) == 2


def test_disk_and_ring():
    cid = int(cells.xy_to_cell_np(30, 500000, 500000, 8))
    assert len(cells.disk_np(cid, 1)) == 9
    assert len(cells.ring_np(cid, 1)) == 8
    assert len(cells.ring_np(cid, 2)) == 16
    assert set(cells.ring_np(cid, 0).tolist()) == {cid}


def test_column_expression_matches_numpy(spark):
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame({
        "zone": rng.integers(0, 60, 500),
        "x": rng.uniform(0, cells.ZONE_SPAN, 500),
        "y": rng.uniform(0, cells.ZONE_SPAN, 500),
    })
    expected = cells.xy_to_cell_np(pdf.zone.values, pdf.x.values, pdf.y.values, 9)
    df = spark.createDataFrame(pdf)
    got = (df.withColumn("cid", cells.xy_to_cell_col(F.col("zone"), F.col("x"), F.col("y"), 9))
             .select("cid").toPandas().cid.values)
    assert (np.sort(got) == np.sort(expected)).all()
    # parent column matches numpy parent
    got_p = (df.withColumn("cid", cells.xy_to_cell_col(F.col("zone"), F.col("x"), F.col("y"), 9))
               .withColumn("p", cells.parent_col(F.col("cid"), 2))
               .select("p").toPandas().p.values)
    assert (np.sort(got_p) == np.sort(cells.parent_np(expected, 2))).all()


def test_sql_expression_matches_numpy():
    rng = np.random.default_rng(2)
    pdf = pd.DataFrame({
        "zone": rng.integers(0, 60, 500),
        "x": rng.uniform(0, cells.ZONE_SPAN, 500),
        "y": rng.uniform(0, cells.ZONE_SPAN, 500),
    })
    expected = cells.xy_to_cell_np(pdf.zone.values, pdf.x.values, pdf.y.values, 9)
    con = duckdb.connect()
    con.register("t", pdf)
    expr = cells.xy_to_cell_sql("zone", "x", "y", 9)
    got = con.sql(f"select {expr} as cid from t").df().cid.values
    assert (got == expected).all()
