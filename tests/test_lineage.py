from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vrtility_spark import composite, datagen, lineage, schema, warp


def test_snapshot_commit_resume(spark, tiny_images, tmp_path):
    """Run a composite job in two halves; the second run resumes from
    the snapshot and only processes the remaining partitions; the final
    state equals a single-shot run."""
    df = warp.assign_cells(tiny_images, datagen.TILE_RES)
    full = composite.composite(df, "median")
    tbl = lineage.SnapshotTable(str(tmp_path / "tbl"))

    # half 1: zone 30 only
    half1 = composite.composite(df.where("zone = 30"), "median")
    m1 = tbl.commit(half1, "cell_id")
    assert sum(p["rows"] for p in m1["partitions"].values()) == 4

    # resume: remaining() filters out completed cells
    done = tbl.completed_partitions()
    assert len(done) == 4
    rest = tbl.remaining(full, "cell_id")
    m2 = tbl.commit(rest, "cell_id")
    assert m2["parent"] == m1["self"]
    assert not (set(m2["partitions"]) & set(m1["partitions"]))

    got = tbl.read(spark).select("cell_id", "caption_agg").toPandas()
    exp = full.select("cell_id", "caption_agg").toPandas()
    assert sorted(map(tuple, got.values)) == sorted(map(tuple, exp.values))


def test_partition_metrics(spark, tiny_images):
    h = lineage.partition_metrics(tiny_images.repartition(4, "image_id"))
    pdf = h.toPandas()
    assert pdf["count"].sum() == tiny_images.count()
