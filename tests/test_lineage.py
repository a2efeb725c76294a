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


def test_upsert_mode_and_tags_are_table_invariants(spark, tmp_path):
    """upsert is a table-level property (conflicting commits raise) and
    idempotency tags survive across the chain; reading an empty table
    errors clearly."""
    import pytest
    from vrtility_spark.lineage import SnapshotTable
    t = SnapshotTable(str(tmp_path / "tbl"))
    with pytest.raises(ValueError, match="no commits"):
        t.read(spark)
    df = spark.range(4).selectExpr("id as k", "id * 2 as v")
    t.commit(df, "k", upsert=True, tag="b0")
    with pytest.raises(ValueError, match="upsert"):
        t.commit(df, "k", upsert=False)
    t.commit(df.where("k < 2"), "k", tag="b1")  # inherits upsert=True
    assert t.tags() == {"b0", "b1"}
    # supersede: re-committed partitions 0,1 appear once
    got = t.read(spark).toPandas()
    assert sorted(got.k.astype(int)) == [0, 1, 2, 3]


def test_manifest_partition_byte_metrics(spark, tiny_images, tmp_path):
    tbl = lineage.SnapshotTable(str(tmp_path / "metrics_tbl"))
    m = tbl.commit(warp.assign_cells(tiny_images.where("zone = 30"),
                                     datagen.TILE_RES), "cell_id")
    assert len(m["partitions"]) == 4
    for p in m["partitions"].values():
        assert p["rows"] == 5
        assert p["bytes"] > 0 and p["files"] >= 1


def test_empty_snapshot_then_read_and_compact(spark, tiny_images, tmp_path):
    """A fully-resumed job commits an EMPTY snapshot; read() must skip
    it (no schema to infer) — and compact() rewrites the chain into one
    parentless snapshot with identical rows and preserved tags."""
    from vrtility_spark import composite, lineage, warp
    tbl = lineage.SnapshotTable(str(tmp_path / "t"))
    df = warp.assign_cells(tiny_images, datagen.TILE_RES)
    comp = composite.composite(df, "median")
    m1 = tbl.commit(comp, "cell_id", tag="b0")
    m2 = tbl.commit(tbl.remaining(comp, "cell_id"), "cell_id", tag="b1")
    assert m2["partitions"] == {}          # nothing left: empty snapshot
    assert m2["snapshot_id"] > m1["snapshot_id"]  # monotonic even same-ms
    before = tbl.read(spark).toPandas()    # must not crash on the empty one
    assert len(before) == 12

    m3 = lineage.compact(tbl, spark)
    assert m3["parent"] is None
    after = lineage.SnapshotTable(tbl.dir)  # fresh instance, cold cache
    got = after.read(spark).toPandas()
    key = lambda d: sorted((int(r.cell_id), bytes(r.bytes))
                           for _, r in d.iterrows())
    assert key(got) == key(before)
    assert after.tags() == {"b0", "b1"}    # idempotency tags survive
