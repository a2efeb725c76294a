from __future__ import annotations

import os

from vrtility_spark import datagen, schema, streaming, warp
from vrtility_spark.composite import composite
from vrtility_spark.lineage import SnapshotTable
from vrtility_spark.masks import vrt_set_maskfun


def test_scene_stream_composites(spark, tiny_images, tmp_path):
    land = str(tmp_path / "landing")
    tbl_dir = str(tmp_path / "stream_tbl")
    # two scene drops: zone 30 first, the rest later
    tiny_images.where("zone = 30").write.parquet(land)
    tiny_images.where("zone != 30").write.mode("append").parquet(land)

    q = streaming.composite_stream(spark, land, tbl_dir, reducer="median")
    q.awaitTermination(240)

    tbl = SnapshotTable(tbl_dir)
    got = tbl.read(spark).select("cell_id", "caption_agg").toPandas()
    # streamed result == batch result (micro-batching is an execution
    # detail, not a semantics change — the async≡sync invariant)
    batch = composite(
        warp.assign_cells(vrt_set_maskfun(tiny_images, "int",
                                          datagen.S2_MASK_VALUES),
                          datagen.TILE_RES), "median") \
        .select("cell_id", "caption_agg").toPandas()
    assert sorted(map(tuple, got.values)) == sorted(map(tuple, batch.values))
    assert os.path.isdir(tbl_dir + "/_stream_checkpoint")
