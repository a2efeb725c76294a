"""Structured-Streaming scene ingestion (optional extension).

The reference is batch-only (SURVEY.md §2.8): its only incremental
behaviors are retry/backoff and async tile completion. This module is
the *optional* streaming demo scoped there: scene-arrival micro-batching
— new scene files appear in a directory, each micro-batch is masked,
cell-assigned, and folded into per-cell composites via ``foreachBatch``
into a snapshot table (exactly-once per batch through the snapshot
manifest chain).

Design notes for real deployments:
- a file-source stream over the landing prefix; watermark on
  ``datetime`` bounds state for windowed variants;
- ``foreachBatch`` + SnapshotTable keeps the sink idempotent/resumable
  (each batch is one atomic snapshot with per-partition lineage);
- per-cell *incremental* composites for decomposable reducers
  (mean/min/max/sum via running aggregates); order-sensitive reducers
  (median, medoid) recompute per affected cell from the batch's cells —
  correct because a cell's scenes arrive together per tile drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vrtility_spark import datagen
from vrtility_spark.composite import composite
from vrtility_spark.lineage import SnapshotTable
from vrtility_spark.masks import vrt_set_maskfun
from vrtility_spark.schema import IMAGE_SCHEMA
from vrtility_spark.warp import assign_cells


def read_scene_stream(spark: SparkSession, input_dir: str,
                      max_files_per_batch: int = 32) -> DataFrame:
    """File-source stream of scene rows (parquet drops)."""
    return (spark.readStream.schema(IMAGE_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_batch)
            .parquet(input_dir)
            .withWatermark("datetime", "30 days"))


def composite_stream(spark: SparkSession, input_dir: str, table_dir: str,
                     reducer: str = "median", cell_res: int = datagen.TILE_RES,
                     mask_values=None, checkpoint_dir: str | None = None):
    """Stream scenes → masked per-cell composites, one snapshot per
    micro-batch. Returns the StreamingQuery (caller awaits/stops);
    use ``trigger(availableNow=True)`` semantics for drain-and-stop."""
    tbl = SnapshotTable(table_dir)
    vals = mask_values or datagen.S2_MASK_VALUES

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        masked = vrt_set_maskfun(batch_df, "int", vals)
        celled = assign_cells(masked, cell_res)
        tbl.commit(composite(celled, reducer), "cell_id")

    stream = read_scene_stream(spark, input_dir)
    writer = (stream.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation",
                      checkpoint_dir or table_dir + "/_stream_checkpoint")
              .trigger(availableNow=True))
    return writer.start()
