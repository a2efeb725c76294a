"""Checkpoint policy for iterative operators.

Iterative DataFrame algorithms (connected components, kNN count
rounds) must truncate lineage every round or round N replans rounds
1..N-1. Two policies:

- ``reliable=False`` (default): ``localCheckpoint`` — executor-local
  blocks, zero external storage, right for a sandbox or any job short
  enough to simply rerun. NOT fault-tolerant: losing one executor
  loses its blocks and fails the job.
- ``reliable=True``: ``DataFrame.checkpoint`` to the context's
  checkpoint directory (HDFS/object store on a real cluster) — an
  hours-long 100-TB job survives executor loss because every round's
  state is re-readable from durable storage. Costs one write+read of
  the state per round; for CC state is the (id, comp) label table,
  tiny next to the edge set.

Reference parity note: the reference's mirai-daemon pipelines have no
mid-job resume at all (failures rerun the collection —
R/vrt-collect.R); durable per-round state is what the 100-TB scale
target adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame, *, eager: bool = True,
                     reliable: bool = False,
                     checkpoint_dir: str | None = None) -> DataFrame:
    """Checkpoint ``df`` under the chosen durability policy.

    ``checkpoint_dir`` (only meaningful with ``reliable=True``) sets
    the context's checkpoint directory if none is set yet; if the
    context already has one, it wins — Spark's checkpoint dir is
    context-global, so per-operator overrides would silently apply to
    every subsequent caller anyway.
    """
    if not reliable:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    current = sc.getCheckpointDir()
    if current is None:
        if checkpoint_dir is None:
            raise ValueError(
                "reliable=True needs a checkpoint directory: call "
                "spark.sparkContext.setCheckpointDir(<durable path>) or "
                "pass checkpoint_dir=")
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)
