"""Checkpoint / resume via snapshot manifests with per-partition lineage.

The reference persists intermediate plans to a VRT cache directory and
can re-build pipelines from saved bundles (R/vrt-save.R:51-109,
R/cache-mgmt.R:28-50). The ``north_rule`` upgrade: durable snapshots
with **per-partition lineage + metrics** enabling mid-job resume.

No Iceberg runtime jar ships in this sandbox, so this implements the
documented plan-B (SURVEY.md §7.3): an Iceberg-shaped snapshot manifest
over immutable parquet directories — atomic snapshot ids, parent
pointers, per-partition row counts/metrics — isolated behind this one
module so a real Iceberg catalog can be swapped in on a cluster
(``df.writeTo(tbl).append()``).

Layout::

    table_dir/
      snap-000001/part=<key>/...parquet   (immutable data)
      manifest-000001.json                (snapshot metadata, atomic rename)
      CURRENT                             (points at live manifest)
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, table_dir: str):
        self.dir = table_dir
        os.makedirs(table_dir, exist_ok=True)

    # ------------------------------------------------------- helpers
    def _current_path(self):
        return os.path.join(self.dir, "CURRENT")

    def current_manifest(self) -> dict | None:
        try:
            with open(self._current_path()) as f:
                name = f.read().strip()
            with open(os.path.join(self.dir, name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def completed_partitions(self) -> set[str]:
        """Union of completed partition keys across the snapshot chain —
        what resume() skips."""
        m = self.current_manifest()
        done: set[str] = set()
        while m is not None:
            done |= set(m["partitions"].keys())
            parent = m.get("parent")
            m = None
            if parent:
                with open(os.path.join(self.dir, parent)) as f:
                    m = json.load(f)
        return done

    # -------------------------------------------------------- commit
    def commit(self, df: DataFrame, partition_col: str,
               upsert: bool | None = None, tag: str | None = None) -> dict:
        """Write a new immutable snapshot of ``df`` and atomically
        publish a manifest recording per-partition row counts (the
        lineage/metrics table).

        ``upsert`` is a TABLE-level property: ``True`` means
        :meth:`read` supersedes older snapshots per re-committed
        partition (newest wins); ``False`` means append-only (every
        snapshot's rows are state — e.g. a scenes log). ``None``
        inherits the table's existing mode (``False`` for the first
        commit); an explicit value conflicting with the table's mode
        raises — one table, one semantics.

        ``tag`` is an idempotency token (e.g. a streaming batch id):
        it is recorded in the manifest and readable via :meth:`tags`,
        letting at-least-once writers skip replayed work."""
        snap_id = int(time.time() * 1000)
        prev = self.current_manifest()
        prev_upsert = bool(prev.get("upsert")) if prev else None
        if upsert is None:
            upsert = prev_upsert if prev_upsert is not None else False
        elif prev_upsert is not None and bool(upsert) != prev_upsert:
            raise ValueError(
                f"table {self.dir} is {'upsert' if prev_upsert else 'append'}"
                f"-mode; cannot commit with upsert={upsert}")
        data_dir = os.path.join(self.dir, f"snap-{snap_id}")
        (df.write.mode("errorifexists").partitionBy(partition_col)
           .parquet(data_dir))
        spark = df.sparkSession
        # schema passed explicitly: an empty snapshot (nothing left to
        # resume) has no files to infer from
        stats = (
            spark.read.schema(df.schema).parquet(data_dir)
            .groupBy(partition_col).count().collect()
        )
        # physical metrics per partition (bytes/files) from the FS
        # listing — the Iceberg-manifest-style size stats that let a
        # planner or resume logic reason about partitions without
        # opening them
        sizes: dict[str, dict] = {}
        prefix = f"{partition_col}="
        for entry in os.scandir(data_dir):
            if not (entry.is_dir() and entry.name.startswith(prefix)):
                continue
            key = entry.name[len(prefix):]
            nbytes = nfiles = 0
            for f in os.scandir(entry.path):
                if f.is_file() and not f.name.startswith(("_", ".")):
                    nbytes += f.stat().st_size
                    nfiles += 1
            sizes[key] = {"bytes": nbytes, "files": nfiles}
        partitions = {str(r[partition_col]):
                      {"rows": r["count"],
                       **sizes.get(str(r[partition_col]), {})}
                      for r in stats}
        manifest = {
            "snapshot_id": snap_id,
            "uuid": str(uuid.uuid4()),
            "parent": prev["self"] if prev else None,
            "created_ms": snap_id,
            "partition_col": partition_col,
            "upsert": bool(upsert),
            "tag": tag,
            "data_dir": f"snap-{snap_id}",
            "partitions": partitions,
            # observed group-size ceiling — what a planner (or a human
            # picking composite.max_stack_bytes) calibrates against
            # without opening any partition
            "max_partition": {
                "rows": max((p["rows"] for p in partitions.values()),
                            default=0),
                "bytes": max((p.get("bytes", 0)
                              for p in partitions.values()), default=0),
            },
            "self": f"manifest-{snap_id}.json",
        }
        mpath = os.path.join(self.dir, manifest["self"])
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mpath)  # atomic publish
        ctmp = self._current_path() + ".tmp"
        with open(ctmp, "w") as f:
            f.write(manifest["self"])
        os.replace(ctmp, self._current_path())
        return manifest

    # -------------------------------------------------------- resume
    def remaining(self, source: DataFrame, partition_col: str) -> DataFrame:
        """Filter a source frame down to partitions NOT yet committed —
        the mid-job resume entry point."""
        done = self.completed_partitions()
        if not done:
            return source
        return source.where(~F.col(partition_col).cast("string").isin(list(done)))

    def tags(self) -> set:
        """All idempotency tags in the snapshot chain (see commit)."""
        out = set()
        m = self.current_manifest()
        while m is not None:
            if m.get("tag") is not None:
                out.add(m["tag"])
            parent = m.get("parent")
            m = None
            if parent:
                with open(os.path.join(self.dir, parent)) as f:
                    m = json.load(f)
        return out

    def read(self, spark: SparkSession) -> DataFrame:
        """Read the committed state. For an UPSERT table (committed
        with ``upsert=True``), a partition re-committed later
        supersedes its older snapshots (newest wins — the incremental
        streaming-composite contract). For the default append table,
        every snapshot's rows are state (e.g. a scenes log, where a
        cell's scenes accumulate across commits)."""
        m = self.current_manifest()
        if m is None:
            raise ValueError(f"snapshot table {self.dir} has no commits")
        upsert = bool(m.get("upsert"))
        pc = m["partition_col"]
        dfs = []
        seen: set[str] = set()
        while m is not None:
            if upsert:
                mine = [p for p in m["partitions"] if p not in seen]
                seen.update(mine)
                if mine:
                    d = spark.read.parquet(
                        os.path.join(self.dir, m["data_dir"]))
                    if len(mine) < len(m["partitions"]):
                        d = d.where(F.col(pc).cast("string").isin(mine))
                    dfs.append(d)
            else:
                dfs.append(spark.read.parquet(
                    os.path.join(self.dir, m["data_dir"])))
            parent = m.get("parent")
            m = None
            if parent:
                with open(os.path.join(self.dir, parent)) as f:
                    m = json.load(f)
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out


def partition_metrics(df: DataFrame) -> DataFrame:
    """Physical-partition histogram — rows per Spark partition. Used by
    the skew tests to demonstrate that salting actually flattens the
    distribution (north_rule: 'skew handled explicitly')."""
    return (df.withColumn("_pid", F.spark_partition_id())
              .groupBy("_pid").count().orderBy("_pid"))


def group_size_metrics(df: DataFrame, key: str = "cell_id",
                       bytes_col: str = "bytes") -> DataFrame:
    """Per-GROUP (cell) scene-count / payload-bytes histogram — the
    observed data that calibrates ``composite.max_stack_bytes`` (the
    reference sizes tiles against machine RAM,
    /root/reference/R/tiling.R:41-64; here the budget can be set
    against measured group sizes at any sf instead of guessed).

    ``payload_bytes`` is the ENCODED size; the decoded compute stack is
    ``payload_bytes x (compute itemsize / storage itemsize)`` — e.g.
    4x for uint16 payloads composited in float64."""
    ln = F.length(bytes_col)
    return (df.groupBy(key).agg(
        F.count("*").alias("n_scenes"),
        F.sum(ln).alias("payload_bytes"),
        F.max(ln).alias("max_scene_bytes")))
