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
        # manifest files are immutable once published (atomic rename),
        # so the chain walk memoizes them — a long-running stream calls
        # tags()/read()/commit() every micro-batch and would otherwise
        # re-open O(chain) JSON files each time
        self._manifest_cache: dict[str, dict] = {}

    def _load_manifest(self, name: str) -> dict:
        m = self._manifest_cache.get(name)
        if m is None:
            with open(os.path.join(self.dir, name)) as f:
                m = json.load(f)
            self._manifest_cache[name] = m
        return m

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
            m = self._load_manifest(parent) if parent else None
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
        prev = self.current_manifest()
        # strictly monotonic: a commit in the same millisecond (or
        # after a clock step back) must not reuse or precede the
        # previous id — equal ids would collide on the data dir and
        # could produce a self-referential parent pointer
        snap_id = int(time.time() * 1000)
        if prev is not None:
            snap_id = max(snap_id, int(prev["snapshot_id"]) + 1)
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
            out.update(m.get("tags", ()))  # carried through compaction
            parent = m.get("parent")
            m = self._load_manifest(parent) if parent else None
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
        append_paths = []
        seen: set[str] = set()
        while m is not None:
            # an EMPTY snapshot (e.g. a resume that had nothing left)
            # has no files to infer a schema from and no rows to
            # contribute — skip it instead of failing the whole read
            if upsert:
                mine = [p for p in m["partitions"] if p not in seen]
                seen.update(mine)
                if mine:
                    d = spark.read.parquet(
                        os.path.join(self.dir, m["data_dir"]))
                    if len(mine) < len(m["partitions"]):
                        d = d.where(F.col(pc).cast("string").isin(mine))
                    dfs.append(d)
            elif m["partitions"]:
                append_paths.append(os.path.join(self.dir, m["data_dir"]))
            parent = m.get("parent")
            m = self._load_manifest(parent) if parent else None
        # each snapshot dir is its own partitioned root (snap-<id>/
        # key=value/...), so they are read per-dir and unioned; a
        # long-running stream should periodically :meth:`compact` the
        # chain so this stays O(1) relations
        dfs.extend(spark.read.parquet(p) for p in append_paths)
        if not dfs:
            raise ValueError(
                f"snapshot table {self.dir} holds no rows (all "
                "snapshots empty)")
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out


def compact(table: SnapshotTable, spark: SparkSession) -> dict:
    """Rewrite the whole snapshot chain into ONE fresh snapshot (same
    visible rows, parentless manifest) — the maintenance operation that
    keeps :meth:`SnapshotTable.read` O(1) relations for long-running
    streams (every micro-batch otherwise unions one DataFrame per
    historical snapshot). Call periodically (e.g. every K batches or
    when the chain length passes a threshold); readers see either the
    old chain or the compacted one (CURRENT swaps atomically)."""
    m = table.current_manifest()
    if m is None:
        raise ValueError(f"snapshot table {table.dir} has no commits")
    state = table.read(spark).localCheckpoint(eager=True)
    pc = m["partition_col"]
    upsert = bool(m.get("upsert"))
    old_tags = sorted(table.tags())
    fresh = SnapshotTable(table.dir + ".compact")
    manifest = fresh.commit(state, pc, upsert=upsert)
    # idempotency tags survive compaction (at-least-once writers check
    # them to skip replayed batches)
    manifest["tags"] = old_tags
    with open(os.path.join(fresh.dir, manifest["self"]), "w") as f:
        json.dump(manifest, f, indent=1)
    # adopt the compacted snapshot into this table's directory
    os.replace(os.path.join(fresh.dir, manifest["data_dir"]),
               os.path.join(table.dir, manifest["data_dir"]))
    os.replace(os.path.join(fresh.dir, manifest["self"]),
               os.path.join(table.dir, manifest["self"]))
    os.replace(os.path.join(fresh.dir, "CURRENT"), table._current_path())
    os.rmdir(fresh.dir)
    table._manifest_cache.clear()
    return manifest


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
