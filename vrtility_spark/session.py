"""SparkSession factory with scale-oriented defaults.

Mirrors the execution-policy choices of the reference
(/root/reference/R/gdal-options.R:67-113 — one compute thread per
worker, parallelism at the process level) translated to Spark: AQE on,
Arrow on, bounded Arrow batches, shuffle partitions sized to cores.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the local-mode twin of
    ``spark-submit --py-files vrtility_spark.zip``).

    Without this, Arrow UDFs deserialize on executor workers that may
    not share the driver's ``sys.path``."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # per-checkout zip name: a fixed machine-wide path lets one clone
    # ship another clone's (or another user's) code to its executors
    import hashlib
    tag = hashlib.sha1(pkg_dir.encode()).hexdigest()[:12]
    zpath = os.path.join(tempfile.gettempdir(),
                         f"vrtility_spark_pyfiles_{tag}.zip")
    # rebuild when any source file is newer than the zip (a stale zip
    # ships old code to executors — ModuleNotFoundError at best, silent
    # old behavior at worst)
    src_mtime = max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(pkg_dir)
        for f in files if f.endswith((".py", ".npz")))
    # stale → rebuild into a pid-suffixed tmp and atomically replace;
    # NEVER remove-first: a concurrent driver between the remove and
    # the replace would addPyFile a missing path (FileNotFound)
    if not os.path.exists(zpath) or os.path.getmtime(zpath) < src_mtime:
        tmp = zpath + f".{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith((".py", ".npz")):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
        os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(zpath)


def get_spark(
    app_name: str = "vrtility_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cores=None`` uses ``$SPARK_GRAFT_CPUS`` (default ``local[*]``).
    On a real cluster these same configs apply; only ``master`` changes
    (spark-submit supplies it).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's default 64 MB advisory size is calibrated for scan-heavy
        # SQL; pixel-UDF stages are CPU-heavy per byte, and coalescing a
        # 200 MB composite shuffle into 3 tasks serializes the cluster
        # (measured 1.4x slowdown at local[8]). 4 MB keeps grouped-map
        # stages wide while still merging truly tiny partitions.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound per-batch memory in pixel UDFs (reference sizes tiles to
        # RAM a priori, R/tiling.R:41-64; we bound the Arrow batch instead)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # bucketed tables (co-located cell joins) need a warehouse; keep
        # it out of the repo — deployments override via env
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE",
                               os.path.join(tempfile.gettempdir(),
                                            "vrtility_warehouse")))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark
