#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf", ...}.

Each query is forced with a noop-format write (full execution, zero
sink cost, nothing collected to the driver). The image-pipeline bench
generates its synthetic input DISTRIBUTED (datagen.images_spark) and
runs mask → cell-assign → composite(median & geomedian) + hampel —
the reference's README pipeline at bench scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from vrtility_spark import datagen  # noqa: E402
from vrtility_spark.pipeline import Pipeline  # noqa: E402
from vrtility_spark.session import get_spark  # noqa: E402

# bench and correctness surfaces stay congruent BY CONSTRUCTION: every
# queries() entry is benched (fixture-scale payload queries included,
# so round-over-round regressions on every operator stay visible). The
# lone exclusion is the fixture-scale "image_median_composite" driver
# query, whose key the sf-SCALED pipeline shape in image_pipeline_bench
# owns (generation cached once, each shape best-of-reps).
BENCH_QUERIES = [k for k in entrymod.queries()
                 if k != "image_median_composite"]

IMG = dict(zones=(30, 31, 27), nx=8, ny=8, n_dates=5, w=64, h=64)


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def image_pipeline_bench(spark, reps: int):
    """sf-scaled image pipeline, best-of-`reps` per key.

    Generation happens ONCE (cached, materialized outside every timed
    window); each of the three pipeline shapes is then timed `reps`
    times and the per-key minimum kept — same contention-noise policy
    as the relational keys (interference only ever adds time).
    """
    images = datagen.images_spark(spark, **IMG).cache()
    n = images.count()  # materialize generation outside the timed section

    # general-warp input: deterministic sub-tile offsets force every
    # scene through regrid_to_cells (explode + resample + pad) before
    # compositing — the no-alignment-assumption pipeline
    from pyspark.sql import functions as F
    off = (F.pmod(F.xxhash64("image_id"), F.lit(4)).cast("double")
           / 4.0 * datagen.TILE_SPAN)
    shifted = images.withColumn("xmin", F.col("xmin") + off) \
                    .withColumn("xmax", F.col("xmax") + off)

    def _median():
        return (Pipeline(images)
                .set_maskfun("int", datagen.S2_MASK_VALUES)
                .warp(cell_res=datagen.TILE_RES)
                .composite("median").df)

    def _geomedian():
        return (Pipeline(images)
                .set_maskfun("int", datagen.S2_MASK_VALUES)
                .warp(cell_res=datagen.TILE_RES)
                .composite("geomedian").df)

    def _regrid():
        return (Pipeline(shifted)
                .set_maskfun("int", datagen.S2_MASK_VALUES)
                .regrid(datagen.TILE_RES, IMG["w"], IMG["h"],
                        resampling="nearest")
                .composite("median").df)

    def _polygonize():
        # first-valid composite → region extraction across all tile
        # seams: per-tile labeling + seam matching + distributed
        # component merge at the sf-scaled grid (8x8 tiles per zone)
        return (Pipeline(images)
                .warp(cell_res=datagen.TILE_RES)
                .composite("first")
                .polygonize(band=-1))

    def _pyramid():
        # composite + 2 overview levels: the delta vs
        # image_median_composite is the pyramid's two shrinking
        # parent-keyed shuffles (levels are 4x and 16x smaller)
        return (Pipeline(images)
                .set_maskfun("int", datagen.S2_MASK_VALUES)
                .warp(cell_res=datagen.TILE_RES)
                .composite("median")
                .overviews(2, include_base=False).df)

    shapes = {"image_median_composite": _median,
              "image_geomedian_composite": _geomedian,
              "image_regrid_pipeline": _regrid,
              "image_pyramid": _pyramid,
              "image_polygonize_pipeline": _polygonize}
    times: dict[str, float] = {}
    for _rep in range(reps):
        for key, build in shapes.items():
            t0 = time.perf_counter()
            _force(build())
            t = time.perf_counter() - t0
            if key not in times or t < times[key]:
                times[key] = t
    images.unpersist()
    return n, times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1
    # quiet-window self-probe BEFORE the Spark session exists: raw
    # kernel multiprocessing throughput annotates the committed JSON
    # with its own noise context (quiet >= 5.0 chunks/s/proc on the (10,5,4096)-f64 chunk).
    # bench.py the module shadows bench/ the dir, hence the path insert.
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "bench"))
    from probe import kernel_probe
    # QUIET-GATE the artifact (VERDICT r4 item #2): the probe used to be
    # recorded but not acted on, so a bench committed in a noisy window
    # understated capability. Retry (bounded) until the host is quiet;
    # if it never quiets, run anyway — the probe history in the JSON
    # says so explicitly and a later quiet rerun can sit beside it.
    retries = int(os.environ.get("SPARK_GRAFT_PROBE_RETRIES", "6"))
    sleep_s = float(os.environ.get("SPARK_GRAFT_PROBE_SLEEP", "300"))
    probe_history = []
    probe = kernel_probe()
    probe_history.append(probe)
    for _ in range(retries):
        if probe["quiet"]:
            break
        print(f"# probe not quiet ({probe}); sleeping {sleep_s:.0f}s",
              file=sys.stderr)
        time.sleep(sleep_s)
        probe = kernel_probe()
        probe_history.append(probe)
    spark = get_spark("vrtility-bench", cores=cpus, shuffle_partitions=cpus)
    queries = entrymod.queries()

    # warm up executors/python workers/parquet footers so the first
    # timed query doesn't absorb session fixed costs
    _force(queries["token_stats"](spark, sf_dir))
    # spawn the Arrow python workers once (several seconds at local[32])
    def _warm_iter(batches):
        yield from batches
    _force(spark.range(64).repartition(64).mapInPandas(_warm_iter, "id long"))

    # best-of-k per query: this VM shows intermittent sibling-tenant
    # contention (single trials can be 2-3x slower); interference only
    # adds time, so the per-query minimum is the capability estimate
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    times: dict[str, float] = {}
    for rep in range(reps):
        for name in BENCH_QUERIES:
            # timer wraps construction too: iterative operators (kNN
            # count rounds) do real work while building the plan
            t0 = time.perf_counter()
            _force(queries[name](spark, sf_dir))
            t = round(time.perf_counter() - t0, 3)
            if name not in times or t < times[name]:
                times[name] = t

    # the three sf-scaled image keys are ~1-2 s each, so an extra rep
    # is cheap insurance on the headline scenes/s figure
    n_scenes, img_times = image_pipeline_bench(spark, max(reps, 3))
    times.update({k: round(v, 3) for k, v in img_times.items()})

    # closing probe: a window that was quiet at t0 may have gone noisy
    # mid-run; quiet-at-both-ends is the claim the artifact makes
    spark.stop()
    probe_end = kernel_probe()

    total = round(sum(times.values()), 3)
    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
        "reps": reps,
        "probe": probe,
        "probe_history": probe_history,
        "probe_end": probe_end,
        "image_bench_scenes": n_scenes,
        "scenes_per_sec_median_composite": round(
            n_scenes / img_times["image_median_composite"], 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
