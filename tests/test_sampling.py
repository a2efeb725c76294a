"""Deterministic hash sampling: the bucket mapping pins to hashlib,
membership is reshard-proof and nested across fractions, splits are
disjoint-and-exhaustive, stratified selection is exact-n."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from vrtility_spark import sampling


@pytest.fixture(scope="module")
def corpus(spark):
    return (spark.range(0, 3000)
            .withColumn("stratum", (F.col("id") % 5).cast("int"))
            .withColumn("val", F.col("id") * 3)
            .cache())


def _hex8_py(seed, *keys):
    return hashlib.md5(
        "|".join([str(seed)] + [str(k) for k in keys]).encode()
    ).hexdigest()[:8]


def test_hash_bucket_matches_hashlib(spark, corpus):
    rows = (corpus.limit(50)
            .withColumn("hx", sampling._hex8(["id", "stratum"], 9))
            .collect())
    for r in rows:
        assert r["hx"] == _hex8_py(9, r["id"], r["stratum"])


def test_sample_fraction_reshard_proof_and_nested(spark, corpus):
    keep = sampling.sample_fraction(corpus, ["id"], 0.2, seed=1)
    ids = {r["id"] for r in keep.collect()}
    again = {r["id"] for r in sampling.sample_fraction(
        corpus.repartition(13), ["id"], 0.2, seed=1).collect()}
    assert ids == again
    # binomial sanity: 3000 * 0.2 = 600 ± 5σ (σ ≈ 21.9)
    assert 490 < len(ids) < 710
    # hash-range nesting: a 10% sample is a SUBSET of the 20% sample
    small = {r["id"] for r in sampling.sample_fraction(
        corpus, ["id"], 0.1, seed=1).collect()}
    assert small <= ids
    # different seed → different (but equally deterministic) set
    other = {r["id"] for r in sampling.sample_fraction(
        corpus, ["id"], 0.2, seed=2).collect()}
    assert other != ids
    # membership is recomputable from the key alone
    for i in list(ids)[:20]:
        assert _hex8_py(1, i) < format(round(0.2 * 16**8), "08x")


def test_sample_fraction_bounds(spark, corpus):
    assert sampling.sample_fraction(corpus, ["id"], 0.0).count() == 0
    assert sampling.sample_fraction(corpus, ["id"], 1.0).count() == 3000
    with pytest.raises(ValueError, match="fraction"):
        sampling.sample_fraction(corpus, ["id"], 1.5)


def test_assign_splits_disjoint_exhaustive_stable(spark, corpus):
    sp = sampling.assign_splits(
        corpus, ["id"], {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
    counts = {r["split"]: r["n"] for r in
              sp.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 3000  # exhaustive, disjoint
    assert counts["train"] > counts["val"] > 0 and counts["test"] > 0
    assert 2280 < counts["train"] < 2520
    # growing one split only MOVES the boundary: train(0.8) ⊆ train(0.9)
    t8 = {r["id"] for r in sp.filter("split = 'train'").collect()}
    sp9 = sampling.assign_splits(
        corpus, ["id"], {"train": 0.9, "val": 0.05, "test": 0.05}, seed=3)
    t9 = {r["id"] for r in sp9.filter("split = 'train'").collect()}
    assert t8 <= t9


def test_assign_splits_validation():
    with pytest.raises(ValueError, match="sum"):
        sampling._thresholds({"a": 0.0})
    with pytest.raises(ValueError, match="negative"):
        sampling._thresholds({"a": 1.0, "b": -0.1})
    # single split label covers everything; saturated bound sorts
    # above every hex8 string
    assert sampling._thresholds({"all": 1.0}) == [("all", "g")]
    assert "ffffffff" < "g"


def test_stratified_sample_exact_n(spark, corpus):
    got = sampling.stratified_sample_n(
        corpus, ["stratum"], 7, ["id"], seed=5)
    per = {r["stratum"]: r["n"] for r in
           got.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert per == {s: 7 for s in range(5)}
    assert got.filter("rk < 1 or rk > 7").count() == 0
    # deterministic under resharding
    a = sorted((r["stratum"], r["id"]) for r in got.collect())
    b = sorted((r["stratum"], r["id"]) for r in sampling.stratified_sample_n(
        corpus.repartition(17), ["stratum"], 7, ["id"], seed=5).collect())
    assert a == b
    # n larger than the stratum → the whole stratum, ranked
    tiny = corpus.filter("id < 12")
    assert sampling.stratified_sample_n(
        tiny, ["stratum"], 99, ["id"], seed=5).count() == 12
    with pytest.raises(ValueError, match="n must be"):
        sampling.stratified_sample_n(corpus, ["stratum"], 0, ["id"])


def test_splits_are_stateless_streaming_ops(spark, corpus, tmp_path):
    """Hash-range membership is a pure expression, so the SAME
    operators run unchanged in Structured Streaming — and because
    membership depends only on the key, streamed assignment equals
    the batch assignment row for row (no RNG, no state store)."""
    land = str(tmp_path / "landing")
    corpus.where("id < 1500").select("id", "stratum") \
        .write.parquet(land)
    corpus.where("id >= 1500").select("id", "stratum") \
        .write.mode("append").parquet(land)
    stream = (spark.readStream.schema("id long, stratum int")
              .parquet(land))
    assigned = sampling.assign_splits(
        sampling.sample_fraction(stream, ["id"], 0.5, seed=11),
        ["id"], {"train": 0.8, "test": 0.2}, seed=12)
    q = (assigned.writeStream.format("memory")
         .queryName("split_stream").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    got = {(r["id"], r["split"]) for r in
           spark.table("split_stream").collect()}
    want = {(r["id"], r["split"]) for r in sampling.assign_splits(
        sampling.sample_fraction(corpus, ["id"], 0.5, seed=11),
        ["id"], {"train": 0.8, "test": 0.2}, seed=12).collect()}
    assert got == want and len(got) > 0


def test_pipeline_thin_caps_scenes_per_cell(spark, tmp_path):
    from vrtility_spark import datagen, schema
    from vrtility_spark.pipeline import Pipeline
    images = schema.images_df(
        spark, datagen.images_pandas(nx=2, ny=2, w=16, h=16))
    p = Pipeline(images).warp(cell_res=datagen.TILE_RES).thin(3, seed=4)
    per = {r["cell_id"]: r["n"] for r in
           p.df.groupBy("cell_id").agg(F.count("*").alias("n"))
           .collect()}
    assert per and all(v == 3 for v in per.values())  # 5 dates → cap 3
    # deterministic: same kept set under resharding
    a = sorted((r["cell_id"], r["image_id"]) for r in p.df.collect())
    p2 = Pipeline(images.repartition(11)) \
        .warp(cell_res=datagen.TILE_RES).thin(3, seed=4)
    assert a == sorted((r["cell_id"], r["image_id"])
                       for r in p2.df.collect())
    # per-period thinning keeps one per month (5 distinct months)
    pm = Pipeline(images).warp(cell_res=datagen.TILE_RES) \
        .thin(1, period="month")
    perm = {r["cell_id"]: r["n"] for r in
            pm.df.groupBy("cell_id").agg(F.count("*").alias("n"))
            .collect()}
    assert all(v == 5 for v in perm.values())
    # composite still works downstream and the verb replays from a
    # bundle (thinning must precede masking/compositing cleanly)
    out = pm.set_maskfun("int", datagen.S2_MASK_VALUES) \
        .composite("median")
    bundle = out.to_bundle(str(tmp_path / "b.json"))
    assert any(v["verb"] == "thin" for v in bundle["verbs"])
    from vrtility_spark.pipeline import Pipeline as P2
    replay = P2.from_bundle(str(tmp_path / "b.json"), images)
    got = {r.cell_id: r.bytes for r in replay.df.collect()}
    assert got == {r.cell_id: r.bytes for r in out.df.collect()}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="cell_id"):
        Pipeline(images).thin(3)
    with _pytest.raises(KeyError, match="period"):
        Pipeline(images).warp(cell_res=datagen.TILE_RES) \
            .thin(3, period="fortnight")
    # a user column named 'rk' survives thinning untouched (the rank
    # column is private '_thin_rk', not the hard-coded 'rk' default)
    tagged = Pipeline(images.withColumn("rk", F.lit("keepme"))) \
        .warp(cell_res=datagen.TILE_RES).thin(3, seed=4)
    assert "rk" in tagged.df.columns
    assert {r["rk"] for r in tagged.df.select("rk").distinct()
            .collect()} == {"keepme"}
