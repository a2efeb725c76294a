"""Benchmark decontamination: hit counts match a naive Python shingle
intersection, short docs survive, the clean corpus is exactly the
un-flagged set, and the benchmark probe is a broadcast join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vrtility_spark import decontam

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "the quick brown fox sat still"),          # shares 2 3-grams w/ 0
    (3, "tiny doc"),                               # < 3 words: 0 shingles
    (4, "completely unrelated text about spark engines and shuffles"),
    (5, "jumps over the lazy dog again and again and again"),
]
BENCH = [
    (100, "the quick brown fox jumps over a fence"),
    (101, "over the lazy dog"),
]


def _shingles(text, n=3):
    w = text.split(" ")
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def _expected(n=3):
    bench = set().union(*[_shingles(t, n) for _, t in BENCH])
    out = {}
    for did, t in DOCS:
        sh = _shingles(t, n)
        out[did] = (len(sh), len(sh & bench))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(BENCH, ["doc_id", "text"])


def test_hit_counts_match_python(spark, docs, bench):
    got = {r["doc_id"]: (r["n_shingles"], r["hit_shingles"])
           for r in decontam.contamination(docs, bench).collect()}
    assert got == _expected()


def test_short_docs_kept_and_uncontaminated(spark, docs, bench):
    rows = {r["doc_id"]: r for r in
            decontam.contamination(docs, bench).collect()}
    assert rows[3]["n_shingles"] == 0
    assert rows[3]["contaminated"] is False
    assert rows[3]["overlap_frac"] == 0.0


def test_thresholds(spark, docs, bench):
    exp = _expected()
    # min_overlap=2: only docs sharing >= 2 shingles flag
    rows = decontam.contamination(docs, bench, min_overlap=2).collect()
    for r in rows:
        assert r["contaminated"] == (exp[r["doc_id"]][1] >= 2)
    # min_frac=0.5: hit fraction must ALSO clear the bar
    rows = decontam.contamination(docs, bench, min_frac=0.5).collect()
    for r in rows:
        n, h = exp[r["doc_id"]]
        assert r["contaminated"] == (h >= 1 and n > 0 and h / n >= 0.5)


def test_decontaminate_is_complement(spark, docs, bench):
    flagged = {r["doc_id"] for r in
               decontam.contamination(docs, bench)
               .where("contaminated").collect()}
    clean = decontam.decontaminate(docs, bench)
    assert set(clean.columns) == set(docs.columns)
    kept = {r["doc_id"] for r in clean.collect()}
    assert kept == {d for d, _ in DOCS} - flagged
    assert flagged  # fixture actually exercises the flag path


def test_ngram_size_param(spark, docs, bench):
    got = {r["doc_id"]: (r["n_shingles"], r["hit_shingles"])
           for r in decontam.contamination(docs, bench, n=2).collect()}
    bench_sh = set().union(*[_shingles(t, 2) for _, t in BENCH])
    for did, t in DOCS:
        sh = _shingles(t, 2)
        assert got[did] == (len(sh), len(sh & bench_sh))
    with pytest.raises(ValueError):
        decontam.contamination(docs, bench, n=0)
    with pytest.raises(ValueError):
        decontam.contamination(docs, bench, min_overlap=0)


def test_benchmark_side_broadcasts(spark, docs, bench):
    plan = (decontam.contamination(docs, bench)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
