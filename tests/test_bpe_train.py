"""Distributed BPE training/encoding vs the naive pure-Python twin:
identical merge tables under any partitioning, exact counts with the
lexicographic tie-break, and encode parity on real document text."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vrtility_spark import bpe

CORPUS = ("the cat sat on the mat " * 3
          + "the bat and the rat chat " * 2
          + "low lower lowest slow slowly ")


def _word_freqs():
    freqs: dict = {}
    for w in CORPUS.split():
        freqs[w] = freqs.get(w, 0) + 1
    return freqs


def test_twin_basics_and_tiebreak():
    # hand corpus where ("a","b") and ("b","c") tie: lexicographic
    # smallest pair must win deterministically
    m = bpe.train_bpe_py({"abc": 5}, 1)
    assert m[0][1:3] == ("a", "b")  # tie 5-5 vs (b,c): (a,b) < (b,c)
    # greedy left-to-right: "aaa" merges (a,a) once non-overlapping
    m2 = bpe.train_bpe_py({"aaaa": 1}, 2)
    assert (m2[0][1], m2[0][2]) == ("a", "a")
    # early stop when fully merged
    m3 = bpe.train_bpe_py({"ab": 1}, 50)
    assert len(m3) < 50


def test_distributed_matches_twin_and_partitioning(spark):
    freqs = _word_freqs()
    want = bpe.train_bpe_py(freqs, 30)
    docs = spark.createDataFrame([(CORPUS,)], "body string")
    wc = bpe.word_counts(docs, "body")
    got_counts = {r.word: r.freq for r in wc.collect()}
    assert got_counts == freqs
    for parts, ck in ((1, 1), (7, 4)):
        got = bpe.train_bpe(wc.repartition(parts), 30,
                            checkpoint_every=ck)
        assert got == want
    # the merges_df artifact round-trips the list
    mdf = bpe.merges_df(spark, want)
    back = [(r.rank, r.left, r.right, r.freq)
            for r in mdf.orderBy("rank").collect()]
    assert back == want


def test_encode_matches_twin_and_counts(spark):
    freqs = _word_freqs()
    merges = bpe.train_bpe_py(freqs, 25)
    ranks = {(a, b): r for r, a, b, _f in merges}
    docs = spark.createDataFrame(
        [("The cat sat",), ("unseen zebra!",), (None,)],
        "body string")
    out = bpe.bpe_encode(docs, "body", merges).collect()
    got = {r.body: list(r.bpe_tokens) for r in out}
    want1 = (bpe.encode_word_py("the", ranks)
             + bpe.encode_word_py("cat", ranks)
             + bpe.encode_word_py("sat", ranks))
    assert got["The cat sat"] == want1
    # unseen words fall back to char + EOW granularity, never error
    assert got["unseen zebra!"][-1] == bpe.EOW
    assert got[None] == []
    # detokenization identity: concatenating tokens and splitting on
    # EOW reproduces the words
    text = "".join(want1).replace(bpe.EOW, " ").strip()
    assert text == "the cat sat"


def test_encode_documents_table(spark):
    sf = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(sf):
        pytest.skip("no testdata")
    docs = spark.read.parquet(sf).limit(20)
    wc = bpe.word_counts(docs, "text")
    merges = bpe.train_bpe(wc, 15)
    enc = bpe.bpe_encode(docs, "text", merges)
    rows = enc.select("doc_id", "text",
                      F.size("bpe_tokens").alias("n")).collect()
    ranks = {(a, b): r for r, a, b, _f in merges}
    for r in rows:
        body = (r.text or "").lower()
        want = sum(len(bpe.encode_word_py(w, ranks))
                   for w in body.split())
        assert r.n == want
