"""Sequence packing: the two-phase distributed prefix sum is exact
(byte-identical to a single-threaded cumulative sum), reshard- and
partition-count-invariant, span explosion conserves every token, and
every sequence except the last is exactly full."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vrtility_spark import packing

L = 64


@pytest.fixture(scope="module")
def docs(spark):
    # word counts 1..40 cycling, a few giants spanning many sequences,
    # and one empty text (token count 1 under the split convention)
    rows = []
    for i in range(400):
        n = (i * 7) % 40 + 1
        if i % 97 == 0:
            n = 300 + i  # multi-sequence giants
        rows.append((i, " ".join(["w%d" % (j % 13) for j in range(n)])))
    rows.append((400, ""))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _naive(rows, L):
    """Driver-side oracle: plain running sum in doc_id order."""
    out, off = {}, 0
    for doc_id, text in sorted(rows):
        n = len(text.split(" "))
        end = off + max(n, 1) - 1
        out[doc_id] = (n, off, off // L, end // L, off % L,
                       end // L - off // L + 1)
        off += n
    return out


def test_pack_matches_naive_prefix_sum(spark, docs):
    packed = packing.pack_documents(docs, L).collect()
    oracle = _naive([(r["doc_id"], r["text"])
                     for r in docs.collect()], L)
    assert len(packed) == len(oracle)
    for r in packed:
        assert (r["n_tokens"], r["tok_start"], r["seq_first"],
                r["seq_last"], r["pos_in_seq"],
                r["n_seqs"]) == oracle[r["doc_id"]], r["doc_id"]


@pytest.mark.parametrize("parts", [1, 3, 17])
def test_partition_count_invariant(spark, docs, parts):
    base = {r["doc_id"]: r["tok_start"] for r in
            packing.pack_documents(docs, L).collect()}
    got = {r["doc_id"]: r["tok_start"] for r in
           packing.pack_documents(docs.repartition(7), L,
                                   num_partitions=parts).collect()}
    assert got == base


def test_shuffled_order_is_deterministic_and_total(spark, docs):
    okey = F.xxhash64(F.col("doc_id"), F.lit(3))
    a = packing.pack_documents(docs, L, order_col=okey).collect()
    b = packing.pack_documents(docs.repartition(5), L,
                               order_col=okey).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # still a valid packing: starts are a permutation-consistent
    # prefix sum (sorted starts + counts tile the token stream)
    seq = sorted((r["tok_start"], r["n_tokens"]) for r in a)
    off = 0
    for start, n in seq:
        assert start == off
        off += n


def test_spans_conserve_tokens_and_fill(spark, docs):
    packed = packing.pack_documents(docs, L)
    spans = packing.pack_spans(packed, L).cache()
    # every token lands in exactly one span (the empty doc adds its
    # zero-length marker row)
    total = spans.agg(F.sum("span_len")).first()[0]
    assert total == packed.agg(F.sum("n_tokens")).first()[0]
    fill = packing.sequence_fill(spans, L).collect()
    last = max(r["seq_id"] for r in fill)
    for r in fill:
        if r["seq_id"] != last:
            assert r["n_tokens"] == L, r
        assert 0 < r["n_docs"]
    # spans never overflow a sequence window
    bad = spans.where((F.col("span_start") < 0) |
                      (F.col("span_start") + F.col("span_len") > L))
    assert bad.count() == 0
    spans.unpersist()


def test_giant_doc_spans_many_sequences(spark, docs):
    packed = packing.pack_documents(docs, L)
    giants = packed.where(F.col("n_tokens") > 2 * L)
    assert giants.count() > 0
    for r in giants.collect():
        assert r["n_seqs"] >= 3
        # middle sequences are fully owned by the giant
        mids = (packing.pack_spans(
            packed.where(F.col("doc_id") == r["doc_id"]), L)
            .where((F.col("seq_id") > r["seq_first"]) &
                   (F.col("seq_id") < r["seq_last"])).collect())
        assert all(m["span_start"] == 0 and m["span_len"] == L
                   for m in mids)


def test_seq_len_validation(spark, docs):
    with pytest.raises(ValueError):
        packing.pack_documents(docs, 0)
