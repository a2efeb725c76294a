"""Repetition quality signals vs a naive Python counter oracle:
word/dup fractions, deterministic top-gram tie-break, short-doc rows,
and the threshold filter as exact complement."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from vrtility_spark import textquality as tq

DOCS = [
    (0, "spam spam spam spam spam spam"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "ab cd ab cd ab cd ab cd"),
    (3, "one"),                       # shorter than every n
    (4, "x y x y z x y x y z x y"),
    (5, "menu home menu home menu home about menu home menu"),
]


def _py_ngrams(text, n):
    w = text.split(" ")
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


def test_word_stats_match_python(spark, docs):
    got = {r["doc_id"]: r for r in tq.word_stats(docs).collect()}
    for did, t in DOCS:
        w = t.split(" ")
        r = got[did]
        assert r["n_words"] == len(w)
        assert r["n_distinct_words"] == len(set(w))
        assert r["dup_word_frac"] == pytest.approx(1 - len(set(w)) / len(w))


@pytest.mark.parametrize("n", [2, 3])
def test_ngram_stats_match_python(spark, docs, n):
    got = {r["doc_id"]: r for r in tq.ngram_stats(docs, n).collect()}
    for did, t in DOCS:
        grams = _py_ngrams(t, n)
        c = Counter(grams)
        r = got[did]
        assert r[f"total_{n}grams"] == len(grams)
        assert r[f"distinct_{n}grams"] == len(c)
        if grams:
            best = min(c, key=lambda g: (-c[g], g))  # count desc, gram asc
            assert r[f"top{n}_gram"] == best
            assert r[f"top{n}_count"] == c[best]
            assert r[f"dup{n}_frac"] == pytest.approx(1 - len(c) / len(grams))
        else:
            assert r[f"top{n}_gram"] == ""
            assert r[f"top{n}_count"] == 0
            assert r[f"dup{n}_frac"] == 0.0


def test_report_top_char_frac(spark, docs):
    got = {r["doc_id"]: r for r in tq.repetition_report(docs).collect()}
    assert set(got) == {d for d, _ in DOCS}
    for did, t in DOCS:
        grams = _py_ngrams(t, 2)
        r = got[did]
        if grams:
            c = Counter(grams)
            best = min(c, key=lambda g: (-c[g], g))
            # capped at 1.0: overlapping top-gram occurrences double-
            # count shared characters (doc 0 is the repro: 5 x 'spam
            # spam' = 45 chars over a 29-char text) — a fraction
            # column must stay in [0, 1]
            assert r["top2_char_frac"] == pytest.approx(
                min(1.0, c[best] * len(best) / len(t)))
            assert 0.0 <= r["top2_char_frac"] <= 1.0
        else:
            assert r["top2_char_frac"] == 0.0
        # dup_n=3 columns present alongside
        assert r["total_3grams"] == len(_py_ngrams(t, 3))


def test_quality_filter_is_threshold_complement(spark, docs):
    rep = {r["doc_id"]: r for r in tq.repetition_report(docs).collect()}
    kept = {r["doc_id"] for r in tq.quality_filter(
        docs, max_dup_word_frac=0.5, max_top_char_frac=0.3,
        max_dup_ngram_frac=0.5).collect()}
    exp = {d for d in rep
           if rep[d]["dup_word_frac"] <= 0.5
           and rep[d]["top2_char_frac"] <= 0.3
           and rep[d]["dup3_frac"] <= 0.5}
    assert kept == exp
    assert kept and kept != {d for d, _ in DOCS}  # both sides exercised
    # spam doc must always fall
    assert 0 not in kept


def test_chars_col_override(spark, docs):
    d2 = docs.withColumn("n_chars", F.length("text") * 2)
    r = {x["doc_id"]: x for x in tq.repetition_report(
        d2, chars_col="n_chars").collect()}
    for did, t in DOCS:
        grams = _py_ngrams(t, 2)
        if not grams:
            continue
        c = Counter(grams)
        best = min(c, key=lambda g: (-c[g], g))
        # cap applies AFTER the overridden denominator
        assert r[did]["top2_char_frac"] == pytest.approx(
            min(1.0, c[best] * len(best) / (2 * len(t))))


def test_word_stats_no_exchange(spark, docs):
    plan = tq.word_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bad_n(spark, docs):
    with pytest.raises(ValueError):
        tq.ngram_stats(docs, 0)
