"""BM25: distributed scores vs a naive Python scorer, top-k
determinism, and skew/edge semantics (query term in every doc, term in
no doc, docs without any query term)."""

from __future__ import annotations

import math

import pytest

from vrtility_spark.bm25 import bm25_scores, bm25_top_k

CORPUS = {
    0: "spark shuffle join hash spark spark",
    1: "join the small broadcast side first",
    2: "completely unrelated words about nothing",
    3: "spark plans prefer hash join over sort merge join",
    4: "tiny",
    5: "the the the the the the the the spark",
}
K1, B = 1.2, 0.75


def naive_bm25(texts: dict, query: list) -> dict:
    toks = {d: t.split(" ") for d, t in texts.items()}
    n = len(texts)
    avgdl = sum(len(w) for w in toks.values()) / n
    dfreq = {t: sum(1 for w in toks.values() if t in w) for t in query}
    out = {}
    for d, w in toks.items():
        s = 0.0
        for t in set(query):
            tf = w.count(t)
            if tf == 0:
                continue
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            s += idf * tf / (tf + K1 * (1 - B + B * len(w) / avgdl))
        if s > 0:
            out[d] = s
    return out


@pytest.mark.parametrize("query", [
    ["spark", "join"],
    ["hash"],
    ["spark", "nosuchterm"],
    ["the"],                       # appears in several docs, repeated
])
def test_matches_naive(spark, query):
    docs = spark.createDataFrame(list(CORPUS.items()),
                                 "doc_id long, text string")
    got = {r.doc_id: r.score
           for r in bm25_scores(docs, query, k1=K1, b=B).collect()}
    want = naive_bm25(CORPUS, query)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12), d


def test_ranking_and_top_k(spark):
    docs = spark.createDataFrame(list(CORPUS.items()),
                                 "doc_id long, text string")
    rows = bm25_scores(docs, ["spark", "join"]).collect()
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # doc 0 (spark x3 + join) and doc 3 (join x2 + spark) lead
    assert {rows[0].doc_id, rows[1].doc_id} == {0, 3}
    top = bm25_top_k(docs, ["spark", "join"], k=2).collect()
    assert [r.doc_id for r in top] == [rows[0].doc_id, rows[1].doc_id]
    assert set(top[0].asDict()) >= {"doc_id", "text", "score"}


def test_validation_and_empty_results(spark):
    docs = spark.createDataFrame(list(CORPUS.items()),
                                 "doc_id long, text string")
    with pytest.raises(ValueError, match="empty query"):
        bm25_scores(docs, [])
    assert bm25_scores(docs, ["zzzznotaword"]).count() == 0
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_scores(empty, ["spark"])


def test_sql_twin_escapes_quotes(spark):
    """Apostrophe-bearing terms must produce parseable oracle SQL that
    matches the operator (review finding: the unescaped literal was a
    DuckDB ParserException)."""
    duckdb = pytest.importorskip("duckdb")
    from vrtility_spark.bm25 import bm25_sql
    corpus = dict(CORPUS)
    corpus[6] = "call o'brien about the spark join"
    docs = spark.createDataFrame(list(corpus.items()),
                                 "doc_id long, text string")
    q = ["o'brien", "join"]
    got = {r.doc_id: round(r.score, 6)
           for r in bm25_scores(docs, q, k1=K1, b=B).collect()}
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(
        {"doc_id": list(corpus), "text": list(corpus.values())}))
    want = {int(r[0]): float(r[1])
            for r in con.execute(bm25_sql(q, k1=K1, b=B)).fetchall()}
    assert {d: round(v, 6) for d, v in want.items()} == got
