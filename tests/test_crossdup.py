"""Cross-document duplicated n-grams vs a naive Python counter:
planted shared passages, internal-only repetition (must NOT count),
short docs, min_docs, and the filter threshold."""

from __future__ import annotations

import pytest

from vrtility_spark.crossdup import cross_dup_filter, cross_duplicates


def naive_report(texts: dict, n: int, min_docs: int) -> dict:
    """Per-doc (n_windows, dup_windows) by brute force over strings."""
    grams = {d: [" ".join(ws[i:i + n])
                 for ws in [t.split(" ")]
                 for i in range(max(len(ws) - n + 1, 0))]
             for d, t in texts.items()}
    docs_per = {}
    for d, gs in grams.items():
        for g in set(gs):
            docs_per[g] = docs_per.get(g, 0) + 1
    out = {}
    for d, gs in grams.items():
        dup = sum(1 for g in gs if docs_per[g] >= min_docs)
        out[d] = (len(gs), dup)
    return out


CORPUS = {
    0: "alpha beta gamma delta epsilon zeta eta theta",
    1: "intro words alpha beta gamma delta epsilon closing remark",
    2: "totally unrelated content about completely different things here",
    3: "spam spam spam spam spam spam spam spam spam",          # internal only
    4: "alpha beta gamma delta epsilon zeta eta theta",         # exact dup of 0
    5: "tiny doc",                                              # < n words
    6: "spam spam spam spam spam spam spam spam spam",          # dup of 3
}


@pytest.mark.parametrize("n,min_docs", [(5, 2), (3, 2), (5, 3)])
def test_matches_naive(spark, n, min_docs):
    docs = spark.createDataFrame(list(CORPUS.items()),
                                 "doc_id long, text string")
    got = {r.doc_id: (r.n_windows, r.dup_windows, r.dup_frac)
           for r in cross_duplicates(docs, n=n, min_docs=min_docs)
           .collect()}
    want = naive_report(CORPUS, n, min_docs)
    assert set(got) == set(CORPUS)
    for d, (nw, dup) in want.items():
        assert got[d][0] == nw, d
        assert got[d][1] == dup, d
        assert got[d][2] == pytest.approx(dup / nw if nw else 0.0), d


def test_semantics_spotchecks(spark):
    docs = spark.createDataFrame(list(CORPUS.items()),
                                 "doc_id long, text string")
    got = {r.doc_id: r for r in cross_duplicates(docs, n=5).collect()}
    # exact duplicate pair: every window duplicated
    assert got[0].dup_frac == 1.0 and got[4].dup_frac == 1.0
    # doc 1 shares only the 5-gram run "alpha..epsilon" (1 window)
    assert got[1].dup_windows == 1
    # internal-only repetition counts ONLY because doc 6 repeats it too;
    # every occurrence counts (5 windows of "spam spam spam spam spam")
    assert got[3].dup_windows == got[3].n_windows == 5
    # unrelated doc: zero; short doc: zero windows, kept
    assert got[2].dup_windows == 0
    assert got[5].n_windows == 0 and got[5].dup_frac == 0.0


def test_internal_repetition_alone_never_counts(spark):
    docs = spark.createDataFrame(
        [(0, "spam spam spam spam spam spam spam"),
         (1, "other words entirely distinct from that one")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in cross_duplicates(docs, n=5).collect()}
    assert got[0].dup_windows == 0 and got[1].dup_windows == 0


def test_filter_and_validation(spark):
    docs = spark.createDataFrame(list(CORPUS.items()),
                                 "doc_id long, text string")
    kept = {r.doc_id for r in
            cross_dup_filter(docs, n=5, max_frac=0.5).collect()}
    # the exact-dup pairs (0,4,3,6) are 100% duplicated -> dropped;
    # doc 1 (1/5 windows) and the rest stay
    assert kept == {1, 2, 5}
    with pytest.raises(ValueError, match="min_docs"):
        cross_duplicates(docs, min_docs=1)
    with pytest.raises(ValueError, match="n must"):
        cross_duplicates(docs, n=0)


# --------------------------------------------------- span-level scrub ----

def _scrub_fixture(spark):
    shared = "alpha beta gamma delta epsilon"
    rows = [
        (1, f"intro one {shared} tail one"),
        (2, f"{shared} something else entirely here"),
        (3, "totally unrelated text with many words here"),
        (4, "short doc"),                       # below n: untouched
        (5, f"{shared}"),                       # fully duplicated
        (6, "repeat me repeat me repeat me repeat me repeat me"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_removes_shared_span_everywhere(spark):
    from vrtility_spark.crossdup import scrub_dup_spans
    out = {r.doc_id: r for r in
           scrub_dup_spans(_scrub_fixture(spark), n=5).collect()}
    assert out[1].text_scrubbed == "intro one tail one"
    assert out[1].n_removed == 5 and out[1].n_tokens == 9
    assert out[2].text_scrubbed == "something else entirely here"
    assert out[3].text_scrubbed.startswith("totally unrelated")
    assert out[3].n_removed == 0
    assert out[4].text_scrubbed == "short doc"   # < n words: untouched
    assert out[5].text_scrubbed == "" and out[5].n_removed == 5


def test_scrub_ignores_within_doc_repeats(spark):
    # doc 6 repeats its own 5-gram but no OTHER doc shares it:
    # min_docs counts distinct documents, so nothing is removed
    from vrtility_spark.crossdup import scrub_dup_spans
    out = {r.doc_id: r for r in
           scrub_dup_spans(_scrub_fixture(spark), n=5).collect()}
    assert out[6].n_removed == 0


def test_scrub_overlapping_windows_merge(spark):
    # two docs share a 7-word run: windows overlap, coverage is the
    # UNION of spans (7 tokens), not 3 windows x 5
    from vrtility_spark.crossdup import scrub_dup_spans
    run = "one two three four five six seven"
    df = spark.createDataFrame(
        [(1, f"head {run} tail"), (2, f"{run} x y z")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in scrub_dup_spans(df, n=5).collect()}
    assert out[1].text_scrubbed == "head tail"
    assert out[1].n_removed == 7


def test_scrub_validation_and_determinism(spark):
    from vrtility_spark.crossdup import scrub_dup_spans
    df = _scrub_fixture(spark)
    with pytest.raises(ValueError, match="min_docs"):
        scrub_dup_spans(df, min_docs=1)
    a = sorted(map(tuple, scrub_dup_spans(df, n=5).collect()))
    b = sorted(map(tuple,
                   scrub_dup_spans(df.repartition(7), n=5).collect()))
    assert a == b
