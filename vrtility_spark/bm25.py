"""BM25 keyword relevance over the document corpus — the lexical
retrieval baseline every training-data pipeline needs next to its
embedding ANN (quality-weighted sampling by query relevance, targeted
corpus carving, "find documents about X" audits at 100 TB).

Okapi BM25 with the Lucene idf variant (always positive):

    idf(t)      = ln((N − df + 0.5) / (df + 0.5) + 1)
    score(d, q) = Σ_t idf(t) · tf / (tf + k1·(1 − b + b·dl/avgdl))

``dl`` is the document's token count, ``avgdl`` the corpus mean;
tokenization is the engine's canonical ``split(text, ' ')`` (shared
with :mod:`textquality` / :mod:`decontam` / :mod:`crossdup`, so
retrieval and dedup can never disagree on terms).

Spark-first plan — the query is tiny, so the corpus-sized work is ONE
narrow pass:

1. corpus length stats ``(N, avgdl)`` are a single scalar aggregate of
   a pure expression (``size(split(text))``) — no explode;
2. tokens explode ONLY for rows filtered to the query's term set
   (``array_intersect`` guards the explode, so non-matching documents
   contribute zero rows); per-(doc, term) tf is one map-side-combined
   exchange bounded by matching docs × query terms;
3. per-term document frequencies aggregate from the tf rows (already
   query-term-only — df over the filtered set equals df over the
   corpus by definition) and BROADCAST into the score expression;
4. per-doc scores re-aggregate on the doc key.

Skew: a query term present in every document produces one tf row per
document — linear, never quadratic; the hot-term df row is one
aggregate. The reference engine has no text path; this extends it per
the brief's training-data-pipeline mandate.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_stats(df: DataFrame, text_col: str = "text") -> tuple:
    """``(N, avgdl)`` in one scalar aggregate (no explode)."""
    row = df.select(
        F.count("*").alias("n"),
        F.avg(F.size(F.split(F.col(text_col), " "))).alias("avgdl")
    ).first()
    if row is None or row.n == 0:
        raise ValueError("bm25: empty corpus")
    return int(row.n), float(row.avgdl)


def bm25_idf(n_docs: int, df_t: int) -> float:
    """Lucene BM25 idf — positive for every df ≤ N."""
    return math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)


def bm25_scores(df: DataFrame, query: Sequence[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """``(id_col, score)`` for every document matching ≥1 query term,
    descending score (ties broken by ``id_col``). ``k1``/``b`` are the
    standard Okapi knobs (term-frequency saturation / length
    normalization)."""
    terms = sorted({t for t in query if t})
    if not terms:
        raise ValueError("bm25: empty query")
    if df.isEmpty():
        raise ValueError("bm25: empty corpus")
    qlit = F.array(*[F.lit(t) for t in terms])
    toks = F.split(F.col(text_col), " ")
    # everything below is ONE lazy plan: corpus stats and per-term df
    # are tiny aggregates broadcast-joined into the score expression —
    # no driver collect, and the tf exchange feeds both its consumers
    # in a single job (Spark's exchange reuse) instead of re-running
    # the corpus filter+explode per driver round-trip
    stats = df.agg(F.count("*").alias("_n"),
                   F.avg(F.size(toks)).alias("_avgdl"))
    cand = (df.select(F.col(id_col),
                      toks.alias("_w"),
                      F.size(toks).alias("_dl"))
              .where(F.size(F.array_intersect(F.col("_w"), qlit)) > 0))
    tf = (cand.select(id_col, "_dl", F.explode("_w").alias("_t"))
              .where(F.col("_t").isin(terms))
              .groupBy(id_col, "_t")
              .agg(F.count("*").alias("_tf"), F.first("_dl").alias("_dl")))
    dfreq = tf.groupBy("_t").agg(F.count("*").alias("_df"))
    idf = F.log((F.col("_n") - F.col("_df") + F.lit(0.5)) /
                (F.col("_df") + F.lit(0.5)) + F.lit(1.0))
    norm = F.lit(float(k1)) * (F.lit(1.0 - float(b)) +
                               F.lit(float(b)) * F.col("_dl") /
                               F.col("_avgdl"))
    contrib = idf * F.col("_tf") / (F.col("_tf") + norm)
    return (tf.join(F.broadcast(dfreq), "_t")
              .crossJoin(F.broadcast(stats))
              .select(id_col, contrib.alias("_c"))
              .groupBy(id_col).agg(F.sum("_c").alias("score"))
              .orderBy(F.desc("score"), F.asc(id_col)))


def bm25_top_k(df: DataFrame, query: Sequence[str], k: int,
               text_col: str = "text", id_col: str = "doc_id",
               k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-``k`` rows of :func:`bm25_scores` joined back to the full
    document rows (deterministic: score desc, then ``id_col``)."""
    top = (bm25_scores(df, query, text_col, id_col, k1, b).limit(int(k)))
    return (top.join(df, id_col, "inner")
               .orderBy(F.desc("score"), F.asc(id_col)))


def bm25_sql(query: Sequence[str], k1: float = 1.2, b: float = 0.75,
             table: str = "documents", text_col: str = "text",
             id_col: str = "doc_id") -> str:
    """DuckDB twin generated from the SAME formula constants — the
    oracle string lives beside the operator so they cannot drift."""
    terms = sorted({t for t in query if t})
    # SQL-literal escape: a term with an apostrophe must not break (or
    # inject into) the oracle string
    tlist = ", ".join("'{}'".format(t.replace("'", "''")) for t in terms)
    return f"""
        with stats as (
          select count(*) as n,
                 avg(len(string_split({text_col}, ' '))) as avgdl
          from {table}
        ), tok as (
          select {id_col}, len(string_split({text_col}, ' ')) as dl,
                 unnest(string_split({text_col}, ' ')) as t
          from {table}
        ), tf as (
          select {id_col}, t, dl, count(*) as tf
          from tok where t in ({tlist})
          group by 1, 2, 3
        ), dfreq as (
          select t, count(*) as df from tf group by t
        )
        select tf.{id_col},
               round(sum(
                 ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                 * tf.tf / (tf.tf + {float(k1)!r} *
                            (1.0 - {float(b)!r} + {float(b)!r} *
                             tf.dl / stats.avgdl))), 6) as score
        from tf
        join dfreq using (t)
        cross join stats
        group by tf.{id_col}
    """
