"""Repetition-based document quality signals — the Gopher/MassiveText
repetition filters re-expressed over a distributed corpus table.

Low-quality web text is dominated by REPETITION (boilerplate menus,
SEO keyword stuffing, templated listings); the Gopher paper's quality
pipeline (Rae et al. 2021, §A1.1) filters on duplicate-line /
duplicate-n-gram fractions and the character share of the single most
frequent n-gram. This module computes the word-level analogues of
those signals per document, plus a threshold filter:

- ``dup_word_frac`` — ``1 - distinct_words / words``: pure array
  expressions over the split column, NO shuffle at all (stays inside
  whole-stage codegen);
- ``top{n}_char_frac`` — characters covered by occurrences of the
  single most frequent word ``n``-gram, ``count * length(gram)``,
  divided by the document's character count. Ties break to the
  lexicographically smallest gram so the winning gram itself is a
  deterministic output column;
- ``dup{n}_frac`` — fraction of ``n``-gram OCCURRENCES that are
  repeats of an earlier occurrence (``1 - distinct / total``).

Spark-first plan: one narrow projection splits the text, one
``explode`` emits gram occurrences, and everything aggregates with
map-side combine on ``(id, gram)`` then ``(id)`` — no joins except
the final narrow re-attach of per-doc aggregates, no UDFs, nothing
driver-side, so the 100-TB corpus streams through codegen and two
partial-agg shuffles of counter rows (never text payloads).

The reference engine has no text path; this family extends it per the
brief's training-data-pipeline mandate (companion to
:mod:`vrtility_spark.decontam` and the dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_ngrams(n: int, words_col: str = "w"):
    """Word ``n``-gram occurrence array (NON-distinct) over a
    previously-materialized split column (inlining ``split`` into
    every ``element_at`` re-evaluates it per shingle); empty array
    below ``n`` words (``sequence`` runs descending for upper bound
    < 1, hence the guard). The ONE canonical shingle definition —
    :mod:`decontam` builds its overlap sets from the same expression,
    so contamination and quality reports can never diverge on
    tokenization."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    parts = ", ".join(f"element_at({words_col}, i + {k})"
                      for k in range(n))
    return F.expr(
        f"case when size({words_col}) >= {n} then "
        f"transform(sequence(1, size({words_col}) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})) "
        "else array() end")


def word_stats(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """``(id, n_words, n_distinct_words, dup_word_frac)`` — expression
    only, no shuffle."""
    w = F.split(F.col(text_col), " ")
    nw = F.size(w)
    nd = F.size(F.array_distinct(w))
    return df.select(
        id_col, nw.alias("n_words"), nd.alias("n_distinct_words"),
        (F.lit(1.0) - nd.cast("double") / nw).alias("dup_word_frac"))


def ngram_stats(df: DataFrame, n: int, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document ``n``-gram repetition aggregates:
    ``(id, total_{n}grams, distinct_{n}grams, dup{n}_frac, top{n}_gram,
    top{n}_count)``. Docs shorter than ``n`` words keep a row with
    zero counts and an empty top gram — short docs must not silently
    vanish from a quality report."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    occ = (df.withColumn("w", F.split(F.col(text_col), " "))
             .select(id_col, F.explode(word_ngrams(n)).alias("gram")))
    per_gram = occ.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    win = Window.partitionBy(id_col).orderBy(F.desc("cnt"), F.asc("gram"))
    top = (per_gram.withColumn("rn", F.row_number().over(win))
           .where("rn = 1")
           .select(id_col, F.col("gram").alias(f"top{n}_gram"),
                   F.col("cnt").alias(f"top{n}_count")))
    agg = per_gram.groupBy(id_col).agg(
        F.sum("cnt").alias(f"total_{n}grams"),
        F.count("*").alias(f"distinct_{n}grams"))
    out = (df.select(id_col)
           .join(agg, id_col, "left").join(top, id_col, "left")
           .select(
               id_col,
               F.coalesce(f"total_{n}grams", F.lit(0))
                .alias(f"total_{n}grams"),
               F.coalesce(f"distinct_{n}grams", F.lit(0))
                .alias(f"distinct_{n}grams"),
               F.coalesce(f"top{n}_gram", F.lit("")).alias(f"top{n}_gram"),
               F.coalesce(f"top{n}_count", F.lit(0)).alias(f"top{n}_count")))
    tot = F.col(f"total_{n}grams")
    return out.withColumn(
        f"dup{n}_frac",
        F.when(tot > 0,
               F.lit(1.0) - F.col(f"distinct_{n}grams").cast("double") / tot)
         .otherwise(F.lit(0.0)))


def repetition_report(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", chars_col: str | None = None,
                      top_n: int = 2, dup_n: int = 3) -> DataFrame:
    """One row per document joining the word stats, the top-``top_n``-
    gram character share, and the duplicate-``dup_n``-gram fraction.
    ``chars_col`` names a precomputed character-count column (else
    ``length(text)`` is used for the top-gram share denominator)."""
    nchars = (F.col(chars_col) if chars_col
              else F.length(F.col(text_col))).cast("double")
    base = df.select(id_col, nchars.alias("_nc"))
    rep = (base
           .join(word_stats(df, text_col, id_col), id_col)
           .join(ngram_stats(df, top_n, text_col, id_col), id_col))
    if dup_n != top_n:
        rep = rep.join(
            ngram_stats(df, dup_n, text_col, id_col)
            .select(id_col, f"total_{dup_n}grams", f"distinct_{dup_n}grams",
                    f"dup{dup_n}_frac"),
            id_col)
    share = (F.col(f"top{top_n}_count")
             * F.length(F.col(f"top{top_n}_gram")).cast("double"))
    # capped at 1.0: overlapping occurrences of the top gram double-
    # count shared characters (count * len(gram) can exceed the text
    # length on exactly the repetitive docs the metric targets), and a
    # "fraction" column must stay a fraction for downstream consumers
    rep = rep.withColumn(
        f"top{top_n}_char_frac",
        F.when(F.col("_nc") > 0,
               F.least(F.lit(1.0), share / F.col("_nc")))
         .otherwise(F.lit(0.0)))
    return rep.drop("_nc")


def quality_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", top_n: int = 2, dup_n: int = 3,
                   max_dup_word_frac: float = 0.5,
                   max_top_char_frac: float = 0.2,
                   max_dup_ngram_frac: float = 0.5) -> DataFrame:
    """The kept corpus: documents whose repetition signals all clear
    the (Gopher-style) thresholds, original columns preserved. The
    report's counter rows shuffle; the corpus re-attaches through one
    semi-join on the id, so text payloads never enter the report
    aggregations' shuffles."""
    rep = repetition_report(df, text_col, id_col, None, top_n, dup_n)
    keep = rep.where(
        (F.col("dup_word_frac") <= float(max_dup_word_frac))
        & (F.col(f"top{top_n}_char_frac") <= float(max_top_char_frac))
        & (F.col(f"dup{dup_n}_frac") <= float(max_dup_ngram_frac))
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")
