"""Cross-document duplicated n-grams: per-document counts of word
windows that also occur in OTHER documents — the window-granularity
form of exact-substring training-data dedup (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better": repeated
spans, not just whole-document duplicates, degrade LLMs).

This completes the text-dedup family: ``dedup_exact`` removes
identical documents, ``minhash_lsh``/``ngram_jaccard`` find NEAR
duplicates, :mod:`textquality`'s repetition report measures
WITHIN-document repetition — this operator measures BETWEEN-document
repeated spans and filters documents that are mostly boilerplate
shared with the rest of the corpus (licence headers, navigation
chrome, templated pages).

Definitions: a document's windows are its word ``n``-grams
(non-distinct, :func:`textquality.word_ngrams` — the engine's one
canonical tokenization). A window is DUPLICATED when its n-gram occurs
in at least ``min_docs`` distinct documents; ``dup_frac`` is the
fraction of the document's window occurrences that are duplicated.
Internal repetition alone never counts (that is ``repetition_report``'s
signal); a document repeating a shared span many times counts every
occurrence, matching the "how much of this doc is corpus boilerplate"
reading.

Spark-first plan — three NARROW exchanges of gram-sized rows, never a
pair explosion (suffix arrays, the paper's single-node tool, do not
distribute; window counting is the scalable equivalent):

1. shingle + ``xxhash64`` fold (pure expressions, one ``explode``);
   per-(doc, gram) counts — exchange on ``(sh, doc)``;
2. distinct-doc count per gram as a window over ``sh`` — the stop-gram
   shared by EVERY document is one aggregated row, never a pair list,
   so skew is bounded by the corpus's distinct-gram row count;
3. duplicated-window totals re-aggregate on ``doc`` — map-side
   combined. ``n_windows`` is a pure expression on the text column
   (``max(words - n + 1, 0)``) — no extra pass over the corpus.

The reference engine has no text path; this family extends it per the
brief's training-data-pipeline mandate (same rationale as
:mod:`decontam`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _window_occurrences(df: DataFrame, text_col: str, id_col: str,
                        n: int) -> DataFrame:
    """``(id_col, sh)`` one row per window OCCURRENCE (non-distinct),
    shingles folded to int64 (the :mod:`decontam` hash trade)."""
    from vrtility_spark.textquality import word_ngrams
    return (df.withColumn("w", F.split(F.col(text_col), " "))
              .select(id_col, F.explode(word_ngrams(n)).alias("_g"))
              .select(id_col, F.xxhash64("_g").alias("sh")))


def cross_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 5,
                     min_docs: int = 2) -> DataFrame:
    """Per-document cross-duplication report:
    ``(id_col, n_windows, dup_windows, dup_frac)``. Every input
    document keeps a row — docs shorter than ``n`` words report zero
    windows (``dup_frac`` 0.0), never silently vanish."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(
            f"min_docs must be >= 2 (cross-document), got {min_docs}")
    occ = _window_occurrences(df, text_col, id_col, n)
    per = occ.groupBy("sh", id_col).agg(F.count("*").alias("cnt"))
    ndocs = F.count("*").over(Window.partitionBy("sh"))
    dup = (per.withColumn("_nd", ndocs)
              .where(F.col("_nd") >= min_docs)
              .groupBy(id_col)
              .agg(F.sum("cnt").alias("dup_windows")))
    nw = F.greatest(
        F.size(F.split(F.col(text_col), " ")) - (n - 1), F.lit(0))
    base = df.select(id_col, nw.alias("n_windows"))
    out = (base.join(dup, id_col, "left")
           .select(
               id_col, "n_windows",
               F.coalesce("dup_windows", F.lit(0)).alias("dup_windows")))
    return out.withColumn(
        "dup_frac",
        F.when(F.col("n_windows") > 0,
               F.col("dup_windows").cast("double") / F.col("n_windows"))
         .otherwise(F.lit(0.0)))


def cross_dup_filter(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 5,
                     min_docs: int = 2,
                     max_frac: float = 0.5) -> DataFrame:
    """Drop documents whose duplicated-window fraction exceeds
    ``max_frac`` (boilerplate-heavy pages). Keeps the input schema —
    one semi join against the small over-threshold id set."""
    bad = (cross_duplicates(df, text_col, id_col, n, min_docs)
           .where(F.col("dup_frac") > float(max_frac))
           .select(id_col))
    return df.join(bad, id_col, "left_anti")


def scrub_dup_spans(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", n: int = 5,
                    min_docs: int = 2) -> DataFrame:
    """Exact-substring span scrub — the token-level member of the
    Lee et al. 2022 "Deduplicating Training Data Makes Language
    Models Better" family (deduplicate-text-datasets): every token
    covered by ANY word ``n``-gram that appears in ``>= min_docs``
    DISTINCT documents is removed from the text, and the survivors
    rejoin in order. This is the remove-ALL-occurrences variant
    (simpler and partitioning-invariant; Lee et al.'s keep-one-copy
    variant needs a global occurrence ranking — use
    :func:`cross_dup_filter` to drop whole boilerplate-heavy docs
    instead when provenance matters).

    Pure Catalyst expressions end to end — shingle hashes
    (:func:`textquality.word_ngrams` + ``xxhash64``, the one
    canonical tokenization), a distinct-doc count per shingle, one
    position-explode of the covered windows, a left-anti join on
    ``(doc, pos)``, and an ordered re-agg. No Python touches a row.
    At 100 TB: two shuffles (shingle groupBy, per-doc rebuild), both
    on keys with natural cardinality; the duplicated-shingle set is
    the only thing joined back and it is corpus-duplication-sized,
    not corpus-sized.

    Returns ``(id_col, text_scrubbed, n_tokens, n_removed)`` — every
    input document keeps a row (fully-duplicated docs come back with
    an empty string, docs shorter than ``n`` words unchanged)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(
            f"min_docs must be >= 2 (cross-document), got {min_docs}")
    from vrtility_spark.textquality import word_ngrams
    words = df.select(id_col, F.split(F.col(text_col), " ").alias("w"))
    toks = words.select(
        id_col, F.posexplode("w").alias("pos", "tok"))
    occ = words.select(
        id_col,
        F.posexplode(word_ngrams(n)).alias("pos", "_g")) \
        .select(id_col, "pos", F.xxhash64("_g").alias("sh"))
    dup = (occ.groupBy("sh")
           .agg(F.countDistinct(id_col).alias("_nd"))
           .where(F.col("_nd") >= int(min_docs))
           .select("sh"))
    covered = (occ.join(dup, "sh")
               .select(id_col,
                       F.explode(F.sequence(
                           F.col("pos"),
                           F.col("pos") + F.lit(int(n) - 1)))
                       .alias("pos"))
               .distinct())
    keep = toks.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = (keep.groupBy(id_col)
               .agg(F.count("*").alias("_kept"),
                    F.concat_ws(" ", F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("pos", "tok"))),
                        lambda s: s.tok)).alias("text_scrubbed")))
    base = df.select(id_col,
                     F.size(F.split(F.col(text_col), " "))
                     .alias("n_tokens"))
    return (base.join(rebuilt, id_col, "left")
            .select(
                id_col,
                F.coalesce("text_scrubbed", F.lit(""))
                .alias("text_scrubbed"),
                "n_tokens",
                (F.col("n_tokens")
                 - F.coalesce("_kept", F.lit(0))).alias("n_removed")))
