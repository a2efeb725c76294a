"""Benchmark decontamination: flag / drop training documents that
overlap an evaluation set by shared word n-grams.

Training-corpus hygiene at 100 TB: any document that contains enough
n-grams from a held-out benchmark (eval questions, test answers,
canary strings) must be removed before training, or the benchmark is
contaminated. The standard recipe (GPT-3 appendix C, The Pile,
Dolma's decontamination pass) is exact n-gram overlap: shingle both
sides into word n-grams, intersect, and flag documents whose overlap
exceeds a threshold.

Spark-first plan — the asymmetry IS the design:

- the CORPUS side is the 100-TB table: shingling is a narrow
  projection (``transform`` over a split column, one ``explode``),
  and shingles fold to int64 via ``xxhash64`` before they ever
  shuffle (~4x less than strings; collision odds n²/2⁶⁵ are the same
  trade :func:`__spark_entry__.ngram_jaccard_pairs` documents);
- the BENCHMARK side is small by construction (eval suites are MBs,
  not TBs), so its distinct shingle-hash set **broadcasts**: the
  overlap test is one broadcast-hash LEFT join marking hits in place —
  the corpus never shuffles for the probe itself;
- per-document hit counts then aggregate on ``id_col`` — one
  map-side-combined shuffle of ``(doc_id, count)`` pairs, nothing
  wider;
- docs too short to shingle (< n words) have zero shingles and are
  kept via the final left join, never silently dropped.

The reference engine has no text path; this family extends it per the
brief's training-data-pipeline mandate (same rationale as
``minhash_lsh`` / ``ngram_jaccard`` in ``__spark_entry__``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingle_hashes(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", n: int = 3,
                   distinct: bool = True) -> DataFrame:
    """``(id_col, sh)`` word-``n``-gram shingles of ``text_col``,
    folded to int64 with ``xxhash64``. The shingle expression is
    :func:`textquality.word_ngrams` — the engine's one canonical
    tokenization, shared with the repetition-quality reports."""
    from vrtility_spark.textquality import word_ngrams
    out = (df.withColumn("w", F.split(F.col(text_col), " "))
             .select(id_col, F.explode(word_ngrams(n)).alias("_sh"))
             .select(id_col, F.xxhash64("_sh").alias("sh")))
    return out.distinct() if distinct else out


def contamination(docs: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, min_overlap: int = 1,
                  min_frac: float = 0.0) -> DataFrame:
    """Per-document overlap report against the benchmark shingle set.

    Returns ``(id_col, n_shingles, hit_shingles, overlap_frac,
    contaminated)`` for EVERY corpus document: ``hit_shingles`` is the
    number of distinct ``n``-gram shingles the document shares with
    ``benchmark``; ``contaminated`` is true when
    ``hit_shingles >= min_overlap`` AND ``overlap_frac >= min_frac``.
    The benchmark's distinct shingle hashes are broadcast — the corpus
    scan is probed map-side and only ``(doc, count)`` pairs shuffle.
    """
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    bench_sh = F.broadcast(
        shingle_hashes(benchmark, text_col, id_col, n)
        .select("sh").distinct().withColumn("_hit", F.lit(1)))
    doc_sh = shingle_hashes(docs, text_col, id_col, n)
    # ONE broadcast probe marks hits in place, ONE map-side-combined
    # shuffle produces both counters — the corpus shingle set is never
    # aggregated twice
    counts = (doc_sh.join(bench_sh, "sh", "left")
              .groupBy(id_col)
              .agg(F.count("*").alias("n_shingles"),
                   F.count("_hit").alias("hit_shingles")))
    frac = F.col("hit_shingles") / F.col("n_shingles")
    return (docs.select(id_col)
            .join(counts, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
                F.coalesce("hit_shingles", F.lit(0)).alias("hit_shingles"))
            .withColumn(
                "overlap_frac",
                F.when(F.col("n_shingles") > 0, frac).otherwise(F.lit(0.0)))
            .withColumn(
                "contaminated",
                (F.col("hit_shingles") >= min_overlap)
                & (F.col("overlap_frac") >= float(min_frac))))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, min_overlap: int = 1,
                  min_frac: float = 0.0) -> DataFrame:
    """The clean corpus: ``docs`` minus every contaminated document
    (all original columns preserved). One broadcast probe + one narrow
    anti-join on the id — the 100-TB payload column never shuffles."""
    bad = (contamination(docs, benchmark, text_col, id_col, n,
                         min_overlap, min_frac)
           .where("contaminated").select(id_col))
    return docs.join(bad, id_col, "left_anti")
