"""Count-based bigram language-model perplexity — the corpus quality
filter of the CCNet/Gopher lineage (documents scored by how surprising
they are under a model trained on the corpus itself, or on a cleaner
reference corpus; high perplexity → boilerplate, gibberish, OCR
noise). Production stacks reach for KenLM; this is the honest
count-based twin with identical plumbing: train once, broadcast,
score in a single pass.

Spark-first shape:

- **train** aggregates token and bigram COUNTS — the shuffles move
  count rows (map-side partially aggregated by Catalyst), never
  documents. The vocabulary is the top-``vocab_size`` tokens and the
  bigram table keeps the top-``bigram_cap`` pairs (count desc, lexical
  tiebreak — fully deterministic); both caps bound the broadcast no
  matter the corpus size, and add-alpha smoothing absorbs what the
  caps drop.
- **score** is a zero-shuffle Arrow pass: the model broadcasts once,
  each document folds its own bigrams —
  ``H = −mean log2 P(w_i | w_{i−1})``,
  ``P = (c(a,b) + α) / (c(a) + α·(V+1))``, ``perplexity = 2^H``.
  Out-of-vocabulary tokens map to a single ``<unk>`` id.

Tokenization matches :mod:`textquality` (whitespace split), so the
two quality signals describe the same token stream.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BigramLM:
    vocab: dict          # token -> id (0..V-1); OOV -> id V (<unk>)
    uni: np.ndarray      # (V+1,) unigram counts incl. <unk>
    bi: dict             # (prev_id, cur_id) -> count (top bigram_cap)
    alpha: float

    @property
    def v(self) -> int:
        return len(self.uni)  # V + 1 (the smoothing denominator size)


def train_lm(df: DataFrame, text_col: str = "text",
             vocab_size: int = 10000, bigram_cap: int = 200000,
             alpha: float = 0.1) -> BigramLM:
    """Fit the count model: two aggregations over the corpus (token
    counts, then vocab-id bigram counts), both shuffling only
    partially-aggregated count rows; collects ``vocab_size +
    bigram_cap`` rows to the driver."""
    toks = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("t")) \
        .where(F.col("t") != "")
    top = (toks.groupBy("t").count()
           .orderBy(F.desc("count"), "t").limit(int(vocab_size))
           .toPandas())
    vocab = {t: i for i, t in enumerate(top.t)}
    unk = len(vocab)

    vb = df.sparkSession.sparkContext.broadcast(vocab)

    @F.pandas_udf("array<int>")
    def to_ids(texts: pd.Series) -> pd.Series:
        v = vb.value
        u = len(v)
        return texts.map(lambda s: [v.get(w, u) for w in s.split(" ")
                                    if w] if isinstance(s, str) else [])

    ids = df.select(to_ids(F.col(text_col)).alias("ids"))
    uni_rows = (ids.select(F.explode("ids").alias("a"))
                .groupBy("a").count().toPandas())
    uni = np.zeros(unk + 1, dtype=np.int64)
    uni[uni_rows.a.to_numpy()] = uni_rows["count"].to_numpy()

    n1 = F.greatest(F.size("ids") - 1, F.lit(0))
    pairs = ids.select(
        F.explode(F.arrays_zip(
            F.slice("ids", 1, n1).alias("pa"),
            F.slice("ids", 2, n1).alias("pb")
        )).alias("p")).select(F.col("p.pa").alias("a"),
                              F.col("p.pb").alias("b"))
    bi_rows = (pairs.groupBy("a", "b").count()
               .orderBy(F.desc("count"), "a", "b")
               .limit(int(bigram_cap)).toPandas())
    bi = {(int(a), int(b)): int(c)
          for a, b, c in zip(bi_rows.a, bi_rows.b, bi_rows["count"])}
    return BigramLM(vocab=vocab, uni=uni, bi=bi, alpha=float(alpha))


def perplexity_np(tokens: list, model: BigramLM) -> float:
    """Per-document bigram perplexity (NaN for < 2 tokens) — the
    scalar kernel score_lm vectorizes; gated against a from-scratch
    reference in tests/test_textlm.py."""
    unk = len(model.vocab)
    ids = [model.vocab.get(w, unk) for w in tokens if w]
    if len(ids) < 2:
        return float("nan")
    a = model.alpha
    v = model.v
    h = 0.0
    for p, c in zip(ids[:-1], ids[1:]):
        num = model.bi.get((p, c), 0) + a
        den = model.uni[p] + a * v
        h -= np.log2(num / den)
    return float(2.0 ** (h / (len(ids) - 1)))


def score_lm(df: DataFrame, model: BigramLM, text_col: str = "text",
             out_col: str = "perplexity") -> DataFrame:
    """Append the perplexity column: one broadcast, zero shuffle."""
    mb = df.sparkSession.sparkContext.broadcast(
        (model.vocab, model.uni, model.bi, model.alpha))

    @F.pandas_udf("double")
    def perp(texts: pd.Series) -> pd.Series:
        vocab, uni, bi, alpha = mb.value
        m = BigramLM(vocab=vocab, uni=uni, bi=bi, alpha=alpha)
        return texts.map(
            lambda s: perplexity_np(s.split(" "), m)
            if isinstance(s, str) else float("nan"))

    return df.withColumn(out_col, perp(F.col(text_col)))
