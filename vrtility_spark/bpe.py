"""Distributed byte-pair-encoding tokenizer training + encoding —
the subword-vocabulary step of an LLM training-data pipeline
(Sennrich, Haddow & Birch 2016; the GPT-2/SentencePiece-BPE family).

Spark-first shape:

* the corpus collapses to a WORD-FREQUENCY table in one shuffle
  (`word_counts` — the standard trick: BPE statistics depend only on
  word histograms, so a 100 TB corpus becomes a vocab-sized state
  table that every later step works on);
* each merge iteration is (1) one PURE-CATALYST adjacent-pair
  explosion + map-side-combinable `sum(freq)` aggregation, (2) one
  `TakeOrdered(1)` for the argmax pair — exact integer counts with a
  lexicographic tie-break, so the winner is deterministic under any
  partitioning — and (3) one narrow Arrow map applying the merge
  greedily left-to-right to the symbol arrays (rows not containing
  both symbols pass through untouched); lineage truncates every
  iteration so `n_merges` rounds never stack a deep plan;
* `bpe_encode` replays a trained merge list on new text with the
  classic lowest-rank-first loop per word, as one Arrow map with the
  broadcast rank dict — embarrassingly parallel.

The driver holds only the merge list (10⁴-ish rows at real vocab
sizes).  The reference has no text processing at all; this quadrant
comes from the LLM-training-data brief.  The pure-Python twin
(`train_bpe_py` / `encode_word_py`) is the test/constants oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrtility_spark.checkpointing import truncate_lineage

#: end-of-word marker (the Sennrich convention: word-final subwords
#: are distinct symbols, so detokenization is unambiguous)
EOW = "</w>"


# ------------------------------------------------ pure-Python twin ----

def _merge_word(syms: tuple, a: str, b: str) -> tuple:
    """Greedy LEFT-TO-RIGHT non-overlapping replacement of the
    adjacent pair (a, b) by the fused symbol a+b — the one merge rule
    both engines implement."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe_py(word_freqs: dict, n_merges: int) -> list:
    """Naive reference trainer over a ``{word: freq}`` dict: recount
    every pair each iteration, pick max count with the
    lexicographically-smallest (a, b) tie-break, merge greedily.
    Returns ``[(rank, a, b, freq), ...]``; stops early when no pair
    remains."""
    state = {w: tuple(list(w) + [EOW]) for w in word_freqs}
    merges = []
    for rank in range(int(n_merges)):
        counts: dict = {}
        for w, syms in state.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = \
                    counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), freq = best
        merges.append((rank, a, b, int(freq)))
        state = {w: _merge_word(s, a, b) for w, s in state.items()}
    return merges


def encode_word_py(word: str, ranks: dict) -> list:
    """Classic BPE apply: start from characters + EOW, repeatedly
    merge the LOWEST-RANK adjacent pair present (leftmost first among
    equal-rank occurrences, which greedy left-to-right replacement
    realizes) until no mergeable pair remains."""
    syms = tuple(list(word) + [EOW])
    while len(syms) > 1:
        cand = [(ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks]
        if not cand:
            break
        r = min(c[0] for c in cand)
        a, b = None, None
        for rr, i in cand:
            if rr == r:
                a, b = syms[i], syms[i + 1]
                break
        syms = _merge_word(syms, a, b)
    return list(syms)


# ------------------------------------------------ distributed side ----

def word_counts(df: DataFrame, text_col: str = "text",
                lowercase: bool = True) -> DataFrame:
    """Whitespace-token word histogram — ONE corpus shuffle with
    map-side combine; everything downstream works on this vocab-sized
    table.  Returns ``(word, freq)``."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    w = F.explode(F.split(t, r"\s+")).alias("word")
    return (df.select(w).where(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("freq")))


def _sym_state(words: DataFrame) -> DataFrame:
    """(word, freq) → (freq, syms): characters + the EOW marker, all
    pure Catalyst expressions."""
    return words.select(
        "freq",
        F.concat(
            F.expr("transform(sequence(1, length(word)), "
                   "i -> substring(word, i, 1))"),
            F.array(F.lit(EOW))).alias("syms"))


def _merge_udf(a: str, b: str):
    """One-merge Arrow map FACTORY — a fresh closure per merge so the
    lazily-executed plan can never see a later iteration's (a, b)
    (plans with ``checkpoint_every > 1`` stack several of these
    before anything runs)."""
    @F.pandas_udf("array<string>")
    def apply_merge(syms: pd.Series) -> pd.Series:
        out = []
        for s in syms:
            lst = list(s)
            if a in lst and b in lst:
                out.append(list(_merge_word(tuple(lst), a, b)))
            else:
                out.append(lst)
        return pd.Series(out)
    return apply_merge


def train_bpe(words: DataFrame, n_merges: int,
              checkpoint_every: int = 1) -> list:
    """Train ``n_merges`` BPE merges over a ``(word, freq)`` table.
    Returns ``[(rank, a, b, freq), ...]`` — exact integer counts,
    deterministic under any partitioning (lexicographic tie-break).
    Stops early when no adjacent pair remains."""
    state = truncate_lineage(_sym_state(words), eager=True)
    merges: list = []
    for rank in range(int(n_merges)):
        pairs = (state.where(F.size("syms") >= 2)
                 .select("freq", F.explode(F.expr(
                     "transform(sequence(1, size(syms) - 1), "
                     "i -> struct(syms[i - 1] as a, syms[i] as b))"))
                     .alias("p"))
                 .groupBy("p.a", "p.b")
                 .agg(F.sum("freq").alias("cnt")))
        top = pairs.orderBy(F.desc("cnt"), "a", "b").take(1)
        if not top:
            break
        a, b, freq = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((rank, a, b, freq))
        state = state.withColumn("syms",
                                 _merge_udf(a, b)(F.col("syms")))
        if (rank + 1) % max(1, int(checkpoint_every)) == 0:
            state = truncate_lineage(state, eager=True)
    return merges


def merges_df(spark, merges: list) -> DataFrame:
    """The merge list as a ``(rank, left, right, freq)`` DataFrame —
    the persistable tokenizer artifact."""
    return spark.createDataFrame(
        [(int(r), a, b, int(f)) for r, a, b, f in merges],
        "rank int, left string, right string, freq long")


def bpe_encode(df: DataFrame, text_col: str, merges: list,
               out_col: str = "bpe_tokens",
               lowercase: bool = True) -> DataFrame:
    """Add an ``array<string>`` subword-token column: per row, split
    on whitespace and replay the merge list per word (lowest rank
    first).  One Arrow map with the broadcast rank dict — no shuffle."""
    ranks = {(a, b): int(r) for r, a, b, _f in merges}

    @F.pandas_udf("array<string>")
    def enc(text: pd.Series) -> pd.Series:
        out = []
        cache: dict = {}
        for t in text:
            s = "" if t is None else (t.lower() if lowercase else t)
            toks: list = []
            for w in s.split():
                if w not in cache:
                    cache[w] = encode_word_py(w, ranks)
                toks.extend(cache[w])
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, enc(F.col(text_col)))
