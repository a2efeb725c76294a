"""Deterministic sampling and dataset splitting for training-data
pipelines: content-addressed (hash-range) membership instead of RNG
state, so every decision is reproducible from the row's key alone.

A 100-TB corpus cannot sample with ``rand()``: resharding, task retries
or a second pass would each see different rows. Here membership is a
pure function of ``md5(seed | key…)`` — stable under repartitioning,
retries, incremental appends, and re-computable by ANY engine (the
DuckDB oracles run the byte-identical expression), the property that
makes train/val/test assignments auditable years later. The reference
has no sampling surface (its testthat fixtures are whole-collection);
this is part of the LLM-training-data layer built on the same engine.

All three operators:

* :func:`sample_fraction` — Bernoulli-by-hash: keep a row iff its
  8-hex-digit bucket (uniform over 16⁸) falls below ``fraction``. A
  pure narrow filter — no shuffle, no state; Catalyst pushes it into
  the scan stage.
* :func:`assign_splits` — partition the hash range into labeled
  intervals (train/val/test…): every row gets exactly one label,
  splits are disjoint by construction, and changing one weight never
  reshuffles rows between the OTHER splits (interval boundaries move
  monotonically). Also a pure expression.
* :func:`stratified_sample_n` — exactly ``n`` rows per stratum, chosen
  by hash order (deterministic "random" without an RNG): one window
  shuffle keyed by the strata columns. Hash ties break on the id
  columns, so the selection is total-order stable.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: hash buckets: the first 8 hex digits of md5 → uniform over 16**8
_BUCKETS = 16 ** 8


def _hex8(id_cols: Sequence[str], seed: int):
    """First 8 md5 hex digits of ``seed|col1|col2|…`` as a Column."""
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(str(int(seed))),
                          *[F.col(c).cast("string") for c in id_cols])),
        1, 8)


def _hex8_sql(id_cols: Sequence[str], seed: int) -> str:
    """The byte-identical ANSI-SQL expression (DuckDB oracle twin)."""
    cols = ", ".join(f"cast({c} as varchar)" for c in id_cols)
    return f"substring(md5(concat_ws('|', '{int(seed)}', {cols})), 1, 8)"


def _hex_bound(bound: int) -> str:
    """Upper bound as a string comparable against 8 lowercase hex
    digits. A saturated bound (≥ 16⁸, "keep everything below") must
    sort ABOVE 'ffffffff'; ``format(16**8, 'x')`` = '100000000' sorts
    lexicographically BELOW it, so saturate to 'g' instead."""
    return "g" if bound >= _BUCKETS else format(bound, "08x")


def _thresholds(weights: Mapping[str, float]) -> list[tuple[str, str]]:
    """(label, upper-bound string) per split, cumulative; the last
    label owns the remainder of the range."""
    total = float(sum(weights.values()))
    if not total > 0:
        raise ValueError("split weights must sum to > 0")
    out, cum = [], 0.0
    items = list(weights.items())
    for i, (name, wt) in enumerate(items):
        if wt < 0:
            raise ValueError(f"negative weight for split {name!r}")
        cum += wt / total
        bound = _BUCKETS if i == len(items) - 1 else round(cum * _BUCKETS)
        out.append((str(name), _hex_bound(bound)))
    return out


def sample_fraction(df: DataFrame, id_cols: Sequence[str],
                    fraction: float, seed: int = 0) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by hash bucket — deterministic,
    reshard-proof, and re-computable from the keys alone."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    thr = _hex_bound(round(fraction * _BUCKETS))
    return df.filter(_hex8(id_cols, seed) < F.lit(thr))


def sample_fraction_sql(id_cols: Sequence[str], fraction: float,
                        seed: int = 0) -> str:
    """WHERE-clause twin of :func:`sample_fraction` for SQL oracles."""
    thr = _hex_bound(round(fraction * _BUCKETS))
    return f"{_hex8_sql(id_cols, seed)} < '{thr}'"


def assign_splits(df: DataFrame, id_cols: Sequence[str],
                  weights: Mapping[str, float], seed: int = 0,
                  col: str = "split") -> DataFrame:
    """Add a ``col`` labeling each row with its hash-range split
    (insertion order of ``weights`` defines the ranges)."""
    hx = _hex8(id_cols, seed)
    expr = None
    for name, bound in _thresholds(weights)[:-1]:
        cond = hx < F.lit(bound)
        expr = F.when(cond, name) if expr is None else \
            expr.when(cond, name)
    last = list(weights)[-1]
    expr = F.lit(str(last)) if expr is None else expr.otherwise(str(last))
    return df.withColumn(col, expr)


def assign_splits_sql(id_cols: Sequence[str],
                      weights: Mapping[str, float],
                      seed: int = 0) -> str:
    """CASE-expression twin of :func:`assign_splits`."""
    hx = _hex8_sql(id_cols, seed)
    parts = [f"when {hx} < '{bound}' then '{name}'"
             for name, bound in _thresholds(weights)[:-1]]
    last = str(list(weights)[-1])
    return "case " + " ".join(parts) + f" else '{last}' end"


def stratified_sample_n(df: DataFrame, strata_cols: Sequence[str],
                        n: int, id_cols: Sequence[str],
                        seed: int = 0, rank_col: str = "rk") -> DataFrame:
    """Exactly ``min(n, stratum size)`` rows per stratum, selected by
    hash order (ties broken by the id columns). One window shuffle on
    the strata key; strata are typically few and bounded, and only
    ``n`` rows per stratum survive the stage."""
    if int(n) < 1:
        raise ValueError("n must be >= 1")
    w = (Window.partitionBy(*[F.col(c) for c in strata_cols])
         .orderBy(_hex8(id_cols, seed),
                  *[F.col(c) for c in id_cols]))
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= int(n)))


def stratified_sample_n_sql(strata_cols: Sequence[str], n: int,
                            id_cols: Sequence[str], seed: int = 0,
                            rank_col: str = "rk") -> str:
    """``row_number()``-window twin (select-list fragment + filter used
    by the oracles): returns the WINDOW expression string."""
    strata = ", ".join(strata_cols)
    order = ", ".join([_hex8_sql(id_cols, seed)] + list(id_cols))
    return (f"row_number() over (partition by {strata} "
            f"order by {order}) as {rank_col}")
