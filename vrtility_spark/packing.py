"""LM sequence packing — concat-and-chunk documents into fixed-length
training sequences, the step every tokenize-for-pretraining pipeline
runs between dedup/quality filtering and the trainer's data loader.

The packing contract is the classic "concatenate in a deterministic
order, then slice into ``seq_len``-token windows" (GPT-2/3, T5
span-corruption inputs, most open-data recipes): document *i* owns the
half-open global token interval ``[tok_start_i, tok_start_i + n_i)``
where ``tok_start_i = sum(n_j for j < i)`` in packing order, and
sequence *s* is the window ``[s*L, (s+1)*L)``.  Everything downstream
(which sequences a document touches, where it starts inside its first
sequence, per-sequence document counts and fill) is pure arithmetic on
that prefix sum — so the ONLY distributed problem is the global
ordered cumulative sum.

Spark-first shape — the prefix sum is two-phase, never a
single-partition window:

1. token counts are one narrow projection (``size(split(text))`` —
   the same whitespace tokenization as :mod:`textquality` /
   :mod:`textlm`, so the packed budget matches the corpus token
   stats);
2. ``repartitionByRange`` on the packing key puts ascending key
   ranges on ascending partition ids (Spark's ``RangePartitioner``
   contract), so per-partition token totals — ONE tiny row per
   partition — collect to the driver, an exclusive prefix over those
   ~hundreds of longs computes each partition's global offset, and
   the offsets broadcast back as a literal map;
3. the within-partition exclusive cumsum is a window PARTITIONED BY
   the partition id — every window group is exactly one Spark
   partition, so no data moves and no partition serializes the whole
   table.  ``global tok_start = partition offset + local cumsum``.

At 100 TB that is one range shuffle of ``(key, n_tokens)`` longs (the
text column is never shuffled), a ~KB driver collect, and a map-local
window — the same shape at any corpus size.

Packing order is a parameter: ``order_col=None`` packs by the id
column (reproducible corpus order); passing e.g. ``xxhash64(id)``
gives the salted pseudo-shuffle most recipes use per epoch, still
fully deterministic.  Ties are broken by the id column so any order
expression yields a total order.

Reference parity: the reference is an EO raster engine with no LM
pipeline; this module is part of the brief's "operations a
large-scale training-data pipeline would need" family (tokenize →
pack).  The arithmetic contract (exclusive prefix, ``div``/``%``
window math) is SQL-replayable, so every output here is pinned to a
DuckDB twin in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_count_col(text_col: str = "text") -> Column:
    """Whitespace token count — identical to the corpus token-budget
    estimator in ``q_token_stats`` (``size(split(text, ' '))``), so a
    packed corpus accounts for exactly the tokens the stats counted."""
    return F.size(F.split(F.col(text_col), " "))


def pack_documents(df: DataFrame, seq_len: int, text_col: str = "text",
                   id_col: str = "doc_id", order_col: Column | None = None,
                   num_partitions: int | None = None) -> DataFrame:
    """Assign every document its slot in the packed token stream.

    Returns one row per input row (NO explosion — a document spanning
    ten thousand sequences is still one row here):

    ``id_col, n_tokens, tok_start, seq_first, seq_last, pos_in_seq,
    n_seqs``

    where ``tok_start`` is the global exclusive prefix sum of
    ``n_tokens`` in packing order, ``seq_first/seq_last`` the first
    and last sequence index the document's tokens land in,
    ``pos_in_seq`` the offset inside ``seq_first``, and ``n_seqs``
    how many sequences the document touches.

    ``order_col`` defaults to the id column; pass an expression over
    input columns (e.g. ``F.xxhash64(F.col("doc_id"), F.lit(epoch))``)
    for salted-shuffle packing.  The order key must be computable from
    the row itself (it rides the range shuffle).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    L = int(seq_len)
    okey = (order_col if order_col is not None else F.col(id_col))

    counts = df.select(
        F.col(id_col),
        okey.alias("_pk"),
        token_count_col(text_col).cast("long").alias("n_tokens"))

    if num_partitions is not None:
        counts = counts.repartitionByRange(int(num_partitions),
                                           "_pk", id_col)
    else:
        counts = counts.repartitionByRange("_pk", id_col)
    counts = counts.withColumn("_pid", F.spark_partition_id())
    # cache: the per-partition totals pass and the main pass must see
    # the SAME physical partitioning (spark_partition_id is tied to it)
    counts = counts.persist()
    try:
        totals = (counts.groupBy("_pid")
                  .agg(F.sum("n_tokens").alias("t"))
                  .collect())  # one row per partition — KBs at any scale
        by_pid = {int(r["_pid"]): int(r["t"]) for r in totals}
        off, offsets = 0, {}
        for pid in sorted(by_pid):
            offsets[pid] = off
            off += by_pid[pid]
        pairs = []
        for pid, o in sorted(offsets.items()):
            pairs.extend((F.lit(pid), F.lit(o)))
        off_map = F.create_map(*pairs) if pairs else F.create_map()

        w = (Window.partitionBy("_pid").orderBy("_pk", id_col)
             .rowsBetween(Window.unboundedPreceding, -1))
        local = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        start = (local + F.coalesce(off_map[F.col("_pid")], F.lit(0))) \
            .alias("tok_start")
        out = (counts.select(F.col(id_col), "n_tokens", start)
               .withColumn("seq_first", F.expr(f"tok_start div {L}"))
               .withColumn(
                   "seq_last",
                   F.expr(f"(tok_start + greatest(n_tokens, 1L) - 1) "
                          f"div {L}"))
               .withColumn("pos_in_seq", F.col("tok_start") % L)
               .withColumn("n_seqs",
                           F.col("seq_last") - F.col("seq_first") + 1))
        # materialize (longs only — ~40 B/row) before unpersisting the
        # shuffled counts: spark_partition_id is only meaningful under
        # the cached partitioning, so the lineage must not re-evaluate
        # after the cache is dropped.  On a real cluster swap for a
        # reliable checkpoint if executor loss matters here.
        out = out.localCheckpoint(eager=True)
    finally:
        counts.unpersist()
    return out


def pack_spans(packed: DataFrame, seq_len: int,
               id_col: str = "doc_id") -> DataFrame:
    """Explode a :func:`pack_documents` result to one row per
    (sequence, document) incidence: ``seq_id, id, span_start`` (offset
    of the span inside the sequence), ``span_len``.

    The explosion is ``F.sequence(seq_first, seq_last)`` — pure
    expression, no Python.  Span arithmetic: inside the first sequence
    the span starts at ``pos_in_seq`` and runs to the sequence end (or
    the document end); middle sequences are fully covered; the last
    sequence holds the remainder.  Zero-token documents contribute one
    zero-length span (they still have a deterministic position).
    """
    L = int(seq_len)
    s = F.col("seq_id")
    doc_lo = F.col("tok_start")                      # global first token
    doc_hi = doc_lo + F.col("n_tokens")              # global end (excl)
    seq_lo = s * L
    seq_hi = seq_lo + L
    lo = F.greatest(doc_lo, seq_lo)
    hi = F.least(doc_hi, seq_hi)
    return (packed
            .withColumn("seq_id", F.explode(
                F.sequence(F.col("seq_first"), F.col("seq_last"))))
            .select(
                "seq_id", F.col(id_col),
                (lo - seq_lo).cast("long").alias("span_start"),
                F.greatest(hi - lo, F.lit(0)).cast("long")
                .alias("span_len")))


def sequence_fill(spans: DataFrame, seq_len: int) -> DataFrame:
    """Per-sequence packing stats from :func:`pack_spans` rows:
    ``seq_id, n_docs, n_tokens, fill_frac``.  Every sequence except
    the last is exactly full (``fill_frac = 1.0``) — the aggregate is
    the standard sanity artifact a packing job publishes."""
    L = int(seq_len)
    return (spans.groupBy("seq_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("span_len").alias("n_tokens"))
            .withColumn("fill_frac",
                        F.round(F.col("n_tokens") / F.lit(L), 6)))
