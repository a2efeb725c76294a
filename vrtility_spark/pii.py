"""PII detection and redaction over a distributed corpus table — the
standard training-data hygiene stage next to dedup
(:mod:`vrtility_spark.dedup`), decontamination
(:mod:`vrtility_spark.decontam`) and quality filtering
(:mod:`vrtility_spark.textquality`).

Web-scale corpora carry personally identifiable strings (emails,
phone numbers, host addresses) that pipelines scrub before training
(e.g. the BigScience ROOTS / BigCode StarCoder PII pipelines). This
module is the regex tier of that stage: detect spans per document,
count them per category, and rewrite the text with fixed placeholder
tokens so downstream tokenization is stable.

Spark-first plan: everything is ``regexp_count`` / ``regexp_replace``
column expressions — JVM-side, whole-stage codegen, ZERO shuffle and
zero Python in the hot path; a 100-TB corpus streams through the scan
with the redaction fused into the projection. The patterns are
deliberately written in the common subset of Java regex and RE2
(character classes, bounded repetition, ``\\b`` — no backrefs, no
lookaround) so the exact same strings run under Spark, DuckDB, and
Python ``re`` (the oracle twins).

The reference engine has no text path; this family extends it per the
brief's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, placeholder) in REDACTION ORDER. Order matters and
#: is part of the contract: emails are scrubbed before IPv4 so a
#: digit-heavy mail domain can't be double-redacted; every consumer
#: (Spark, SQL oracle, NumPy twin) must apply the same order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    # NANP forms: (555) 123-4567, 555-123-4567, 555.123.4567, with an
    # optional +1 / 1 trunk prefix. Separators stay restricted to
    # "-"/"." (plus the parenthesized area code) so running digit
    # prose, dates (2026-08-19) and dotted quads can't be swallowed:
    # a dotted quad never satisfies the trailing \d{4}\b because IPv4
    # octets are <= 3 digits.
    ("phone",
     r"(\+1[-. ]|\b1[-. ])?(\(\d{3}\) ?|\b\d{3}[-.])\d{3}[-.]\d{4}\b",
     "<PHONE>"),
    ("ipv4", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
)


def scrub_expr(text_col: str | Column) -> Column:
    """Redacted-text expression: every pattern replaced (globally, in
    :data:`PII_PATTERNS` order) by its placeholder token."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for _name, pat, token in PII_PATTERNS:
        col = F.regexp_replace(col, pat, token)
    return col


def _strip_expr(text_col: str | Column) -> Column:
    """Text with every PII span deleted — only used to measure matched
    characters (``length(text) - length(stripped)``), which sidesteps
    per-engine differences in empty-list aggregation."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for _name, pat, _token in PII_PATTERNS:
        col = F.regexp_replace(col, pat, "")
    return col


def pii_report(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document PII report: ``(id, n_<category>... , n_pii,
    pii_chars, pii_char_frac, redacted)``.

    ``pii_chars`` counts characters covered by the (order-applied,
    non-overlapping-after-redaction) matches; ``pii_char_frac`` is
    that over the original length. Pure expressions — no shuffle, no
    UDF; chain ``.drop("redacted")`` if only the counts are needed.
    """
    text = F.col(text_col)
    counts = {name: F.regexp_count(text, F.lit(pat))
              for name, pat, _tok in PII_PATTERNS}
    pii_chars = (F.length(text) - F.length(_strip_expr(text)))
    total = sum(counts.values(), F.lit(0))
    return df.select(
        id_col,
        *(c.alias(f"n_{name}") for name, c in counts.items()),
        total.alias("n_pii"),
        pii_chars.alias("pii_chars"),
        F.when(F.length(text) > 0,
               pii_chars.cast("double") / F.length(text))
         .otherwise(F.lit(0.0)).alias("pii_char_frac"),
        scrub_expr(text).alias("redacted"))


def scrub(df: DataFrame, text_col: str = "text",
          out_col: str | None = None) -> DataFrame:
    """Corpus with ``text_col`` redacted in place (or into
    ``out_col``) — the write-side of the stage; fused into whatever
    projection follows, so it costs one codegen pass over the scan."""
    return df.withColumn(out_col or text_col, scrub_expr(text_col))
