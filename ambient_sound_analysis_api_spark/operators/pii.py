"""PII detection and redaction over text columns.

The standard pre-training compliance pass (mirrors the scrubbing stage of
public pipeline descriptions — e.g. BigScience ROOTS and Dolma both regex-
scrub emails/IPs before training): find personally-identifying substrings
and replace them with typed placeholders, reporting per-document counts so
downstream filtering can drop PII-dense documents entirely.

Everything is Catalyst (``regexp_count`` / ``regexp_replace``): zero Python
in the row path, so the scrub rides whole-stage codegen and the patterns
push into one projection. The pattern dialect is restricted to the
RE2 ∩ Java-regex common subset (character classes, bounded repetition,
``\\b``) so the SAME strings run under DuckDB for the oracle comparison —
engine-portability is part of the operator's contract, since a production
pipeline audits its scrub with exactly this kind of cross-engine replay.

Redaction order is fixed (emails → IPv4 → long digit runs): earlier
replacements consume their digits before the long-number rule can see them,
and the fixed order makes the composition deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2 ∩ Java common-subset patterns (no lookaround, no backrefs)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
LONGNUM_RE = r"\b\d{9,}\b"

EMAIL_TAG, IP_TAG, NUM_TAG = "<EMAIL>", "<IP>", "<NUM>"


def scrub_text(text: Column) -> Column:
    """Redact emails, IPv4 addresses, then 9+-digit runs with typed tags."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TAG)
    out = F.regexp_replace(out, IPV4_RE, IP_TAG)
    return F.regexp_replace(out, LONGNUM_RE, NUM_TAG)


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts + redacted text.

    Returns ``(id_col, n_emails, n_ips, n_long_numbers, scrubbed)``.
    Counts are taken on the ORIGINAL text (the audit signal); the redacted
    text applies the fixed email → IP → number order documented above.
    """
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(text, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(text, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(text, F.lit(LONGNUM_RE)).alias("n_long_numbers"),
        scrub_text(text).alias("scrubbed"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_identifiers: list[str],
    k: int = 5,
    by: str | None = None,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple.

    A record is k-anonymous when at least k records share its full
    quasi-identifier combination; releasing (or training on) rows from
    smaller groups risks re-identification, so the standard curation
    move is to suppress them.  This operator reports the damage BEFORE
    the suppression: per ``by`` rollup key (or one global row), how many
    QI equivalence classes exist, how many fall below k, and what
    fraction of records suppression would remove.

    Plan shape: one group-by on the QI tuple (map-side combined; output
    is QI-cardinality-sized, a vocabulary, not data-sized), then a
    grid-sized conditional rollup.  No window, no join.

    Returns (by?, n_groups, n_small_groups, n_rows, n_suppressed,
    suppression_rate) with the rate 6dp-rounded, ordered by the rollup
    key.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keys = [by, *quasi_identifiers] if by else list(quasi_identifiers)
    classes = df.groupBy(*keys).agg(F.count("*").alias("_n"))
    small = F.col("_n") < k
    rollup = [by] if by else []
    out = classes.groupBy(*rollup).agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(F.when(small, 1).otherwise(0)).cast("bigint").alias(
            "n_small_groups"
        ),
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.sum(F.when(small, F.col("_n")).otherwise(0)).cast("bigint").alias(
            "n_suppressed"
        ),
        F.round(
            F.sum(F.when(small, F.col("_n")).otherwise(0))
            / F.sum("_n"),
            6,
        ).alias("suppression_rate"),
    )
    return out.orderBy(by) if by else out
