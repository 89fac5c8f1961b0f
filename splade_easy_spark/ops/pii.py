"""PII detection and redaction over a text corpus.

The release-hygiene pass every public training-data pipeline runs before
publishing or training: find spans that look like emails, phone numbers,
IP addresses, and national-id-shaped numbers; count them per document; and
rewrite the text with typed placeholder tags.

Scale design (100 TB):

- pure Catalyst ``regexp_extract_all`` / ``regexp_replace`` — JVM regex in
  whole-stage codegen, one corpus scan, zero shuffle, zero Python;
- detection and redaction share the same pattern table so counts and
  rewrites can never disagree;
- patterns are deliberately RE2-compatible (no backreferences, no
  lookaround) so the DuckDB oracle and any downstream re-implementation
  (e.g. a Flink or Ray stage) match byte-for-byte.  Real deployments swap
  in stronger patterns / an NER model behind the same column contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ordered pattern table: (kind, regex).  Order matters for redaction —
#: earlier patterns are replaced first (email before phone, so the digits
#: inside an already-redacted email can't double-match).  All patterns are
#: valid in BOTH Java regex (Spark) and RE2 (DuckDB): character classes,
#: bounded repetition and \b word boundaries only.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b"),
)


def pii_counts(text_col: Column) -> dict[str, Column]:
    """{kind: match-count column} over one text column."""
    return {
        kind: F.size(F.regexp_extract_all(text_col, F.lit(pat), 0))
        for kind, pat in PII_PATTERNS
    }


def redact(text_col: Column) -> Column:
    """Text with every PII span replaced by ``<KIND>`` tags, applied in
    pattern-table order."""
    out = text_col
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_scan(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_redacted: bool = True,
) -> DataFrame:
    """Per-doc PII report: one count column per kind, total, a boolean
    ``has_pii``, and (optionally) the redacted text.  One scan, no shuffle.
    """
    counts = pii_counts(F.col(text_col))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    cols = [
        F.col(id_col),
        *[c.alias(f"n_{kind}") for kind, c in counts.items()],
        total.alias("n_pii"),
        (total > 0).cast("int").alias("has_pii"),
    ]
    if with_redacted:
        cols.append(redact(F.col(text_col)).alias("redacted_text"))
    return df.select(*cols)
