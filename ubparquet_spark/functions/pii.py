"""PII redaction over text columns — pre-training hygiene plumbing.

A production LLM data pipeline scrubs personally identifiable information
(emails, phone numbers, IPs, SSNs, card numbers) before training. This
module is the Spark-side plumbing: a chain of ``regexp_replace`` calls plus
per-pattern match counts, all JVM-side regex (whole-stage codegen, no
Python UDFs) — a narrow per-row map with zero shuffles, so it composes with
any scan and scales linearly.

The synthetic ``documents`` corpus contains no PII by construction, so this
is exercised by crafted fixtures in ``tests/test_pii.py`` rather than a
registry query (an all-zero oracle row would prove nothing).

Semantics:

- counts (``n_<name>``) are computed against the ORIGINAL text, per
  pattern, independently — overlapping patterns may each count the same
  span;
- redaction applies patterns IN ORDER to a running value, so an earlier
  pattern's replacement token can preempt a later pattern's match (e.g. the
  digits of an already-redacted phone number are gone before the card
  pattern runs);
- ``scrub_text`` is idempotent: replacement tokens contain no characters
  that any default pattern matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, regex, replacement) — Java regex syntax; every construct used here
#: (classes, bounded quantifiers, \b anchors, non-capturing groups) behaves
#: identically in RE2, so the patterns port to engines like DuckDB as-is.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # cards BEFORE phones: a 4-4-4-4 grouped card would otherwise have its
    # first 10 digits eaten by the separator-tolerant phone pattern.
    # Covers unbroken 13-16 digit runs AND the common 4-4-4-4 grouped form
    # (space or dash separated).
    ("card", r"\b(?:\d{4}[- ]){3}\d{4}\b|\b\d{13,16}\b", "<CARD>"),
    # separator-formatted (555-123-4567 / 555.123.4567), optional +1 /
    # parenthesized area code, AND bare 10-digit runs.  Bare runs are
    # anchored so they don't fire inside longer digit strings (those are
    # card/other territory).
    (
        "phone",
        r"(?:\+?1[-. ])?\(?\b\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b|\b\d{10}\b",
        "<PHONE>",
    ),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def pii_counts(
    df: DataFrame,
    col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """``df`` + one ``n_<name>`` long column per pattern: match counts
    against the original ``col`` (no redaction)."""
    return df.withColumns(
        {
            f"n_{name}": F.regexp_count(F.col(col), F.lit(pat)).cast("long")
            for name, pat, _repl in patterns
        }
    )


def scrub_text(
    df: DataFrame,
    col: str = "text",
    out_col: str | None = None,
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
    with_counts: bool = True,
) -> DataFrame:
    """Redact every pattern match in ``col`` into ``out_col`` (defaults to
    replacing ``col`` in place), optionally adding per-pattern match counts.

    One narrow projection: N ``regexp_count`` + N chained ``regexp_replace``
    expressions, no shuffle, no Python in the row path.
    """
    out_col = out_col or col
    if with_counts:
        df = pii_counts(df, col, patterns)
    redacted = F.col(col)
    for _name, pat, repl in patterns:
        redacted = F.regexp_replace(redacted, pat, repl)
    return df.withColumn(out_col, redacted)
