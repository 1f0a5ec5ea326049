"""PII detection + redaction for training-data pipelines: emails, IPv4
addresses, US-style phone numbers. Pure Catalyst ``regexp_replace`` /
``regexp_extract_all`` — JVM-side, whole-stage codegen, zero shuffles
(a pure map over the corpus scan at 100 TB).

Patterns deliberately use only the regex subset shared by Java
(Spark) and RE2 (DuckDB) — character classes, bounded repetition,
``\\b`` word boundaries; no lookaround or backreferences — so the SQL
oracle runs the IDENTICAL pattern strings.

Redaction order matters and is fixed: emails first (an email's
user/host can contain digit runs that would otherwise partially match
the phone/IP patterns), then IPv4, then phone.

The reference engine stores raw review text verbatim; PII scrubbing is
part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — order is the redaction order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def with_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(+) n_email, n_ipv4, n_phone — match counts per PII class.

    Counts are measured on the PROGRESSIVELY REDACTED text (each class
    counted after the previous classes were replaced), mirroring the
    redaction pass exactly: an address inside an email never double
    counts as an IP."""
    cur = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).cast("long"),
        )
        cur = F.regexp_replace(cur, pat, repl)
    return out


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(+) per-class counts and ``text_redacted`` with every match
    replaced by its placeholder token."""
    out = with_pii_counts(df, text_col)
    cur = F.coalesce(F.col(text_col), F.lit(""))
    for _, pat, repl in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, repl)
    return out.withColumn("text_redacted", cur)
