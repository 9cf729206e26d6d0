"""PII detection / redaction for corpus pipelines.

Scrubs the two PII shapes the testdata actually contains (email addresses
and numeric identifiers) with patterns chosen to behave identically under
Java regex (Spark) and RE2 (DuckDB): no backreferences, no lookaround, no
\\s (Java's \\s matches \\x0B, RE2's does not -- see README determinism
rules), ASCII character classes only. A production pipeline extends
``PII_PATTERNS`` with phone/SSN/IP shapes the same way.

Redaction order matters and is part of the operator contract: emails are
replaced first (their local/domain parts contain digits), then remaining
digit runs -- so ``n_id_runs`` counts only non-email numbers. The redacted
text is fingerprinted (md5 -> 60-bit int) so the differential gate proves
byte-identical redaction, not just equal counts.

Scale: pure per-row Column expressions (regexp_extract_all / regexp_replace
are codegen'd JVM work) -- no shuffle, no Python, streams through a 100 TB
scan at full parquet read speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, md5_long_sql

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
DIGITS_RE = "[0-9]+"
EMAIL_TAG = "<EMAIL>"
NUM_TAG = "<NUM>"


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per row: email / digit-run match counts, the redacted text, and its
    fingerprint. Emails first, then digit runs over the email-redacted text."""
    from ..sources.loaders import widen_scan

    df = widen_scan(df)
    raw = F.col(text_col)
    no_email = F.regexp_replace(raw, EMAIL_RE, EMAIL_TAG)
    clean = F.regexp_replace(no_email, DIGITS_RE, NUM_TAG)
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(raw, F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(DIGITS_RE), F.lit(0))).alias(
            "n_id_runs"
        ),
        F.length(clean).alias("redacted_len"),
        md5_long(clean).alias("redacted_fp"),
    )


def pii_scrub_sql(table_expr: str, id_col: str, text_expr: str) -> str:
    """DuckDB twin. ``table_expr`` is a table name or parenthesized subquery;
    ``text_expr`` a SQL expression for the text. DuckDB regexp_replace needs
    the explicit 'g' flag (Spark replaces globally by default)."""
    no_email = f"regexp_replace({text_expr}, '{EMAIL_RE}', '{EMAIL_TAG}', 'g')"
    clean = f"regexp_replace({no_email}, '{DIGITS_RE}', '{NUM_TAG}', 'g')"
    return f"""
SELECT {id_col},
       len(regexp_extract_all({text_expr}, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all({no_email}, '{DIGITS_RE}')) AS n_id_runs,
       length({clean}) AS redacted_len,
       {md5_long_sql(clean)} AS redacted_fp
FROM {table_expr}
"""
