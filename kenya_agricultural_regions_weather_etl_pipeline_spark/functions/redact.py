"""PII detection / redaction expressions for corpus cleaning.

Standard pre-training hygiene: strip emails, phone numbers, and long
digit runs (account/ID numbers) from text before it reaches a training
set. All expressions are native ``regexp_replace`` / ``regexp_count``
built-ins — JVM regex, whole-stage codegen, zero Python on the hot
path; at 100 TB this is a pure map stage fused into the scan.

Regex dialect note: patterns restrict themselves to character classes,
alternation, and counted quantifiers — the subset Java's regex and
DuckDB's RE2 interpret identically — so the DuckDB oracle applies the
SAME pattern verbatim (DuckDB needs the explicit 'g' flag; Spark's
regexp_replace is global by default).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
# the reference corpus formats phones as nn-nnn-nnn-nnnn (TPC-H c_phone)
PHONE_RE = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
DIGIT_RUN_RE = "[0-9]{6,}"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
NUMBER_TOKEN = "<NUM>"


def redact_text(text: Column) -> Column:
    """Replace emails → <EMAIL>, phones → <PHONE>, digit runs → <NUM>.

    Order matters: phones before digit runs, else the run pattern eats
    phone fragments.
    """
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
    return F.regexp_replace(out, DIGIT_RUN_RE, NUMBER_TOKEN)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-row hit counts for each PII class (audit columns)."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_phones": F.regexp_count(text, F.lit(PHONE_RE)),
        "n_digit_runs": F.regexp_count(
            F.regexp_replace(text, PHONE_RE, PHONE_TOKEN), F.lit(DIGIT_RUN_RE)
        ),
    }


def mask_keep_last(col: Column, keep: int = 4, mask_char: str = "*") -> Column:
    """Mask all but the trailing ``keep`` characters (card/phone style)."""
    n = F.length(col)
    return F.concat(
        F.repeat(F.lit(mask_char), F.greatest(n - keep, F.lit(0))),
        F.substring(col, -keep, keep),
    )


def redact_text_sql(text: str) -> str:
    """DuckDB twin of :func:`redact_text` (same patterns, 'g' flag)."""
    out = f"regexp_replace({text}, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g')"
    out = f"regexp_replace({out}, '{PHONE_RE}', '{PHONE_TOKEN}', 'g')"
    return f"regexp_replace({out}, '{DIGIT_RUN_RE}', '{NUMBER_TOKEN}', 'g')"


def mask_keep_last_sql(col: str, keep: int = 4, mask_char: str = "*") -> str:
    return (
        f"repeat('{mask_char}', greatest(length({col}) - {keep}, 0)) || "
        f"substr({col}, length({col}) - {keep} + 1, {keep})"
    )
