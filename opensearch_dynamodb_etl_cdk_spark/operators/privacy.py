"""PII detection and redaction for training-data pipelines.

Pre-training corpora are scrubbed of obvious personal identifiers
before tokenization (emails, phone numbers, IP addresses are the
standard regex-detectable classes). Everything here is JVM-side
``regexp_*`` column expressions — the scrub pipelines into the scan
with zero shuffles and zero Python, so a 100 TB corpus pays exactly
one pass.

Regex dialect discipline: patterns are restricted to the syntax both
Java's regex engine (Spark) and RE2 (the DuckDB oracle) implement
identically — character classes, bounded repetition, alternation and
``\\b`` word boundaries; NO lookaround/backreferences (absent from
RE2). Both engines scan leftmost, non-overlapping, greedy, so match
counts and replacements agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Class → (pattern, replacement token). Order matters for redact_pii:
# emails first so their user/host digits are gone before the phone/IP
# scans run over the remaining text.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)*\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}[ .-]?(\([0-9]{2,3}\)|[0-9]{2,3})[ .-]?[0-9]{3}[ .-]?[0-9]{2,4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (EMAIL_RE, "<EMAIL>"),
    "phone": (PHONE_RE, "<PHONE>"),
    "ipv4": (IPV4_RE, "<IP>"),
}


def pii_count(col: Column, kind: str) -> Column:
    """Non-overlapping match count of one PII class in a text column."""
    pattern, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast("bigint")


def redact_pii(col: Column, kinds: tuple[str, ...] = ("email", "phone", "ipv4")) -> Column:
    """Replace every PII match with its class token, in declaration
    order (one chained expression — still a single projection)."""
    out = col
    for kind in kinds:
        pattern, token = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_report(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-group scrub audit: documents scanned, documents carrying any
    PII, and match counts per class — the numbers a privacy review
    actually asks for. One aggregation pass; counts, never text, leave
    the executors."""
    t = F.col(text_col)
    e, p, i = (pii_count(t, k) for k in ("email", "phone", "ipv4"))
    return (
        df.select(F.col(group_col), e.alias("_e"), p.alias("_p"), i.alias("_i"))
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                ((F.col("_e") + F.col("_p") + F.col("_i")) > 0).cast("bigint")
            ).alias("docs_with_pii"),
            F.sum("_e").alias("n_emails"),
            F.sum("_p").alias("n_phones"),
            F.sum("_i").alias("n_ipv4"),
        )
    )
