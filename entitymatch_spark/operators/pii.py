"""PII redaction: replace emails / IPv4 addresses / phone-shaped
numbers with typed placeholders, and count what was redacted.

The standard pre-training scrub (C4 and successors strip or mask
contact strings before text ever reaches a trainer). Pure JVM
``regexp_replace`` chains — per-row narrow column math, no UDF, valid
in streaming plans; the patterns stay inside the regex subset that
Java regex and RE2-family engines interpret identically (ASCII
classes, bounded quantifiers, word boundaries), so an external SQL
oracle reproduces the redaction byte-for-byte.

Order matters: IPv4 runs before phone, else the phone pattern eats
dotted octets ("10.0.3.1" is 7+ digits with separators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# 9+ digits with optional single spaces/dashes between them, optional
# leading +; anchored on word boundaries to avoid eating digit runs
# inside longer tokens. The 9-digit floor keeps ISO dates (8 digits:
# 2026-08-18) and year ranges (2020-2021) out of the mask — real
# phone numbers carry 9+ digits with country/area codes. Precision
# over recall: a training-corpus scrub that rewrites every date to
# <PHONE> does more damage than missing a 7-digit local number; swap
# in an NER pass if higher recall is required.
PHONE_RE = r"\+?\b\d(?:[ -]?\d){8,}\b"

_RULES = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def _count(col, pattern: str) -> Column:
    # lit-parameterized (an inline F.expr SQL literal would re-escape
    # the backslashes)
    return F.regexp_count(F.col(col), F.lit(pattern))


def redact_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, redacted, n_email, n_ip, n_phone): text with PII masked by
    typed placeholders plus per-category counts (counted BEFORE
    masking, on the stage each rule actually sees — the audit numbers
    a scrub job reports)."""
    out = docs.select(F.col(id_col), F.col(text_col).alias("redacted"))
    counts = []
    for name, pattern, token in _RULES:
        out = out.withColumn(f"n_{name}", _count("redacted", pattern))
        out = out.withColumn(
            "redacted", F.regexp_replace("redacted", pattern, token)
        )
        counts.append(f"n_{name}")
    return out.select(id_col, "redacted", *[F.col(c).cast("long") for c in counts])
