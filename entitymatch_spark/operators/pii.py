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
# Phone-SHAPED forms only, as an ordered alternation (leftmost-first
# semantics agree between Java and RE2; no lookaround/backrefs, which
# RE2 lacks). Each alternative requires a structural phone signal —
# a '+' country prefix, a parenthesized area code, a 3-3-4 / 3-4-4
# digit grouping, a 9-15 digit contiguous run, or a dash-required
# 7-digit local — instead of the old "any 9+ digits with free
# single separators", which jumped across token boundaries and
# rewrote date+number adjacencies ('2026-08-18 4' -> '<PHONE>'),
# year-range+count ('2020-2021 19'), and ISBNs to <PHONE>.
# ISO dates (4-2-2), year ranges (4-4), and ISBN grouping (3-1-3-5-1)
# match none of these shapes; grouped number LISTS that exactly mimic
# a phone grouping ('100 200 3000', '2026 123 4567', '12 34 56 78 90'
# tables) still mask — that residue is the documented precision floor
# of a regex-only scrub (swap in an NER pass for more). Order matters
# within the alternation: at the same start offset the first
# alternative wins, so wider forms precede the 7-digit local rule
# ('555-867-5309' must be one 3-3-4 match, not '<PHONE>-5309').
PHONE_RE = (
    r"\+\d{1,3}[ -]?\d(?:[ -]?\d){7,12}\b"            # +cc, free single seps
    r"|\+\d{1,3}[ -]?\(0\)[ -]?\d(?:[ -]?\d){5,12}\b"  # +cc (0) trunk prefix
    r"|\(\d{3}\)[ -]?\d{3}[- ]?\d{4}\b"      # (area) grouped
    r"|\b\d{3,4}[-. ]\d{3}[-. ]\d{4}\b"      # 3/4-3-4 grouped (NANP, UK geo)
    r"|\b\d{3}[- ]\d{4}[- ]\d{4}\b"          # 3-4-4 grouped (UK style)
    r"|\b\d{4,5}[ -]\d{6}\b"                 # 4/5-6 grouped (UK mobile)
    r"|\b\d{2}(?:[ -]\d{2}){4}\b"            # 2-2-2-2-2 pairs (FR style)
    r"|\b\d{9,15}\b"                         # bare contiguous MSISDN run
    r"|\b\d{3}-\d{4}\b"                      # 7-digit local, dash REQUIRED
)

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
    custom_rules: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """(id, redacted, n_email, n_ip, n_phone[, n_<custom>...]): text with
    PII masked by typed placeholders plus per-category counts (counted
    BEFORE masking, on the stage each rule actually sees — the audit
    numbers a scrub job reports).

    ``custom_rules``: extra ``(name, java_regex, placeholder)`` rules
    appended AFTER the built-ins (so they see built-in placeholders, not
    raw emails/phones), each masking and auditing like the built-ins —
    the extension seam for site ids, national id formats, or an
    NER-derived pattern list, without forking this module. Names must
    not collide with built-ins or each other."""
    rules = list(_RULES)
    if custom_rules:
        seen = {name for name, _, _ in rules}
        for rule in custom_rules:
            name, pattern, token = rule  # fail fast on bad shape
            if name in seen:
                raise ValueError(f"duplicate redaction rule name {name!r}")
            seen.add(name)
            rules.append((name, pattern, token))
    out = docs.select(F.col(id_col), F.col(text_col).alias("redacted"))
    counts = []
    for name, pattern, token in rules:
        out = out.withColumn(f"n_{name}", _count("redacted", pattern))
        # Java replacement-string semantics make '$' and '\' special
        # (group refs / escapes): quote them so a literal placeholder
        # like '$PRICE' masks instead of throwing IllegalArgumentException
        # mid-task (no-op for the built-in <...> tokens)
        literal_token = token.replace("\\", "\\\\").replace("$", "\\$")
        out = out.withColumn(
            "redacted", F.regexp_replace("redacted", pattern, literal_token)
        )
        counts.append(f"n_{name}")
    return out.select(id_col, "redacted", *[F.col(c).cast("long") for c in counts])
