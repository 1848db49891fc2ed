"""HTML -> text extraction as pure column expressions.

The input_hint corpus carries raw page bytes (``html binary``) next to
the extracted ``text``; the per-row invariant is byte-identical
extracted text per url. This extractor is the deterministic inverse of
the synthetic generator's page wrapper (head with title/style, body
with entity-escaped text, trailing script), built entirely from
regexp_replace chains — whole-stage codegen, no UDF, valid in
Structured Streaming.

Not a general-purpose HTML5 parser (no external libs in this
container); it handles the common extraction steps in the order a real
one would: drop non-content sections (head / script / style /
comments), strip tags, unescape entities (&amp; last, so escaped
entity names survive), collapse the whitespace that tag removal leaves
behind.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def html_to_text(col: str | Column, collapse_ws: bool = False) -> Column:
    """Extract readable text from an HTML string column.

    collapse_ws: also trim + collapse whitespace runs to single spaces
    (OFF by default — the byte-identical invariant needs the exact
    body whitespace preserved).
    """
    c = F.col(col) if isinstance(col, str) else col
    # drop non-content sections (dotall + case-insensitive)
    c = F.regexp_replace(c, r"(?is)<head\b.*?</head>", "")
    c = F.regexp_replace(c, r"(?is)<script\b.*?</script>", "")
    c = F.regexp_replace(c, r"(?is)<style\b.*?</style>", "")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", "")
    # strip remaining tags
    c = F.regexp_replace(c, r"(?s)<[^>]*>", "")
    # entities: named subset + numeric; &amp; LAST so "&amp;lt;" -> "&lt;"
    c = F.regexp_replace(c, r"&nbsp;", " ")
    c = F.regexp_replace(c, r"&lt;", "<")
    c = F.regexp_replace(c, r"&gt;", ">")
    c = F.regexp_replace(c, r"&quot;", '"')
    c = F.regexp_replace(c, r"&#0*39;|&#x0*27;", "'")
    c = F.regexp_replace(c, r"&amp;", "&")
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c
