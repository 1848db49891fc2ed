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

Supported subset (documented contract):

- sections: head/script/style pairs, including UNCLOSED open tags
  (truncated pages — everything from the dangling open tag to EOF is
  dropped, which is what a streaming extractor does on a cut-off page);
  comments ``<!-- -->``.
- entities: the named set &nbsp; &lt; &gt; &quot; &amp; plus the
  decimal/hex NUMERIC forms of those same characters (&#60; &#x3C;
  &#34; &#39; &#38; ...). Arbitrary numeric code points beyond this set
  are NOT decoded (regexp_replace cannot compute chr(n)); a corpus
  needing full numeric-entity decoding would swap in a pandas-UDF
  decoder at the same call site.
- no CDATA, no SVG/MathML foreign content, no attribute-aware parsing
  (a literal '>' inside an attribute value ends the tag early).
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
    # drop non-content sections (dotall + case-insensitive); the second
    # alternative of each pattern handles an UNCLOSED open tag by
    # dropping through end-of-input (truncated/hostile pages must not
    # leak raw script/style bytes into the "text").
    # COMMENTS FIRST: a commented-out include ("<!-- <script src=x> -->")
    # must not let the unclosed-script rule eat the rest of the page,
    # and the legacy "<script><!-- code //--></script>" hiding idiom
    # reduces to an empty script pair. Residual (documented): a script
    # body containing "<!--" with NO later "-->" anywhere in the
    # document merges the comment-to-EOF drop with the script rule and
    # over-trims — the mirrored case of the order this replaces, but
    # the far rarer one in web text.
    c = F.regexp_replace(c, r"(?s)<!--.*?-->|<!--.*$", "")
    c = F.regexp_replace(c, r"(?is)<head\b.*?</head>|<head\b.*$", "")
    c = F.regexp_replace(c, r"(?is)<script\b.*?</script>|<script\b.*$", "")
    c = F.regexp_replace(c, r"(?is)<style\b.*?</style>|<style\b.*$", "")
    # strip remaining tags
    c = F.regexp_replace(c, r"(?s)<[^>]*>", "")
    # entities: named subset + the numeric (decimal/hex) forms of the
    # same characters; &amp;/&#38; LAST so "&amp;lt;" -> "&lt;"
    c = F.regexp_replace(c, r"&nbsp;|&#0*160;|&#[xX]0*[aA]0;", " ")
    c = F.regexp_replace(c, r"&lt;|&#0*60;|&#[xX]0*3[cC];", "<")
    c = F.regexp_replace(c, r"&gt;|&#0*62;|&#[xX]0*3[eE];", ">")
    c = F.regexp_replace(c, r"&quot;|&#0*34;|&#[xX]0*22;", '"')
    c = F.regexp_replace(c, r"&#0*39;|&#[xX]0*27;", "'")
    c = F.regexp_replace(c, r"&amp;|&#0*38;|&#[xX]0*26;", "&")
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c
