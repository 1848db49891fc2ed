"""Text normalization & tokenization as columnar Spark expressions.

Semantics follow the reference exactly (the per-url byte-identical
invariant surface):

- Normalize  (ref: EntityMatch/EntityMatch/Language.cs:25-35):
    phrase.Trim().ToLower()  then strip parenthesized substrings with
    the regex  \\([^)]*\\)   (all occurrences).
- WordBreak  (ref: Language.cs:18-23):
    tokens are maximal  \\w+  runs over the normalized phrase, with
    char offsets preserved.

Everything stays JVM-side (regexp_replace / regexp_extract_all inside
whole-stage codegen); the offsets variant needs per-match indices that
Spark's regex builtins don't expose, so it is a batched Arrow pandas UDF
(never per-row Python).

Regex note: Java (Spark), RE2 (DuckDB oracle) and C# agree that the
fixtures' tokens are ASCII \\w = [A-Za-z0-9_]; the Python UDF pins
re.ASCII so all four engines tokenize identically.

Trim note: the reference's Trim() strips Unicode whitespace
(Char.IsWhiteSpace). Spark's bare ``trim`` and DuckDB's bare ``trim``
strip SPACES ONLY — so "\\tfoo" / "bar\\n" edges used to keep their
tabs/newlines on the engine side while the Python twin (str.strip())
dropped them. The engine pins the ASCII-WHITESPACE surface
(``ASCII_WS``): Spark charset trim, DuckDB ``trim(text, chars)``, and
Python ``strip(ASCII_WS)`` all agree byte-for-byte, and match C# on
every ASCII input (fixtures are ASCII by design). Unicode-only
whitespace (U+00A0 etc.) is outside the pinned surface: all three
engines here KEEP it, C# would strip it — documented residual.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

NORMALIZE_PAREN_RE = r"\([^)]*\)"
TOKEN_RE = r"\w+"
# The pinned trim charset (see module docstring). \x0b == \v; Java
# regex treats a bare \v as a character CLASS, so the regex below
# embeds the raw charset bytes in its character class instead.
ASCII_WS = " \t\n\r\f\x0b"
# Edge-anchored charset trim as ONE global regexp (Spark's two-arg
# trim() signature is deprecated in 4.x; this stays codegen'd and is
# byte-equivalent for any charset without regex metacharacters).
# \z, NOT $: Java's $ also matches BEFORE a final Unicode line
# terminator (U+0085/U+2028/U+2029), so 'ab \x85' would lose its
# space on the engine while py_normalize and the DuckDB charset trim
# keep it — \z anchors at true end-of-input on all inputs.
_TRIM_RE = f"^[{ASCII_WS}]+|[{ASCII_WS}]+\\z"

_PY_PAREN_RE = re.compile(r"\([^)]*\)")
_PY_TOKEN_RE = re.compile(r"\w+", re.ASCII)


def normalize_text(col: Column | str) -> Column:
    """trim -> lower -> strip parens (ref: Language.cs:32).

    ASCII-whitespace charset trim, NOT bare F.trim (spaces only) — see
    the module docstring's trim note."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.lower(F.regexp_replace(c, _TRIM_RE, "")), NORMALIZE_PAREN_RE, ""
    )


def tokenize(col: Column | str, *, normalize: bool = True) -> Column:
    """array<string> of \\w+ tokens (ref: Language.cs:18-23)."""
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = normalize_text(c)
    return F.regexp_extract_all(c, F.lit(TOKEN_RE), 0)


def py_normalize(s: str) -> str:
    """Driver/test-side reference reimplementation (golden oracle).

    strip(ASCII_WS), not bare strip(): Python's strip() also removes
    \\x1c-\\x1f, \\x85 and Unicode spaces, which the Java/DuckDB charset
    trims keep — the pinned surface is ASCII whitespace only."""
    return _PY_PAREN_RE.sub("", s.strip(ASCII_WS).lower())


def py_tokenize(s: str, *, normalize: bool = True) -> list[str]:
    if normalize:
        s = py_normalize(s)
    return _PY_TOKEN_RE.findall(s)


_tokenize_offsets_udf = None


def tokenize_with_offsets(col: Column | str) -> Column:
    """Token + char offsets into the *normalized* text, mirroring the
    reference Token(value, index, length) (ref: Interfaces.cs:9-25).

    Arrow-batched pandas UDF (schema parsing needs an active session, so
    the UDF is built lazily on first use); offsets refer to the
    normalized string, as in the reference where WordBreak runs on the
    normalized phrase.
    """
    global _tokenize_offsets_udf
    if _tokenize_offsets_udf is None:

        def _batch(texts: pd.Series) -> pd.Series:
            def one(s: str | None):
                if s is None:
                    return None  # NULL in, NULL out — same as tokenize()
                # THE normalizer, not an inline copy: offsets must be
                # computed against the same bytes the rest of the
                # pipeline tokenizes
                norm = py_normalize(s)
                return [
                    {"token": m.group(0), "start": m.start(), "length": m.end() - m.start()}
                    for m in _PY_TOKEN_RE.finditer(norm)
                ]

            return texts.map(one)

        _tokenize_offsets_udf = F.pandas_udf(
            _batch, "array<struct<token:string,start:int,length:int>>"
        )
    c = F.col(col) if isinstance(col, str) else col
    return _tokenize_offsets_udf(c)


def ngram_expr(tokens_col: str, n: int) -> Column:
    """array<string> of space-joined word n-grams over a token-array
    column (empty when the doc has fewer than n tokens). THE shingle
    construction — the dedup family (ngram_jaccard_pairs), winnowing
    fingerprints, decontamination, and repetition signals all build
    their grams here, so "what is an n-gram" cannot drift between the
    operators that must agree on it."""
    return F.when(
        F.size(tokens_col) < n, F.array().cast("array<string>")
    ).otherwise(
        F.expr(
            f"transform(sequence(0, size({tokens_col}) - {n}), i -> "
            + f"concat_ws(' ', {', '.join(f'{tokens_col}[i+{j}]' for j in range(n))}))"
        )
    )
