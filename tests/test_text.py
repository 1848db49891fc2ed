"""Golden tests for normalize/tokenize vs a reference reimplementation.

The invariant (BASELINE.json input_hint): extracted/normalized text is
byte-identical per url vs the reference semantics
(trim -> lower -> strip \\([^)]*\\), then \\w+ word break;
ref: EntityMatch/EntityMatch/Language.cs:18-35).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from entitymatch_spark.functions.text import (
    normalize_text,
    py_normalize,
    py_tokenize,
    tokenize,
    tokenize_with_offsets,
)
from entitymatch_spark.sources.synthetic import generate_corpus

GOLDEN = [
    ("  The Dark Knight (2008 film) rises ", "the dark knight  rises"),
    ("A(b)C(d)e", "ace"),
    ("no parens here", "no parens here"),
    ("(all gone)", ""),
    ("Tabs\tand  spaces", "tabs\tand  spaces"),
    ("UPPER lower MiXeD", "upper lower mixed"),
    ("dangling (open paren", "dangling (open paren"),  # unclosed paren is kept
    ("nested (a (b) c)", "nested  c)"),  # regex is non-nesting, like the reference
    ("punct, stays; here!", "punct, stays; here!"),
]


def test_normalize_golden(spark):
    df = spark.createDataFrame([(s,) for s, _ in GOLDEN], "text string")
    got = [r[0] for r in df.select(normalize_text("text")).collect()]
    want = [w for _, w in GOLDEN]
    assert got == want
    # and the python reimplementation agrees byte-for-byte
    assert [py_normalize(s) for s, _ in GOLDEN] == want


def test_tokenize_golden(spark):
    cases = [
        ("The Dark Knight (2008) Rises!", ["the", "dark", "knight", "rises"]),
        ("ab_1 c-d", ["ab_1", "c", "d"]),
        ("", []),
        ("(x)", []),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "text string")
    got = [r[0] for r in df.select(tokenize("text")).collect()]
    assert got == [w for _, w in cases]
    assert [py_tokenize(s) for s, _ in cases] == [w for _, w in cases]


def test_tokenize_offsets(spark):
    df = spark.createDataFrame([(" Hello (x) world_1 ",)], "text string")
    rows = df.select(tokenize_with_offsets("text").alias("t")).collect()[0][0]
    norm = py_normalize(" Hello (x) world_1 ")
    assert norm == "hello  world_1"
    assert [(t["token"], t["start"], t["length"]) for t in rows] == [
        ("hello", 0, 5),
        ("world_1", 7, 7),
    ]
    for t in rows:
        assert norm[t["start"] : t["start"] + t["length"]] == t["token"]


def test_corpus_normalization_byte_identical(spark):
    """Spark-side normalization of every generated page equals the
    python reference reimplementation, byte for byte per url."""
    fx = generate_corpus(n_clusters=40, seed=42)
    df = spark.createDataFrame(
        fx.pages[["url", "text"]], schema="url string, text string"
    )
    got = {
        r["url"]: r["norm"]
        for r in df.select("url", normalize_text("text").alias("norm")).collect()
    }
    for _, row in fx.pages.iterrows():
        assert got[row["url"]] == py_normalize(row["text"])


def test_corpus_determinism():
    a = generate_corpus(n_clusters=25, seed=7)
    b = generate_corpus(n_clusters=25, seed=7)
    assert a.pages.equals(b.pages)
    assert a.labels.equals(b.labels)
    c = generate_corpus(n_clusters=25, seed=8)
    assert not a.pages["text"].equals(c.pages["text"])


def test_html_roundtrip():
    fx = generate_corpus(n_clusters=10, seed=42)
    for _, row in fx.pages.head(20).iterrows():
        assert bytes(row["html"]).decode("utf-8") == f"<html><body>{row['text']}</body></html>"
