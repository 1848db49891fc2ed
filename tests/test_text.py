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
    """html carries the entity-escaped text inside a head/body/script
    wrapper; the python-side inverse reproduces text exactly (the
    Spark-side inverse is functions/html.html_to_text, tested below)."""
    import re

    fx = generate_corpus(n_clusters=10, seed=42)
    for _, row in fx.pages.head(20).iterrows():
        page = bytes(row["html"]).decode("utf-8")
        m = re.search(r"<p[^>]*>(.*?)</p>", page, re.S)
        assert m is not None
        unesc = (
            m.group(1).replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
        )
        assert unesc == row["text"]


def test_html_to_text_byte_identical_on_corpus(spark):
    """input_hint invariant: extracting text from the raw html bytes
    reproduces the stored text column byte-for-byte, for every url."""
    from entitymatch_spark.functions.html import html_to_text
    from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

    fx = generate_corpus(n_clusters=40, seed=17)
    pages = corpus_to_spark(spark, fx)["pages"]
    bad = (
        pages.withColumn("ext", html_to_text(F.decode("html", "utf-8")))
        .filter(F.col("ext") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_html_to_text_goldens(spark):
    from entitymatch_spark.functions.html import html_to_text

    cases = [
        ("<html><body>plain</body></html>", "plain"),
        ("<body>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#x27;</body>", "a & b <tag> \"q\" 's'"),
        ("<head><title>skip me</title></head><body>kept</body>", "kept"),
        ("<body>one<script>var x='<b>no</b>';</script>two</body>", "onetwo"),
        ("<body>x<style>p{}</style>y<!-- z -->w</body>", "xyw"),
        ("<BODY><P CLASS='a'>upper</P></BODY>", "upper"),
        ("&amp;lt;", "&lt;"),  # double-escape survives (amp last)
        # hostile/truncated markup: unclosed sections drop to EOF
        # instead of leaking raw script/style bytes into "text"
        ("<body>seen<script>var y=1;", "seen"),
        ("<body>kept<style>p{color:red}", "kept"),
        ("<head><title>cut off page", ""),
        ("<body>a<!-- unterminated comment", "a"),
        # nested tags inside removed sections
        ("<body>u<script>if(a<b){<i>x</i>}</script>v</body>", "uv"),
        # numeric entities (decimal + hex forms of the named set)
        ("&#60;tag&#62; &#34;q&#34; &#x27;s&#X27; &#38;", "<tag> \"q\" 's' &"),
        ("&#160;nb&#xa0;sp", " nb sp"),
        # words starting with 'head'/'script' are NOT section tags
        ("<body><heading>hx</heading></body>", "hx"),
    ]
    df = spark.createDataFrame(cases, "html string, want string")
    got = df.select(html_to_text("html").alias("g"), "want").collect()
    for r in got:
        assert r["g"] == r["want"], (r["g"], r["want"])
    # collapse_ws variant
    one = spark.createDataFrame(
        [("<body>  a\n\n<b>b</b>   c </body>",)], "html string"
    ).select(html_to_text("html", collapse_ws=True).alias("g")).collect()[0]["g"]
    assert one == "a b c"


def test_normalize_trim_charset_three_engine_agreement(spark):
    """The ASCII-whitespace trim surface: Spark charset trim, the DuckDB
    oracle's NORM fragment, and py_normalize must agree byte-for-byte on
    leading/trailing \\t \\n \\r \\f \\x0b — the edge where bare
    trim()/strip() used to diverge (spaces-only vs all-whitespace).
    Unicode-only whitespace (U+00A0) is OUTSIDE the pinned surface: all
    three engines keep it (the reference's C# Trim would strip it —
    documented residual, functions/text.py module docstring)."""
    import random

    import duckdb

    import __spark_entry__ as entry

    edges = [
        "\tfoo", "bar\n", "\r\nBoth (x)\t", "\x0bvt", "\fff\f",
        " \t mixed \n ", "\t", "", " ", "a\u00a0b", "\u00a0nbsp kept\u00a0",
    ]
    rng = random.Random(99)
    chars = "ab (x)\t\n\r\f\x0b _A."
    fuzz = ["".join(rng.choice(chars) for _ in range(rng.randrange(0, 30)))
            for _ in range(400)]
    cases = edges + fuzz

    df = spark.createDataFrame([(s,) for s in cases], "text string")
    spark_norm = [r[0] for r in df.select(normalize_text("text")).collect()]
    py_norm = [py_normalize(s) for s in cases]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"(?)" for _ in cases)
                + ") t(text)", cases)
    duck_norm = [r[0] for r in con.execute(
        f"SELECT {entry.NORM} FROM documents").fetchall()]

    assert spark_norm == py_norm == duck_norm
    # the NBSP case proves the pinned surface keeps Unicode whitespace
    assert py_normalize("\u00a0nbsp kept\u00a0") == "\u00a0nbsp kept\u00a0"


def test_html_comment_section_interactions(spark):
    """Comments are stripped BEFORE sections: a commented-out script
    include must not trigger the unclosed-script drop-to-EOF, and the
    legacy <script><!-- code //--></script> hiding idiom reduces to a
    clean empty pair."""
    from entitymatch_spark.functions.html import html_to_text

    cases = [
        ("before <!-- <script src=x> --> after", "before  after"),
        ("<body>a<script><!-- var x=1; //--></script>b</body>", "ab"),
        ("<!-- <head> --><body>kept</body>", "kept"),
        ("<!-- <style> -->s<style>p{}</style>t", "st"),
    ]
    df = spark.createDataFrame(cases, "html string, want string")
    for r in df.select(html_to_text("html").alias("g"), "want").collect():
        assert r["g"] == r["want"], (r["g"], r["want"])


def test_trim_anchors_at_true_end_of_input(spark):
    """Java's $ matches BEFORE a final Unicode line terminator
    (U+0085/U+2028/U+2029); the engine trim must anchor at \\z so
    'ab \\x85' keeps its space on all three engines."""
    from entitymatch_spark.functions.text import normalize_text, py_normalize

    cases = ["ab \x85", "ab\t ", "ab \r\x85", "ab  ", "ab  "]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = [r["n"] for r in df.select(normalize_text("text").alias("n")).collect()]
    want = [py_normalize(c) for c in cases]
    assert got == want, list(zip(got, want))


def test_tokenize_offsets_null_matches_tokenize(spark):
    """Both tokenizers agree on NULL documents: NULL in, NULL out."""
    from pyspark.sql import functions as F

    from entitymatch_spark.functions.text import tokenize, tokenize_with_offsets

    df = spark.createDataFrame([(1, None), (2, "a b")], "id long, text string")
    rows = {
        r["id"]: (r["t"], r["o"])
        for r in df.select(
            "id",
            tokenize("text").alias("t"),
            tokenize_with_offsets("text").alias("o"),
        ).collect()
    }
    assert rows[1] == (None, None)
    assert [x["token"] for x in rows[2][1]] == rows[2][0] == ["a", "b"]
