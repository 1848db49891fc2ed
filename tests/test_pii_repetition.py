"""PII redaction (operators/pii.py) and repetition signals
(operators/textstats.py repetition_signals)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entitymatch_spark.operators.pii import redact_pii
from entitymatch_spark.operators.textstats import repetition_signals


def test_redact_pii_masks_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@corp-site.co.uk and cindy@a.io now"),
            (1, "server at 192.168.0.1 fell over"),
            (2, "call +1 555-010-0199 or 020 7946 0958 today"),
            (3, "clean text with a short 123 number"),
            (4, "released 2026-08-18 covering 2020-2021 fiscal years"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert out[0]["n_email"] == 2 and out[0]["redacted"].count("<EMAIL>") == 2
    assert "@" not in out[0]["redacted"]
    assert out[1]["n_ip"] == 1 and "<IP>" in out[1]["redacted"]
    assert out[2]["n_phone"] == 2 and out[2]["redacted"].count("<PHONE>") == 2
    assert out[3]["redacted"] == docs.filter("doc_id = 3").first()["text"]
    assert out[3]["n_email"] == out[3]["n_ip"] == out[3]["n_phone"] == 0
    # ISO dates and year ranges stay below the 9-digit phone floor
    assert out[4]["n_phone"] == 0 and "<PHONE>" not in out[4]["redacted"]


def test_phone_recall_and_date_adjacency(spark):
    """Separator-anchored forms recover 7/8-digit local recall WITHOUT
    re-eating dates: the old free-separator rule rewrote a date
    followed by a standalone number ('2026-08-18 4') and ISBNs to
    <PHONE>; the grouped forms must mask real local numbers while all
    date/ISBN shapes stay untouched."""
    docs = spark.createDataFrame(
        [
            # --- must mask ---
            (0, "call (555) 867-5309 now"),
            (1, "or 555-867-5309 works"),
            (2, "dotted 555.867.5309 form"),
            (3, "local 555-1234 line"),
            (4, "raw 5551234567 msisdn"),
            (5, "intl +49 171 123 4567 cell"),
            (6, "uk mobile 07911 123456 txt"),
            (7, "uk geo 0171 123 4567 office"),
            (8, "fr 01 23 45 67 89 bureau"),
            (9, "trunk +44 (0)20 7946 0958 desk"),
            # --- must NOT mask ---
            (10, "on 2026-08-18 4 people came"),
            (11, "2020-2021 19 items shipped"),
            (12, "ISBN 978-0-306-40615-7 cited"),
            (13, "range 08-18 and 12-31 dates"),
            (14, "space local 555 1234 is ambiguous prose"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    for i in range(10):
        assert out[i]["n_phone"] == 1 and "<PHONE>" in out[i]["redacted"], (
            i, out[i]["redacted"])
    for i in (10, 11, 12, 13, 14):
        assert out[i]["n_phone"] == 0 and out[i]["redacted"] == (
            docs.filter(F.col("doc_id") == i).first()["text"]
        ), (i, out[i]["redacted"])


def test_redact_pii_ip_before_phone(spark):
    # dotted octets are 7+ digits with separators; the IP rule must
    # claim them before the phone rule can
    docs = spark.createDataFrame(
        [(0, "node 10.20.30.40 responded")], "doc_id long, text string"
    )
    r = redact_pii(docs).first()
    assert r["n_ip"] == 1 and r["n_phone"] == 0
    assert "<IP>" in r["redacted"] and "<PHONE>" not in r["redacted"]


def test_repetition_signals_extremes(spark):
    docs = spark.createDataFrame(
        [
            (0, ["spam"] * 10),                      # maximal repetition
            (1, ["a", "b", "c", "d", "e"]),          # all distinct
            (2, ["solo"]),                           # no bigrams
        ],
        "doc_id long, tokens array<string>",
    )
    out = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert out[0]["top_token_frac"] == 1.0
    assert out[0]["dup_bigram_frac"] == 1.0 and out[0]["n_bigrams"] == 9
    assert abs(out[1]["top_token_frac"] - 0.2) < 1e-12
    assert out[1]["dup_bigram_frac"] == 0.0
    assert out[2]["n_bigrams"] == 0 and out[2]["top_bigram_frac"] == 0.0


def test_repetition_signals_no_python(spark):
    docs = spark.createDataFrame(
        [(0, ["a", "b", "a"])], "doc_id long, tokens array<string>"
    )
    plan = (
        repetition_signals(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_phone_regex_java_re2_agree_fuzz(spark):
    """The redact_pii oracle embeds PHONE_RE verbatim in DuckDB (RE2),
    so the pattern must behave identically under Java regex and RE2 —
    same matches, same leftmost-first alternation choice, same
    replacement output. Fuzz the agreement on adversarial digit
    soup: dates, year ranges, ISBN-ish groupings, phone shapes, and
    seeded random digit-group/separator sequences."""
    import random

    import duckdb

    from entitymatch_spark.operators.pii import PHONE_RE

    rng = random.Random(7)
    fixed = [
        "on 2026-08-18 4 people came",
        "2020-2021 19 items",
        "ISBN 978-0-306-40615-7 cited",
        "+49 171 123 4567 and (555) 867-5309",
        "555.867.5309 or 555-1234 or 5551234567",
        "version 1.2.3.4.5 build 123456789012345678",
        "100 200 3000 list",
    ]
    seps = [" ", "-", ".", "", "  ", " - "]
    texts = list(fixed)
    for _ in range(300):
        parts = []
        for _ in range(rng.randrange(1, 6)):
            parts.append(
                "".join(rng.choice("0123456789")
                        for _ in range(rng.randrange(1, 12)))
            )
            parts.append(rng.choice(seps))
        prefix = rng.choice(["", "+", "call ", "(", "x"])
        texts.append(prefix + "".join(parts) + rng.choice(["", " end", ")"]))

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    sql_re = PHONE_RE.replace("\\", "\\\\")  # SQL literal eats one level
    got = {
        r["i"]: (r["masked"], r["n"])
        for r in df.select(
            "i",
            F.regexp_replace("t", PHONE_RE, "<PHONE>").alias("masked"),
            F.size(F.expr(f"regexp_extract_all(t, '{sql_re}', 0)")).alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("create table tt (i bigint, t varchar)")
    con.executemany("insert into tt values (?, ?)", list(enumerate(texts)))
    want = {
        i: (m, n)
        for i, m, n in con.execute(
            f"""select i, regexp_replace(t, '{PHONE_RE}', '<PHONE>', 'g'),
                       len(regexp_extract_all(t, '{PHONE_RE}')) from tt"""
        ).fetchall()
    }
    bad = [(i, texts[i], got[i], want[i]) for i in got if got[i] != want[i]]
    assert not bad, bad[:5]


def test_redact_pii_custom_rules_mask_and_audit(spark):
    """The custom_rules seam: extra (name, regex, placeholder) rules
    append after the built-ins, mask, and audit alongside them."""
    import pytest

    from entitymatch_spark.operators.pii import redact_pii

    docs = spark.createDataFrame(
        [
            (0, "ssn 123-45-6789 mail a@b.co order ORD-998877"),
            (1, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = redact_pii(
        docs,
        custom_rules=[
            ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
            ("order", r"\bORD-\d{6}\b", "<ORDER>"),
        ],
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["redacted"] == "ssn <SSN> mail <EMAIL> order <ORDER>"
    assert (rows[0]["n_ssn"], rows[0]["n_order"], rows[0]["n_email"]) == (1, 1, 1)
    assert rows[1]["n_ssn"] == 0 and rows[1]["redacted"] == "no pii here"
    # built-in output contract unchanged when no custom rules are given
    assert redact_pii(docs).columns == [
        "doc_id", "redacted", "n_email", "n_ip", "n_phone"
    ]
    with pytest.raises(ValueError, match="duplicate"):
        redact_pii(docs, custom_rules=[("email", r"x", "<X>")])


def test_redact_pii_dollar_placeholder_is_literal(spark):
    """Java replacement semantics make '$'/'\\' special in
    regexp_replace; a custom placeholder like '$PRICE' must mask
    literally, not throw an illegal-group-reference error or
    re-insert matched text via $0."""
    from entitymatch_spark.operators.pii import redact_pii

    docs = spark.createDataFrame(
        [(0, "costs 12.50 total"), (1, "id X99 here")],
        "doc_id long, text string",
    )
    out = redact_pii(
        docs,
        custom_rules=[
            ("price", r"\b\d+\.\d\d\b", "$PRICE"),
            ("code", r"\bX\d\d\b", "a$0b\\c"),
        ],
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["redacted"] == "costs $PRICE total"
    assert rows[1]["redacted"] == "id a$0b\\c here"
