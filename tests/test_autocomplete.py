"""Fuzzy-prefix lookup + completions (ref: EditDistance.cs prefixcheck,
Trie.cs autocomplete walk) and ContainsAny.

The vocab {match, matcher, watch, watcher, hatch} is the reference's
own unit-test corpus (TestEditDistance/UnitTest1.cs:8-26)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entitymatch_spark.functions.similarity import levenshtein_bounded
from entitymatch_spark.operators.autocomplete import (
    complete_topl,
    prefix_edit_lookup,
    vocab_prefixes,
)
from entitymatch_spark.operators.textsearch import contains_any, multi_pattern_scan

VOCAB = ["match", "matcher", "watch", "watcher", "hatch"]


def _vocab_df(spark):
    return spark.createDataFrame([(w,) for w in VOCAB], "token string")


def _brute_prefix_hits(queries: list[str], vocab: list[str], k: int):
    """Port of prefixcheck semantics: all prefix-end positions j of the
    vocab token with lev(query, token[:j]) <= k."""
    out = set()
    for q in queries:
        for w in vocab:
            for j in range(1, len(w) + 1):
                d = levenshtein_bounded(q, w[:j], cap=k)
                if d <= k:
                    out.add((q, w, j, d))
    return out


def test_prefix_edit_lookup_matches_bruteforce(spark):
    queries = ["matc", "wat", "hatch", "xyz", "m"]
    qdf = spark.createDataFrame([(q,) for q in queries], "query string")
    got = {
        (r["query"], r["token"], r["prefix_len"], r["distance"])
        for r in prefix_edit_lookup(qdf, _vocab_df(spark), max_edit=1).collect()
    }
    assert got == _brute_prefix_hits(queries, VOCAB, 1)


def test_prefix_edit_lookup_k2(spark):
    # the reference unit test uses k=3 fuzzy lookup; verify a larger band
    qdf = spark.createDataFrame([("atch",)], "query string")
    got = {
        (r["token"], r["prefix_len"], r["distance"])
        for r in prefix_edit_lookup(qdf, _vocab_df(spark), max_edit=2).collect()
    }
    assert got == {
        (w, j, levenshtein_bounded("atch", w[:j], cap=2))
        for (q, w, j, d) in _brute_prefix_hits(["atch"], VOCAB, 2)
    }
    # every vocab word has SOME prefix within 2 of 'atch'
    assert {w for w, _, _ in got} == set(VOCAB)


def test_vocab_prefixes_shape(spark):
    rows = vocab_prefixes(_vocab_df(spark)).collect()
    assert len(rows) == sum(len(w) for w in VOCAB)
    assert all(r["prefix"] == r["token"][: r["prefix_len"]] for r in rows)


def test_complete_topl_ranking(spark):
    # weights = document frequency; ties must break by weight desc then token
    wdf = spark.createDataFrame(
        [("match", 100), ("matcher", 50), ("watch", 80), ("watcher", 10), ("hatch", 70)],
        "token string, df long",
    )
    qdf = spark.createDataFrame([("matc",)], "query string")
    rows = complete_topl(qdf, wdf, max_edit=1, top_l=5, weight_col="df").collect()
    got = [(r["token"], r["distance"], r["rnk"]) for r in sorted(rows, key=lambda r: r["rnk"])]
    # d=0: match (df 100), matcher (df 50); d=1: watch(80) > hatch(70) > watcher(10)
    assert got == [
        ("match", 0, 1),
        ("matcher", 0, 2),
        ("watch", 1, 3),
        ("hatch", 1, 4),
        ("watcher", 1, 5),
    ]


def test_complete_topl_limit_and_no_weight(spark):
    qdf = spark.createDataFrame([("matc",), ("zzz",)], "query string")
    rows = complete_topl(qdf, _vocab_df(spark), max_edit=1, top_l=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query"], []).append(r)
    assert len(by_q.get("matc", [])) == 2  # top-L enforced
    assert "zzz" not in by_q  # no prefix within 1 edit
    # without weight, ties break by token asc
    toks = [r["token"] for r in sorted(by_q["matc"], key=lambda r: r["rnk"])]
    assert toks == ["match", "matcher"]


def test_contains_any_vs_bruteforce_and_jvm_only(spark):
    texts = [
        (0, "the quick match runs"),
        (1, "nothing relevant here"),
        (2, "a watcher watches"),
        (3, ""),
    ]
    d = spark.createDataFrame(texts, "doc_id long, norm_text string")
    phrases = ["match", "watcher", "absent phrase"]
    out = {r["doc_id"]: r["has_any"] for r in contains_any(d, phrases).collect()}
    assert out == {i: any(p in t for p in phrases) for i, t in texts}
    # ContainsAny is the early-exit JVM variant: no Python in the plan
    plan = contains_any(d, phrases)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_ac_cache_two_dictionaries_one_session(spark):
    """Regression: the executor-side automaton cache is keyed by
    broadcast id; two different phrase lists in one session must not
    collide (id(bc.value) could, after GC reuse)."""
    d = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon")], "doc_id long, norm_text string"
    )
    first = {
        (r["doc_id"], r["phrase"])
        for r in multi_pattern_scan(d, ["alpha", "epsilon"]).collect()
    }
    assert first == {(0, "alpha"), (1, "epsilon")}
    second = {
        (r["doc_id"], r["phrase"])
        for r in multi_pattern_scan(d, ["beta", "delta"]).collect()
    }
    assert second == {(0, "beta"), (1, "delta")}


def test_complete_topl_dedups_vocab_weights(spark):
    """A vocab token listed with two weight values must yield ONE
    ranked row per (query, token) — duplicates consumed top-L slots
    and pushed legitimate completions out."""
    from entitymatch_spark.operators.autocomplete import complete_topl

    queries = spark.createDataFrame([("pari",)], "query string")
    vocab = spark.createDataFrame(
        [("paris", 10), ("paris", 12), ("parish", 5)],
        "token string, weight int",
    )
    out = complete_topl(
        queries, vocab, max_edit=1, top_l=5, weight_col="weight"
    ).collect()
    toks = [r.token for r in out]
    assert toks.count("paris") == 1
    paris = [r for r in out if r.token == "paris"][0]
    assert paris.weight == 12  # max wins


def test_vocab_prefixes_drops_empty_and_null_tokens(spark):
    """sequence(1, 0) is the DESCENDING [1, 0] in Spark, so an
    unfiltered '' token emitted prefix rows whose '' prefix matched
    every short query; empty/NULL vocab tokens must yield no rows."""
    from pyspark.sql import functions as F

    from entitymatch_spark.operators.autocomplete import (
        complete_topl,
        vocab_prefixes,
    )

    vocab = spark.createDataFrame(
        [("",), (None,), ("ab",)], "token string"
    )
    rows = vocab_prefixes(vocab).collect()
    assert {r["token"] for r in rows} == {"ab"}
    assert {r["prefix"] for r in rows} == {"a", "ab"}

    queries = spark.createDataFrame([("a",)], "query string")
    got = complete_topl(queries, vocab, max_edit=1, top_l=5).collect()
    assert all(r["token"] == "ab" for r in got)  # '' never ranks
