"""Similarity primitives vs independent oracles (DuckDB, brute force)."""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from entitymatch_spark.functions.similarity import (
    _jaro_naive,
    jaro,
    jaro_winkler,
    levenshtein_bounded,
    tfidf_cosine_and_containment,
    tfidf_pair_from_profiles,
    tfidf_profile,
)


def _rand_word(rng, n):
    return "".join(rng.choice("abcdefgh") for _ in range(n))


def test_jaro_winkler_matches_duckdb():
    rng = random.Random(1)
    cases = [("martha", "marhta"), ("dixon", "dicksonx"), ("", ""), ("a", ""), ("abc", "abc")]
    cases += [(_rand_word(rng, rng.randint(0, 12)), _rand_word(rng, rng.randint(0, 12))) for _ in range(500)]
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        got = jaro_winkler(a, b)
        assert got == pytest.approx(want, abs=1e-12), (a, b, got, want)


def test_fast_jaro_equals_naive_on_long_strings():
    """The O(la+lb) per-char two-pointer jaro() must be exactly the
    textbook greedy (_jaro_naive) — incl. window edge cases and long
    inputs beyond the DuckDB fuzz range above."""
    rng = random.Random(3)
    for _ in range(3000):
        a = _rand_word(rng, rng.randint(0, 40))
        b = _rand_word(rng, rng.randint(0, 40))
        assert jaro(a, b) == pytest.approx(_jaro_naive(a, b), abs=1e-15), (a, b)
    for _ in range(200):
        a = " ".join(_rand_word(rng, rng.randint(1, 8)) for _ in range(rng.randint(0, 60)))
        b = " ".join(_rand_word(rng, rng.randint(1, 8)) for _ in range(rng.randint(0, 60)))
        assert jaro(a, b) == pytest.approx(_jaro_naive(a, b), abs=1e-15)


def test_tfidf_profiles_equal_direct():
    """Memoized profile path == direct path for every pair."""
    rng = random.Random(4)
    vocab = [_rand_word(rng, rng.randint(1, 6)) for _ in range(50)]
    idf = {w: rng.random() * 5 for w in vocab[:40]}  # some tokens miss -> default idf
    docs = [[rng.choice(vocab) for _ in range(rng.randint(0, 30))] for _ in range(40)]
    profs = [tfidf_profile(d, idf) for d in docs]
    for _ in range(500):
        i, j = rng.randrange(40), rng.randrange(40)
        want = tfidf_cosine_and_containment(docs[i], docs[j], idf)
        got = tfidf_pair_from_profiles(profs[i], profs[j], idf)
        assert got[0] == pytest.approx(want[0], abs=1e-12)
        assert got[1] == pytest.approx(want[1], abs=1e-12)


def test_levenshtein_matches_duckdb():
    rng = random.Random(2)
    con = duckdb.connect()
    for _ in range(300):
        a = _rand_word(rng, rng.randint(0, 10))
        b = _rand_word(rng, rng.randint(0, 10))
        want = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein_bounded(a, b) == want
        cap = rng.randint(0, 4)
        got = levenshtein_bounded(a, b, cap=cap)
        assert (got <= cap) == (want <= cap)
        if want <= cap:
            assert got == want


def test_tfidf_cosine_basics():
    idf = {"a": 2.0, "b": 1.0, "c": 3.0}
    cos, cont = tfidf_cosine_and_containment(["a", "b"], ["a", "b"], idf)
    assert cos == pytest.approx(1.0) and cont == pytest.approx(1.0)
    cos, cont = tfidf_cosine_and_containment(["a"], ["c"], idf)
    assert cos == 0.0 and cont == 0.0
    assert tfidf_cosine_and_containment([], ["a"], idf) == (0.0, 0.0)
    # multiset: duplicate tokens raise tf
    cos_dup, _ = tfidf_cosine_and_containment(["a", "a", "b"], ["a", "b"], idf)
    cos_one, _ = tfidf_cosine_and_containment(["a", "b"], ["a", "b"], idf)
    assert cos_dup < cos_one
    # containment of a subset is 1.0 against its superset
    _, cont_sub = tfidf_cosine_and_containment(["a"], ["a", "b"], idf)
    assert cont_sub == pytest.approx(1.0)


def test_synonym_expand_chains_after_spelling(spark):
    """The advertised chain: expander output (with weight) feeds
    synonym_expand without AMBIGUOUS_REFERENCE; weights multiply."""
    import pytest
    from pyspark.sql import functions as F

    from entitymatch_spark.operators.alternatives import (
        spelling_alternatives,
        synonym_expand,
    )

    probes = spark.createDataFrame([("cot",)], "token string")
    vocab = spark.createDataFrame([("cat",)], "token string")
    syn = spark.createDataFrame(
        [("cat", "feline", 0.8)], "token string, alt_token string, weight double"
    )
    spelled = spelling_alternatives(probes, vocab, max_edit=1)
    # rename the expansion to the next stage's token column (the
    # collision is rejected loudly rather than mis-resolving)
    with pytest.raises(ValueError, match="collides"):
        synonym_expand(spelled, syn, token_col="alt_token")
    stage2 = spelled.select(
        F.col("alt_token").alias("token"), "weight"
    )
    out = {
        (r["token"], r["alt_token"]): r["weight"]
        for r in synonym_expand(stage2, syn).collect()
    }
    # spelled weight 1/(1+1) = 0.5; synonym 0.8 -> 0.4; identity keeps 0.5
    assert out[("cat", "cat")] == 0.5
    assert out[("cat", "feline")] == 0.5 * 0.8
