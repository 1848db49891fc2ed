"""Property-based invariants over the pure-Python golden twins.

The repo's fuzz tests (test_similarity.py, test_urlnorm.py,
test_pii_repetition.py) draw fixed-seed random strings from limited
alphabets. Hypothesis adds the two things those can't: adversarial
input generation over full Unicode / pathological shapes, and
counterexample shrinking. Everything here is driver-side pure Python —
no Spark session — so the whole module runs in seconds.

Determinism: ``derandomize=True`` makes every run generate the same
examples (CI-stable); ``database=None`` keeps hypothesis from writing a
.hypothesis/ cache dir into the repo.

What is *not* asserted, deliberately:

- normalize idempotence: py_normalize strips parens AFTER trim, so a
  leading "(x) y" normalizes to " y" (outer space kept) — faithful to
  the reference (Language.cs:32 Trim().ToLower() then regex), so
  re-normalizing trims further. Not a bug; not a valid property.
- cross-engine (Java/RE2/C#) equality on arbitrary Unicode: the
  byte-identical surface is pinned by the corpus golden tests on the
  fixtures' charset; engines legitimately diverge on exotic casefolds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from entitymatch_spark.functions.similarity import (
    _jaro_naive,
    jaro,
    jaro_profile,
    jaro_winkler,
    jaro_winkler_with_profile,
    levenshtein_bounded,
    tfidf_cosine_and_containment,
    tfidf_pair_from_profiles,
    tfidf_profile,
)
from entitymatch_spark.functions.text import py_normalize, py_tokenize

COMMON = settings(derandomize=True, database=None, max_examples=300)

# Mixed strategy: small alphabets force collisions/transpositions (the
# interesting Jaro/Levenshtein regime); full text exercises Unicode.
short_collidey = st.text(alphabet="abАБ💡", max_size=24)
any_text = st.text(max_size=48)
strings = st.one_of(short_collidey, any_text)

tokens = st.lists(st.text(alphabet="abcde", min_size=1, max_size=4), max_size=12)
idf_maps = st.dictionaries(
    st.text(alphabet="abcde", min_size=1, max_size=4),
    st.floats(min_value=1e-6, max_value=10.0, allow_nan=False),
    max_size=16,
)


# --- Jaro / Jaro-Winkler ------------------------------------------------

@COMMON
@given(strings, strings)
def test_fast_jaro_equals_naive(a, b):
    # m and t are integers in both implementations; equal (m, t) means
    # bit-identical float arithmetic, so exact equality is the contract.
    assert jaro(a, b) == _jaro_naive(a, b)


@COMMON
@given(strings, strings)
def test_jaro_symmetric_bounded(a, b):
    j = jaro(a, b)
    assert 0.0 <= j <= 1.0
    assert j == jaro(b, a)
    if a and a == b:
        assert j == 1.0


@COMMON
@given(strings, strings)
def test_jaro_winkler_bounds_and_profile_parity(a, b):
    jw = jaro_winkler(a, b)
    j = jaro(a, b)
    # boost adds prefix * 0.1 * (1 - j) >= 0, and jw <= j + 0.4*(1-j) <= 1
    assert j <= jw <= 1.0
    prof = jaro_profile(b)
    assert jaro_winkler_with_profile(a, b, prof) == jw


# --- Levenshtein --------------------------------------------------------

@COMMON
@given(strings, strings)
def test_levenshtein_metric_properties(a, b):
    d = levenshtein_bounded(a, b)
    assert d == levenshtein_bounded(b, a)
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))
    assert (d == 0) == (a == b)


@COMMON
@given(strings, strings, st.integers(min_value=0, max_value=6))
def test_levenshtein_cap_semantics(a, b, cap):
    # The band cap's contract: exact when within the cap, and any
    # value > cap (the scorer only compares <= cap) when beyond it.
    d = levenshtein_bounded(a, b)
    capped = levenshtein_bounded(a, b, cap)
    if d <= cap:
        assert capped == d
    else:
        assert capped > cap


@COMMON
@given(
    st.text(alphabet="abc", max_size=12),
    st.text(alphabet="abc", max_size=12),
    st.text(alphabet="abc", max_size=12),
)
def test_levenshtein_triangle_inequality(a, b, c):
    assert levenshtein_bounded(a, c) <= (
        levenshtein_bounded(a, b) + levenshtein_bounded(b, c)
    )


# --- TF-IDF cosine / containment ---------------------------------------

@COMMON
@given(tokens, tokens, idf_maps)
def test_tfidf_profile_form_equals_direct(ta, tb, idf):
    # The scorer's cached-profile fast path must be the same function as
    # the direct form. Both compute the shared-term sums over the same
    # (token, count) multiset, but may iterate dict entries in different
    # orders — float addition isn't associative, so compare with a tight
    # epsilon rather than bit equality.
    pa, pb = tfidf_profile(ta, idf), tfidf_profile(tb, idf)
    cos_p, con_p = tfidf_pair_from_profiles(pa, pb, idf)
    cos_d, con_d = tfidf_cosine_and_containment(ta, tb, idf)
    assert abs(cos_p - cos_d) < 1e-12
    assert abs(con_p - con_d) < 1e-12


@COMMON
@given(tokens, tokens, idf_maps)
def test_tfidf_bounds_and_symmetry(ta, tb, idf):
    cos, con = tfidf_cosine_and_containment(ta, tb, idf)
    assert 0.0 <= cos <= 1.0 + 1e-12
    assert 0.0 <= con <= 1.0 + 1e-12
    cos2, con2 = tfidf_cosine_and_containment(tb, ta, idf)
    assert abs(cos - cos2) < 1e-12
    assert abs(con - con2) < 1e-12


@COMMON
@given(tokens, idf_maps)
def test_tfidf_self_similarity(ta, idf):
    cos, con = tfidf_cosine_and_containment(ta, ta, idf)
    if ta:
        assert abs(cos - 1.0) < 1e-12
        assert abs(con - 1.0) < 1e-12
    else:
        assert cos == con == 0.0


# --- Tokenization -------------------------------------------------------

@COMMON
@given(any_text)
def test_tokens_are_ascii_word_runs_in_order(s):
    norm = py_normalize(s)
    toks = py_tokenize(s)
    # Every token is a nonempty ASCII \w run, and the token sequence is
    # recoverable left-to-right from the normalized text (the offsets
    # UDF contract: norm[start:start+length] == token).
    pos = 0
    for t in toks:
        assert t and all(c.isascii() and (c.isalnum() or c == "_") for c in t)
        found = norm.find(t, pos)
        assert found >= 0
        pos = found + len(t)


@COMMON
@given(any_text)
def test_normalize_strips_all_parens(s):
    # After one pass no openable group remains: any "(" left has no
    # matching ")" after it (the regex removed every closable group).
    norm = py_normalize(s)
    i = norm.find("(")
    while i >= 0:
        assert ")" not in norm[i + 1 :]
        i = norm.find("(", i + 1)


# --- Rational thresholds / the integer quality gate ---------------------

@COMMON
@given(st.integers(min_value=0, max_value=10_000), st.integers(min_value=1, max_value=10_000))
def test_coerce_rational_roundtrips_exact_pairs_and_floats(num, den):
    from entitymatch_spark.operators.textstats import coerce_rational

    assert coerce_rational((num, den)) == (num, den)
    # A legacy float of any den<=10000 rational coerces to an equivalent
    # fraction (possibly reduced) within the documented 1e-9 tolerance.
    x = num / den
    n2, d2 = coerce_rational(x)
    assert d2 > 0
    assert abs(n2 / d2 - x) <= 1e-9 * max(1.0, abs(x))


@COMMON
@given(
    st.integers(min_value=1, max_value=200),   # n tokens
    st.integers(min_value=0, max_value=200),   # distinct (clamped to n)
    st.integers(min_value=0, max_value=200),   # stopword occurrences (clamped)
    st.integers(min_value=0, max_value=2000),  # extra chars beyond 1/token
    st.integers(min_value=0, max_value=100),   # threshold numerator
    st.integers(min_value=1, max_value=100),   # threshold denominator
)
def test_integer_quality_gate_coefficients_match_exact_arithmetic(
    n, u, s, extra, qnum, qden
):
    # Re-derive quality_at_least's hand-derived integer inequalities
    # (textstats.py:184-186) against the float formula evaluated in
    # EXACT Fraction arithmetic — the pure-Python complement of the
    # Spark drift-sweep (test_quality_gate_matches_float_formula),
    # covering the whole integer lattice rather than corpus samples.
    from fractions import Fraction as Fr

    u = max(1, min(u, n))      # at least 1 distinct token when n > 0
    s = min(s, n)
    tl = n + extra             # every token has >= 1 char
    quality = (
        Fr(2, 5) * Fr(u, n)
        + Fr(3, 10) * (1 - Fr(s, n))
        + Fr(3, 10) * min(Fr(tl, 8 * n), Fr(1))
    )
    expected = quality >= Fr(qnum, qden)
    if tl >= 8 * n:
        got = qden * (4 * u + 3 * (n - s) + 3 * n) >= 10 * qnum * n
    else:
        got = qden * (32 * u + 24 * (n - s) + 3 * tl) >= 80 * qnum * n
    assert got == expected


# --- Tokenization -------------------------------------------------------

@COMMON
@given(any_text)
def test_tokens_stable_under_renormalization(s):
    # Operators that store normalized text and re-tokenize it later
    # (posting build vs span scoring) must see the same tokens as a
    # raw-text tokenization: the second normalize pass may trim edge
    # whitespace the paren-strip exposed, but \w+ runs can't change.
    assert py_tokenize(py_normalize(s)) == py_tokenize(s)


# --- unigram LM / stupid backoff / drift (operators/lm.py, drift.py) ----
# Pure-Python golden twins of the Spark formulas (Spark parity is pinned
# value-for-value in tests/test_lm.py / test_drift.py); here hypothesis
# drives the FORMULA invariants: Gibbs' inequality for the smoothed
# cross-entropy, JSD bounds/symmetry, backoff score validity.

import math as _math

import pytest

corpus_strategy = st.lists(
    st.lists(st.text(alphabet="abcde", min_size=1, max_size=3),
             min_size=1, max_size=8),
    min_size=1, max_size=6,
)


def _uni_counts(corpus):
    c: dict[str, int] = {}
    for toks in corpus:
        for t in toks:
            c[t] = c.get(t, 0) + 1
    return c, sum(c.values())


def _uni_logp(counts, total, alpha):
    denom = total + alpha * (len(counts) + 1)
    return {t: _math.log((n + alpha) / denom) for t, n in counts.items()}


@COMMON
@given(corpus_strategy, st.floats(min_value=0.0, max_value=5.0,
                                  allow_nan=False))
def test_unigram_cross_entropy_bound(corpus, alpha):
    """Token-weighted mean self-scored nll equals the corpus unigram
    entropy at alpha=0 (MLE) and can only EXCEED it for alpha>0 —
    Gibbs' inequality: cross-entropy H(p, q_smoothed) >= H(p)."""
    counts, total = _uni_counts(corpus)
    entropy = -sum(
        (n / total) * _math.log(n / total) for n in counts.values()
    )
    logp = _uni_logp(counts, total, alpha)
    xent = -sum((n / total) * logp[t] for t, n in counts.items())
    assert xent >= entropy - 1e-9
    if alpha == 0:
        assert xent == pytest.approx(entropy, abs=1e-9)


@COMMON
@given(corpus_strategy, corpus_strategy,
       st.floats(min_value=1e-3, max_value=5.0, allow_nan=False))
def test_jsd_bounds_symmetry_antisymmetry(corpus_a, corpus_b, alpha):
    """JSD of the smoothed distributions is symmetric, in [0, ln 2],
    zero on identical corpora; per-token log-ratios are antisymmetric."""

    def smoothed(corpus_x, corpus_y):
        ca, ta = _uni_counts(corpus_x)
        cb, tb = _uni_counts(corpus_y)
        vocab = sorted(set(ca) | set(cb))
        v = len(vocab)
        pa = {t: (ca.get(t, 0) + alpha) / (ta + alpha * v) for t in vocab}
        pb = {t: (cb.get(t, 0) + alpha) / (tb + alpha * v) for t in vocab}
        return vocab, pa, pb

    def jsd(pa, pb, vocab):
        out = 0.0
        for t in vocab:
            m = (pa[t] + pb[t]) / 2
            out += 0.5 * pa[t] * _math.log(pa[t] / m)
            out += 0.5 * pb[t] * _math.log(pb[t] / m)
        return out

    vocab, pa, pb = smoothed(corpus_a, corpus_b)
    fwd = jsd(pa, pb, vocab)
    assert -1e-12 <= fwd <= _math.log(2) + 1e-12
    vocab_r, pa_r, pb_r = smoothed(corpus_b, corpus_a)
    assert fwd == pytest.approx(jsd(pa_r, pb_r, vocab_r), abs=1e-12)
    for t in vocab:
        lr = _math.log(pa[t] / pb[t])
        assert lr == pytest.approx(-_math.log(pb[t] / pa[t]), abs=1e-12)
    vocab_s, ps, qs = smoothed(corpus_a, corpus_a)
    assert jsd(ps, qs, vocab_s) == pytest.approx(0.0, abs=1e-12)


@COMMON
@given(corpus_strategy, st.integers(min_value=1, max_value=3))
def test_stupid_backoff_scores_valid(corpus, min_count):
    """Every stupid-backoff score is a finite value in (0, 1]: bigram
    MLE <= 1, the 0.4-discounted unigram fallback < 1, first-token
    unigram MLE <= 1 — so per-doc nll is finite and >= 0 regardless of
    corpus shape or pruning level."""
    uni, total = _uni_counts(corpus)
    big: dict[tuple[str, str], int] = {}
    for toks in corpus:
        for i in range(1, len(toks)):
            k = (toks[i - 1], toks[i])
            big[k] = big.get(k, 0) + 1
    big = {k: c for k, c in big.items() if c >= min_count}
    for toks in corpus:
        nll_terms = []
        for i, t in enumerate(toks):
            if i == 0:
                s = uni[t] / total
            elif (toks[i - 1], t) in big:
                s = big[(toks[i - 1], t)] / uni[toks[i - 1]]
            else:
                s = 0.4 * uni[t] / total
            assert 0.0 < s <= 1.0
            nll_terms.append(-_math.log(s))
        nll = sum(nll_terms) / len(nll_terms)
        assert _math.isfinite(nll) and nll >= -1e-12
