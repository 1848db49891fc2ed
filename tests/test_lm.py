"""Unigram-LM scoring (operators/lm.py) vs a pure-Python reference:
self-scored smoothed/unsmoothed NLL, the held-out OOV path, and the
bucketing projection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _posting(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, tokens array<string>")
    return df.select("doc_id", F.posexplode("tokens").alias("pos", "token"))


def _py_model(token_lists, alpha):
    counts: dict[str, int] = {}
    for toks in token_lists:
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    vocab = len(counts)
    denom = total + alpha * (vocab + 1)
    logp = {t: math.log((c + alpha) / denom) for t, c in counts.items()}
    oov = math.log(alpha / denom) if alpha > 0 else None
    return logp, oov


def _py_nll(toks, logp, oov):
    vals = [logp.get(t, oov) for t in toks]
    return -sum(vals) / len(vals)


CORPUS = [
    ("d1", ["the", "cat", "sat", "on", "the", "mat"]),
    ("d2", ["the", "dog", "sat"]),
    ("d3", ["rare", "words", "here", "entirely"]),
    ("d4", ["the", "the", "the", "the"]),
]


@pytest.mark.parametrize("alpha", [1.0, 0.0, 0.5])
def test_self_score_matches_python(spark, alpha):
    """Self-scored avg_nll equals the pure-Python reference for the
    smoothed (alpha>0) and MLE (alpha=0) forms."""
    from entitymatch_spark.operators.lm import unigram_nll

    posting = _posting(spark, CORPUS)
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_nll"])
        for r in unigram_nll(posting, alpha=alpha).collect()
    }
    logp, oov = _py_model([t for _, t in CORPUS], alpha)
    assert set(got) == {d for d, _ in CORPUS}
    for doc_id, toks in CORPUS:
        n, nll = got[doc_id]
        assert n == len(toks)
        assert nll == pytest.approx(_py_nll(toks, logp, oov), abs=1e-9)


def test_held_out_oov_smoothing(spark):
    """Scoring a held-out corpus against a model built elsewhere: OOV
    tokens get the shared Laplace OOV mass, seen tokens their model
    logp — checked value-for-value against the Python reference, and
    an all-OOV doc scores exactly -oov_logp."""
    from entitymatch_spark.operators.lm import unigram_model, unigram_nll

    alpha = 1.0
    model = unigram_model(_posting(spark, CORPUS), alpha=alpha)
    held_out = [
        ("h1", ["the", "zebra", "sat"]),      # 1 OOV of 3
        ("h2", ["qqq", "zzz"]),               # all OOV
        ("h3", ["the", "dog", "mat"]),        # no OOV
    ]
    got = {
        r["doc_id"]: r["avg_nll"]
        for r in unigram_nll(
            _posting(spark, held_out), model, alpha=alpha
        ).collect()
    }
    logp, oov = _py_model([t for _, t in CORPUS], alpha)
    for doc_id, toks in held_out:
        assert got[doc_id] == pytest.approx(
            _py_nll(toks, logp, oov), abs=1e-9
        ), doc_id
    assert got["h2"] == pytest.approx(-oov, abs=1e-9)


def test_bucket_expr_and_validation(spark):
    from entitymatch_spark.operators.lm import (
        ppl_bucket_expr,
        unigram_model,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, 5.0), (3, 6.0), (4, 9.9)], "id int, avg_nll double"
    )
    got = {
        r["id"]: r["b"]
        for r in df.select(
            "id", ppl_bucket_expr("avg_nll", (5.0, 6.0)).alias("b")
        ).collect()
    }
    # half-open buckets: head < t1 <= middle < t2 <= tail
    assert got == {1: "head", 2: "middle", 3: "tail", 4: "tail"}

    with pytest.raises(ValueError, match="increasing"):
        ppl_bucket_expr("avg_nll", (6.0, 5.0))
    with pytest.raises(ValueError, match="alpha"):
        unigram_model(_posting(spark, CORPUS), alpha=-1.0)


def _py_backoff_nll(token_lists, doc, backoff, min_count):
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for toks in token_lists:
        for i, t in enumerate(toks):
            uni[t] = uni.get(t, 0) + 1
            if i > 0:
                big[(toks[i - 1], t)] = big.get((toks[i - 1], t), 0) + 1
    total = sum(uni.values())
    big = {k: c for k, c in big.items() if c >= min_count}
    vals = []
    for i, t in enumerate(doc):
        if i == 0:
            vals.append(math.log(uni[t] / total))
        elif (doc[i - 1], t) in big:
            vals.append(math.log(big[(doc[i - 1], t)] / uni[doc[i - 1]]))
        else:
            vals.append(math.log(backoff * uni[t] / total))
    return -sum(vals) / len(vals)


@pytest.mark.parametrize("min_count", [1, 2])
def test_bigram_backoff_matches_python(spark, min_count):
    """Stupid-backoff scores match the Python reference; min_count=2
    prunes the singleton bigrams so the backoff branch actually fires
    (d3 is all singleton bigrams -> fully backed off), min_count=1
    keeps every observed bigram (self-scored: backoff never fires)."""
    from entitymatch_spark.operators.lm import bigram_backoff_nll

    posting = _posting(spark, CORPUS)
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_nll"])
        for r in bigram_backoff_nll(
            posting, backoff=0.4, min_count=min_count
        ).collect()
    }
    lists = [t for _, t in CORPUS]
    assert set(got) == {d for d, _ in CORPUS}
    for doc_id, toks in CORPUS:
        n, nll = got[doc_id]
        assert n == len(toks)
        assert nll == pytest.approx(
            _py_backoff_nll(lists, toks, 0.4, min_count), abs=1e-9
        ), doc_id


def test_bigram_validation(spark):
    from entitymatch_spark.operators.lm import bigram_backoff_nll

    posting = _posting(spark, CORPUS)
    with pytest.raises(ValueError, match="backoff"):
        bigram_backoff_nll(posting, backoff=0.0)
    with pytest.raises(ValueError, match="min_count"):
        bigram_backoff_nll(posting, min_count=0)


def test_alpha_zero_oov_poisons_with_nan(spark):
    """An alpha=0 model reserves no OOV mass: a held-out doc with ANY
    OOV token must score NaN (not a silently-shrunk average over its
    in-vocab tokens), and its bucket label must be NULL (not 'tail')."""
    from entitymatch_spark.operators.lm import (
        ppl_bucket_expr,
        unigram_model,
        unigram_nll,
    )

    model = unigram_model(_posting(spark, CORPUS), alpha=0.0)
    held_out = [
        ("h1", ["the", "zebra", "sat"]),  # partial OOV -> NaN
        ("h3", ["the", "dog", "mat"]),    # in-vocab -> finite MLE
    ]
    out = unigram_nll(_posting(spark, held_out), model).select(
        "doc_id", "n_tokens", "avg_nll",
        ppl_bucket_expr("avg_nll", (5.0, 6.0)).alias("b"),
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert got["h1"]["n_tokens"] == 3       # OOV token still counted
    assert math.isnan(got["h1"]["avg_nll"])  # ...but poisons the score
    assert got["h1"]["b"] is None
    logp, _ = _py_model([t for _, t in CORPUS], 0.0)
    assert got["h3"]["avg_nll"] == pytest.approx(
        _py_nll(["the", "dog", "mat"], logp, None), abs=1e-9
    )


def test_oov_mass_comes_from_the_model_not_the_call(spark):
    """The OOV probability is the one the MODEL reserved (alpha=0.1
    here); the scoring call's own alpha default must not override it."""
    from entitymatch_spark.operators.lm import unigram_model, unigram_nll

    model = unigram_model(_posting(spark, CORPUS), alpha=0.1)
    got = {
        r["doc_id"]: r["avg_nll"]
        for r in unigram_nll(_posting(spark, [("h2", ["qqq", "zzz"])]), model)
        .collect()
    }
    _, oov = _py_model([t for _, t in CORPUS], 0.1)
    assert got["h2"] == pytest.approx(-oov, abs=1e-9)


def test_empty_model_scores_nan_not_empty(spark):
    """Scoring against an (erroneously) empty model must surface NaN
    rows, not silently return an empty DataFrame."""
    from entitymatch_spark.operators.lm import unigram_model, unigram_nll

    empty = unigram_model(_posting(spark, []).limit(0))
    rows = unigram_nll(_posting(spark, CORPUS), empty).collect()
    assert len(rows) == len(CORPUS)
    assert all(math.isnan(r["avg_nll"]) for r in rows)


def test_null_tokens_dropped_consistently(spark):
    """A NULL element in the tokens array is not a token: both scorers
    drop it (same n_tokens), and the bigram adjacency closes over it
    instead of treating the next token as a document start."""
    from pyspark.sql import functions as F

    from entitymatch_spark.operators.lm import bigram_backoff_nll, unigram_nll

    with_null = spark.createDataFrame(
        [("d1", ["the", None, "cat"]), ("d2", ["the", "cat"])],
        "doc_id string, tokens array<string>",
    ).select("doc_id", F.posexplode_outer("tokens").alias("pos", "token"))
    uni = {r["doc_id"]: r for r in unigram_nll(with_null).collect()}
    big = {r["doc_id"]: r for r in bigram_backoff_nll(with_null).collect()}
    assert uni["d1"]["n_tokens"] == big["d1"]["n_tokens"] == 2
    # with the NULL closed over, d1's adjacency is (the, cat) — the
    # same bigram d2 has, so their backoff scores agree exactly
    assert big["d1"]["avg_nll"] == pytest.approx(
        big["d2"]["avg_nll"], abs=1e-12
    )


def test_model_side_is_broadcast(spark):
    """The vocabulary-sized model must arrive at the scorer as a
    broadcast hash join — a shuffled sort-merge here would move the
    full posting on token at 100 TB."""
    from entitymatch_spark.operators.lm import unigram_nll

    plan = unigram_nll(_posting(spark, CORPUS))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
