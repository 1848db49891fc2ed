"""token_drift / drift_summary vs a pure-Python JSD reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _posting(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, tokens array<string>")
    return df.select("doc_id", F.posexplode("tokens").alias("pos", "token"))


A = [("a1", ["the", "cat", "sat", "the"]), ("a2", ["the", "dog"])]
B = [("b1", ["le", "chat", "the"]), ("b2", ["le", "chien", "dort"])]


def _py_drift(lists_a, lists_b, alpha):
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for toks in lists_a:
        for t in toks:
            ca[t] = ca.get(t, 0) + 1
    for toks in lists_b:
        for t in toks:
            cb[t] = cb.get(t, 0) + 1
    vocab = sorted(set(ca) | set(cb))
    ta, tb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    out = {}
    for t in vocab:
        na, nb = ca.get(t, 0), cb.get(t, 0)
        pa = (na + alpha) / (ta + alpha * v)
        pb = (nb + alpha) / (tb + alpha * v)
        m = (pa + pb) / 2
        out[t] = (
            na,
            nb,
            math.log(pa / pb),
            0.5 * pa * math.log(pa / m) + 0.5 * pb * math.log(pb / m),
        )
    return out


def test_drift_matches_python(spark):
    from entitymatch_spark.operators.drift import drift_summary, token_drift

    d = token_drift(_posting(spark, A), _posting(spark, B), alpha=0.5)
    got = {
        r["token"]: (r["n_a"], r["n_b"], r["log_ratio"], r["jsd_term"])
        for r in d.collect()
    }
    want = _py_drift([t for _, t in A], [t for _, t in B], 0.5)
    assert set(got) == set(want)
    for t, (na, nb, lr, js) in want.items():
        gna, gnb, glr, gjs = got[t]
        assert (gna, gnb) == (na, nb), t
        assert glr == pytest.approx(lr, abs=1e-12), t
        assert gjs == pytest.approx(js, abs=1e-12), t

    s = drift_summary(d).collect()[0]
    assert s["jsd"] == pytest.approx(
        sum(js for *_, js in want.values()), abs=1e-12
    )
    assert 0 <= s["jsd"] <= math.log(2)
    assert (s["total_a"], s["total_b"], s["vocab"]) == (6, 6, len(want))


def test_identical_corpora_have_zero_jsd(spark):
    from entitymatch_spark.operators.drift import drift_summary, token_drift

    d = token_drift(_posting(spark, A), _posting(spark, A))
    s = drift_summary(d).collect()[0]
    assert s["jsd"] == pytest.approx(0.0, abs=1e-12)
    assert all(r["log_ratio"] == pytest.approx(0.0, abs=1e-12) for r in d.collect())


def test_drift_validation_and_null_tokens(spark):
    from entitymatch_spark.operators.drift import token_drift

    with pytest.raises(ValueError, match="alpha"):
        token_drift(_posting(spark, A), _posting(spark, B), alpha=0.0)

    with_null = spark.createDataFrame(
        [("x", ["the", None])], "doc_id string, tokens array<string>"
    ).select("doc_id", F.posexplode_outer("tokens").alias("pos", "token"))
    d = token_drift(with_null, _posting(spark, B))
    assert {r["token"] for r in d.collect()} >= {"the", "le"}
    assert None not in {r["token"] for r in d.collect()}
    got = {r["token"]: r["n_a"] for r in d.collect()}
    assert got["the"] == 1  # NULL dropped, not counted


def test_drift_rejects_nan_alpha(spark):
    import pytest

    from entitymatch_spark.operators.drift import token_drift

    with pytest.raises(ValueError, match="alpha"):
        token_drift(
            _posting(spark, A), _posting(spark, B), alpha=float("nan")
        )
