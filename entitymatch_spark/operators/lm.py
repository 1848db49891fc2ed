"""Unigram language-model scoring — the CCNet-style perplexity filter.

CCNet (Wenzek et al., LREC 2020) buckets Common-Crawl documents into
head/middle/tail by language-model perplexity; the GPT-3 and Pile
pipelines use the same LM-quality family. A full KenLM n-gram model is
out of scope for a pure-Spark engine, but the scalable core of the
filter — score every document by the average negative log-likelihood
of its tokens under a corpus-level model — is exactly two relational
passes:

1. **model**: ``token -> ln(p(token))`` over the model corpus, with
   add-alpha (Laplace) smoothing so a held-out scoring corpus gets
   out-of-vocabulary mass instead of ``-inf``:
   ``p(t) = (count(t) + alpha) / (total + alpha * (V + 1))`` and the
   single shared OOV event ``p(oov) = alpha / (total + alpha*(V+1))``.
2. **score**: join token occurrences with the model and take the
   per-document mean of ``-ln p``; bucket by thresholds.

At 100 TB: the model table is vocabulary-sized (orders of magnitude
smaller than the corpus) and is broadcast, so scoring is a map-side
join plus a partial+final hash aggregate — the posting shuffles once,
on the document key, and nothing else moves. The totals (one row) ride
along as a broadcast cross join. Bucketing by FIXED thresholds is a
pure projection; derive thresholds from ``approx_percentile`` over a
calibration sample rather than an exact global sort — the CCNet paper
itself ships pretrained per-language cutoffs, it does not re-sort the
corpus per run.

No reference-file citation: the reference engine (EntityMatch, C#) has
no LM scoring; this module is part of the training-data-pipeline layer
the north star adds on top of SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_model(posting: DataFrame, alpha: float = 1.0) -> DataFrame:
    """(token, n_occ, total, vocab, logp) from a (id, pos, token) posting.

    ``alpha`` is the Laplace pseudo-count; ``alpha=0`` gives the
    unsmoothed MLE (only safe when scoring the model corpus itself).
    ``total``/``vocab`` are duplicated onto every row via a broadcast
    one-row cross join so downstream scoring never needs a driver
    collect; the whole table stays vocabulary-sized.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = posting.groupBy("token").agg(F.count("*").alias("n_occ"))
    totals = counts.agg(
        F.sum("n_occ").alias("total"), F.count("*").alias("vocab")
    )
    denom = F.col("total") + F.lit(alpha) * (F.col("vocab") + 1)
    return counts.crossJoin(F.broadcast(totals)).withColumn(
        "logp", F.log((F.col("n_occ") + F.lit(alpha)) / denom)
    )


def oov_logp_expr(alpha: float):
    """ln of the shared OOV event's probability, as a column over the
    model's (total, vocab) columns — ``-inf`` guard: alpha=0 with an
    OOV token is a modeling error, surfaced as NULL by ln(0) rather
    than silently scored."""
    denom = F.col("total") + F.lit(alpha) * (F.col("vocab") + 1)
    return F.log(F.lit(alpha) / denom)


def unigram_nll(
    posting: DataFrame,
    model: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """(id, n_tokens, avg_nll): per-document mean negative
    log-likelihood under the unigram model (nats/token — ``e**avg_nll``
    is the per-token perplexity).

    ``model=None`` self-scores: the model is built from ``posting``
    itself (the CCNet in-domain case — no OOV possible). Passing a
    model built on a DIFFERENT corpus exercises the OOV path: unseen
    tokens get the smoothed OOV mass via a left join + coalesce.
    """
    if model is None:
        model = unigram_model(posting, alpha=alpha)
    oov = oov_logp_expr(alpha)
    # one-row totals for the OOV fallback; vocabulary-sized model side
    # is broadcast — scoring is map-side, the only shuffle is the
    # groupBy on the document key.
    totals = model.select("total", "vocab").limit(1)
    scored = (
        posting.join(F.broadcast(model.select("token", "logp")), "token", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn("logp_eff", F.coalesce(F.col("logp"), oov))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (-F.avg("logp_eff")).alias("avg_nll"),
    )


def ppl_bucket_expr(nll_col: str = "avg_nll", thresholds=(6.0, 7.0)):
    """head/middle/tail label column from two nll cutoffs (nats/token).

    Fixed thresholds keep bucketing a pure projection (the 100 TB
    shape); calibrate them per language/corpus with
    ``approx_percentile(avg_nll, array(1/3, 2/3))`` on a sample, the
    way CCNet ships pretrained cutoffs.
    """
    t1, t2 = thresholds
    if not t1 < t2:
        raise ValueError(f"thresholds must be increasing, got {thresholds}")
    c = F.col(nll_col)
    return (
        F.when(c < F.lit(t1), F.lit("head"))
        .when(c < F.lit(t2), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
