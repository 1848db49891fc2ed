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
    if not alpha >= 0:  # 'not >=' also rejects NaN
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = (
        posting.filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count("*").alias("n_occ"))
    )
    totals = counts.agg(
        F.sum("n_occ").alias("total"), F.count("*").alias("vocab")
    )
    denom = F.col("total") + F.lit(alpha) * (F.col("vocab") + 1)
    return (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("logp", F.log((F.col("n_occ") + F.lit(alpha)) / denom))
        .withColumn("logp_oov", oov_logp_expr(alpha))
    )


def oov_logp_expr(alpha: float):
    """ln of the shared OOV event's probability, as a column over the
    model's (total, vocab) columns. alpha=0 reserves NO mass for OOV,
    so an OOV token under it is a modeling error — surfaced as NaN
    (which poisons the document's avg_nll) rather than silently
    dropped from the average the way a NULL would be."""
    if alpha == 0:
        return F.lit(float("nan"))
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
    itself (the CCNet in-domain case — no OOV possible) with ``alpha``.
    Passing a model built on a DIFFERENT corpus exercises the OOV
    path: unseen tokens get the OOV mass the MODEL reserved (its
    ``logp_oov`` column — never recomputed from this call's ``alpha``,
    so model and scorer cannot desync). NULL tokens are dropped on
    both build and score. An alpha=0 model scores OOV tokens as NaN,
    poisoning that document's avg_nll rather than silently averaging
    around them; an EMPTY model scores every document NaN.
    """
    posting = posting.filter(F.col("token").isNotNull())
    if model is None:
        model = unigram_model(posting, alpha=alpha)
    # one-row OOV mass (agg, not limit(1): stays one row — all NULLs —
    # for an empty model, so the crossJoin cannot annihilate the
    # posting); vocabulary-sized model side is broadcast — scoring is
    # map-side, the only shuffle is the groupBy on the document key.
    oov_row = model.agg(F.first("logp_oov").alias("logp_oov"))
    scored = (
        posting.join(F.broadcast(model.select("token", "logp")), "token", "left")
        .crossJoin(F.broadcast(oov_row))
        .withColumn(
            "logp_eff",
            F.coalesce(
                F.col("logp"), F.col("logp_oov"), F.lit(float("nan"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (-F.avg("logp_eff")).alias("avg_nll"),
    )


def bigram_backoff_nll(
    posting: DataFrame,
    *,
    id_col: str = "doc_id",
    backoff: float = 0.4,
    min_count: int = 1,
) -> DataFrame:
    """(id, n_tokens, avg_nll): per-document mean negative log of the
    STUPID BACKOFF bigram score (Brants et al., EMNLP 2007 — the
    distributed web-scale LM scheme; scores, not probabilities):

        S(w_i | w_{i-1}) = count(w_{i-1} w_i) / count(w_{i-1})
                           if the bigram was kept, else
                           backoff * count(w_i) / total
        S(w_1)           = count(w_1) / total          (first token)

    ``min_count`` prunes the bigram table to entries seen at least that
    often — the paper's lever for bounding model size: at 100 TB the
    bigram table is the one LM artifact that can rival the corpus, and
    pruning trades it against backoff coverage. Self-scored (model =
    scoring corpus), so unigram counts always exist.

    Shapes at scale: the bigram context is built with one ``lag``
    window per document partition (the posting is already hashed by
    document for it — same shuffle the per-doc aggregate needs
    anyway); the pruned bigram model joins on (prev, token) as a
    shuffle hash join IF large, broadcast when pruning keeps it small;
    the unigram model is always vocabulary-sized and broadcast.
    """
    if not 0 < backoff <= 1:
        raise ValueError(f"backoff must be in (0, 1], got {backoff}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    from pyspark.sql import Window

    # NULL tokens are not tokens: drop them BEFORE the lag so the
    # adjacency closes over them, keeping n_tokens consistent with
    # unigram_nll (which filters identically)
    posting = posting.filter(F.col("token").isNotNull())
    w = Window.partitionBy(id_col).orderBy("pos")
    ctx = posting.select(
        F.col(id_col), "pos", "token", F.lag("token").over(w).alias("prev")
    )
    uni = posting.groupBy("token").agg(F.count("*").alias("n_uni"))
    totals = uni.agg(F.sum("n_uni").alias("total"))
    big = (
        ctx.filter(F.col("prev").isNotNull())
        .groupBy("prev", "token")
        .agg(F.count("*").alias("n_big"))
        .filter(F.col("n_big") >= min_count)
    )
    prev_uni = uni.select(
        F.col("token").alias("prev"), F.col("n_uni").alias("n_prev")
    )
    scored = (
        ctx.join(big, ["prev", "token"], "left")
        .join(F.broadcast(prev_uni), "prev", "left")
        .join(F.broadcast(uni), "token")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "logs",
            F.when(
                F.col("prev").isNull(),  # first token: unigram score
                F.log(F.col("n_uni") / F.col("total")),
            )
            .when(
                F.col("n_big").isNotNull(),
                F.log(F.col("n_big") / F.col("n_prev")),
            )
            .otherwise(
                F.log(F.lit(backoff) * F.col("n_uni") / F.col("total"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (-F.avg("logs")).alias("avg_nll"),
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
    # NaN scores (alpha=0 OOV poisoning) get a NULL label — every NaN
    # comparison is false, so without the guard they would silently
    # fall through to 'tail'
    return (
        F.when(F.isnan(c.cast("double")), F.lit(None).cast("string"))
        .when(c < F.lit(t1), F.lit("head"))
        .when(c < F.lit(t2), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
