"""Corpus-distribution drift between two snapshots / slices.

When a crawl is re-run, a source added, or a filter changed, the first
question is "did the token distribution move, and where?" — standard
dataset-shift monitoring. This module compares the unigram
distributions of two corpora with add-alpha smoothing over their UNION
vocabulary and emits

- per token: counts, the smoothed log-likelihood ratio
  ``ln(p_a / p_b)`` (positive = over-represented in A), and that
  token's contribution to the Jensen-Shannon divergence;
- a one-row summary: total JSD in nats (``sum(jsd_term)``; bounded by
  ln 2 ≈ 0.693 — 0 means identical distributions), totals and
  vocabulary size.

Shapes at 100 TB: both count tables are VOCABULARY-sized (the corpus
collapses in the first map-side-combinable aggregate), so the full
outer join on token moves two vocab-sized tables — trivial next to
the corpus scan. The one-row totals ride along as a broadcast cross
join; everything else is pure column math.

No reference-file citation: the reference engine (EntityMatch, C#) has
no corpus observability; this joins the evaluation/observability layer
(operators/evaluate.py) of the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_drift(
    posting_a: DataFrame, posting_b: DataFrame, *, alpha: float = 0.5
) -> DataFrame:
    """(token, n_a, n_b, log_ratio, jsd_term) over the union vocabulary.

    ``posting_a`` / ``posting_b`` are (id, pos, token) postings (NULL
    tokens dropped). ``alpha`` is the add-alpha smoothing pseudo-count
    — it must be positive so a token absent from one side gets finite
    mass instead of ``ln 0``.
    """
    if not alpha > 0:  # 'not >' also rejects NaN, which '<= 0' lets by
        raise ValueError(f"alpha must be > 0, got {alpha}")

    def counts(posting: DataFrame, out: str) -> DataFrame:
        return (
            posting.filter(F.col("token").isNotNull())
            .groupBy("token")
            .agg(F.count("*").alias(out))
        )

    joined = (
        counts(posting_a, "n_a")
        .join(counts(posting_b, "n_b"), "token", "full_outer")
        .fillna(0, ["n_a", "n_b"])
    )
    totals = joined.agg(
        F.sum("n_a").alias("t_a"),
        F.sum("n_b").alias("t_b"),
        F.count("*").alias("vocab"),
    )
    j = joined.crossJoin(F.broadcast(totals))
    p_a = (F.col("n_a") + F.lit(alpha)) / (
        F.col("t_a") + F.lit(alpha) * F.col("vocab")
    )
    p_b = (F.col("n_b") + F.lit(alpha)) / (
        F.col("t_b") + F.lit(alpha) * F.col("vocab")
    )
    m = (p_a + p_b) / 2
    return j.select(
        "token",
        "n_a",
        "n_b",
        F.log(p_a / p_b).alias("log_ratio"),
        (0.5 * p_a * F.log(p_a / m) + 0.5 * p_b * F.log(p_b / m)).alias(
            "jsd_term"
        ),
    )


def drift_summary(drift: DataFrame) -> DataFrame:
    """One row: (jsd, total_a, total_b, vocab) from a token_drift
    frame. ``jsd`` is the Jensen-Shannon divergence in nats between
    the two smoothed distributions (0 = identical, ln 2 = disjoint)."""
    return drift.agg(
        F.sum("jsd_term").alias("jsd"),
        F.sum("n_a").alias("total_a"),
        F.sum("n_b").alias("total_b"),
        F.count("*").alias("vocab"),
    )
