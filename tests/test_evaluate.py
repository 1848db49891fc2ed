"""Distributed evaluation operators vs independent driver-side math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entitymatch_spark.operators.evaluate import blocking_stats, pair_metrics
from entitymatch_spark.plans.pipeline import MatchConfig, match_pipeline
from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus


@pytest.fixture(scope="module")
def fixture(spark):
    fx = generate_corpus(n_clusters=60, seed=13)
    dfs = corpus_to_spark(spark, fx)
    res = match_pipeline(dfs["pages"], MatchConfig(cache=False))
    return fx, res


def test_pair_metrics_equals_pandas(spark, fixture):
    """The relational tp/fp/fn/P/R/F1 must equal the independent pandas
    computation used by the e2e acceptance test."""
    fx, res = fixture
    labels = (
        spark.createDataFrame(fx.labels[["url_a", "url_b", "is_match"]])
        .withColumnRenamed("url_a", "id_a")
        .withColumnRenamed("url_b", "id_b")
    )
    got = pair_metrics(res.matches, labels).collect()[0]

    # independent: same convention (unscored labeled pair = non-match)
    matched = {
        tuple(sorted((r.id_a, r.id_b))) for r in res.matches.select("id_a", "id_b").collect()
    }
    tp = fp = fn = 0
    for r in fx.labels.itertuples():
        pred = tuple(sorted((r.url_a, r.url_b))) in matched
        if r.is_match and pred:
            tp += 1
        elif not r.is_match and pred:
            fp += 1
        elif r.is_match and not pred:
            fn += 1
    assert (got.tp, got.fp, got.fn) == (tp, fp, fn)
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    assert got.precision == pytest.approx(prec)
    assert got.recall == pytest.approx(rec)
    assert got.f1 == pytest.approx(f1)
    # the north_rule gate itself, through the distributed operator
    assert got.f1 >= 0.99


def test_pair_metrics_order_normalization(spark):
    matches = spark.createDataFrame([("b", "a")], "id_a string, id_b string")
    labels = spark.createDataFrame(
        [("a", "b", True), ("c", "d", True), ("a", "c", False)],
        "id_a string, id_b string, is_match boolean",
    )
    row = pair_metrics(matches, labels).collect()[0]
    assert (row.tp, row.fp, row.fn) == (1, 0, 1)


def test_blocking_stats_counts(spark, fixture):
    """Stats must reconcile with directly computed block sizes."""
    _, res = fixture
    cap = 5
    stats = {r.family: r for r in blocking_stats(res.keys, max_block=cap).collect()}
    sizes = (
        res.keys.groupBy("key").agg(F.count("*").alias("n"))
        .withColumn("family", F.regexp_extract("key", r"^([a-z]+)", 1))
        .collect()
    )
    for fam in {r.family for r in sizes}:
        ns = [r.n for r in sizes if r.family == fam]
        s = stats[fam]
        assert s.n_keys == len(ns)
        assert s.n_pair_blocks == sum(1 for n in ns if 2 <= n <= cap)
        assert s.n_purged == sum(1 for n in ns if n > cap)
        assert s.cand_pairs == sum(n * (n - 1) // 2 for n in ns if 2 <= n <= cap)
        assert s.max_block == max(ns)
    assert set(stats) == {"tok", "lsh"}


def test_cluster_stats_reconciles(spark, fixture):
    """Histogram must reconcile with directly computed cluster sizes,
    and its totals with the doc count."""
    from collections import Counter

    from entitymatch_spark.operators.evaluate import cluster_stats

    _, res = fixture
    rows = {r.cluster_size: r for r in cluster_stats(res.clusters).collect()}
    want = Counter(
        Counter(r.cluster_id for r in res.clusters.collect()).values()
    )
    assert {k: v.n_clusters for k, v in rows.items()} == dict(want)
    n_docs = res.clusters.count()
    assert sum(r.n_docs for r in rows.values()) == n_docs
    assert abs(sum(r.pct_docs for r in rows.values()) - 100.0) < 0.01
    for r in rows.values():
        assert r.n_docs == r.cluster_size * r.n_clusters


def test_pair_metrics_dedups_reversed_labels(spark):
    """(a,b,true) and (b,a,true) are ONE labeled pair: a correct
    prediction must count tp=1, not 2 — double-counting inflated
    precision/recall through the F1 acceptance gate."""
    from entitymatch_spark.operators.evaluate import pair_metrics

    labels = spark.createDataFrame(
        [(1, 2, True), (2, 1, True), (3, 4, False)],
        "id_a long, id_b long, is_match boolean",
    )
    matches = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = pair_metrics(matches, labels).collect()[0]
    assert (row.tp, row.fp, row.fn) == (1, 0, 0)
    assert row.precision == 1.0 and row.recall == 1.0


def test_cluster_stats_single_lazy_plan(spark):
    """pct_docs totals come from a window over the histogram — one lazy
    plan, no eager count() at call time (which ran the input lineage
    twice and, on nondeterministic input, against a different
    materialization)."""
    from entitymatch_spark.operators.evaluate import cluster_stats

    clusters = spark.createDataFrame(
        [(i, i // 3) for i in range(12)], "doc_id long, cluster_id long"
    )
    rows = {r.cluster_size: r for r in cluster_stats(clusters).collect()}
    assert rows[3].n_clusters == 4 and rows[3].n_docs == 12
    assert rows[3].pct_docs == 100.0
    # empty input -> empty histogram, no eager count and no div/0
    assert cluster_stats(clusters.limit(0)).count() == 0
