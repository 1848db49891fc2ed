"""End-to-end pipeline correctness: pairwise F1 >= 0.99 on labeled
same-blocking-key pairs + exact cluster reproduction (north_rule)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from entitymatch_spark.plans.pipeline import MatchConfig, match_pipeline
from entitymatch_spark.sources.synthetic import generate_corpus, corpus_to_spark


@pytest.fixture(scope="module")
def result(spark):
    fx = generate_corpus(n_clusters=150, seed=42)
    dfs = corpus_to_spark(spark, fx)
    res = match_pipeline(dfs["pages"], MatchConfig())
    scored = res.scored.select("id_a", "id_b", "score").toPandas()
    clusters = res.clusters.toPandas()
    return fx, scored, clusters


def _pair_predictions(fx, scored, threshold):
    sc = {(r.id_a, r.id_b): r.score for r in scored.itertuples()}
    rows = []
    for r in fx.labels.itertuples():
        a, b = sorted((r.url_a, r.url_b))
        score = sc.get((a, b), 0.0)  # unblocked/unscored pair = non-match
        rows.append((a, b, r.is_match, score >= threshold, score))
    return pd.DataFrame(rows, columns=["a", "b", "truth", "pred", "score"])


def test_pairwise_f1(result):
    fx, scored, _ = result
    preds = _pair_predictions(fx, scored, MatchConfig().threshold)
    tp = int(((preds.truth) & (preds.pred)).sum())
    fp = int((~preds.truth & preds.pred).sum())
    fn = int((preds.truth & ~preds.pred).sum())
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    print(f"pairs={len(preds)} tp={tp} fp={fp} fn={fn} P={precision:.4f} R={recall:.4f} F1={f1:.4f}")
    assert f1 >= 0.99, (tp, fp, fn, precision, recall, f1)


def test_cluster_reproduction(result):
    """Predicted partition == ground-truth partition, exactly."""
    fx, _, clusters = result
    truth = fx.pages[["url", "cluster_id"]].rename(columns={"cluster_id": "truth"})
    merged = clusters.rename(columns={"doc_id": "url", "cluster_id": "pred"}).merge(truth, on="url")
    # bijection test: each truth cluster maps to exactly one predicted id & vice versa
    t2p = merged.groupby("truth")["pred"].nunique()
    p2t = merged.groupby("pred")["truth"].nunique()
    frag = int((t2p > 1).sum())
    merge_err = int((p2t > 1).sum())
    print(f"clusters={len(t2p)} fragmented={frag} wrongly_merged={merge_err}")
    assert frag == 0, f"{frag} ground-truth clusters fragmented"
    assert merge_err == 0, f"{merge_err} predicted clusters span >1 truth cluster"


def test_production_matches_portable_variant(spark, result):
    """The production pipeline (xxhash64 MinHash, folded band keys — the
    no-oracle driver variant) must recover the SAME partition as the
    portable md5/concat variant that the DuckDB oracle value-checks.
    Cluster ids are min-member ids, so identical partitions mean
    identical (doc -> cluster) maps — compared exactly. This anchors the
    production hash path to the value-checked one (VERDICT r2 ask)."""
    fx, _, prod_clusters = result
    cfg = MatchConfig(
        num_hashes=16, bands=4, rows_per_band=4,
        minhash_token_hash="md5", lsh_band_hash="concat",
    )
    portable = match_pipeline(corpus_to_spark(spark, fx)["pages"], cfg).clusters.toPandas()
    prod = dict(zip(prod_clusters["doc_id"], prod_clusters["cluster_id"]))
    port = dict(zip(portable["doc_id"], portable["cluster_id"]))
    assert prod == port


def test_scorer_parallelism_not_aqe_coalesced(spark):
    """AQE coalesces shuffles by BYTES, but the Arrow scorer's cost is
    rows x python-time: a few-MB pair table must still fan out across
    cores. score_partitions='auto' (default) pins 4 x defaultParallelism;
    None leaves AQE's layout; an int pins that int."""
    pages = corpus_to_spark(spark, generate_corpus(n_clusters=10, seed=3))["pages"]
    res = match_pipeline(pages, MatchConfig())
    dp = spark.sparkContext.defaultParallelism
    assert res.pairs.rdd.getNumPartitions() == 4 * dp
    res_pinned = match_pipeline(pages, MatchConfig(score_partitions=7, cache=False))
    assert res_pinned.pairs.rdd.getNumPartitions() == 7


def test_clustering_is_lazy(spark, monkeypatch):
    """Constructing a MatchResult must NOT run the iterative
    connected-components loop (per-round driver actions); it runs once,
    on first access to .clusters, and is cached."""
    import entitymatch_spark.plans.pipeline as pl

    calls = []
    orig = pl.connected_components

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pl, "connected_components", spy)
    pages = corpus_to_spark(spark, generate_corpus(n_clusters=5, seed=3))["pages"]
    res = match_pipeline(pages, MatchConfig())
    assert not calls, "clustering ran during pipeline construction"
    assert res.scored.count() >= 0  # scoring usable without clustering
    assert not calls
    c1 = res.clusters
    assert calls == [1]
    c2 = res.clusters
    assert c2 is c1 and calls == [1]  # cached, not re-run


def test_all_labeled_pairs_blocked(result):
    """Every labeled positive pair must be a candidate (blocking recall)."""
    fx, scored, _ = result
    have = {(r.id_a, r.id_b) for r in scored.itertuples()}
    pos = fx.labels[fx.labels.is_match]
    missing = [
        (r.url_a, r.url_b)
        for r in pos.itertuples()
        if tuple(sorted((r.url_a, r.url_b))) not in have
    ]
    assert not missing, f"{len(missing)} positive pairs missed by blocking: {missing[:5]}"
