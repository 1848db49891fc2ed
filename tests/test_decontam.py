"""Decontamination (operators/decontam.py): overlap semantics and the
broadcast probe plan."""

from __future__ import annotations

from entitymatch_spark.operators.decontam import (
    contamination_report,
    decontaminate,
)


def _dfs(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta".split())],
        "doc_id long, tokens array<string>",
    )
    corpus = spark.createDataFrame(
        [
            # shares bigrams "alpha beta" and "beta gamma" -> 2 hits
            (0, "alpha beta gamma zeta".split()),
            # shares only "delta" unigram, no bigram -> 0 hits
            (1, "delta epsilon zeta eta".split()),
            # shares exactly one bigram "gamma delta" -> 1 hit
            (2, "gamma delta theta iota".split()),
            # repeats a shared bigram: hits count DISTINCT grams -> 1
            (3, "alpha beta kappa alpha beta".split()),
        ],
        "doc_id long, tokens array<string>",
    )
    return corpus, bench


def test_report_counts_distinct_shared_grams(spark):
    corpus, bench = _dfs(spark)
    rep = {r["doc_id"]: r["n_hits"] for r in
           contamination_report(corpus, bench, n=2, min_hits=1).collect()}
    assert rep == {0: 2, 2: 1, 3: 1}


def test_decontaminate_threshold(spark):
    corpus, bench = _dfs(spark)
    kept = {r["doc_id"] for r in
            decontaminate(corpus, bench, n=2, min_hits=2).collect()}
    # only doc 0 crosses the 2-distinct-gram threshold
    assert kept == {1, 2, 3}


def test_probe_is_broadcast_no_python(spark):
    corpus, bench = _dfs(spark)
    plan = (
        contamination_report(corpus, bench, n=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_fuzzy_contamination_cross_set_only(spark):
    from entitymatch_spark.operators.decontam import fuzzy_contamination_report

    base = "federated learning converges faster when gradients compress sparsely worldwide".split()
    bench = spark.createDataFrame(
        [(100, base)], "doc_id long, tokens array<string>"
    )
    corpus = spark.createDataFrame(
        [
            (0, base),                               # exact copy -> flagged
            (1, base[:-1] + ["tonight"]),            # near dup -> flagged
            (2, "entirely different prose about parquet shuffles and salting".split()),
            (3, base),                               # corpus-internal dup of 0:
        ],                                           # both flagged vs bench,
        "doc_id long, tokens array<string>",         # never paired together
    )
    out = {r["doc_id"]: r["n_bench_matches"] for r in
           fuzzy_contamination_report(corpus, bench).collect()}
    assert out == {0: 1, 1: 1, 3: 1}


def test_fuzzy_plan_broadcasts_benchmark(spark):
    from entitymatch_spark.operators.decontam import fuzzy_contamination_report

    toks = [f"t{i}" for i in range(12)]
    corpus = spark.createDataFrame(
        [(i, toks) for i in range(20)], "doc_id long, tokens array<string>"
    )
    bench = spark.createDataFrame(
        [(100, toks)], "doc_id long, tokens array<string>"
    )
    plan = (
        fuzzy_contamination_report(corpus, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # both benchmark-side joins (band keys, token sets) must broadcast;
    # the corpus-side candidate hydration join MAY sort-merge — both of
    # its sides are corpus-scale pre-AQE, and that shuffle is the
    # honest cost (AQE converts it when the candidate set is small)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "EvalPython" not in plan
