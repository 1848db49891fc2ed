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


def test_fuzzy_recall_on_planted_paraphrases(spark):
    """The oracle rows prove Spark==DuckDB; this proves the LSH layout
    actually CATCHES paraphrased leakage. Plant one paraphrase per
    benchmark doc at jaccard ~0.5/0.6/0.7 (threshold-level rewording),
    score ground truth by brute-force integer jaccard, and gate recall
    at the default 8x2 band layout — expected 1-(1-j^2)^8 = 0.90/0.97/
    0.995 per tier. Also pin that the old 4x4 layout (P=0.23 at j=0.5)
    is strictly worse: the ADVICE-flagged silent-miss regression guard."""
    from entitymatch_spark.operators.decontam import fuzzy_contamination_report

    m = 40  # tokens per benchmark doc
    bench_rows, corpus_rows, truth = [], [], set()
    cid = 0
    for b in range(30):
        base = [f"w{b}_{i}" for i in range(m)]
        bench_rows.append((1000 + b, base))
        # replace k tokens -> jaccard (m-k)/(m+k); k per tier:
        # 13 -> 0.509, 10 -> 0.600, 7 -> 0.702
        k = [13, 10, 7][b % 3]
        para = [f"x{b}_{i}" for i in range(k)] + base[k:]
        inter, union = m - k, m + k
        if 2 * inter >= union:  # the verify threshold 1/2, integer form
            truth.add(cid)
        corpus_rows.append((cid, para))
        cid += 1
        # distractor sharing a handful of tokens (jaccard << 0.5)
        corpus_rows.append((cid, base[:4] + [f"d{b}_{i}" for i in range(m)]))
        cid += 1
    bench = spark.createDataFrame(bench_rows, "doc_id long, tokens array<string>")
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, tokens array<string>")

    def flagged(bands, rows_per_band):
        return {
            r["doc_id"]
            for r in fuzzy_contamination_report(
                corpus, bench, bands=bands, rows_per_band=rows_per_band
            ).collect()
        }

    got = flagged(8, 2)
    assert not (got - truth), "precision: verify step must kill sub-0.5 pairs"
    recall = len(got & truth) / len(truth)
    # deterministic at seed 42; measured 1.00 — gate leaves LSH headroom
    assert recall >= 0.85, f"8x2 recall {recall:.2f} below gate"
    # the pre-fix 4x4 layout must not silently come back
    old_recall = len(flagged(4, 4) & truth) / len(truth)
    assert recall > old_recall, (recall, old_recall)


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
