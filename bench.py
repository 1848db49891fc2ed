#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

    {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...}

Two subprocess legs (one JVM per master):

1. Scaling evidence (BASELINE.json north_rule: N vs 4N): the scoring
   stage of the record-linkage pipeline on an identical deterministic
   corpus at task-parallelism N=1 vs 4N=4. Each task holds TWO active
   threads (JVM + python worker), so these legs occupy 2 vs 8 threads
   — both inside the box's ~16 physical cores (the sandbox's 32
   "CPUs" are SMT logical cores, shared with neighbors); at N=2 the
   4N leg would need 16 threads and measure SMT oversubscription
   instead of engine scaling. Both legs run inside ONE local[4]
   session with parallelism bounded by the partition count of the
   cached pair table; legs alternate order per round, each leg runs
   min-of-SPARK_GRAFT_SCALE_PASSES (default 2) passes per round, and
   the HEADLINE efficiency is the ratio of per-leg FLOORS — each
   leg's min across every pass of every round, i.e. its clean-machine
   time, the quantity a dedicated cluster would show. Rationale: the
   box is SHARED, and per-round median ratios carry a bias whose SIGN
   flips with pass count (single-pass medians under-read: spikes land
   on the ~3.5x-longer N leg more often; multi-pass medians over-read:
   the short 4N leg reaches its floor first — measured 0.789-0.833 vs
   0.929 on the same code/box/day, floor ratio 0.876 in between,
   matching the box's 0.887 pure-python capacity curve). Reported:
   per-leg pairs-scored/sec at the floors + `efficiency` (floor
   ratio, headline) + `efficiency_median_round` and
   `efficiency_best_round` for transparency.
2. Full run at local[$SPARK_GRAFT_CPUS] (default 32): end-to-end
   pipeline on the sf-sized corpus + headline operator queries from
   __spark_entry__ on $SPARK_GRAFT_SF_DIR testdata.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FULL_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# N=1 -> 4N=4: every task runs 1 JVM thread + 1 python worker, so the
# legs hold 2 vs 8 active threads — BOTH inside the box's ~16 physical
# cores. At N=2 the 4N leg needs 16 active threads and starts measuring
# SMT/neighbor oversubscription instead of engine scaling (it reads
# 0.10-0.15 lower for the same code; see BASELINE.md).
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
SCALE_4N = 4 * SCALE_N
SCALE_CLUSTERS = int(os.environ.get("SPARK_GRAFT_SCALE_CLUSTERS", "1000"))
# best-of-R per leg: enough interleaved rounds to dodge shared-box
# neighbor spikes (r1 drift: 0.66-0.81 at R=3). ODD on purpose — the
# efficiency headline is the median round, and an odd count has a true
# middle element (an even count forces a choice between the upper
# median, which over-reads, and interpolation, which manufactures a
# value no round actually measured). 9 rounds because observed
# contention spikes last ~1-2 min and a round is ~45 s: one spike
# pollutes 2-3 ADJACENT rounds (seen twice on 2026-08-18: medians
# 0.714/0.779 with exactly two ~60%-slower 4N legs back-to-back,
# 0.837 minutes earlier on identical code), and the median needs a
# majority of clean rounds to ignore them.
SCALE_REPEATS = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "9"))
SCALE_PASSES = int(os.environ.get("SPARK_GRAFT_SCALE_PASSES", "2"))
# best-of-N for the once-per-pipeline block/cluster stages (the score
# stage already repeats): 2 passes halve the exposure to shared-box
# weather at ~10s extra untimed wall
BLOCK_REPEATS = int(os.environ.get("SPARK_GRAFT_BLOCK_REPEATS", "2"))
# best-of-N for the FULL leg's scoring stage — its own knob: reusing
# SCALE_REPEATS here silently changed the e2e headline whenever a user
# shortened the scale leg, making records incomparable
FULL_SCORE_REPEATS = int(os.environ.get("SPARK_GRAFT_FULL_SCORE_REPEATS", "9"))

BENCH_QUERIES = [
    "build_posting",
    "token_idf",
    "word_freq",
    "tfidf_cosine_pairs",
    "score_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_exact",
    # ExactSubstr duplicate spans (window count + span merge fold) —
    # the substring-level dedup leg
    "dedup_substring",
    # composed curation keep-set (quality -> LSH dedup -> closure ->
    # md5 sample) in the portable-hash variant — the training-data
    # pipeline leg
    "curate_corpus",
    # unigram-LM perplexity filter (broadcast model join + per-doc
    # aggregate) — the LM-quality leg
    "unigram_nll",
    "winnowing_fingerprints",
    "agg_lineitem",
    "histogram_summary",
]


def _sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.removeprefix("sf"))
    except ValueError:
        # a silent 0.1 fallback mis-sized the synthetic corpus AND
        # mislabeled the output record — refuse loudly instead
        raise ValueError(
            f"cannot parse scale factor from {name!r} (expected 'sf<float>',"
            " e.g. sf0.1); set SPARK_GRAFT_SF_DIR to a standard testdata dir"
        ) from None


def _warmup(spark, cpus):
    """Spin up the python worker pool + whole-stage-codegen/JIT before
    any timed stage, so the timed numbers measure steady-state
    throughput rather than one-time compile cost (which a long-running
    cluster amortizes to zero). Two parts, both on toy data, untimed:

    1. generic paths: the Arrow UDF worker pool and the higher-order-
       function interpreter (minhash/simhash folds);
    2. a miniature end-to-end match pipeline (~170 docs) — the SAME
       operator compositions as the timed run (prepare_docs, posting,
       IDF, token+LSH keys, single-pass candidate_pairs, Arrow scorer,
       connected components, assign_clusters), so Janino's codegen
       cache and the JVM JIT are hot for those exact plan shapes.
       Micro-profile evidence (scripts/micro_block.py): the blocking
       stage runs 16.2s cold vs 4.1s on the third identical pass."""
    from pyspark.sql import functions as F

    from entitymatch_spark.plans.pipeline import MatchConfig, match_pipeline
    from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

    _w = F.pandas_udf(lambda s: s * 1.0, "double")
    (
        spark.range(cpus * 20000).repartition(cpus)
        .select(_w(F.col("id").cast("double")))
        .write.format("noop").mode("overwrite").save()
    )
    (
        spark.range(1000)
        .select(F.array(F.col("id"), F.col("id") + 1).alias("xs"))
        .select(
            F.aggregate(
                "xs", F.lit(0).cast("long"),
                lambda a, x: a + F.xxhash64(x.cast("string")) % 7,
            )
        )
        .write.format("noop").mode("overwrite").save()
    )
    pages = corpus_to_spark(spark, generate_corpus(n_clusters=50, seed=1))["pages"]
    res = match_pipeline(pages, MatchConfig(cache=False))
    res.clusters.write.format("noop").mode("overwrite").save()
    # incremental shapes too (asymmetric block expansion, cluster
    # merge): the incremental leg otherwise pays their one-time
    # codegen in its timed window (measured ~6s of a first pass)
    from entitymatch_spark.plans.incremental import incremental_match, initial_state

    wb = F.pmod(F.xxhash64("url"), F.lit(5)) == 0
    st = initial_state(pages.filter(~wb), MatchConfig(cache=False))
    incremental_match(st, pages.filter(wb)).state.clusters.write.format(
        "noop"
    ).mode("overwrite").save()


def _scale_legs(spark, n_clusters: int) -> dict:
    """Interleaved N vs 4N scoring-throughput legs in one session.

    Parallelism is bounded by the partition count of the cached pair
    table: a stage over p partitions runs p concurrent tasks (p JVM
    threads + p python workers). Legs alternate (N, 4N) x R rounds,
    best-of-R per leg, so both levels sample the same few minutes of
    this shared box.
    """
    from entitymatch_spark.operators.blocking import candidate_pairs
    from entitymatch_spark.operators.posting import (
        build_posting, collect_idf_map, token_idf,
    )
    from entitymatch_spark.operators.scoring import score_pairs
    from entitymatch_spark.plans.pipeline import (
        MatchConfig, blocking_keys, prepare_docs,
    )
    from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

    cfg = MatchConfig()
    fx = generate_corpus(n_clusters=n_clusters, seed=42)
    pages = corpus_to_spark(spark, fx)["pages"]
    docs = prepare_docs(pages, cfg).persist()
    n_docs = docs.count()
    posting = build_posting(docs, id_col="doc_id")
    idf = token_idf(posting, n_docs=n_docs)
    # THE pipeline's key construction (shared helper) — the timed legs
    # measure exactly what match_pipeline runs, hash variants included
    keys = blocking_keys(docs, idf, cfg)
    # persist the pair table ONCE: each leg's repartition (and the
    # count below) would otherwise re-run the whole blocking chain
    pairs = candidate_pairs(keys, max_block=cfg.max_block).persist()
    n_pairs = pairs.count()
    idf_map = collect_idf_map(idf)

    legs = {}
    for p in (SCALE_N, SCALE_4N):
        # ROUND-ROBIN + local sort, deliberately NOT the pipeline's
        # hash-by-id_a: at p=4 a hash layout is unbalanced (pairs
        # concentrate on hot docs; the leg time is max-of-partitions,
        # so a few % skew reads as lost efficiency) while round-robin
        # is exactly balanced at any p. The local sort still gives the
        # scorer's per-batch doc-profile memo its locality. At the
        # pipeline's 4x-cores partition counts hash imbalance washes
        # out; at p=4 it would measure hash granularity, not scaling.
        legs[p] = (
            pairs.repartition(p).sortWithinPartitions("id_a", "id_b").persist()
        )
        legs[p].count()
    pairs.unpersist()
    # Methodology guard: "parallelism = partition count of the pair
    # table" only holds while the docs-side joins in score_pairs are
    # BROADCAST (a shuffle join would re-partition both legs to
    # spark.sql.shuffle.partitions and the N vs 4N ratio would no
    # longer measure capacity). Check the plan that actually RUNS:
    # under AQE the pre-execution executedPlan() string is the INITIAL
    # static plan (isFinalPlan=false) — a static SortMergeJoin that
    # AQE would convert at runtime must not abort a valid run, so
    # execute the 4N probe once (untimed; doubles as a score-path
    # warmup) and assert the finalized plan. An explicit raise, not a
    # bare assert: the precondition of the headline number must
    # survive python -O.
    probe = score_pairs(legs[SCALE_4N], docs, idf_map, weights=cfg.weights)
    probe.write.format("noop").mode("overwrite").save()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    if "BroadcastHashJoin" not in plan or "SortMergeJoin" in plan:
        raise AssertionError(
            "scaling legs require broadcast doc-side joins; final plan "
            "was:\n" + plan[:2000]
        )
    # Arrow batch granularity for the scale legs: the SESSION DEFAULT
    # (40k), same config both legs, same config as the production
    # pipeline. A 2k-batch variant was trialled on the theory that the
    # p1 leg's ~5 batches pay a pipeline fill/drain bubble the p4 leg
    # hides; a controlled same-box A/B (5 interleaved rounds each,
    # back-to-back) refuted it: at 2k the p1 leg does run faster
    # (22.4s vs 26.3s best — large-frame pandas cost is real for the
    # single task) but the p4 leg gets SLOWER AND ERRATIC (8.1-10.8s
    # vs a stable 7.8-8.3s at 40k, drifting upward across rounds).
    # Mechanism: at 2k the p4 leg crosses 4x96=384 batch boundaries,
    # each allocating JVM-side Arrow buffers in the ONE shared
    # local-mode JVM — accumulating GC pressure that a real 4N-executor
    # cluster (4 independent JVMs) does not share. Per-core per-pair
    # cost: p1@40k 136us, p4@40k 161us, p1@2k 116us, p4@2k 167-224us.
    # Cross-checking the box's own capacity: a pure-python
    # multiprocessing run of the exact scorer workload scales at 0.887
    # efficiency (BASELINE.md r2 note), bracketing the 40k reading
    # (0.885 in the A/B) and marking the sub-0.8 2k readings as
    # shared-JVM artifacts, not engine behavior. Same-config-both-legs
    # at the session default is also the honest "same job, two
    # parallelism levels" reading. SPARK_GRAFT_SCALE_BATCH re-runs the
    # A/B.
    batch_prior = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    scale_batch = os.environ.get("SPARK_GRAFT_SCALE_BATCH", batch_prior)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", scale_batch)
    best = {SCALE_N: float("inf"), SCALE_4N: float("inf")}
    rounds = []  # (t_N, t_4N) measured back-to-back in one weather window
    for r in range(max(1, SCALE_REPEATS)):
        # alternate leg order each round so a neighbor-load ramp during a
        # round penalizes both legs symmetrically over the run
        order = (SCALE_N, SCALE_4N) if r % 2 == 0 else (SCALE_4N, SCALE_N)
        took = {}
        for p in order:
            # Per-leg min-of-SCALE_PASSES within the round's weather
            # window: neighbor contention only ever INFLATES a leg, so
            # the min is the least-contended estimate of that leg in
            # that window, and taking it for BOTH legs symmetrically
            # does not bias the ratio (unlike best-leg-across-rounds,
            # which mixes weather windows — see below). Observed
            # effect: single-pass medians on the same code/box swung
            # 0.789-0.833 across runs (spike rounds land on one leg at
            # random); two passes halve a leg's exposure per round.
            t_leg = float("inf")
            for _ in range(max(1, SCALE_PASSES)):
                t0 = time.perf_counter()
                score_pairs(
                    legs[p], docs, idf_map, weights=cfg.weights
                ).write.format("noop").mode("overwrite").save()
                t_leg = min(t_leg, time.perf_counter() - t0)
            took[p] = t_leg
            best[p] = min(best[p], took[p])
        rounds.append((took[SCALE_N], took[SCALE_4N]))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", batch_prior)
    for df in (docs, *legs.values()):
        df.unpersist()
    # Two estimator families, both reported; the FLOOR ratio is the
    # headline (see the comment at eff_floor below for the measured
    # evidence). Per-round ratios pair legs within one weather window
    # (common-mode load cancels); their median's residual bias flips
    # sign with pass count, which is why they are secondary now.
    # SCALE_REPEATS is odd so len//2 is the true middle element; with a
    # user-forced even count this is the upper median (documented bias).
    per_round_eff = sorted(tn / t4 / 4.0 for tn, t4 in rounds)
    eff_median = per_round_eff[len(per_round_eff) // 2]
    eff_best = per_round_eff[-1]
    # HEADLINE = ratio of per-leg FLOORS (min across every pass of
    # every round). The floor is each leg's clean-machine time — the
    # quantity a dedicated N- or 4N-executor cluster would show — and
    # with SCALE_REPEATS*SCALE_PASSES samples per leg both floors
    # converge, so the estimator is stable run-to-run. Why not the
    # per-round median ratio: its bias FLIPS with pass count on a
    # shared box. Measured, same code/box/day: single-pass medians
    # read 0.789-0.833 (a contention spike lands on one leg of a
    # round at random, and the long leg is exposed ~3.5x longer, so
    # spikes deflate more rounds than they inflate); min-of-2 medians
    # read 0.929 with a nonphysical 1.118 best round (the short leg
    # reaches its floor in fewer passes than the long leg, so rounds
    # where the long leg stayed dirty over-read). The floor ratio on
    # the same data reads 0.876 — bracketed by both and matching the
    # box's own capacity curve (0.887 pure-python multiprocessing of
    # the same scorer workload, BASELINE.md r2 note), which neither
    # median matches. Both medians stay reported for transparency.
    eff_floor = best[SCALE_N] / best[SCALE_4N] / 4.0
    return {
        "n_docs": n_docs,
        "n_pairs": n_pairs,
        f"score_sec_p{SCALE_N}": round(best[SCALE_N], 3),
        f"score_sec_p{SCALE_4N}": round(best[SCALE_4N], 3),
        f"pairs_per_sec_p{SCALE_N}": round(n_pairs / best[SCALE_N], 1),
        f"pairs_per_sec_p{SCALE_4N}": round(n_pairs / best[SCALE_4N], 1),
        "rounds_sec": [(round(a, 3), round(b, 3)) for a, b in rounds],
        "efficiency_best_round": round(eff_best, 3),
        "efficiency_median_round": round(eff_median, 3),
        "speedup": round(4.0 * eff_floor, 3),
        "efficiency": round(eff_floor, 3),
    }


def _pipeline_stages(spark, cpus: int, n_clusters: int, pages=None) -> dict:
    """Staged pipeline run with per-stage timings; returns metrics."""
    from pyspark.sql import functions as F

    from entitymatch_spark.operators.blocking import candidate_pairs
    from entitymatch_spark.operators.clustering import (
        assign_clusters, connected_components,
    )
    from entitymatch_spark.operators.posting import (
        build_posting, collect_idf_map, token_idf,
    )
    from entitymatch_spark.operators.scoring import score_pairs
    from entitymatch_spark.plans.pipeline import (
        MatchConfig, blocking_keys, prepare_docs,
    )
    from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

    cfg = MatchConfig()
    if pages is None:
        pages = corpus_to_spark(
            spark, generate_corpus(n_clusters=n_clusters, seed=42)
        )["pages"]

    # Block and cluster run once per pipeline, so a single timing pass
    # is fully exposed to shared-box weather (observed 6.7s vs 22.0s on
    # byte-identical code hours apart). Best-of-N with a FRESHLY BUILT
    # plan per pass: new DataFrame lineage -> new RDDs, so Spark can't
    # skip stages via existing shuffle files and every pass honestly
    # recomputes. The losing pass's persists are dropped.
    t_block = float("inf")
    docs = idf = pairs = None
    for _ in range(max(1, BLOCK_REPEATS)):
        # Drop the previous pass's cache FIRST: Spark's cache manager
        # substitutes any live cached subtree with an identical
        # analyzed plan, so a later pass would otherwise "recompute"
        # by reading the earlier pass's cache (observed: 1.3s for a
        # 6.7s stage). With the cache gone and a fresh lineage, every
        # pass pays the full compute.
        if docs is not None:
            docs.unpersist()
            pairs.unpersist()
        t0 = time.perf_counter()
        docs = prepare_docs(pages, cfg).persist()
        n_docs = docs.count()
        idf = token_idf(build_posting(docs, id_col="doc_id"), n_docs=n_docs)
        # shared pipeline key construction; no persist — candidate_pairs
        # consumes the key table once
        keys = blocking_keys(docs, idf, cfg)
        # hash-by-id_a + local sort = per-batch doc-profile locality in
        # the Arrow scorer (~2x at 10x scale; see plans/pipeline.py)
        pairs = (
            candidate_pairs(keys, max_block=cfg.max_block)
            .repartition(cpus * 4, "id_a")
            .sortWithinPartitions("id_a", "id_b")
            .persist()
        )
        n_pairs = pairs.count()
        t_block = min(t_block, time.perf_counter() - t0)

    idf_map = collect_idf_map(idf)
    # best-of-N on the scoring stage (the throughput-scaling surface):
    # repeats squeeze out worker-pool cold start + scheduler noise.
    # Timing passes sink to noop; a final untimed pass persists for
    # clustering.
    times = []
    for _ in range(max(1, FULL_SCORE_REPEATS)):
        t1 = time.perf_counter()
        score_pairs(pairs, docs, idf_map, weights=cfg.weights).write.format(
            "noop"
        ).mode("overwrite").save()
        times.append(time.perf_counter() - t1)
    t_score = min(times)
    n_scored = n_pairs
    scored = score_pairs(pairs, docs, idf_map, weights=cfg.weights).persist()
    scored.count()

    t_cluster = float("inf")
    for _ in range(max(1, BLOCK_REPEATS)):
        t2 = time.perf_counter()
        matches = scored.filter(F.col("score") >= cfg.threshold)
        comps = connected_components(matches.select("id_a", "id_b"), "id_a", "id_b")
        n_clustered = assign_clusters(docs.select("doc_id"), comps).count()
        t_cluster = min(t_cluster, time.perf_counter() - t2)

    for df in (docs, pairs, scored):
        df.unpersist()
    return {
        "n_docs": n_docs,
        "n_pairs": n_pairs,
        "block_sec": round(t_block, 3),
        "score_sec": round(t_score, 3),
        "cluster_sec": round(t_cluster, 3),
        "e2e_sec": round(t_block + t_score + t_cluster, 3),
        "pairs_scored_per_sec": round(n_scored / t_score, 1),
        "docs_clustered": n_clustered,
    }


def _incremental_stage(spark, n_clusters: int, pages=None) -> dict:
    """Batch-incremental growth cost: time matching a ~10% batch into a
    standing corpus (plans/incremental.py) — the operation a daily
    crawl pays — against the full-recompute e2e number reported
    alongside. The state is loaded from parquet exactly as a real
    deployment would (build + save are untimed): the timed leg pays
    batch key construction, the key/doc semi-joins against the stored
    tables, scoring of batch-touching pairs, and the affected-cluster
    merge. Best-of-N like the other once-per-pipeline stages."""
    import shutil

    from pyspark.sql import functions as F

    from entitymatch_spark.plans.incremental import (
        incremental_match, initial_state, load_state, save_state,
    )
    from entitymatch_spark.plans.pipeline import MatchConfig
    from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

    cfg = MatchConfig()
    if pages is None:
        pages = corpus_to_spark(
            spark, generate_corpus(n_clusters=n_clusters, seed=42)
        )["pages"]
    # The batch holds out ~10% of ENTITIES (whole ground-truth
    # clusters): the dominant growth regime for a crawl is new content
    # arriving, which touches only the blocks its own tokens/bands
    # reach. A uniform 10% doc resample is the worst case instead —
    # every block and nearly every doc gets touched, and the batch
    # costs close to a full run; that regime is exercised (and proven
    # exact) by tests/test_incremental_batch.py, while the bench
    # measures the operation as deployed.
    is_batch = F.pmod(F.xxhash64(F.col("cluster_id").cast("string")), F.lit(10)) == 0
    base, batch = pages.filter(~is_batch), pages.filter(is_batch)
    n_batch = batch.count()

    # The scale claim is corpus-size INDEPENDENCE: the SAME batch is
    # matched into the base corpus and into one ~3x its size (extra
    # disjoint entities, same vocabulary family — they share blocks but
    # not matches, exactly like unrelated web pages). The batch cost
    # should track the batch's blocking degree, not the corpus size:
    # ratio_3x near 1.0 is the evidence, vs a full recompute whose cost
    # triples.
    filler = corpus_to_spark(
        spark,
        generate_corpus(
            n_clusters=2 * n_clusters, seed=77, cluster_id_offset=n_clusters
        ),
    )["pages"]
    out = {"incr_batch_docs": n_batch}
    for tag, corpus in (("", base), ("_3x", base.unionByName(filler))):
        state_dir = tempfile.mkdtemp(prefix="bench_state_")
        st0 = initial_state(corpus, cfg)  # untimed standing corpus
        save_state(st0, state_dir)
        # release EVERYTHING the untimed build cached (docs AND the
        # candidate-pair table cfg.cache persisted): leaked cache
        # entries sit in executor storage through the timed reps below
        # and turn into eviction/GC noise inside the measured windows
        spark.catalog.clearCache()
        t_incr, n_total = float("inf"), 0
        # min-of-3 here even when BLOCK_REPEATS=2: each timed rep
        # directly follows the untimed state build (a multi-minute
        # full pipeline at 3x), so the first rep routinely reads hot;
        # with only 2 reps one dirty rep leaves a single sample and
        # the incr_ratio_3x headline wobbled 1.0-1.3 across driver
        # runs while the quiet-box stress harness (min-of-3, 10x legs)
        # pinned it flat (SCALING.md / BASELINE.md round-4 tables).
        for _ in range(max(3, BLOCK_REPEATS)):
            st = load_state(spark, state_dir, cfg)
            t0 = time.perf_counter()
            res = incremental_match(st, batch)
            n_total = res.state.clusters.count()
            t_incr = min(t_incr, time.perf_counter() - t0)
            for df in (res.new_docs, res.pairs):
                df.unpersist()
        if tag == "":
            # recalibration cost: a new threshold over the PERSISTED
            # scored-pair state (no blocking, no Arrow scorer — pure
            # column math + one CC pass). Compare to e2e: this is what
            # a calibration change costs instead of a full re-run.
            from entitymatch_spark.plans.incremental import rethreshold

            t_re = float("inf")
            for _ in range(max(1, BLOCK_REPEATS)):
                st = load_state(spark, state_dir, cfg)
                t0 = time.perf_counter()
                rethreshold(st, threshold=0.70).clusters.count()
                t_re = min(t_re, time.perf_counter() - t0)
            out["rethreshold_sec"] = round(t_re, 3)
            # deletion cost: retire a ~5% doc sample from the loaded
            # state (plans/incremental.py remove_docs — broadcast
            # anti-joins + CC over affected clusters only). Like the
            # batch leg, this should track the delete set / its
            # clusters, not the corpus.
            from entitymatch_spark.plans.incremental import remove_docs

            t_rm = float("inf")
            gone = corpus.filter(
                F.pmod(F.xxhash64("url"), F.lit(20)) == 0
            ).select("url")
            for _ in range(max(1, BLOCK_REPEATS)):
                st = load_state(spark, state_dir, cfg)
                t0 = time.perf_counter()
                remove_docs(st, gone).clusters.count()
                t_rm = min(t_rm, time.perf_counter() - t0)
            out["remove_docs_sec"] = round(t_rm, 3)
        shutil.rmtree(state_dir, ignore_errors=True)
        out[f"incr_total_docs{tag}"] = n_total
        out[f"incr_batch_sec{tag}"] = round(t_incr, 3)
    out["incr_ratio_3x"] = round(
        out["incr_batch_sec_3x"] / out["incr_batch_sec"], 3
    )
    return out


def child_main(cpus: int, mode: str, out_path: str) -> None:
    from entitymatch_spark.session import get_spark

    spark = get_spark(f"bench-{cpus}", cpus=cpus, shuffle_partitions=2 * cpus)
    _warmup(spark, cpus)
    result: dict = {"cpus": cpus}

    if mode == "scale":
        result.update(_scale_legs(spark, SCALE_CLUSTERS))
    else:  # full
        sf = _sf_from_dir(SF_DIR)
        ncl = max(50, int(30000 * sf))
        # ONE deterministic corpus for both stages (the incremental
        # stage previously regenerated the identical fixture)
        from entitymatch_spark.sources.synthetic import (
            corpus_to_spark, generate_corpus,
        )
        bench_pages = corpus_to_spark(
            spark, generate_corpus(n_clusters=ncl, seed=42)
        )["pages"]
        result.update(_pipeline_stages(spark, cpus, ncl, pages=bench_pages))
        import __spark_entry__ as entry_mod

        qs = entry_mod.queries()
        timings = {}
        for name in BENCH_QUERIES:
            t = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t, 3)
        timings["e2e_match_pipeline"] = result["e2e_sec"]
        # per-stage decomposition of the e2e number (block includes
        # normalize/posting/IDF/keys/pairs; score is best-of-repeats)
        timings["pipeline_block_stage"] = result["block_sec"]
        timings["pipeline_score_stage"] = result["score_sec"]
        timings["pipeline_cluster_stage"] = result["cluster_sec"]
        incr = _incremental_stage(spark, ncl, pages=bench_pages)
        result.update(incr)
        timings["incremental_10pct_batch"] = incr["incr_batch_sec"]
        timings["rethreshold_recalibrate"] = incr["rethreshold_sec"]
        timings["remove_docs_retire"] = incr["remove_docs_sec"]
        result["queries"] = timings

    spark.stop()
    Path(out_path).write_text(json.dumps(result))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return

    legs = [(SCALE_4N, "scale"), (FULL_CPUS, "full")]
    results = {}
    for cpus, mode in legs:
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
            out = f.name
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        try:
            # capture (don't discard) child output: on failure the Spark
            # traceback lives in the child's stderr, and a bare
            # CalledProcessError with no context is undiagnosable
            proc = subprocess.run(
                [sys.executable, str(REPO / "bench.py"), "--child", str(cpus), mode, out],
                env=env, capture_output=True, text=True,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-8000:])
                raise subprocess.CalledProcessError(
                    proc.returncode, proc.args, proc.stdout, proc.stderr
                )
            results[mode] = json.loads(Path(out).read_text())
        finally:
            Path(out).unlink(missing_ok=True)

    scale = results["scale"]
    full = results["full"]
    out = {
        "metric": f"e2e_match_pipeline_local[{FULL_CPUS}]",
        "value": full["e2e_sec"],
        "unit": "sec",
        "queries": full["queries"],
        "sf": _sf_from_dir(SF_DIR),
        "n_docs": full["n_docs"],
        "n_pairs": full["n_pairs"],
        "pairs_scored_per_sec": full["pairs_scored_per_sec"],
        "incremental": {
            "batch_docs": full["incr_batch_docs"],
            "total_docs": full["incr_total_docs"],
            "total_docs_3x": full["incr_total_docs_3x"],
            "batch_sec": full["incr_batch_sec"],
            "batch_sec_3x": full["incr_batch_sec_3x"],
            "ratio_3x": full["incr_ratio_3x"],
            "vs_full_e2e": round(full["incr_batch_sec"] / full["e2e_sec"], 3),
            "rethreshold_sec": full["rethreshold_sec"],
            "rethreshold_vs_full_e2e": round(
                full["rethreshold_sec"] / full["e2e_sec"], 3
            ),
            "remove_docs_sec": full["remove_docs_sec"],
            "remove_vs_full_e2e": round(
                full["remove_docs_sec"] / full["e2e_sec"], 3
            ),
        },
        "scaling": {
            "method": (
                f"one local[{SCALE_4N}] session; task parallelism bounded by "
                f"partition count ({SCALE_N} vs {SCALE_4N}); "
                f"{SCALE_REPEATS} interleaved rounds x min-of-{SCALE_PASSES} "
                f"passes per leg; headline = per-leg floor ratio "
                f"(clean-machine times; round medians reported alongside); "
                f"session-default Arrow batches both legs "
                f"(same job config at both levels)"
            ),
            "n_cpus": SCALE_N,
            "4n_cpus": SCALE_4N,
            "scale_corpus_docs": scale["n_docs"],
            "scale_corpus_pairs": scale["n_pairs"],
            f"pairs_per_sec_p{SCALE_N}": scale[f"pairs_per_sec_p{SCALE_N}"],
            f"pairs_per_sec_p{SCALE_4N}": scale[f"pairs_per_sec_p{SCALE_4N}"],
            f"score_sec_p{SCALE_N}": scale[f"score_sec_p{SCALE_N}"],
            f"score_sec_p{SCALE_4N}": scale[f"score_sec_p{SCALE_4N}"],
            "rounds_sec": scale["rounds_sec"],
            "efficiency_best_round": scale["efficiency_best_round"],
            "efficiency_median_round": scale["efficiency_median_round"],
            "speedup": scale["speedup"],
            "efficiency": scale["efficiency"],
        },
        "scaling_efficiency": scale["efficiency"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
