"""Cascade scoring equivalence + a real SIGKILL mid-stage resume."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import textwrap
import time
from pathlib import Path

from pyspark.sql import functions as F

from entitymatch_spark.operators.blocking import candidate_pairs, token_blocking_keys
from entitymatch_spark.operators.posting import build_posting, collect_idf_map, token_idf
from entitymatch_spark.operators.scoring import score_pairs
from entitymatch_spark.plans.pipeline import MatchConfig, prepare_docs
from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus


def test_cascade_matches_full_above_gate(spark):
    fx = generate_corpus(n_clusters=30, seed=3)
    pages = corpus_to_spark(spark, fx)["pages"]
    cfg = MatchConfig()
    docs = prepare_docs(pages, cfg).persist()
    n = docs.count()
    posting = build_posting(docs)
    idf = token_idf(posting, n_docs=n)
    pairs = candidate_pairs(token_blocking_keys(posting, idf, 1.0), max_block=64)
    idf_map = collect_idf_map(idf)

    full = score_pairs(pairs, docs, idf_map).collect()
    casc = score_pairs(pairs, docs, idf_map, cascade_min_jaccard=0.3).collect()
    f = {(r["id_a"], r["id_b"]): r for r in full}
    c = {(r["id_a"], r["id_b"]): r for r in casc}
    assert set(f) == set(c)  # same pair universe
    gated = passed = 0
    for k, rf in f.items():
        rc = c[k]
        if rf["jaccard"] >= 0.3:
            passed += 1
            for col in ("jw", "cosine", "containment", "score"):
                assert abs(rf[col] - rc[col]) < 1e-12, (k, col)
        else:
            gated += 1
            assert rc["jw"] == 0.0 and rc["cosine"] == 0.0
            assert rc["score"] < 0.6  # gated pairs can never match
    assert gated > 0 and passed > 0  # the gate actually split the set


_KILL_SCRIPT = textwrap.dedent(
    """
    import sys, os
    sys.path.insert(0, "/root/repo")
    from entitymatch_spark.session import get_spark
    from entitymatch_spark.plans.pipeline import MatchConfig
    from entitymatch_spark.plans.resumable import resumable_match_pipeline
    from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus
    import entitymatch_spark.plans.checkpoint as ckpt

    workdir = sys.argv[1]
    die_after = int(sys.argv[2])  # SIGKILL self after N scored buckets

    if die_after >= 0:
        orig = ckpt.CheckpointManager._log_metric
        state = {"n": 0}
        def wrapped(self, rec):
            orig(self, rec)
            if rec.get("stage") == "scored" and "bucket" in rec:
                state["n"] += 1
                if state["n"] >= die_after:
                    os.kill(os.getpid(), 9)  # hard kill, no cleanup
        ckpt.CheckpointManager._log_metric = wrapped

    spark = get_spark("killrun", cpus=4, shuffle_partitions=8)
    pages = corpus_to_spark(spark, generate_corpus(n_clusters=25, seed=17))["pages"]
    res = resumable_match_pipeline(spark, pages, workdir, MatchConfig(), n_score_buckets=4)
    import hashlib
    out = sorted((r["doc_id"], r["cluster_id"]) for r in res["clusters"].collect())
    digest = hashlib.md5(repr(out).encode()).hexdigest()
    print("CLUSTERS", len(out), digest)
    spark.stop()
    """
)


def test_sigkill_mid_scoring_then_resume(tmp_path):
    """First run is SIGKILLed after 2 of 4 scoring buckets commit; the
    rerun completes only the missing buckets and produces the same
    result as an uninterrupted run."""
    script = tmp_path / "killrun.py"
    script.write_text(_KILL_SCRIPT)
    work = tmp_path / "wk"

    p = subprocess.run(
        [sys.executable, str(script), str(work), "2"],
        capture_output=True, text=True, timeout=420,
    )
    assert p.returncode == -signal.SIGKILL or p.returncode == 137, p.returncode
    m = json.loads((work / "scored.manifest.json").read_text())
    done_before = list(m["buckets_done"])
    assert 0 < len(done_before) < 4  # died mid-stage

    p2 = subprocess.run(
        [sys.executable, str(script), str(work), "-1"],
        capture_output=True, text=True, timeout=420,
    )
    assert p2.returncode == 0, p2.stderr[-2000:]
    resumed = [l for l in p2.stdout.splitlines() if l.startswith("CLUSTERS")][0]

    m2 = json.loads((work / "scored.manifest.json").read_text())
    assert m2["complete"] and m2["buckets_done"] == [0, 1, 2, 3]
    for b in done_before:  # completed buckets were not rescored
        assert m2["rows_by_bucket"][str(b)] == m["rows_by_bucket"][str(b)]
    kill_metrics = [
        json.loads(l) for l in open(work / "metrics.jsonl")
        if json.loads(l).get("stage") == "scored"
    ]
    # total scored-bucket commits across both runs = exactly 4 (no redo)
    assert len(kill_metrics) == 4

    p3 = subprocess.run(
        [sys.executable, str(script), str(tmp_path / "fresh"), "-1"],
        capture_output=True, text=True, timeout=420,
    )
    assert p3.returncode == 0
    fresh = [l for l in p3.stdout.splitlines() if l.startswith("CLUSTERS")][0]
    assert resumed == fresh  # identical output to an uninterrupted run
