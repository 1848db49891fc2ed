#!/usr/bin/env python
"""spark-submit entry point for the record-linkage pipeline and its
state lifecycle.

One-shot run (the original surface):

    spark-submit --py-files entitymatch_spark.zip scripts/run_pipeline.py \
        --input /path/to/pages_parquet --output /path/to/out \
        [--no-lsh] [--threshold 0.6] [--idf-max-entries 2000000] \
        [--resume-dir /path/to/ckpt]

State lifecycle (plans/incremental.py — the nightly-crawl deployment):

    ... run_pipeline.py --mode build  --input pages  --output out --state-out st0
    ... run_pipeline.py --mode grow   --input batch  --output out \
            --state-dir st0 --state-out st1          # score only batch-touching pairs
    ... run_pipeline.py --mode grow   --input batch2 --output out \
            --state-dir st1 --commit-in-place        # O(batch) delta commit, no st2
    ... run_pipeline.py --mode upsert --input recrawl --output out \
            --state-dir st1 --state-out st2          # same-url fresher-crawl replace
    ... run_pipeline.py --mode remove --delete-ids ids_parquet --output out \
            --state-dir st2 --state-out st3          # take-down / expiry
    ... run_pipeline.py --mode rethreshold --threshold 0.7 --output out \
            --state-dir st3 --state-out st4          # recalibrate, no rescoring

Every mode writes (url, cluster_id) parquet under --output plus a
metrics.json. State-mutating modes write the successor state to
--state-out — a NEW directory, not in place: the grown tables are
lazy plans READING the prior state's parquet, and parquet has no
atomic replace (an Iceberg deployment would commit a snapshot instead;
here the prior dir stays valid until the new one is fully written —
retire it once the write returns). The exception is grow's
--commit-in-place, which routes through commit_increment(): the
batch's deltas are MATERIALIZED first, then appended to the standing
tables (clusters replaced — row-level delete+append on Iceberg, full
overwrite here), so the nightly commit costs O(batch) writes instead
of an O(corpus) rewrite. On a cluster, master/executor sizing come
from spark-submit flags; this script only declares plans.

The --py-files zip is optional: ensure_workers_can_import() zips and
ships the package to executor python workers automatically (works for
local and cluster masters alike).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode",
        choices=["run", "build", "grow", "upsert", "remove", "rethreshold"],
        default="run",
        help="run = one-shot pipeline (default); the rest operate on a "
        "persisted MatchState (plans/incremental.py)",
    )
    ap.add_argument("--input", default=None, help="pages parquet dir")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--no-lsh", action="store_true")
    ap.add_argument("--idf-max-entries", type=int, default=None)
    ap.add_argument("--resume-dir", default=None,
                    help="checkpoint dir: enables manifest commit/resume "
                    "(mode=run only)")
    ap.add_argument("--state-dir", default=None,
                    help="existing MatchState dir (grow/upsert/remove/"
                    "rethreshold)")
    ap.add_argument("--state-out", default=None,
                    help="where to save the successor state (build/grow/"
                    "upsert/remove/rethreshold); must not equal --state-dir")
    ap.add_argument("--commit-in-place", action="store_true",
                    help="grow only: commit the batch to --state-dir "
                    "itself via commit_increment (O(batch) delta appends; "
                    "clusters replaced) instead of writing a full "
                    "successor state to --state-out")
    ap.add_argument("--delete-ids", default=None,
                    help="one-column parquet of ids to retire (mode=remove)")
    return ap


def run(args, spark) -> dict:
    from entitymatch_spark.plans.incremental import (
        incremental_match,
        initial_state,
        load_state,
        remove_docs,
        rethreshold,
        save_state,
        upsert_pages,
    )
    from entitymatch_spark.plans.pipeline import MatchConfig, match_pipeline
    from entitymatch_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)

    cfg = MatchConfig(use_lsh=not args.no_lsh)
    if args.idf_max_entries is not None:  # else: MatchConfig's bounded default
        cfg.idf_max_entries = args.idf_max_entries
    if args.threshold is not None and args.mode != "rethreshold":
        cfg.threshold = args.threshold

    needs_input = args.mode in ("run", "build", "grow", "upsert")
    if needs_input and not args.input:
        raise SystemExit(f"--input is required for mode={args.mode}")
    if args.commit_in_place and args.mode != "grow":
        raise SystemExit("--commit-in-place is only valid for mode=grow")
    if args.mode != "run":
        if args.state_out is None and not args.commit_in_place:
            raise SystemExit("--state-out is required for state modes")
        if args.mode != "build" and args.state_dir is None:
            raise SystemExit(f"--state-dir is required for mode={args.mode}")
        if args.state_out is not None and args.state_out == args.state_dir:
            raise SystemExit(
                "--state-out must differ from --state-dir: the successor "
                "state's plans read the prior dir (no in-place replace "
                "over parquet)"
            )

    t0 = time.time()
    metrics: dict = {"mode": args.mode}

    if args.mode == "run":
        pages = spark.read.parquet(args.input)
        if args.resume_dir:
            from entitymatch_spark.plans.resumable import resumable_match_pipeline

            res = resumable_match_pipeline(spark, pages, args.resume_dir, cfg)
            clusters, docs, pairs = res["clusters"], res["docs"], res["pairs"]
        else:
            res = match_pipeline(pages, cfg)
            clusters, docs, pairs = res.clusters, res.docs, res.pairs
        clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
        metrics.update(n_docs=docs.count(), n_pairs=pairs.count())
    else:
        if args.mode == "build":
            state = initial_state(spark.read.parquet(args.input), cfg)
        elif args.mode == "grow":
            st = load_state(spark, args.state_dir, cfg)
            res = incremental_match(st, spark.read.parquet(args.input))
            metrics["n_batch_pairs"] = res.pairs.count()
            metrics["n_batch_matches"] = res.matches.count()
            state = res.state
        elif args.mode == "upsert":
            st = load_state(spark, args.state_dir, cfg)
            res = upsert_pages(st, spark.read.parquet(args.input))
            metrics["n_batch_pairs"] = res.pairs.count()
            metrics["n_batch_matches"] = res.matches.count()
            state = res.state
        elif args.mode == "remove":
            if not args.delete_ids:
                raise SystemExit("--delete-ids is required for mode=remove")
            st = load_state(spark, args.state_dir, cfg)
            state = remove_docs(st, spark.read.parquet(args.delete_ids))
        else:  # rethreshold
            st = load_state(spark, args.state_dir, cfg)
            state = rethreshold(st, threshold=args.threshold)
        if args.commit_in_place:
            from entitymatch_spark.plans.incremental import commit_increment

            commit_increment(res, args.state_dir)
            committed_to = args.state_dir
        else:
            save_state(state, args.state_out)
            committed_to = args.state_out
        # clusters were just materialized by the commit; re-read for the
        # output copy instead of re-running the CC plan
        saved = spark.read.parquet(f"{committed_to}/clusters")
        saved.write.mode("overwrite").parquet(f"{args.output}/clusters")
        # count docs from the committed dir, not state.docs: after an
        # in-place commit that lazy plan re-reads the appended table
        # and would double-count the batch
        metrics.update(
            n_docs=spark.read.parquet(f"{committed_to}/docs").count(),
            n_clusters_rows=saved.count(),
        )

    metrics["wall_sec"] = round(time.time() - t0, 2)
    out = Path(args.output) / "metrics.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(metrics))
    return metrics


def main() -> None:
    args = build_parser().parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("entitymatch-pipeline").getOrCreate()
    print(json.dumps(run(args, spark)))
    spark.stop()


if __name__ == "__main__":
    main()
