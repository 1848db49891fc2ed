#!/usr/bin/env python
"""spark-submit entry point for the record-linkage pipeline.

    spark-submit --py-files entitymatch_spark.zip scripts/run_pipeline.py \
        --input /path/to/pages_parquet --output /path/to/out \
        [--no-lsh] [--threshold 0.6] [--idf-max-entries 2000000] \
        [--resume-dir /path/to/ckpt]

Reads a pages table (url, warc_ts, html, text, lang), runs
normalize -> blocking -> scoring -> connected components, writes
(url, cluster_id) parquet plus per-stage metrics. With --resume-dir,
stages commit through the manifest layer and a rerun after a kill
resumes mid-stage (north_rule). On a cluster, master/executor sizing
come from spark-submit flags; this script only declares the plan.

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet dir")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--no-lsh", action="store_true")
    ap.add_argument("--idf-max-entries", type=int, default=None)
    ap.add_argument("--resume-dir", default=None,
                    help="checkpoint dir: enables manifest commit/resume")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from entitymatch_spark.plans.pipeline import MatchConfig, match_pipeline
    from entitymatch_spark.session import ensure_workers_can_import

    spark = SparkSession.builder.appName("entitymatch-pipeline").getOrCreate()
    ensure_workers_can_import(spark)

    cfg = MatchConfig(use_lsh=not args.no_lsh)
    if args.idf_max_entries is not None:  # else: MatchConfig's bounded default
        cfg.idf_max_entries = args.idf_max_entries
    if args.threshold is not None:
        cfg.threshold = args.threshold

    t0 = time.time()
    pages = spark.read.parquet(args.input)
    if args.resume_dir:
        from entitymatch_spark.plans.resumable import resumable_match_pipeline

        res = resumable_match_pipeline(spark, pages, args.resume_dir, cfg)
        res["clusters"].write.mode("overwrite").parquet(f"{args.output}/clusters")
        metrics = {
            "n_docs": res["docs"].count(),
            "n_pairs": res["pairs"].count(),
        }
    else:
        res = match_pipeline(pages, cfg)
        res.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
        metrics = {
            "n_docs": res.docs.count(),
            "n_pairs": res.pairs.count(),
        }
    metrics["wall_sec"] = round(time.time() - t0, 2)
    out = Path(args.output) / "metrics.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(metrics))
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
