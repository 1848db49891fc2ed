#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

    {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...}

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1):

1. The end-to-end record-linkage pipeline on the deterministic labeled
   corpus sized to the scale factor, with per-stage timings — at
   local[8] AND local[32] (the sandbox stand-in for N vs 4N executors;
   BASELINE.json north_rule), reporting pairs-scored/sec at both and
   the scaling efficiency of the scoring stage.
2. Headline operator queries from __spark_entry__ on the driver
   testdata tables at full parallelism.

Each parallelism level runs in its own subprocess (one JVM cannot
change master after start)."""

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
SMALL_CPUS = max(1, FULL_CPUS // 4)

BENCH_QUERIES = [
    "build_posting",
    "token_idf",
    "word_freq",
    "tfidf_cosine_pairs",
    "score_pairs",
    "ann_cosine_topk",
    "dedup_minhash_lsh",
    "dedup_exact",
    "agg_lineitem",
    "histogram_summary",
]


def _sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def child_main(cpus: int, mode: str, out_path: str) -> None:
    from pyspark.sql import functions as F

    from entitymatch_spark.operators.blocking import (
        candidate_pairs, lsh_band_keys, minhash_signature, token_blocking_keys,
    )
    from entitymatch_spark.operators.clustering import (
        assign_clusters, connected_components,
    )
    from entitymatch_spark.operators.posting import (
        build_posting, collect_idf_map, token_idf,
    )
    from entitymatch_spark.operators.scoring import score_pairs
    from entitymatch_spark.plans.pipeline import MatchConfig, prepare_docs
    from entitymatch_spark.session import get_spark
    from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

    sf = _sf_from_dir(SF_DIR)
    spark = get_spark(f"bench-{cpus}", cpus=cpus, shuffle_partitions=2 * cpus)
    result: dict = {"cpus": cpus}

    # ---- end-to-end pipeline on the labeled corpus sized to sf ----------
    n_clusters = max(50, int(30000 * sf))
    fx = generate_corpus(n_clusters=n_clusters, seed=42)
    pages = corpus_to_spark(spark, fx)["pages"]
    cfg = MatchConfig()

    t0 = time.perf_counter()
    docs = prepare_docs(pages, cfg).persist()
    n_docs = docs.count()
    posting = build_posting(docs, id_col="doc_id")
    idf = token_idf(posting, n_docs=n_docs)
    keys = token_blocking_keys(posting, idf, min_idf=cfg.min_idf).unionByName(
        lsh_band_keys(
            minhash_signature(docs, num_hashes=cfg.num_hashes, seed=cfg.seed),
            bands=cfg.bands, rows_per_band=cfg.rows_per_band,
        )
    )
    pairs = candidate_pairs(keys, max_block=cfg.max_block).persist()
    n_pairs = pairs.count()
    t_block = time.perf_counter() - t0

    idf_map = collect_idf_map(idf)
    t1 = time.perf_counter()
    scored = score_pairs(pairs, docs, idf_map, weights=cfg.weights).persist()
    n_scored = scored.count()
    t_score = time.perf_counter() - t1

    t2 = time.perf_counter()
    matches = scored.filter(F.col("score") >= cfg.threshold)
    comps = connected_components(matches.select("id_a", "id_b"), "id_a", "id_b")
    n_clustered = assign_clusters(docs.select("doc_id"), comps).count()
    t_cluster = time.perf_counter() - t2

    result.update(
        n_docs=n_docs,
        n_pairs=n_pairs,
        e2e_sec=round(t_block + t_score + t_cluster, 3),
        block_sec=round(t_block, 3),
        score_sec=round(t_score, 3),
        cluster_sec=round(t_cluster, 3),
        pairs_scored_per_sec=round(n_scored / t_score, 1),
        docs_clustered=n_clustered,
    )

    # ---- headline operator queries on driver testdata --------------------
    if mode == "full":
        import __spark_entry__ as entry_mod

        qs = entry_mod.queries()
        timings = {}
        t3 = time.perf_counter()
        for name in BENCH_QUERIES:
            t = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t, 3)
        timings["e2e_match_pipeline"] = result["e2e_sec"]
        result["queries"] = timings
        result["queries_sec"] = round(time.perf_counter() - t3, 3)

    spark.stop()
    Path(out_path).write_text(json.dumps(result))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return

    results = {}
    for cpus, mode in [(SMALL_CPUS, "scale"), (FULL_CPUS, "full")]:
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
            out = f.name
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        subprocess.run(
            [sys.executable, str(REPO / "bench.py"), "--child", str(cpus), mode, out],
            check=True, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        results[cpus] = json.loads(Path(out).read_text())
        os.unlink(out)

    small, full = results[SMALL_CPUS], results[FULL_CPUS]
    ratio = full["pairs_scored_per_sec"] / small["pairs_scored_per_sec"]
    efficiency = ratio / (FULL_CPUS / SMALL_CPUS)
    out = {
        "metric": f"e2e_match_pipeline_local[{FULL_CPUS}]",
        "value": full["e2e_sec"],
        "unit": "sec",
        "queries": full["queries"],
        "sf": _sf_from_dir(SF_DIR),
        "n_docs": full["n_docs"],
        "n_pairs": full["n_pairs"],
        "pairs_scored_per_sec": full["pairs_scored_per_sec"],
        f"pairs_scored_per_sec_local[{SMALL_CPUS}]": small["pairs_scored_per_sec"],
        f"score_sec_local[{SMALL_CPUS}]": small["score_sec"],
        "scaling_speedup": round(ratio, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
