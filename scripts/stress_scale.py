#!/usr/bin/env python
"""Scale-headroom stress: the flagship pipeline at ~10x bench size.

The bench corpus is n_clusters=3000 (~10.6k docs, ~0.72M candidate
pairs). This runs the same MatchConfig at n_clusters=30000 (~106k
docs) and reports per-stage times, pair counts, and cluster recovery,
to evidence that stage costs grow ~linearly in pairs (blocking is
bounded per block, scoring is per-pair, CC is per-edge) and that the
bounded-memory guards (IDF broadcast cap, block purge) hold an order
of magnitude above the test scale.

Usage: python scripts/stress_scale.py [n_clusters] [cpus]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from entitymatch_spark.operators.clustering import assign_clusters, connected_components
from entitymatch_spark.operators.blocking import (
    candidate_pairs,
    lsh_band_keys,
    minhash_signature,
    token_blocking_keys_from_docs,
)
from entitymatch_spark.operators.posting import build_posting, collect_idf_map, token_idf
from entitymatch_spark.operators.scoring import score_pairs
from entitymatch_spark.plans.pipeline import MatchConfig, prepare_docs
from entitymatch_spark.session import get_spark
from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

N_CLUSTERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main():
    spark = get_spark("stress-scale", cpus=CPUS, shuffle_partitions=2 * CPUS)
    cfg = MatchConfig()

    t0 = time.perf_counter()
    pages = corpus_to_spark(spark, generate_corpus(n_clusters=N_CLUSTERS, seed=42))[
        "pages"
    ]
    pages.persist().count()
    t_gen = time.perf_counter() - t0

    t0 = time.perf_counter()
    docs = prepare_docs(pages, cfg).persist()
    n_docs = docs.count()
    idf = token_idf(build_posting(docs, id_col="doc_id"), n_docs=n_docs)
    keys = token_blocking_keys_from_docs(docs, idf, min_idf=cfg.min_idf).unionByName(
        lsh_band_keys(
            minhash_signature(docs, num_hashes=cfg.num_hashes, seed=cfg.seed),
            bands=cfg.bands,
            rows_per_band=cfg.rows_per_band,
        )
    )
    pairs = (
        candidate_pairs(keys, max_block=cfg.max_block)
        .repartition(CPUS * 4, "id_a")
        .sortWithinPartitions("id_a", "id_b")
        .persist()
    )
    n_pairs = pairs.count()
    t_block = time.perf_counter() - t0

    idf_map = collect_idf_map(idf)
    t0 = time.perf_counter()
    scored = score_pairs(pairs, docs, idf_map, weights=cfg.weights).persist()
    scored.count()
    t_score = time.perf_counter() - t0

    t0 = time.perf_counter()
    matches = scored.filter(F.col("score") >= cfg.threshold)
    n_edges = matches.count()
    comps = connected_components(matches.select("id_a", "id_b"), "id_a", "id_b")
    clusters = assign_clusters(docs.select("doc_id"), comps)
    n_clusters_found = clusters.select("cluster_id").distinct().count()
    t_cluster = time.perf_counter() - t0

    print(
        f"n_clusters={N_CLUSTERS} docs={n_docs} pairs={n_pairs} "
        f"edges={n_edges} clusters_found={n_clusters_found}"
    )
    print(
        f"gen={t_gen:.1f}s block={t_block:.1f}s score={t_score:.1f}s "
        f"cluster={t_cluster:.1f}s idf_entries={len(idf_map)}"
    )
    print(
        f"pairs/doc={n_pairs / n_docs:.1f} "
        f"score_pairs_per_sec={n_pairs / t_score:.0f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
