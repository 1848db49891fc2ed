#!/usr/bin/env python
"""A/B micro-benchmark: connected-components round shapes.

OLD: groupBy-mins + join-back stars (2 shuffles per star) with EAGER
     localCheckpoint (one extra job per round).
NEW (operators/clustering.py): window-min stars (1 shuffle per star),
     LAZY localCheckpoint materialized by the checksum job.

Usage: python scripts/micro_cluster.py [n_clusters] [repeats]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F

from entitymatch_spark.operators.clustering import (
    _checksum,
    connected_components,
)
from entitymatch_spark.operators.scoring import score_pairs
from entitymatch_spark.operators.blocking import (
    candidate_pairs,
    lsh_band_keys,
    minhash_signature,
    token_blocking_keys_from_docs,
)
from entitymatch_spark.operators.posting import (
    build_posting,
    collect_idf_map,
    token_idf,
)
from entitymatch_spark.plans.pipeline import MatchConfig, prepare_docs
from entitymatch_spark.session import get_spark
from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

N_CLUSTERS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def _large_star_old(edges):
    bidir = edges.select(F.col("u"), F.col("v")).union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = bidir.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return (
        bidir.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star_old(edges):
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = oriented.unionByName(
        oriented.select("u", F.col("u").alias("v")).distinct()
    )
    return (
        nbrs.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def cc_old(edges: DataFrame, src: str, dst: str, max_iter: int = 30) -> DataFrame:
    def cut(df):
        return df.localCheckpoint(eager=True)

    e = cut(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev = _checksum(e)
    for _ in range(max_iter):
        e = cut(_small_star_old(_large_star_old(e)))
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    members = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return members.unionByName(roots).distinct()


def main():
    spark = get_spark("micro-cluster", cpus=32, shuffle_partitions=64)
    cfg = MatchConfig()
    fx = generate_corpus(n_clusters=N_CLUSTERS, seed=42)
    docs = prepare_docs(corpus_to_spark(spark, fx)["pages"], cfg).persist()
    n_docs = docs.count()
    posting = build_posting(docs, id_col="doc_id")
    idf = token_idf(posting, n_docs=n_docs)
    keys = token_blocking_keys_from_docs(docs, idf, min_idf=cfg.min_idf).unionByName(
        lsh_band_keys(
            minhash_signature(docs, num_hashes=cfg.num_hashes, seed=cfg.seed),
            bands=cfg.bands, rows_per_band=cfg.rows_per_band,
        )
    )
    pairs = candidate_pairs(keys, max_block=cfg.max_block)
    idf_map = collect_idf_map(idf)
    matches = (
        score_pairs(pairs, docs, idf_map, weights=cfg.weights)
        .filter(F.col("score") >= cfg.threshold)
        .select("id_a", "id_b")
        .persist()
    )
    n_edges = matches.count()
    print(f"docs={n_docs} match_edges={n_edges}", flush=True)

    # equality first
    a = {(r["id"], r["component"]) for r in cc_old(matches, "id_a", "id_b").collect()}
    b = {
        (r["id"], r["component"])
        for r in connected_components(matches, "id_a", "id_b").collect()
    }
    print(f"old_rows={len(a)} new_rows={len(b)} equal={a == b}", flush=True)
    assert a == b

    variants = {"old_join_eager": cc_old, "new_window_lazy": connected_components}
    for r in range(REPEATS):
        items = list(variants.items())
        if r % 2:
            items.reverse()
        for name, fn in items:
            t0 = time.perf_counter()
            fn(matches, "id_a", "id_b").write.format("noop").mode("overwrite").save()
            print(f"round={r} {name}: {time.perf_counter() - t0:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
