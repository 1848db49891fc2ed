#!/usr/bin/env python
"""Corpus-size stress for the round-3 curation heads: latest_snapshot,
curate(), and fuzzy_contamination_report at 1x / 3x / 10x bench size.

Each op's SCALING.md argument predicts ~linear cost in corpus rows
(one columnar scan + the op's single keyed shuffle), with no cliff from
a driver-side or broadcast structure growing with the corpus:

- latest_snapshot: pure JVM canonicalization chain + one hash shuffle
  on the canonical key feeding a WindowGroupLimit-pinned rank window.
  Stress input plants THREE crawl snapshots per page (base URL, a
  later recrawl under a tracking param, a still-later one under a
  fragment) so every canonical group actually exercises the window.
- curate: quality gate (narrow) -> minhash/LSH over the filtered pool
  (zero-shuffle fold) -> purge-capped block join -> CC -> anti-join.
  All stages bounded per block/edge, nothing all-pairs.
- fuzzy_contamination_report: the benchmark side is FIXED (the shape
  of a real eval set) and broadcast at both the key and verify joins;
  corpus rows never shuffle on the band key, so cost ~= one corpus
  scan + the final per-doc count.

Evidence of "no cliff" = time_10x / time_1x <= ~10 (sublinear in
practice: per-job overheads amortize). REPEATS=min-of-3 like the
bench's scale legs.

Usage: python scripts/stress_curation.py [n_clusters] [cpus]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from entitymatch_spark.functions.text import tokenize
from entitymatch_spark.operators.decontam import fuzzy_contamination_report
from entitymatch_spark.operators.urlnorm import latest_snapshot
from entitymatch_spark.plans.curate import CurateConfig, curate
from entitymatch_spark.session import get_spark
from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

N_CLUSTERS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
REPEATS = 3


def timed(fn) -> tuple[float, int]:
    best, n = float("inf"), 0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        n = fn().count()
        best = min(best, time.perf_counter() - t0)
    return best, n


def main() -> None:
    spark = get_spark("stress-curation", cpus=CPUS, shuffle_partitions=2 * CPUS)

    legs = []
    offset = 0
    prev = None
    for tag, extra in (("1x", N_CLUSTERS), ("3x", 2 * N_CLUSTERS), ("10x", 7 * N_CLUSTERS)):
        part = corpus_to_spark(
            spark,
            generate_corpus(
                n_clusters=extra, seed=42 if offset == 0 else 70 + extra,
                cluster_id_offset=offset,
            ),
        )["pages"]
        cur = part if prev is None else prev.unionByName(part)
        legs.append((tag, cur))
        prev = cur
        offset += extra

    # Fixed benchmark: ~1/50 of the 1x leg's docs, identical across
    # legs (a real eval set does not grow with the training corpus).
    base_docs = (
        legs[0][1]
        .select(F.xxhash64("url").alias("doc_id"), "text")
        .persist()
    )
    bench = (
        base_docs.filter(F.pmod(F.col("doc_id"), F.lit(50)) == 0)
        .select("doc_id", tokenize("text").alias("tokens"))
        .persist()
    )
    n_bench = bench.count()
    print(f"bench_docs={n_bench}")

    results = {}
    for tag, pages in legs:
        pages = pages.persist()
        n_pages = pages.count()

        # three snapshots per page: canonicalization must collapse the
        # tracking-param and fragment recrawls onto the base URL and the
        # window must pick the freshest (+2d) one. TRACKING-ONLY params
        # (utm_/fbclid) — a non-tracking param would survive
        # canonicalization and split the group to 2+1.
        snaps = pages.select("url", "warc_ts", "text").unionByName(
            pages.select(
                F.concat("url", F.lit("?utm_source=feed&fbclid=1")).alias("url"),
                (F.col("warc_ts") + F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
                "text",
            )
        ).unionByName(
            pages.select(
                F.concat("url", F.lit("#section2")).alias("url"),
                (F.col("warc_ts") + F.expr("INTERVAL 2 DAY")).alias("warc_ts"),
                "text",
            )
        )
        t_snap, n_snap = timed(
            lambda: latest_snapshot(snaps, tiebreak_col="url")
        )

        docs = (
            pages.select(F.xxhash64("url").alias("doc_id"), "text").persist()
        )
        docs.count()
        t_cur, n_cur = timed(lambda: curate(docs, CurateConfig()))

        corpus_toks = docs.join(
            bench.select("doc_id"), "doc_id", "left_anti"
        ).select("doc_id", tokenize("text").alias("tokens"))
        t_dec, n_dec = timed(
            lambda: fuzzy_contamination_report(corpus_toks, bench)
        )

        results[tag] = (t_snap, t_cur, t_dec)
        print(
            f"{tag}: pages={n_pages} snapshot={t_snap:.2f}s ({n_snap} rows) "
            f"curate={t_cur:.2f}s ({n_cur} survivors) "
            f"decontam_fuzzy={t_dec:.2f}s ({n_dec} flagged)"
        )
        docs.unpersist()
        pages.unpersist()

    r1, r10 = results["1x"], results["10x"]
    print(
        "10x/1x ratios: "
        f"snapshot={r10[0] / r1[0]:.2f} curate={r10[1] / r1[1]:.2f} "
        f"decontam_fuzzy={r10[2] / r1[2]:.2f} (linear would be ~10)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
