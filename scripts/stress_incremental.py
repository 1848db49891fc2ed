#!/usr/bin/env python
"""Corpus-size stress for the batch-incremental path, both directions.

The 100 TB claim for plans/incremental.py is corpus-size INDEPENDENCE:
matching a fixed daily batch into a standing corpus costs ~the batch's
blocking degree, not the corpus size. Evidence: the SAME ~1k-doc batch
is matched into standing corpora at 1x / 3x / 10x the bench size
(entity-disjoint fillers via generate_corpus(cluster_id_offset=), same
vocabulary family — they share blocks but not matches, the shape of
unrelated web content), with state loaded from parquet like a real
deployment. A full recompute's cost grows ~linearly with the corpus
(scripts/stress_scale.py measures that leg); the incremental batch
should stay ~flat apart from one columnar scan of the key table
(feeding a broadcast LeftSemi — no corpus-side shuffle, plan-asserted
in tests/test_plan_quality.py).

The DELETE leg mirrors it: retiring the SAME fixed ~5% doc set from
each standing corpus (remove_docs — broadcast anti-joins + one CC pass
over only the clusters that lost a member) should track the delete
set's cluster degree plus narrow scans of the state tables, never the
full-rebuild cost the corpus size implies.

Usage: python scripts/stress_incremental.py [n_clusters] [cpus]
"""
from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from entitymatch_spark.plans.incremental import (
    incremental_match,
    initial_state,
    load_state,
    remove_docs,
    save_state,
)
from entitymatch_spark.plans.pipeline import MatchConfig
from entitymatch_spark.session import get_spark
from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

N_CLUSTERS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
REPEATS = 3


def main() -> None:
    spark = get_spark("stress-incremental", cpus=CPUS, shuffle_partitions=2 * CPUS)
    cfg = MatchConfig()
    pages = corpus_to_spark(
        spark, generate_corpus(n_clusters=N_CLUSTERS, seed=42)
    )["pages"]
    is_b = F.pmod(F.xxhash64(F.col("cluster_id").cast("string")), F.lit(10)) == 0
    base, batch = pages.filter(~is_b).persist(), pages.filter(is_b).persist()
    print(f"batch={batch.count()} base={base.count()}")

    legs = [("1x", base)]
    offset = N_CLUSTERS
    for mult, extra in (("3x", 2 * N_CLUSTERS), ("10x", 7 * N_CLUSTERS)):
        filler = corpus_to_spark(
            spark,
            generate_corpus(
                n_clusters=extra, seed=70 + extra, cluster_id_offset=offset
            ),
        )["pages"]
        legs.append((mult, legs[-1][1].unionByName(filler)))
        offset += extra

    # Fixed delete set: ~5% of BASE docs, identical across corpus legs
    # (the fillers never contain these ids), so the delete leg varies
    # only the standing-corpus size around the same work.
    gone = (
        base.select("url")
        .filter(F.pmod(F.xxhash64("url"), F.lit(20)) == 0)
        .persist()
    )
    print(f"delete_set={gone.count()}")

    for tag, corpus in legs:
        state_dir = tempfile.mkdtemp(prefix=f"stress_incr_{tag}_")
        t0 = time.perf_counter()
        st0 = initial_state(corpus, cfg)
        save_state(st0, state_dir)
        t_build = time.perf_counter() - t0
        st0.docs.unpersist()
        best, n_pairs, n_total = float("inf"), 0, 0
        for _ in range(REPEATS):
            st = load_state(spark, state_dir, cfg)
            t0 = time.perf_counter()
            res = incremental_match(st, batch)
            n_total = res.state.clusters.count()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            n_pairs = res.pairs.count()
            for df in (res.new_docs, res.pairs):
                df.unpersist()
        best_rm, n_after = float("inf"), 0
        for _ in range(REPEATS):
            st = load_state(spark, state_dir, cfg)
            t0 = time.perf_counter()
            n_after = remove_docs(st, gone).clusters.count()
            best_rm = min(best_rm, time.perf_counter() - t0)
        print(
            f"{tag}: corpus_docs={n_total} batch_pairs={n_pairs} "
            f"full_build+save={t_build:.1f}s incr_batch={best:.2f}s "
            f"remove_5pct={best_rm:.2f}s survivors={n_after}"
        )
        shutil.rmtree(state_dir, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
