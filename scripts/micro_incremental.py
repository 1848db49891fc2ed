#!/usr/bin/env python
"""Stage decomposition of the batch-incremental leg at bench scale.

Times, per repeat, with the state loaded fresh from parquet like the
bench leg does:

  pairs    — batch keys + key semi-join + asymmetric block expansion
             (materialized via count)
  score    — Arrow scoring of the batch-touching pairs (matches count)
  merge    — affected-cluster CC merge + final clusters count

The sum approximates the bench's `incremental_10pct_batch`; the split
says which stage to optimize. Run: python scripts/micro_incremental.py
"""

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from entitymatch_spark.plans.incremental import (
    incremental_match,
    initial_state,
    load_state,
    save_state,
)
from entitymatch_spark.plans.pipeline import MatchConfig
from entitymatch_spark.session import get_spark
from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

N_CLUSTERS = 3000
REPEATS = 3


def main() -> None:
    spark = get_spark("micro_incremental", cpus=32)
    cfg = MatchConfig()
    pages = corpus_to_spark(
        spark, generate_corpus(n_clusters=N_CLUSTERS, seed=42)
    )["pages"]
    is_b = F.pmod(F.xxhash64(F.col("cluster_id").cast("string")), F.lit(10)) == 0
    base, batch = pages.filter(~is_b), pages.filter(is_b)
    print(f"corpus={pages.count()} batch={batch.count()}")

    state_dir = tempfile.mkdtemp(prefix="micro_incr_state_")
    st0 = initial_state(base, cfg)
    save_state(st0, state_dir)
    st0.docs.unpersist()

    for r in range(REPEATS):
        st = load_state(spark, state_dir, cfg)
        t0 = time.perf_counter()
        res = incremental_match(st, batch)
        n_pairs = res.pairs.count()
        t1 = time.perf_counter()
        n_matches = res.matches.count()
        t2 = time.perf_counter()
        n_total = res.state.clusters.count()
        t3 = time.perf_counter()
        print(
            f"round {r}: pairs={n_pairs} matches={n_matches} docs={n_total} | "
            f"pairs {t1 - t0:.2f}s score {t2 - t1:.2f}s merge {t3 - t2:.2f}s "
            f"total {t3 - t0:.2f}s"
        )
        for df in (res.new_docs, res.pairs):
            df.unpersist()

    shutil.rmtree(state_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
