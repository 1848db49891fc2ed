#!/usr/bin/env python
"""A/B micro-benchmark: SimHash signature shapes.

OLD (dedup.py single-shuffle): explode token occurrences -> 64-column
    signed-sum hash aggregate -> pack bits.
NEW: per-row aggregate() fold over the token array (zip_with bit
    contributions), ZERO shuffle, no row blow-up; sums materialized in
    a projection so the 64-element packing reads them once.

Usage: python scripts/micro_simhash.py [n_clusters] [repeats]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from entitymatch_spark.operators.dedup import simhash_signature
from entitymatch_spark.plans.pipeline import MatchConfig, prepare_docs
from entitymatch_spark.session import get_spark
from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

N_CLUSTERS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def simhash_explode_agg(docs, id_col="doc_id", tokens_col="tokens"):
    """The pre-fold library implementation, kept inline for A/B."""
    exploded = docs.select(
        F.col(id_col), F.explode(tokens_col).alias("token")
    ).withColumn("h", F.xxhash64("token"))
    sums = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = exploded.groupBy(id_col).agg(*sums)
    sig = None
    for i in range(64):
        bit = F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return agg.select(F.col(id_col), sig.alias("simhash"))


def main():
    spark = get_spark("micro-simhash", cpus=8, shuffle_partitions=16)
    cfg = MatchConfig()
    fx = generate_corpus(n_clusters=N_CLUSTERS, seed=42)
    docs = prepare_docs(corpus_to_spark(spark, fx)["pages"], cfg).persist()
    n = docs.count()
    print(f"docs={n}", flush=True)

    old = simhash_explode_agg(docs)
    new = simhash_signature(docs)
    mism = (
        old.alias("x")
        .join(new.alias("y"), "doc_id", "full")
        .filter(F.expr("x.simhash IS DISTINCT FROM y.simhash"))
        .count()
    )
    print(f"mismatches={mism} (of {n})", flush=True)
    assert mism == 0

    variants = {"old_explode_agg": simhash_explode_agg, "new_fold": simhash_signature}
    for r in range(REPEATS):
        items = list(variants.items())
        if r % 2:
            items.reverse()
        for name, fn in items:
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            print(f"round={r} {name}: {time.perf_counter() - t0:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
