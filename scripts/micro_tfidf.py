#!/usr/bin/env python
"""Interleaved A/B: tf-idf pair cosine, single-pass profile form vs the
classic relational weights-CTE shape, on the bench inputs at sf0.1.

Round-3 rewrote q_tfidf_cosine_pairs to the profile form
(operators/posting.py tfidf_doc_profiles + tfidf_cosine_for_pairs):
the classic shape references the weight table 3x and the pair table
2x, and Spark re-executes the upstream subtree per reference, so at
scale the profile form strictly wins on plan shape (one posting
aggregation instead of three). The r3 driver bench read it +18% vs
r2's relational number — this harness settles whether that was box
weather by interleaving the two shapes in ONE session (ABAB...), the
same discipline scripts/micro_minhash.py used for the persist
question. Medians + mins per shape; the stage inputs (posting, idf,
pairs) are persisted ONCE outside the timed region so only the
pair-cosine plan differs between legs.

Usage: python scripts/micro_tfidf.py [sf_dir] [cpus] [rounds]
"""
from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

import __spark_entry__ as se
from entitymatch_spark.operators.posting import (
    tfidf_cosine_for_pairs,
    tfidf_doc_profiles,
)
from entitymatch_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 7


def profile_form(pairs, posting, idf):
    profiles = tfidf_doc_profiles(posting, idf)
    out = tfidf_cosine_for_pairs(pairs, profiles)
    return out.select(
        "id_a", "id_b", F.round("cosine", 4).alias("cosine")
    )


def relational_form(pairs, posting, idf):
    w = (
        posting.groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .join(F.broadcast(idf.select("token", "idf")), "token")
        .select("doc_id", "token", (F.col("tf") * F.col("idf")).alias("w"))
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    wa = w.select(F.col("doc_id").alias("id_a"), "token", F.col("w").alias("wa"))
    wb = w.select(F.col("doc_id").alias("id_b"), "token", F.col("w").alias("wb"))
    dots = (
        pairs.join(wa, "id_a").join(wb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))
    return (
        pairs.join(dots, ["id_a", "id_b"], "left")
        .join(na, "id_a").join(nb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0.0))
                / (F.col("na") * F.col("nb")),
                4,
            ).alias("cosine"),
        )
    )


def main() -> None:
    spark = get_spark("micro-tfidf", cpus=CPUS, shuffle_partitions=2 * CPUS)
    _, posting, idf = se._idf(spark, SF_DIR)
    posting = posting.persist()
    idf = idf.persist()
    pairs = se._tri_pairs(spark, SF_DIR).select("id_a", "id_b").persist()
    n_pairs = pairs.count()
    posting.count(), idf.count()
    print(f"sf_dir={SF_DIR} pairs={n_pairs}")

    shapes = {"profile": profile_form, "relational": relational_form}
    times: dict[str, list[float]] = {k: [] for k in shapes}
    # one untimed warm pass per shape (codegen/JIT), then interleave
    for name, fn in shapes.items():
        fn(pairs, posting, idf).count()
    for r in range(ROUNDS):
        for name, fn in shapes.items():
            t0 = time.perf_counter()
            n = fn(pairs, posting, idf).count()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"round {r} {name}: {dt:.3f}s rows={n}")
    for name, ts in times.items():
        print(
            f"{name}: min={min(ts):.3f}s median={statistics.median(ts):.3f}s "
            f"all={[round(t, 2) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
