#!/usr/bin/env python
"""A/B micro-benchmark for MinHash signature computation strategies.

Variants (all produce bit-identical signatures):
  A current: minhash_sig_expr — 64 x array_min(transform(hashed, perm))
     with the token-hash subexpression textually duplicated into each
     of the 64 mins (HOFs evaluate interpreted; no codegen CSE).
  B hash-materialized: project the hashed token array first (CollapseProject
     keeps the boundary: the alias is expensive and referenced 64x),
     then the 64 array_mins read the materialized array.
  C fold: one aggregate() pass over the hashed array, accumulator =
     64-slot array, zip_with(acc, perms(x), least) — one traversal,
     hash evaluated once per token.

Usage: python scripts/micro_minhash.py [n_clusters] [repeats]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from entitymatch_spark.operators.blocking import (
    MERSENNE_31,
    minhash_coeffs,
    minhash_sig_expr,
)
from entitymatch_spark.plans.pipeline import MatchConfig, prepare_docs
from entitymatch_spark.session import get_spark
from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

N_CLUSTERS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
NUM_HASHES, SEED = 64, 42


def hashed_expr(tokens_col):
    p = F.lit(MERSENNE_31)
    return F.transform(F.array_distinct(tokens_col), lambda t: F.pmod(F.xxhash64(t), p))


def variant_a(docs):
    return docs.filter(F.size("tokens") > 0).select(
        "doc_id", minhash_sig_expr("tokens", NUM_HASHES, SEED).alias("sig")
    )


def variant_b(docs):
    coeffs = minhash_coeffs(NUM_HASHES, SEED)
    p = F.lit(MERSENNE_31)
    mins = F.array(
        *[
            F.array_min(F.transform(F.col("h"), lambda x: F.pmod(x * F.lit(a) + F.lit(b), p)))
            for (a, b) in coeffs
        ]
    )
    return (
        docs.filter(F.size("tokens") > 0)
        .select("doc_id", hashed_expr("tokens").alias("h"))
        .select("doc_id", mins.alias("sig"))
    )


def variant_c(docs):
    coeffs = minhash_coeffs(NUM_HASHES, SEED)
    p = F.lit(MERSENNE_31)

    def perms(x):
        return F.array(*[F.pmod(x * F.lit(a) + F.lit(b), p) for (a, b) in coeffs])

    sig = F.aggregate(
        F.col("h"),
        F.array_repeat(F.lit(MERSENNE_31).cast("long"), NUM_HASHES),
        lambda acc, x: F.zip_with(acc, perms(x), lambda m, v: F.least(m, v)),
    )
    return (
        docs.filter(F.size("tokens") > 0)
        .select("doc_id", hashed_expr("tokens").alias("h"))
        .select("doc_id", sig.alias("sig"))
    )


def variant_d(docs):
    """Fold form as a PURE expression (hash inlined as the aggregate's
    input — evaluated once; no projection boundary needed)."""
    coeffs = minhash_coeffs(NUM_HASHES, SEED)
    p = F.lit(MERSENNE_31)

    def perms(x):
        return F.array(*[F.pmod(x * F.lit(a) + F.lit(b), p) for (a, b) in coeffs])

    sig = F.aggregate(
        hashed_expr("tokens"),
        F.array_repeat(F.lit(MERSENNE_31).cast("long"), NUM_HASHES),
        lambda acc, x: F.zip_with(acc, perms(x), lambda m, v: F.least(m, v)),
    )
    return docs.filter(F.size("tokens") > 0).select("doc_id", sig.alias("sig"))


def main():
    spark = get_spark("micro-minhash", cpus=8, shuffle_partitions=16)
    cfg = MatchConfig()
    fx = generate_corpus(n_clusters=N_CLUSTERS, seed=42)
    docs = prepare_docs(corpus_to_spark(spark, fx)["pages"], cfg).persist()
    n = docs.count()
    print(f"docs={n}")

    variants = {
        "A_current": variant_a,
        "B_hash_materialized": variant_b,
        "C_fold": variant_c,
        "D_fold_pure_expr": variant_d,
    }
    # equality check first (bit-identical signatures)
    ref = variant_a(docs)
    for name, fn in list(variants.items())[1:]:
        mism = (
            ref.alias("x")
            .join(fn(docs).alias("y"), "doc_id")
            .filter(F.expr("x.sig <> y.sig"))
            .count()
        )
        print(f"{name}: mismatches={mism} (of {n})")
        assert mism == 0, name

    for r in range(REPEATS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            print(f"round={r} {name}: {time.perf_counter() - t0:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
