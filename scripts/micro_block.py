#!/usr/bin/env python
"""Sub-stage profile of the blocking stage (the largest e2e chunk).

Decomposes bench.py's `block` timing into materialized sub-stages so
optimization effort lands where the time actually goes:

  prep      prepare_docs (normalize + tokenize) -> persist + count
  posting   build_posting -> noop sink
  idf       token_idf -> noop sink
  tokkeys   token_blocking_keys_from_docs -> noop sink
  minhash   minhash_signature -> noop sink
  bandkeys  lsh_band_keys(minhash_signature(...)) -> noop sink
  pairs     candidate_pairs(union of keys) -> count (the real stage:
            everything upstream fused into one pass, as in the pipeline)

The sub-stage timings OVERLAP the fused `pairs` run (each re-executes
its upstream), so they locate hotspots; `pairs` alone matches the
pipeline's actual block cost after `prep`.

Usage: python scripts/micro_block.py [n_clusters] [repeats] [cpus]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from entitymatch_spark.operators.blocking import (
    candidate_pairs,
    lsh_band_keys,
    minhash_signature,
    token_blocking_keys_from_docs,
)
from entitymatch_spark.operators.posting import build_posting, token_idf
from entitymatch_spark.plans.pipeline import MatchConfig, prepare_docs
from entitymatch_spark.session import get_spark
from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus

N_CLUSTERS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 32


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("micro-block", cpus=CPUS, shuffle_partitions=2 * CPUS)
    cfg = MatchConfig()
    fx = generate_corpus(n_clusters=N_CLUSTERS, seed=42)
    pages = corpus_to_spark(spark, fx)["pages"]
    pages.persist().count()  # exclude synthetic-gen from all timings

    rows = []
    for r in range(REPEATS):
        t = {}

        t0 = time.perf_counter()
        docs = prepare_docs(pages, cfg).persist()
        n_docs = docs.count()
        t["prep"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        posting = build_posting(docs, id_col="doc_id")
        noop(posting)
        t["posting"] = time.perf_counter() - t0

        idf = token_idf(build_posting(docs, id_col="doc_id"), n_docs=n_docs)
        t0 = time.perf_counter()
        noop(idf)
        t["idf"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        noop(token_blocking_keys_from_docs(docs, idf, min_idf=cfg.min_idf))
        t["tokkeys"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        noop(minhash_signature(docs, num_hashes=cfg.num_hashes, seed=cfg.seed))
        t["minhash"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        noop(
            lsh_band_keys(
                minhash_signature(docs, num_hashes=cfg.num_hashes, seed=cfg.seed),
                bands=cfg.bands,
                rows_per_band=cfg.rows_per_band,
            )
        )
        t["bandkeys"] = time.perf_counter() - t0

        keys = token_blocking_keys_from_docs(docs, idf, min_idf=cfg.min_idf).unionByName(
            lsh_band_keys(
                minhash_signature(docs, num_hashes=cfg.num_hashes, seed=cfg.seed),
                bands=cfg.bands,
                rows_per_band=cfg.rows_per_band,
            )
        )
        t0 = time.perf_counter()
        n_pairs = candidate_pairs(keys, max_block=cfg.max_block).count()
        t["pairs"] = time.perf_counter() - t0

        docs.unpersist()
        rows.append(t)
        print(
            f"round {r}: "
            + "  ".join(f"{k}={v:.2f}s" for k, v in t.items())
            + f"  (docs={n_docs} pairs={n_pairs})",
            flush=True,
        )

    meds = {k: sorted(r[k] for r in rows)[len(rows) // 2] for k in rows[0]}
    print("medians: " + "  ".join(f"{k}={v:.2f}s" for k, v in meds.items()))
    spark.stop()


if __name__ == "__main__":
    main()
