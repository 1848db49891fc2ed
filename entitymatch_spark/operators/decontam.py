"""Benchmark decontamination: drop training docs that overlap an
evaluation set on word n-grams.

The standard training-data hygiene step (GPT-3 App. C / The Pile use
13-gram overlap): any training doc sharing >= ``min_hits`` distinct
word n-grams with ANY benchmark doc is contaminated and removed.

Shape at 100 TB: the benchmark side is tiny relative to the corpus
(eval sets are thousands of docs, the corpus is billions), so its
distinct n-gram set is BROADCAST and the corpus-side probe is a
narrow explode -> broadcast-hash semi-join -> per-doc count: the only
shuffle is the final groupBy on the doc id. If the benchmark outgrows
broadcast (pass ``broadcast_benchmark=False``), the join falls back to
a hash join on the gram — still an equi-join, never all-pairs.

The reference has no decontamination flow (it is a query engine);
this is a task-brief training-data extension reusing the n-gram
shingle expression of the dedup family (dedup.py ngram_jaccard_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# the shingle construction lives with the text expressions; re-exported
# here because decontamination call sites read naturally from this module
from entitymatch_spark.functions.text import ngram_expr  # noqa: E402,F401


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id, n_hits) for every corpus doc sharing >= ``min_hits``
    DISTINCT word n-grams with the benchmark — the audit table a
    pipeline reviews before deleting anything.

    ``n`` defaults to 13, the GPT-3 Appendix C / The Pile convention
    the module docstring cites; pass a smaller ``n`` for a stricter
    (more-flagging) filter."""
    bg = (
        benchmark.select(
            F.explode(F.array_distinct(ngram_expr(tokens_col, n))).alias("gram")
        )
        .distinct()
    )
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    cg = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(ngram_expr(tokens_col, n))).alias("gram"),
    )
    return (
        cg.join(bg, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """The surviving corpus: ``corpus`` minus contaminated docs, via a
    hash anti-join on the id (the contaminated set can be large — never
    collected or broadcast)."""
    flagged = contamination_report(
        corpus, benchmark, n, min_hits, id_col, tokens_col, broadcast_benchmark
    )
    return corpus.join(flagged.select(id_col), id_col, "left_anti")


def fuzzy_contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    rows_per_band: int = 2,
    jaccard_threshold: tuple[int, int] = (1, 2),
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    token_hash: str = "xxhash64",
    band_hash: str = "xxhash64",
    seed: int = 42,
) -> DataFrame:
    """(id, n_bench_matches): corpus docs NEAR-duplicating any benchmark
    doc — the paraphrased-leakage case exact n-gram overlap misses
    (an eval question lightly reworded survives contamination_report
    but still leaks).

    Cross-set MinHash-LSH: both sides get band keys, but the join is
    corpus-keys x benchmark-keys ONLY (never the corpus self-join the
    dedup family pays) and the benchmark side is BROADCAST — eval sets
    are tiny next to the corpus, so corpus rows never shuffle on the
    band key; the only wide op is the final per-doc count. Candidates
    are verified with exact token-set jaccard in the integer
    cross-multiplied form (``den*|A∩B| >= num*|A∪B|``).

    ``jaccard_threshold`` is (num, den); defaults to 1/2. Candidate
    recall at jaccard j is ``P = 1 - (1 - j^rows_per_band)^bands``;
    the default 8 bands x 2 rows (16 hashes) gives P ~= 0.90 at
    j = 0.5, 0.97 at 0.6, 0.995 at 0.7 — sized so threshold-level
    paraphrases are actually caught. (The narrower 4x4 layout misses
    ~77% of j = 0.5 pairs: P = 1-(1-0.5^4)^4 ~= 0.23 — fine for
    high-jaccard dedup, wrong for a contamination audit whose verify
    threshold is 0.5.) More bands of fewer rows = more candidates on
    the tiny cross-set join, a cheap price on a broadcast benchmark.
    """
    from entitymatch_spark.operators.blocking import (
        lsh_band_keys,
        minhash_signature,
    )

    def keys(df):
        return lsh_band_keys(
            minhash_signature(
                df,
                id_col=id_col,
                tokens_col=tokens_col,
                num_hashes=num_hashes,
                seed=seed,
                token_hash=token_hash,
            ),
            bands=bands,
            rows_per_band=rows_per_band,
            id_col=id_col,
            band_hash=band_hash,
            sig_len=num_hashes,
        )

    from entitymatch_spark.operators.dedup import verify_token_jaccard

    ck = keys(corpus)
    bk = keys(benchmark).withColumnRenamed(id_col, "bench_id")
    cand = (
        ck.join(F.broadcast(bk), "key")
        .select(id_col, "bench_id")
        .distinct()
    )
    return (
        verify_token_jaccard(
            cand,
            corpus,
            benchmark,
            threshold=jaccard_threshold,
            id_col=id_col,
            tokens_col=tokens_col,
            left_col=id_col,
            right_col="bench_id",
            broadcast_right=True,
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bench_matches"))
    )
