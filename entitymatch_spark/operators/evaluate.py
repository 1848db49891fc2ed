"""Match-quality and blocking observability, computed distributed.

The north_rule's acceptance metric is pairwise F1 >= 0.99 on labeled
same-blocking-key pairs; at 10^12-doc scale the labeled set itself can
be millions of pairs, so evaluation must be a relational plan, not a
driver-side pandas pass (tests/test_match_e2e.py keeps its small
pandas computation as the independent cross-check of this operator).

``blocking_stats`` is the observability half: per key family (token
vs LSH band), how many blocks exist, how many are purged by the
``max_block`` cap, and how many candidate pairs the surviving blocks
generate — the numbers an operator watches to tune min_idf / bands /
max_block before paying for a scoring run. One narrow aggregation over
the key table; no pair materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pair_metrics(
    matches: DataFrame,
    labels: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    label_col: str = "is_match",
) -> DataFrame:
    """One row: (tp, fp, fn, precision, recall, f1) of predicted match
    pairs against labeled pairs.

    ``matches``: predicted matched pairs (e.g. MatchResult.matches).
    ``labels``: labeled pairs with a boolean ``label_col``. Labeled
    pairs absent from ``matches`` count as predicted non-matches (the
    blocking-miss convention of the north_rule: an unblocked pair was
    never scored, so the pipeline predicted non-match). Pair order is
    normalized on both sides, so (a,b)/(b,a) duplicates collapse.
    """
    def canon(df: DataFrame, a: str, b: str) -> DataFrame:
        return df.select(
            F.least(F.col(a), F.col(b)).alias("id_a"),
            F.greatest(F.col(a), F.col(b)).alias("id_b"),
            *[c for c in df.columns if c not in (a, b)],
        )

    # distinct: a label supplied in both orders — (a,b,true) and
    # (b,a,true) — is ONE labeled pair, not two tp/fn slots. (Labels
    # that CONFLICT after normalization, (a,b,true)+(b,a,false),
    # survive as two rows: contradictory ground truth is the caller's
    # data bug to surface, not this function's to pick a winner for.)
    lab = canon(labels, id_a, id_b).select("id_a", "id_b", label_col).distinct()
    pred = (
        canon(matches, id_a, id_b)
        .select("id_a", "id_b")
        .distinct()
        .withColumn("__pred", F.lit(True))
    )
    j = lab.join(pred, ["id_a", "id_b"], "left").select(
        F.col(label_col).alias("truth"),
        F.coalesce("__pred", F.lit(False)).alias("pred"),
    )
    agg = j.agg(
        F.sum(F.when(F.col("truth") & F.col("pred"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("truth") & F.col("pred"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("truth") & ~F.col("pred"), 1).otherwise(0)).alias("fn"),
    )
    p = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0))
    r = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(0.0))
    return agg.select(
        "tp", "fp", "fn",
        p.alias("precision"),
        r.alias("recall"),
        F.when(
            p + r > 0, 2 * p * r / (p + r)
        ).otherwise(F.lit(0.0)).alias("f1"),
    )


def blocking_stats(
    keys: DataFrame, max_block: int = 64, family_pattern: str = r"^([a-z]+)"
) -> DataFrame:
    """Per key-family block statistics from a (doc_id, key) table.

    Family = leading letters of the key ('tok' for token keys, 'lsh'
    for every LSH band — the band index digits are excluded by the
    pattern, collapsing the bands into one family).

    Columns per family: n_keys (distinct keys), n_pair_blocks (size
    2..max_block — the blocks that will generate pairs), n_purged
    (> max_block — dropped by the purge), cand_pairs (sum n*(n-1)/2
    over pair blocks: the exact pre-dedup candidate volume the scorer
    would see), max_block (largest block), avg_block (mean size,
    4 decimals). Cost: one groupBy(key) + one tiny groupBy(family).
    """
    sizes = keys.groupBy("key").agg(F.count("*").alias("n"))
    pairable = (F.col("n") >= 2) & (F.col("n") <= max_block)
    return (
        sizes.groupBy(
            F.regexp_extract("key", family_pattern, 1).alias("family")
        )
        .agg(
            F.count("*").alias("n_keys"),
            F.sum(pairable.cast("long")).alias("n_pair_blocks"),
            F.sum((F.col("n") > max_block).cast("long")).alias("n_purged"),
            # integer arithmetic end to end: n*(n-1) is even, so DIV 2
            # is exact, and the long-typed sum stays exact — the double
            # form lost integer precision past 2^53 summed pairs (real
            # at 10^12-doc key tables), returning an approximate count
            # documented as exact
            F.sum(
                F.when(
                    pairable,
                    F.expr("CAST(n AS BIGINT) * (n - 1) div 2"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("cand_pairs"),
            F.max("n").alias("max_block"),
            F.round(F.avg("n"), 4).alias("avg_block"),
        )
    )


def cluster_stats(clusters: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Cluster-size distribution from a (doc_id, cluster_id) table —
    the post-run ops dial (blocking_stats is the pre-run one): how many
    entities the corpus collapsed into, how much of it is singletons,
    and whether some cluster exploded (a giant component is the classic
    symptom of an over-permissive threshold or a boilerplate blocking
    key at web scale).

    One row per cluster size: (cluster_size, n_clusters, n_docs,
    pct_docs). Cost: two narrow aggregations (doc→cluster counts,
    counts→histogram); never materializes pairs.
    """
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(id_col).alias("cluster_size")
    )
    # the doc total comes from a window over the (tiny) histogram, so
    # the whole thing stays ONE lazy plan — an eager clusters.count()
    # here ran the input lineage twice (once at call time, once when
    # the result evaluated) and, on a nondeterministic input, computed
    # pct_docs against a different materialization's total
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .withColumn("n_docs", F.col("cluster_size") * F.col("n_clusters"))
        .withColumn(
            "pct_docs",
            F.round(
                F.col("n_docs")
                / F.sum("n_docs").over(Window.partitionBy())
                * 100,
                4,
            ),
        )
        .select("cluster_size", "n_clusters", "n_docs", "pct_docs")
    )
