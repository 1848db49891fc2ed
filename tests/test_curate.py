"""Curation plan (plans/curate.py): quality gate, dedup pool scoping,
deterministic sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from entitymatch_spark.plans.curate import CurateConfig, curate, sample_hash


def _pages(spark):
    rich = (
        "federated learning converges faster when gradients compress "
        "sparsely across heterogeneous silos worldwide"
    )
    rows = [
        (0, rich),
        (1, rich + " tonight"),                     # near dup of 0
        (2, "the the the the the the the the"),     # stopword sludge -> low quality
        (3, "unique prose about parquet shuffle topology and adaptive salting"),
        (4, ""),                                    # empty -> dropped
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_gates_and_members(spark):
    out = {r["doc_id"]: r for r in curate(_pages(spark), CurateConfig()).collect()}
    # low-quality and empty docs never reach the output or the dedup pool
    assert 2 not in out and 4 not in out
    # 0 and 1 are near-dups: min-id survivor stands for both
    assert 0 in out and 1 not in out and out[0]["n_members"] == 2
    assert out[3]["n_members"] == 1
    # member counts cover exactly the quality-filtered pool
    assert sum(r["n_members"] for r in out.values()) == 3


def test_curate_sampling_deterministic(spark):
    pages = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body variant number "), F.col("id").cast("string"),
            F.lit(" carries distinct entropy payload"),
        ).alias("text"),
    )
    cfg = CurateConfig(quality_min=(0, 1), sample_keep=5000)
    a = {r["doc_id"] for r in curate(pages, cfg).collect()}
    b = {r["doc_id"] for r in curate(pages.repartition(7), cfg).collect()}
    # content-hash sampling: identical keep-set at any partitioning
    assert a == b
    assert 0 < len(a) < 200
    # the keep rule is exactly the documented hash predicate
    pred = {
        r["doc_id"]
        for r in pages.filter(sample_hash("doc_id", 10000) < 5000).collect()
    }
    assert a == pred


def test_split_assign_deterministic_and_stable(spark):
    from entitymatch_spark.plans.curate import split_assign

    docs = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in
         split_assign(docs.repartition(13)).collect()}
    assert a == b                                    # parallelism-invariant
    # shares near 90/5/5 (content hash, not exact)
    n = len(a)
    from collections import Counter
    c = Counter(a.values())
    assert 0.85 < c["train"] / n < 0.95
    assert 0.02 < c["val"] / n < 0.08
    assert 0.02 < c["test"] / n < 0.08
    # corpus growth never relabels existing docs
    grown = {r["doc_id"]: r["split"] for r in
             split_assign(spark.range(0, 2000).withColumnRenamed("id", "doc_id")).collect()}
    assert all(grown[k] == v for k, v in a.items())
    # a different salt draws an independent partition
    salted = {r["doc_id"]: r["split"] for r in
              split_assign(docs, salt="v2").collect()}
    assert salted != a


def test_split_assign_rejects_bad_weights(spark):
    import pytest as _pytest

    from entitymatch_spark.plans.curate import split_assign

    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with _pytest.raises(ValueError):
        split_assign(docs, splits={"train": 9000, "val": 400})


def test_curate_config_accepts_legacy_float_threshold(spark):
    """Pre-rational callers passed quality_min=0.62; that must coerce to
    the exact decimal rational (31/50), not fail with an unpacking
    TypeError deep inside the integer gate."""
    import pytest

    from entitymatch_spark.operators.textstats import coerce_rational

    cfg = CurateConfig(quality_min=0.62)
    assert cfg.quality_min == (31, 50)
    cfg = CurateConfig(quality_min=0.55, jaccard_threshold=0.5)
    assert cfg.quality_min == (11, 20) and cfg.jaccard_threshold == (1, 2)
    assert coerce_rational((3, 5)) == (3, 5)
    with pytest.raises(TypeError, match="num, den"):
        CurateConfig(quality_min="0.62")
    with pytest.raises(TypeError, match="den > 0"):
        CurateConfig(quality_min=(1, 0))
    # floats needing denominator > 10000 must ERROR, not silently snap
    # (1e-5 used to coerce to 0/1 — "keep everything")
    with pytest.raises(ValueError, match="denominator"):
        coerce_rational(1e-5)
    with pytest.raises(ValueError, match="denominator"):
        coerce_rational(0.123456)
    # non-finite floats get the contract TypeError, not a Fraction
    # internals error
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(TypeError, match="finite"):
            coerce_rational(bad)
    # exact zero and representable decimals still coerce
    assert coerce_rational(0.0) == (0, 1)
    assert coerce_rational(0.0001) == (1, 10000)


def test_quality_at_least_float_threshold_matches_rational(spark):
    """quality_at_least(0.55) == quality_at_least((11, 20)) row-for-row."""
    from entitymatch_spark.functions.text import tokenize
    from entitymatch_spark.operators.textstats import quality_at_least

    docs = spark.createDataFrame(
        [(i, f"doc {i} " + " ".join(f"tok{j % (i + 1)}" for j in range(12)))
         for i in range(40)],
        "doc_id long, text string",
    ).withColumn("tokens", tokenize("text"))
    a = docs.filter(quality_at_least("tokens", 0.55)).select("doc_id")
    b = docs.filter(quality_at_least("tokens", (11, 20))).select("doc_id")
    got_a = {r["doc_id"] for r in a.collect()}
    got_b = {r["doc_id"] for r in b.collect()}
    assert got_a == got_b and 0 < len(got_a) < 40


def test_verify_token_jaccard_accepts_legacy_float(spark):
    """verify_token_jaccard is the other integer gate coerce_rational
    names — a legacy float threshold must coerce, matching the exact
    rational form row-for-row."""
    from entitymatch_spark.functions.text import tokenize
    from entitymatch_spark.operators.dedup import verify_token_jaccard

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "alpha beta gamma zeta"),
         (2, "one two three four")],
        "doc_id long, text string",
    ).withColumn("tokens", tokenize("text"))
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2)], "id_a long, id_b long"
    )
    got_f = {(r["id_a"], r["id_b"])
             for r in verify_token_jaccard(pairs, docs, threshold=0.5).collect()}
    got_r = {(r["id_a"], r["id_b"])
             for r in verify_token_jaccard(pairs, docs, threshold=(1, 2)).collect()}
    assert got_f == got_r == {(0, 1)}  # jaccard 3/5 >= 1/2; 0/8 fails


def test_cap_per_group_semantics(spark):
    import pytest

    from entitymatch_spark.plans.curate import cap_per_group

    df = spark.createDataFrame(
        [("a", i, 100 - i) for i in range(5)]
        + [("b", 10, 7), ("b", 11, 7)]       # tie on score -> id breaks it
        + [("c", 20, 1)],                    # under the cap -> kept whole
        "grp string, doc_id long, score long",
    )
    kept = cap_per_group(
        df, "grp", 3, [F.desc("score"), F.asc("doc_id")]
    ).collect()
    by_grp: dict[str, list[int]] = {}
    for r in kept:
        by_grp.setdefault(r["grp"], []).append(r["doc_id"])
    assert sorted(by_grp["a"]) == [0, 1, 2]  # top-3 by score desc
    assert sorted(by_grp["b"]) == [10, 11]
    assert by_grp["c"] == [20]
    assert "__rn" not in kept[0].asDict()    # helper column dropped

    with pytest.raises(ValueError, match="n must be"):
        cap_per_group(df, "grp", 0, [F.asc("doc_id")])
    with pytest.raises(ValueError, match="__rn.*reserved"):
        cap_per_group(
            df.withColumnRenamed("score", "__rn"), "grp", 1, [F.asc("doc_id")]
        )


def test_cap_per_group_pushes_rank_limit(spark):
    """The cap must plan as WindowGroupLimit (bounded per-task state),
    not a full window over the hottest group."""
    from entitymatch_spark.plans.curate import cap_per_group

    df = spark.range(100).select(
        (F.col("id") % 5).alias("grp"), F.col("id").alias("doc_id")
    )
    plan = (
        cap_per_group(df, "grp", 3, [F.asc("doc_id")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_stratified_sample_deterministic_and_consistent(spark):
    import pytest

    from entitymatch_spark.plans.curate import sample_hash, stratified_sample

    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    frac = {"en": (1, 2), "de": (1, 4)}
    a = {r["doc_id"] for r in stratified_sample(docs, "lang", frac).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(7), "lang", frac
        ).collect()
    }
    assert a == b  # parallelism-invariant

    # unlisted stratum (fr) fully dropped
    langs = {
        r["lang"]
        for r in stratified_sample(docs, "lang", frac)
        .select("lang").distinct().collect()
    }
    assert langs == {"en", "de"}

    # single-stratum decision == sample_hash with the same (keep, mod)
    en_only = docs.filter(F.col("lang") == "en")
    via_strat = {
        r["doc_id"]
        for r in stratified_sample(en_only, "lang", {"en": (1, 4)}).collect()
    }
    via_hash = {
        r["doc_id"]
        for r in en_only.filter(sample_hash("doc_id", 4) < 1).collect()
    }
    assert via_strat == via_hash

    # a different salt draws an independent sample (not identical)
    salted = {
        r["doc_id"]
        for r in stratified_sample(
            docs, "lang", frac, salt="v2"
        ).collect()
    }
    assert salted != a

    with pytest.raises(ValueError, match="at least one stratum"):
        stratified_sample(docs, "lang", {})
    with pytest.raises(ValueError, match="keep <= mod"):
        stratified_sample(docs, "lang", {"en": (5, 4)})


def test_curate_forwards_id_col(spark):
    """curate(id_col=...) must thread the id through every stage —
    candidate_pairs previously defaulted to doc_id and crashed."""
    from entitymatch_spark.plans.curate import curate

    pages = _pages(spark).withColumnRenamed("doc_id", "page_id")
    out = {
        r["page_id"]: r
        for r in curate(pages, CurateConfig(), id_col="page_id").collect()
    }
    assert 0 in out and out[0]["n_members"] == 2  # same verdicts as default


def test_curate_sample_salt_draws_independent_sample(spark):
    from entitymatch_spark.plans.curate import curate

    pages = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("unique prose number "),
            F.col("id"),
            F.lit(" about shuffle topology and adaptive salting"),
        ).alias("text"),
    )
    base = {
        r["doc_id"]
        for r in curate(
            pages, CurateConfig(sample_keep=5000, sample_mod=10000)
        ).collect()
    }
    salted = {
        r["doc_id"]
        for r in curate(
            pages,
            CurateConfig(
                sample_keep=5000, sample_mod=10000, sample_salt="v2"
            ),
        ).collect()
    }
    assert base and salted and base != salted


def test_curate_and_split_validation(spark):
    import pytest

    from entitymatch_spark.plans.curate import split_assign

    with pytest.raises(ValueError, match="sample_keep"):
        CurateConfig(sample_keep=100, sample_mod=0)
    with pytest.raises(ValueError, match="sample_keep"):
        CurateConfig(sample_keep=0.5)
    with pytest.raises(ValueError, match="sample_keep"):
        CurateConfig(sample_keep=20000, sample_mod=10000)
    with pytest.raises(ValueError, match=">= 0"):
        split_assign(
            _pages(spark), {"train": 10500, "val": -500}, mod=10000
        )
