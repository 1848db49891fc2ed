"""One-call training-corpus curation: quality filter -> near-dup
dedup -> deterministic sampling.

The operator family answers the individual questions (how good is this
doc, which docs duplicate each other, which rows to keep); a training
run needs the composed decision — from raw pages to the final
reweighted keep-set — as ONE plan, so the stages share tokenization,
the dedup pool is the already-quality-filtered corpus (dedup on the
rejected tail is wasted work at 100 TB), and the sample is drawn from
SURVIVORS (sampling before dedup would bias ``n_members``).

Every stage is one of the repo's audited operators, so the composition
adds no new shuffle: quality is per-row column math, the dedup chain is
the banded LSH -> purge-capped block join -> components loop, and the
sample is a narrow hash filter. Determinism end-to-end: content-hash
sampling (md5 of the id, never rand()) keeps the decision stable across
cluster sizes and reruns — the property that makes a 100 TB curation
job resumable and its output reproducible.

ref: the reference has no curation flow (it is a query engine);
this plan is the task brief's training-data-pipeline extension built
from the EntityMatch-derived blocking/clustering machinery
(EntityMatch/Matcher.cs transitive interpretation merge).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CurateConfig:
    """Dials for :func:`curate`.

    ``quality_min`` and ``jaccard_threshold`` are RATIONALS
    (num, den), decided by integer cross-multiplication
    (textstats.quality_at_least / dedup.verify_token_jaccard), so
    Spark and any SQL oracle agree on the exact boundary without
    float division — a doc sitting precisely on 0.55 or 0.60 passes
    in both engines or in neither.

    ``sample_keep``/``sample_mod``: keep a survivor iff
    ``md5_int(salt + id) % sample_mod < sample_keep`` (None = keep
    all). Content-deterministic — the same docs survive at any
    parallelism. CAUTION: with the default empty ``sample_salt`` this
    is the SAME decision hash split_assign reduces — sampling here and
    then splitting with both salts empty correlates the decisions
    (e.g. keep < 1000 of 10000 is a subset of train's < 9000, so val/
    test come out empty). Salt ONE of the two when composing them.

    ``cache_pool``: persist the quality-filtered pool (same dial as
    MatchConfig.cache) — the pool lineage (scan + tokenize + gate) is
    referenced by the stats, signature, and verify stages, so without
    the persist it recomputes per reference.
    """

    quality_min: tuple[int, int] = (62, 100)
    minhash_hashes: int = 16
    bands: int = 4
    rows_per_band: int = 4
    max_block: int = 32
    jaccard_threshold: tuple[int, int] = (1, 2)
    sample_keep: int | None = None
    sample_mod: int = 10000
    sample_salt: str = ""
    token_hash: str = "xxhash64"  # "md5" = oracle-portable variant
    band_hash: str = "xxhash64"   # "concat" = oracle-portable variant
    seed: int = 42
    cache_pool: bool = True

    def __post_init__(self):
        if self.sample_keep is not None:
            if (
                not isinstance(self.sample_keep, int)
                or not isinstance(self.sample_mod, int)
                or self.sample_mod <= 0
                or not 0 <= self.sample_keep <= self.sample_mod
            ):
                raise ValueError(
                    "need integer 0 <= sample_keep <= sample_mod and "
                    f"sample_mod > 0, got sample_keep={self.sample_keep!r} "
                    f"sample_mod={self.sample_mod!r}"
                )
        # legacy callers pass floats (the pre-rational API shape,
        # e.g. quality_min=0.62); coerce to an exact (num, den) pair
        # here instead of failing with an opaque unpacking error deep
        # inside the integer gates
        from entitymatch_spark.operators.textstats import coerce_rational

        object.__setattr__(
            self, "quality_min",
            coerce_rational(self.quality_min, "CurateConfig.quality_min"),
        )
        object.__setattr__(
            self, "jaccard_threshold",
            coerce_rational(
                self.jaccard_threshold, "CurateConfig.jaccard_threshold"
            ),
        )
        # same fail-fast as MatchConfig: bands past the signature end
        # silently zero those bands' recall (see blocking.py)
        from entitymatch_spark.operators.blocking import _check_band_geometry

        _check_band_geometry(self.bands, self.rows_per_band, self.minhash_hashes)


def _decision_hash(id_col, salt: str = ""):
    """The raw per-id decision integer (first 8 md5 hex chars of the
    salt-prefixed id string). THE one hash every keep/label decision
    derives from — sample_hash / split_assign / stratified_sample all
    reduce it mod their own denominators, so they cannot drift."""
    key = F.col(id_col).cast("string")
    if salt:
        key = F.concat(F.lit(salt), key)
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def sample_hash(id_col, mod: int, salt: str = ""):
    """Deterministic per-id sampling hash in [0, mod): first 8 md5 hex
    chars of the (salt-prefixed) id's decimal string, as an integer.
    Portable — any engine with md5 reproduces the keep decision."""
    return _decision_hash(id_col, salt) % mod


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, tuple[int, int]],
    *,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows:
    ``fractions[stratum] = (keep, mod)`` keeps a row iff its decision
    hash ``% mod < keep`` — exact rational rates (1, 2) = half,
    (1, 10) = a tenth, no float drift. Strata not listed are DROPPED
    (an explicit ``(1, 1)`` keeps a stratum whole).

    The keep decision depends only on (salt, id), so it is identical
    at any parallelism, stable under reruns and corpus growth, and a
    different ``salt`` draws an independent sample. Narrow per-row
    column math — zero shuffle, streaming-valid; this is how you
    rebalance a web corpus (downweight the over-crawled language /
    domain) without a global count.
    """
    if not fractions:
        raise ValueError("fractions must name at least one stratum")
    h = _decision_hash(id_col, salt)
    cond = None
    for stratum, (keep, mod) in fractions.items():
        if mod <= 0 or not 0 <= keep <= mod:
            raise ValueError(
                f"stratum {stratum!r}: need 0 <= keep <= mod and mod > 0, "
                f"got (keep, mod) = {(keep, mod)}"
            )
        c = (F.col(strata_col) == F.lit(stratum)) & ((h % mod) < keep)
        cond = c if cond is None else (cond | c)
    return df.filter(cond)


def cap_per_group(
    df: DataFrame, group_col: str, n: int, order_by: list
) -> DataFrame:
    """Keep at most ``n`` rows per group, preferring the first rows in
    ``order_by`` order — the per-domain cap of web-corpus curation
    (bound any one source's share instead of letting the most-crawled
    domain dominate the mix). ``order_by`` must be a TOTAL order
    (break ties on a unique id) or the kept set is nondeterministic.

    One shuffle on the group key; the rank-limit filter is pushed into
    the window operator (WindowGroupLimit), so state per task is
    bounded by n, not by the hottest group's row count — the property
    that makes a 10^9-page domain safe to cap.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if "__rn" in df.columns:
        raise ValueError("'__rn' is reserved by cap_per_group; rename it")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def curate(
    docs: DataFrame,
    cfg: CurateConfig = CurateConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, quality, n_members) for every doc that survives
    quality filter -> near-dup dedup -> sampling.

    ``n_members`` counts the QUALITY-FILTERED docs each survivor stands
    for (the reweighting factor for downstream sampling); docs rejected
    on quality never enter the dedup pool.
    """
    from entitymatch_spark.functions.text import tokenize
    from entitymatch_spark.operators.blocking import (
        candidate_pairs,
        lsh_band_keys,
        minhash_signature,
    )
    from entitymatch_spark.operators.dedup import (
        dedup_survivors,
        verify_token_jaccard,
    )
    from entitymatch_spark.operators.textstats import (
        quality_at_least,
        quality_score,
    )

    toks = docs.select(F.col(id_col), tokenize(text_col).alias("tokens"))
    # integer-exact gate FIRST (no join needed: quality_score of the
    # kept pool yields exactly the filtered stats)
    pool = toks.filter(quality_at_least("tokens", cfg.quality_min))
    if cfg.cache_pool:
        # the pool lineage feeds stats, signatures, AND both sides of
        # the jaccard verify — unpersisted, the corpus scan + tokenize
        # + gate re-execute once per reference (MEMORY_AND_DISK, the
        # same tradeoff MatchConfig.cache makes for the match docs)
        pool = pool.persist()
    stats = quality_score(pool, id_col=id_col)

    sigs = minhash_signature(
        pool,
        id_col=id_col,
        num_hashes=cfg.minhash_hashes,
        seed=cfg.seed,
        token_hash=cfg.token_hash,
    )
    keys = lsh_band_keys(
        sigs,
        bands=cfg.bands,
        rows_per_band=cfg.rows_per_band,
        id_col=id_col,
        band_hash=cfg.band_hash,
        sig_len=cfg.minhash_hashes,
    )
    cand = candidate_pairs(keys, max_block=cfg.max_block, id_col=id_col)

    ver = verify_token_jaccard(
        cand, pool, threshold=cfg.jaccard_threshold, id_col=id_col
    ).select("id_a", "id_b")

    out = dedup_survivors(
        stats.select(id_col, "n_tokens", "quality"), ver, id_col=id_col
    )
    if cfg.sample_keep is not None:
        out = out.filter(
            sample_hash(id_col, cfg.sample_mod, cfg.sample_salt)
            < cfg.sample_keep
        )
    return out.select(id_col, "n_tokens", "quality", "n_members")


def split_assign(
    docs: DataFrame,
    splits: dict[str, int] | None = None,
    id_col: str = "doc_id",
    mod: int = 10000,
    salt: str = "",
) -> DataFrame:
    """docs + a deterministic ``split`` label (train/val/test style).

    ``splits`` maps label -> weight in ``mod``-ths; weights must sum to
    ``mod`` (exact integer shares, no float drift). A doc's label is
    decided by which cumulative bucket its content hash lands in —
    md5 of salt + id, so (a) the assignment is identical at any
    parallelism and rerun, (b) a different ``salt`` draws a fresh
    independent partition without touching the data, and (c) adding
    docs never moves existing docs between splits (the property a
    growing corpus needs: yesterday's val doc must not leak into
    today's train split).

    Narrow per-row column math — no shuffle, valid in streaming plans.
    """
    splits = splits or {"train": 9000, "val": 500, "test": 500}
    if any(w < 0 for w in splits.values()):
        # a negative weight still sums to mod but pushes a cumulative
        # edge past mod, silently swallowing the later splits
        raise ValueError(f"split weights must be >= 0, got {splits}")
    if sum(splits.values()) != mod:
        raise ValueError(
            f"split weights {splits} must sum to mod={mod} "
            "(exact integer shares)"
        )
    h = sample_hash(id_col, mod, salt)
    expr = None
    edge = 0
    for label, weight in splits.items():
        edge += weight
        cond = h < edge
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return docs.withColumn("split", expr)
