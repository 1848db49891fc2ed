"""The end-to-end record-linkage pipeline (BASELINE.json north_star).

    pages(url, warc_ts, html, text, lang)
      -> normalize/tokenize                 (columnar regex, M0)
      -> posting + IDF + totals             (posexplode + hash agg, M1)
      -> blocking keys: rare tokens ∪ LSH bands, block purging (M2)
      -> candidate pairs (single-pass bounded block expansion)
      -> batched Arrow pair scoring, IDF broadcast (M3)
      -> threshold -> matched pairs
      -> connected components -> stable cluster ids (M4)

Every stage is a DataFrame; `match_pipeline` wires them lazily so
Catalyst sees one plan per output. Checkpoint/resume for long jobs
lives in plans/checkpoint.py and wraps these stages at write points.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entitymatch_spark.functions.text import normalize_text, tokenize
from entitymatch_spark.operators.blocking import (
    _check_band_geometry,
    candidate_pairs,
    lsh_band_keys,
    minhash_signature,
    token_blocking_keys_from_docs,
)
from entitymatch_spark.operators.clustering import assign_clusters, connected_components
from entitymatch_spark.operators.posting import (
    build_posting,
    collect_idf_map,
    collect_idf_map_bounded,
    token_idf,
)
from entitymatch_spark.operators.scoring import (
    DEFAULT_THRESHOLD,
    DEFAULT_WEIGHTS,
    score_pairs,
)


@dataclass
class MatchConfig:
    min_idf: float = 1.0          # token blocking: rare-token floor
    max_block: int = 64           # block purging cap
    num_hashes: int = 64          # MinHash signature width
    bands: int = 16               # LSH bands (16 x 4: ~0.5 jaccard knee)
    rows_per_band: int = 4
    use_lsh: bool = True
    # hash choices: 'xxhash64' (fast, production) or the portable
    # 'md5'/'concat' pair that a relational oracle reproduces exactly
    # (see blocking.md5_token_hash) — lets the FULL pipeline incl. LSH
    # blocking be value-checked end-to-end.
    minhash_token_hash: str = "xxhash64"
    lsh_band_hash: str = "xxhash64"
    weights: dict = field(default_factory=lambda: dict(DEFAULT_WEIGHTS))
    threshold: float = DEFAULT_THRESHOLD
    lev_prefix: int = 128
    # verification cascade: pairs below this jaccard skip the Arrow UDF.
    # Safe at the default threshold (with jw/cosine/containment zeroed the
    # blend caps at 0.30 < 0.60), but OFF by default: the filter+union
    # re-hydrates both branches, so it only pays when a large fraction of
    # candidates are junk (e.g. web-scale LSH bands over boilerplate) —
    # measured 0% gated / 2.5x overhead on the labeled fixture.
    cascade_min_jaccard: float | None = None
    # Cap on the broadcast IDF dictionary (None = full vocabulary). At
    # 10^12-doc scale the raw web vocabulary does not fit in a broadcast;
    # keep the top-K most frequent tokens and score dropped (rare) tokens
    # at the tail's occurrence-weighted mean IDF — see
    # posting.collect_idf_map_bounded. BOUNDED BY DEFAULT: 2M entries
    # (~100-200 MB broadcast) so the default path has no unbounded
    # driver-side collect; at test scale the vocabulary is far smaller
    # than the cap, so nothing is dropped and results are identical.
    idf_max_entries: int | None = 2_000_000
    # Partition count for the pair table feeding the Arrow scorer.
    # AQE coalesces shuffle output by BYTES (advisory 64 MB), but the
    # scoring stage's cost is rows x python-time — on a mid-size corpus
    # a few-MB pair table coalesces to 1-2 partitions and the Python
    # scorer runs on 1-2 cores. "auto" repartitions to
    # 4 x defaultParallelism (cheap: the pair table is narrow);
    # None leaves AQE's layout (right when pairs are huge and
    # byte-proportional); an int pins it.
    score_partitions: int | str | None = "auto"
    # Minimum partition count for the INPUT scan. Parquet cannot split
    # below a row group, so a small input (one or few files) floors the
    # whole narrow front of the pipeline — normalize, tokenize, the
    # MinHash fold — at one task per file regardless of cluster size.
    # "auto" fans pages out to defaultParallelism when the scan arrives
    # below it (a no-op at real corpus scale, where splits ≫ cores);
    # None trusts the source layout; an int pins a floor.
    input_partitions: int | str | None = "auto"
    seed: int = 42
    cache: bool = True  # persist docs + pairs (reused by several stages)
    # block-cap enforcement: "purge" (single-pass; reduce buffer = the
    # hot key's PRE-purge size) or "prepurge" (count-first + broadcast
    # anti-join — every buffer bounded by max_block; one extra pass
    # over the key table). Same output, parity-tested. Flip to
    # "prepurge" for adversarially skewed corpora (boilerplate LSH
    # bands at 10^12 docs); "salt" trades recall instead of dropping.
    oversize_policy: str = "purge"
    id_col: str = "url"
    text_col: str = "text"

    def __post_init__(self):
        # fail at CONFIG time, not after the signature stage has run:
        # bands past the signature end would emit one constant key per
        # band (skew + zero recall after the purge — see blocking.py)
        if self.use_lsh:
            _check_band_geometry(self.bands, self.rows_per_band, self.num_hashes)


@dataclass
class MatchResult:
    """Every field is a lazy DataFrame except ``clusters``, which is
    computed ON FIRST ACCESS: the connected-components loop is an
    iterative algorithm with per-round driver actions (checksums,
    lineage cuts), so it cannot be a lazy plan — deferring it means a
    caller who stops at ``scored``/``matches`` never pays for
    clustering."""

    docs: DataFrame        # (id, norm_text, tokens)
    posting: DataFrame     # (id, pos, token)
    idf: DataFrame         # (token, df, idf)
    keys: DataFrame        # (id, key)
    pairs: DataFrame       # (id_a, id_b, n_keys)
    scored: DataFrame      # pairs + features + score
    matches: DataFrame     # scored, score >= threshold
    _clusters_fn: Callable[[], DataFrame] = field(repr=False)
    _clusters: DataFrame | None = field(default=None, repr=False)

    @property
    def clusters(self) -> DataFrame:
        """docs + cluster_id (runs transitive clustering once, cached)."""
        if self._clusters is None:
            self._clusters = self._clusters_fn()
        return self._clusters


def prepare_docs(pages: DataFrame, cfg: MatchConfig) -> DataFrame:
    if cfg.input_partitions is not None:
        floor = (
            pages.sparkSession.sparkContext.defaultParallelism
            if cfg.input_partitions == "auto"
            else int(cfg.input_partitions)
        )
        if pages.rdd.getNumPartitions() < floor:
            pages = pages.repartition(floor)
    return pages.select(
        F.col(cfg.id_col).alias("doc_id"),
        normalize_text(cfg.text_col).alias("norm_text"),
        tokenize(cfg.text_col).alias("tokens"),
    )


def blocking_keys(docs: DataFrame, idf: DataFrame, cfg: MatchConfig) -> DataFrame:
    """(doc_id, key, family): the pipeline's blocking-key table —
    rare-token keys (narrow per-doc array_distinct + broadcast IDF
    join, no global distinct shuffle) unioned with MinHash-LSH band
    keys when ``cfg.use_lsh``. THE one construction: the bench's timed
    chains call this too, so what the bench measures cannot drift from
    what the pipeline runs (hash variants, band geometry, use_lsh gate).
    """
    keys = token_blocking_keys_from_docs(docs, idf, min_idf=cfg.min_idf)
    if cfg.use_lsh:
        sigs = minhash_signature(
            docs, id_col="doc_id", tokens_col="tokens",
            num_hashes=cfg.num_hashes, seed=cfg.seed,
            token_hash=cfg.minhash_token_hash,
        )
        keys = keys.unionByName(
            lsh_band_keys(
                sigs, bands=cfg.bands, rows_per_band=cfg.rows_per_band,
                band_hash=cfg.lsh_band_hash, sig_len=cfg.num_hashes,
            )
        )
    return keys


def match_pipeline(
    pages: DataFrame, cfg: MatchConfig | None = None, idf: DataFrame | None = None
) -> MatchResult:
    """``idf``: optional external dictionary (token, df, idf) — e.g. a
    snapshot computed over a reference corpus, the contract that makes
    batch-incremental growth exact (plans/incremental.py). Default
    (None) computes IDF over ``pages`` itself, unchanged."""
    cfg = cfg or MatchConfig()
    docs = prepare_docs(pages, cfg)
    if cfg.cache:
        docs = docs.persist()
    n_docs = docs.count()

    posting = build_posting(docs, id_col="doc_id")
    if idf is None:
        idf = token_idf(posting, n_docs=n_docs)

    keys = blocking_keys(docs, idf, cfg)

    # No keys persist: candidate_pairs is single-pass (one groupBy over
    # the key table), so there is no multi-reference recompute to avoid
    # and nothing to leak from the cache.
    pairs = candidate_pairs(
        keys, max_block=cfg.max_block, oversize_policy=cfg.oversize_policy
    )
    if cfg.score_partitions is not None:
        n_part = (
            4 * pages.sparkSession.sparkContext.defaultParallelism
            if cfg.score_partitions == "auto"
            else int(cfg.score_partitions)
        )
        # Hash-partition by id_a + local sort, NOT round-robin: the
        # Arrow scorer memoizes per-doc tf-idf/Jaro profiles PER BATCH,
        # and on a round-robin layout a doc's pairs scatter across all
        # partitions so nearly every lookup misses (the memo dict also
        # balloons to one entry per distinct doc per batch — GC
        # pressure that grows with corpus size, not pair count).
        # Sorted runs of id_a make the a-side profile a guaranteed hit
        # and keep the working set small. Measured on a 105k-doc /
        # 5.1M-pair corpus (scripts/stress_scale.py shape, interleaved
        # 3-round A/B): 50-56s sorted vs 105-122s round-robin — ~2x.
        # Skew is bounded: max_block caps any one doc's pair count.
        # CAVEAT: the local sort only materializes through the persist
        # boundary below (cfg.cache=True, the default) — with
        # cache=False Catalyst's EliminateSorts drops a Sort under the
        # hydration joins as semantically unordered, leaving hash
        # partitioning alone (still co-locates each doc's pairs; the
        # per-batch hit rate just loses the contiguity bonus). The
        # resumable path bakes the same layout into written parquet
        # instead, which has no such exposure (plans/resumable.py).
        pairs = pairs.repartition(n_part, "id_a").sortWithinPartitions(
            "id_a", "id_b"
        )
    if cfg.cache:
        pairs = pairs.persist()
    if cfg.idf_max_entries is not None:
        idf_map, default_idf = collect_idf_map_bounded(idf, cfg.idf_max_entries)
    else:
        idf_map, default_idf = collect_idf_map(idf), 1e-5
    scored = score_pairs(
        pairs, docs, idf_map,
        weights=cfg.weights, lev_prefix=cfg.lev_prefix,
        cascade_min_jaccard=cfg.cascade_min_jaccard,
        default_idf=default_idf,
    )
    matches = scored.filter(F.col("score") >= cfg.threshold)

    def _clusters() -> DataFrame:
        components = connected_components(
            matches.select("id_a", "id_b"), src="id_a", dst="id_b"
        )
        return assign_clusters(docs.select("doc_id"), components)

    return MatchResult(
        docs=docs, posting=posting, idf=idf, keys=keys,
        pairs=pairs, scored=scored, matches=matches, _clusters_fn=_clusters,
    )
