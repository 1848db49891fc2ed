"""Structured Streaming: incremental corpus ingestion.

The reference's incremental patterns are per-character autocomplete
state (ref: EditTrie/Trie.cs:221-282) and resumable keyset-paginated
scans (ref: extract/Program.cs:69-79) — both single-process. The
streaming analog for this engine is incremental *index maintenance*:
as new pages arrive, emit their normalized fingerprints / MinHash
blocking keys so the batch pipeline's state tables stay current, and
keep watermarked event-time aggregates for monitoring.

All transformations here are the SAME columnar expressions the batch
operators use (normalize/tokenize/minhash are stateless per-row), so
batch/stream parity is by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entitymatch_spark.functions.text import normalize_text, tokenize
from entitymatch_spark.operators.blocking import (
    lsh_band_keys,
    lsh_band_keys_expr,
    minhash_sig_expr,
    minhash_signature,
)


def incremental_fingerprints(pages_stream: DataFrame) -> DataFrame:
    """Streaming (url, warc_ts, fingerprint): exact-dedup keys for new
    pages; downstream sinks join against the historical fingerprint
    table to drop already-seen content."""
    return pages_stream.select(
        "url",
        "warc_ts",
        F.md5(normalize_text("text")).alias("fingerprint"),
    )


def incremental_minhash_keys(
    pages_stream: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    seed: int = 42,
    token_hash: str = "xxhash64",
    band_hash: str = "xxhash64",
) -> DataFrame:
    """Streaming (url, key): LSH blocking keys for newly arrived pages.

    minhash_signature aggregates per url; on a stream this is a
    stateless per-row aggregation only because each url appears once
    per micro-batch — enforced by the upstream source contract.

    ``token_hash``/``band_hash`` MUST match the static index's
    configuration (MatchConfig.minhash_token_hash / lsh_band_hash):
    keys built with a different hash variant never collide with the
    indexed keys, so recall silently drops to zero on the LSH branch.
    """
    docs = pages_stream.select(
        F.col("url").alias("doc_id"), tokenize("text").alias("tokens")
    )
    sigs = minhash_signature(
        docs, id_col="doc_id", num_hashes=num_hashes, seed=seed,
        token_hash=token_hash,
    )
    return lsh_band_keys(
        sigs, bands=bands, rows_per_band=rows_per_band, id_col="doc_id",
        band_hash=band_hash, sig_len=num_hashes,
    )


def incremental_match(
    pages_stream: DataFrame,
    static_docs: DataFrame,
    static_keys: DataFrame,
    idf: DataFrame,
    idf_map: dict[str, float],
    min_idf: float = 1.0,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    seed: int = 42,
    token_hash: str = "xxhash64",
    band_hash: str = "xxhash64",
    weights: dict[str, float] | None = None,
    threshold: float | None = None,
    default_idf: float = 1e-5,
    dedup_within_watermark: bool = False,
    event_time_col: str = "warc_ts",
    lev_prefix: int | None = None,
    jw_prefix: int | None = None,
    lev_band: int | None = None,
) -> DataFrame:
    """Streaming record linkage: score newly arrived pages against the
    already-indexed corpus. (Stream-vs-static scoring only; for BATCH
    corpus growth that also merges cluster state and proves equality
    with a full recompute, see plans/incremental.py's function of the
    same name.) Uses the SAME keys and the SAME scorer as
    the batch pipeline (batch/stream parity by shared code, not by
    re-implementation).

    Plan (all stream-side steps are stateless/narrow, so the query is a
    valid append-mode Structured Streaming plan):

      new page -> normalize/tokenize -> hydration cols (prefixes, token
      set/string — computed ONCE, carried through; a stream cannot be
      re-joined to itself)
      -> blocking keys: rare-token keys (broadcast IDF membership;
         array_distinct + explode is per-row distinct, no stateful
         dropDuplicates needed since each url arrives once per the
         source contract) UNION MinHash band keys (minhash_sig_expr is
         a per-row column expression)
      -> stream-static equi-join against the PRE-PURGED static key
         table (block purging needs global key counts, a batch-side
         property of the index)
      -> stateful dropDuplicates on (id_a, id_b): a pair is scored at
         most once per stream lifetime (set dedup_within_watermark and
         put a watermark on the stream to bound that state in a
         long-running job)
      -> b-side hydration join against static docs (stream-static)
      -> score_hydrated: the batch scorer's feature + blend stage.

    static_docs: (doc_id, norm_text, tokens) of the indexed corpus.
    static_keys: (doc_id, key) — purged blocking keys of that corpus.
    idf/idf_map: the index's IDF table (broadcast) and scorer dict.
    token_hash/band_hash (and num_hashes/bands/rows_per_band/seed) MUST
    mirror the static index's MatchConfig — keys built with a different
    hash variant never equal the indexed keys, so the LSH branch of the
    stream-static join silently matches nothing. Likewise lev_prefix /
    jw_prefix (None = the batch defaults): a stream side hydrated at a
    different prefix cap scores the same pair differently from the
    batch pipeline — pass the index's MatchConfig.lev_prefix when it
    was customized.

    Emits (id_a = new url, id_b = indexed doc, features..., score).
    """
    from entitymatch_spark.operators.blocking import (
        _check_band_geometry,
        token_key_expr,
    )
    from entitymatch_spark.operators.scoring import (
        JW_PREFIX,
        LEV_BAND,
        LEV_PREFIX,
        hydration_exprs,
        score_hydrated,
    )

    # prefix/band knobs MUST mirror the static index's MatchConfig the
    # same way the hash knobs must: a stream side hydrated at a
    # different lev_prefix scores the same pair differently from the
    # batch pipeline, silently breaking batch/stream score parity
    lev_prefix = LEV_PREFIX if lev_prefix is None else lev_prefix
    jw_prefix = JW_PREFIX if jw_prefix is None else jw_prefix
    lev_band = LEV_BAND if lev_band is None else lev_band
    _check_band_geometry(bands, rows_per_band, num_hashes)

    # the event-time (watermark) column must ride along when bounded
    # dedup state is requested — fail fast here rather than let
    # dropDuplicatesWithinWatermark error obscurely downstream (or
    # silently drop the caller's watermark on a differently named column)
    if dedup_within_watermark:
        if event_time_col not in pages_stream.columns:
            raise ValueError(
                f"dedup_within_watermark=True needs event-time column "
                f"{event_time_col!r} on the stream (have: {pages_stream.columns}); "
                "pass event_time_col= to name it"
            )
        extra = [event_time_col]
    else:
        extra = []
    a = pages_stream.select(
        F.col("url").alias("id_a"),
        normalize_text("text").alias("_norm"),
        tokenize("text").alias("_toks"),
        *extra,
    )
    # the scorer's own hydration recipe (shared with hydration_side),
    # at the index's prefix caps
    hyd_cols = hydration_exprs(
        "a", "_norm", "_toks", lev_prefix=lev_prefix, jw_prefix=jw_prefix
    )
    a_hyd = a.select("id_a", *extra, *hyd_cols, "_toks")
    carry = ["id_a", *extra, "jwt_a", "levt_a", "toksj_a", "toksd_a"]

    rare = idf.filter(F.col("idf") >= min_idf).select("token")
    tok_keys = (
        a_hyd.select(*carry, F.explode("toksd_a").alias("token"))
        .join(F.broadcast(rare), "token")
        .select(*carry, token_key_expr(F.col("token")).alias("key"))
    )
    lsh_keys = (
        a_hyd.withColumn(
            "sig", minhash_sig_expr("_toks", num_hashes, seed, token_hash)
        )
        .select(
            *carry,
            F.explode(
                lsh_band_keys_expr("sig", bands, rows_per_band, band_hash)
            ).alias("key"),
        )
    )
    keys_a = tok_keys.unionByName(lsh_keys)

    cand = (
        keys_a.join(
            static_keys.select(F.col("doc_id").alias("id_b"), "key"), "key"
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .drop("key")
    )
    if dedup_within_watermark:
        cand = cand.dropDuplicatesWithinWatermark(["id_a", "id_b"])
    else:
        cand = cand.dropDuplicates(["id_a", "id_b"])

    from entitymatch_spark.operators.scoring import hydration_side

    b_side = hydration_side(
        static_docs, "b", lev_prefix=lev_prefix, jw_prefix=jw_prefix
    )
    hydrated = cand.join(b_side, "id_b")
    return score_hydrated(
        hydrated,
        idf_map,
        weights=weights,
        threshold=threshold,
        lev_band=lev_band,
        jw_prefix=jw_prefix,
        default_idf=default_idf,
    )


def streaming_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed counts over an event stream (late data
    handled by the watermark; append-mode compatible)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type", "n", "total",
        )
    )
