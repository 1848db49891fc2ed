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
from entitymatch_spark.operators.blocking import lsh_band_keys, minhash_signature


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
) -> DataFrame:
    """Streaming (url, key): LSH blocking keys for newly arrived pages.

    minhash_signature aggregates per url; on a stream this is a
    stateless per-row aggregation only because each url appears once
    per micro-batch — enforced by the upstream source contract.
    """
    docs = pages_stream.select(
        F.col("url").alias("doc_id"), tokenize("text").alias("tokens")
    )
    sigs = minhash_signature(docs, id_col="doc_id", num_hashes=num_hashes, seed=seed)
    return lsh_band_keys(sigs, bands=bands, rows_per_band=rows_per_band, id_col="doc_id")


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
