"""Candidate generation: token blocking + MinHash-LSH, skew-aware.

The reference's only blocking structure is the inverted index — every
entity sharing >=1 token with the query is a candidate (ref:
EntityMatch/EntityMatch/EntitiesDictionary.cs:39-62, Recognizer.cs:97-126).
At web scale that is quadratic under Zipfian tokens, so this module is
skew-aware by construction:

- **Token blocking** keeps only *discriminative* tokens (IDF above a
  floor — the same signal the reference uses to weight tokens,
  EntitiesDictionary.cs:69-79).
- **MinHash-LSH** adds recall for pairs that share no rare token:
  64 seeded linear permutations min-folded over xxhash64(token) —
  entirely JVM-side column expressions (no UDF, deterministic across
  partitionings), banded into key groups; two docs collide on a band
  iff their signatures agree on all rows of the band.
- **Block purging + salting**: any key whose block exceeds ``max_block``
  is dropped (an over-shared key has no discriminative power — the
  blocking analog of the IDF floor); surviving blocks are bounded, so
  per-block pair output is bounded by cap^2/2. Pair generation is a
  SINGLE PASS over the key table (see candidate_pairs), with AQE skew
  splitting on top.

MinHash arithmetic note: Spark 4 runs ANSI mode (overflow raises), so
the permutation is computed mod the Mersenne prime 2^31-1 with factors
< 2^31 — products stay under 2^62, no overflow.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERSENNE_31 = (1 << 31) - 1


def token_key_expr(token) -> "F.Column":
    """The canonical token blocking key: ``tok:<token>``. ONE place
    defines the format — the batch key builders below and the
    streaming matcher's per-row key construction must emit identical
    strings or stream keys silently stop equaling indexed keys."""
    return F.concat(F.lit("tok:"), token)


def _check_band_geometry(bands: int, rows_per_band: int, sig_len: int | None) -> None:
    """Fail fast when the band layout overruns the signature: bands
    past the end slice empty arrays, so every doc collides on ONE
    constant key per out-of-range band — a massive skewed block that
    the purge then drops, silently zeroing those bands' recall."""
    if sig_len is not None and bands * rows_per_band > sig_len:
        raise ValueError(
            f"bands*rows_per_band = {bands}*{rows_per_band} = "
            f"{bands * rows_per_band} exceeds the signature length "
            f"{sig_len}; raise num_hashes or lower bands/rows_per_band"
        )


def token_blocking_keys(
    posting: DataFrame,
    idf: DataFrame,
    min_idf: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, key): one blocking key per (doc, rare token).

    Rare = idf >= min_idf. IDF is vocabulary-sized -> broadcast join.
    The trailing .distinct() is a full shuffle of the key table; when
    the docs table (with its token arrays) is at hand, prefer
    token_blocking_keys_from_docs — identical output with ZERO shuffle.
    This posting-based form serves callers that only have the exploded
    posting (e.g. a pre-materialized static index).
    """
    rare = idf.filter(F.col("idf") >= min_idf).select("token")
    return (
        posting.join(F.broadcast(rare), "token")
        .select(id_col, token_key_expr(F.col("token")).alias("key"))
        .distinct()
    )


def token_blocking_keys_from_docs(
    docs: DataFrame,
    idf: DataFrame,
    min_idf: float = 1.0,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """token_blocking_keys computed NARROWLY from the docs table.

    Per-row array_distinct before the explode replaces the global
    .distinct() (dedup within a doc needs no cross-partition view), so
    the whole key construction is explode + broadcast-join — zero
    shuffles. At web scale that removes one full shuffle of a
    ~10^13-row key table from the blocking stage. Output is
    row-identical to the posting form (asserted in
    tests/test_blocking_clustering.py).
    """
    rare = idf.filter(F.col("idf") >= min_idf).select("token")
    return (
        docs.select(
            F.col(id_col), F.explode(F.array_distinct(tokens_col)).alias("token")
        )
        .join(F.broadcast(rare), "token")
        .select(id_col, token_key_expr(F.col("token")).alias("key"))
    )


def minhash_coeffs(num_hashes: int = 64, seed: int = 42) -> list[tuple[int, int]]:
    """The seeded permutation coefficients — exposed so an external
    oracle (e.g. the DuckDB contract SQL) can reproduce signatures."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_31), rng.randrange(0, MERSENNE_31))
        for _ in range(num_hashes)
    ]


def md5_token_hash(t) -> "F.Column":
    """60-bit token hash from the md5 hex prefix, mod 2^31-1 — exactly
    reproducible in any engine with md5 (DuckDB: ('0x'||substr(md5(t),
    1,15))::BIGINT). The xxhash64 default is faster; this portable
    variant exists so the MinHash-LSH path can be value-checked by a
    relational oracle end-to-end."""
    return F.pmod(
        F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
        F.lit(MERSENNE_31),
    )


def minhash_sig_expr(
    tokens_col: str = "tokens",
    num_hashes: int = 64,
    seed: int = 42,
    token_hash: str = "xxhash64",
):
    """MinHash signature as a pure COLUMN EXPRESSION (array<long>, null
    for empty token sets). Being a per-row expression, it composes into
    any plan — including Structured Streaming, where the incremental
    matcher computes it on newly arrived pages with zero state.

    token_hash: 'xxhash64' (default, fastest) or 'md5' (portable —
    bit-for-bit reproducible by the DuckDB oracle, see md5_token_hash).

    Shape: a single aggregate() FOLD over the hashed token array — the
    accumulator is the 64-slot signature, each token zip_with/least-
    folds its 64 permuted values in. One array traversal, and the
    token-hash subexpression appears ONCE (the aggregate's input), so
    it is evaluated once per token. The previous shape — 64 separate
    array_min(transform(hashed, perm)) expressions — textually
    duplicated the hash into every min; higher-order functions
    evaluate without whole-stage-codegen subexpression elimination, so
    tokens were re-hashed 64x and the array traversed 64x. Measured
    2.4x faster on the signature stage (scripts/micro_minhash.py,
    17,741 docs, local[8]: 2.4s -> 1.0s), signatures bit-identical.
    """
    coeffs = minhash_coeffs(num_hashes, seed)
    p = F.lit(MERSENNE_31)
    if token_hash == "md5":
        hashed = F.transform(F.array_distinct(tokens_col), md5_token_hash)
    else:
        hashed = F.transform(
            F.array_distinct(tokens_col), lambda t: F.pmod(F.xxhash64(t), p)
        )

    def perms(x):
        return F.array(*[F.pmod(x * F.lit(a) + F.lit(b), p) for (a, b) in coeffs])

    mins = F.aggregate(
        hashed,
        F.array_repeat(F.lit(MERSENNE_31).cast("long"), num_hashes),
        lambda acc, x: F.zip_with(acc, perms(x), lambda m, v: F.least(m, v)),
    )
    return F.when(F.size(tokens_col) > 0, mins)


def lsh_band_keys_expr(
    sig_col: str = "sig",
    bands: int = 16,
    rows_per_band: int = 4,
    band_hash: str = "xxhash64",
    sig_len: int | None = None,
):
    """Band-key array (array<string>) from a signature column — one key
    per band, empty array for a null signature. Column expression form
    so the streaming path can use it per row.

    band_hash: 'xxhash64' folds each band slice to one long (compact
    shuffle keys); 'concat' joins the slice values textually — longer
    keys, but exactly reproducible by a relational oracle.

    ``sig_len``: the signature width (num_hashes) when the caller knows
    it — validates ``bands * rows_per_band <= sig_len`` and raises
    instead of silently emitting one constant key per out-of-range band
    (see _check_band_geometry).
    """
    _check_band_geometry(bands, rows_per_band, sig_len)
    cols = []
    for b in range(bands):
        sl = F.slice(sig_col, b * rows_per_band + 1, rows_per_band)
        if band_hash == "concat":
            cols.append(
                F.concat(
                    F.lit(f"lsh{b}:"),
                    F.array_join(
                        F.transform(sl, lambda x: x.cast("string")), ","
                    ),
                )
            )
        else:
            cols.append(F.concat(F.lit(f"lsh{b}:"), F.xxhash64(sl)))
    return F.when(
        F.col(sig_col).isNotNull(), F.array(*cols)
    ).otherwise(F.array().cast("array<string>"))


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_hashes: int = 64,
    seed: int = 42,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """(id, sig array<long>): deterministic MinHash over the token *set*.

    sig[i] = min over distinct tokens t of (a_i * (xxhash64(t) mod p) + b_i) mod p
    with p = 2^31 - 1. Computed PER ROW with a single aggregate() fold column
    expressions (minhash_sig_expr) — a narrow transformation: zero
    shuffle, valid in Structured Streaming, and trivially partition-
    independent. Seeded factors, never time- or partition-dependent ->
    stable across cluster sizes.

    Docs with no tokens get no signature row (empty sets match nothing).
    """
    return (
        df.filter(F.size(tokens_col) > 0)
        .select(
            F.col(id_col),
            minhash_sig_expr(tokens_col, num_hashes, seed, token_hash).alias("sig"),
        )
    )


def lsh_band_keys(
    signatures: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    id_col: str = "doc_id",
    band_hash: str = "xxhash64",
    sig_len: int | None = None,
) -> DataFrame:
    """(id, key): one key per signature band — docs collide on a band iff
    all ``rows_per_band`` signature slots agree. Key = band index +
    a fold of the band slice (see lsh_band_keys_expr band_hash;
    ``sig_len`` = the signatures' num_hashes, validated when given).
    """
    _check_band_geometry(bands, rows_per_band, sig_len)
    return signatures.select(
        id_col,
        F.explode(
            lsh_band_keys_expr("sig", bands, rows_per_band, band_hash)
        ).alias("key"),
    )


def prune_oversized_blocks(keys: DataFrame, max_block: int) -> DataFrame:
    """Drop keys whose block exceeds ``max_block`` (block purging).
    (No id_col parameter: the purge decision touches only ``key`` —
    an id-named knob here would imply per-id behavior it doesn't have.)

    Bounded blocks make per-block pair output <= cap^2/2 and leave no
    skewed shuffle key behind. candidate_pairs folds this purge into
    its block grouping; this standalone form serves callers that need
    a purged KEY table itself (e.g. the streaming matcher's static
    side, which stream-static-joins against it every micro-batch).
    """
    sizes = keys.groupBy("key").agg(F.count("*").alias("n"))
    ok = sizes.filter(F.col("n") <= max_block).select("key")
    return keys.join(ok, "key")


def salt_oversized_blocks(
    keys: DataFrame, max_block: int, id_col: str = "doc_id"
) -> DataFrame:
    """Split blocks larger than ``max_block`` into hash-salted sub-blocks.

    A block of n docs becomes ceil(n / max_block) sub-blocks keyed by
    ``key#salt`` with salt = xxhash64(id) mod s — deterministic, no
    partition dependence. Pair generation then happens within
    sub-blocks only: the join key cardinality is bounded (no skewed
    reducer) at the cost of sampling cross-sub-block pairs away
    (probability ~1/s of keeping a given pair of a hot key). For
    near-dup discovery this is the standard recall/cost dial: truly
    similar pairs share several keys, so they get several chances.

    Only the OVERSIZED keys ride the broadcast: at web scale the full
    key-size table is vocabulary-sized (10^9+, never broadcastable),
    but keys with > max_block members are few by definition — Zipf's
    head, not its tail. Normal keys pass through the left join
    untouched with no per-key state.
    """
    sizes = keys.groupBy("key").agg(F.count("*").alias("__n"))
    hot = sizes.filter(F.col("__n") > max_block)
    s = F.ceil(F.col("__n") / F.lit(max_block)).cast("long")
    return (
        keys.join(F.broadcast(hot), "key", "left")
        .withColumn(
            "key",
            F.when(F.col("__n").isNull(), F.col("key")).otherwise(
                F.concat(
                    F.col("key"), F.lit("#"),
                    F.pmod(F.xxhash64(F.col(id_col)), s).cast("string"),
                )
            ),
        )
        .drop("__n")
    )


def candidate_pairs(
    keys: DataFrame,
    max_block: int = 64,
    id_col: str = "doc_id",
    n_partitions: int | None = None,
    oversize_policy: str = "purge",
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """(id_a, id_b, n_keys): unordered candidate pairs from blocking keys.

    SINGLE-PASS block expansion: one groupBy(key) collects each block's
    member ids (bounded by ``max_block`` after purge/salt, so the arrays
    are small), then pairs with id_a < id_b explode WITHIN the block —
    a narrow transformation. Pairs generated by several keys are deduped
    and carry how many keys agreed (a free, cheap match signal).

    Why this beats the classic self-equi-join on key: the join form
    reads the key table three times (block-size aggregate + both join
    sides) — without a persist the whole upstream (e.g. the 64-hash
    MinHash) is recomputed per reference, and with one it pays a
    cache-write barrier; either way the join shuffles the key table
    twice more. Here the key table is consumed ONCE, the plan has two
    shuffles total (block groupBy + pair dedup groupBy), and reduce-side
    memory stays bounded by the block cap. Measured on the
    dedup_minhash_lsh contract query at sf0.1 (median of 5): join form
    6.2s without persist / 3.6s with persist -> 2.85s single-pass with
    NO persist (warm rounds 2.2-2.5s). The contract queries and the
    pipeline dropped their key persists on the back of this (they were
    also leaking cached blocks across the driver session — ADVICE r2).

    oversize_policy:
      - "purge": drop blocks over ``max_block`` (an over-shared key has
        no discriminative power — the blocking analog of the IDF floor).
        CAVEAT: the purge is applied AFTER the collect, so the reduce
        buffer for one pathological key is the block's PRE-purge size.
        Fine when upstream already bounds key frequency (the IDF floor,
        LSH bands over non-degenerate signatures); at true web scale
        with adversarial boilerplate use "prepurge".
      - "prepurge": same OUTPUT as "purge" (parity-tested), but the
        oversized keys are identified by a count-first aggregate and
        removed with a broadcast anti-join BEFORE the collect, so every
        aggregation buffer is bounded by ``max_block``. Costs a second
        pass over the key table (persist the keys or accept the
        upstream recompute) — the safety/one-pass dial at 10^12 docs.
      - "salt": keep oversized blocks, split into hash-salted
        sub-blocks (bounded cost, sampled recall on hot keys — see
        salt_oversized_blocks; sub-block sizes are ~max_block in
        expectation, so the collected arrays stay bounded too).
    """
    if oversize_policy == "salt":
        keys = salt_oversized_blocks(keys, max_block, id_col)
    elif oversize_policy == "prepurge":
        oversized = (
            keys.groupBy("key")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_block)
            .select("key")
        )
        # hot keys are FEW (that is why they're purged) -> broadcast
        keys = keys.join(F.broadcast(oversized), "key", "left_anti")
    elif oversize_policy != "purge":
        raise ValueError(f"unknown oversize_policy: {oversize_policy!r}")
    if n_partitions:
        keys = keys.repartition(n_partitions, "key")
    # ``payload_cols`` carries NARROW per-id columns (e.g. an 8-byte
    # SimHash) through the block expansion so the verifier needs NO
    # join back to the id table — which, when the upstream is a narrow
    # fold with no exchange to reuse, would recompute that upstream
    # once per join side. Output gains <c>_a/<c>_b per payload column.
    # Keep payloads small: each rides the block shuffle once per key
    # and the pair shuffle twice per pair (fat columns belong in the
    # join form, see score_pairs hydration). Without payloads the
    # member is the bare id — same plan minus the struct wrap.
    member = (
        F.struct(F.col(id_col).alias("__id"), *[F.col(c) for c in payload_cols])
        if payload_cols
        else F.col(id_col)
    )
    # collect_list (not _set): duplicate (key, id) rows must count
    # toward the purge threshold and the n_keys signal exactly as the
    # row-level join form did.
    blocks = keys.groupBy("key").agg(F.collect_list(member).alias("ids"))
    if oversize_policy in ("purge", "prepurge"):
        # prepurge already bounded the buffers; the filter is then a
        # no-op kept for belt-and-braces output parity with purge
        blocks = blocks.filter(F.size("ids") <= max_block)
    # blocks of one produce no pairs; skip their expansion entirely
    blocks = blocks.filter(F.size("ids") >= 2)
    expanded = (
        blocks.select(F.col("ids"), F.explode("ids").alias("a"))
        .select("a", F.explode("ids").alias("b"))
    )
    a_id = F.col("a.__id") if payload_cols else F.col("a")
    b_id = F.col("b.__id") if payload_cols else F.col("b")
    return (
        expanded.filter(a_id < b_id)
        .groupBy(a_id.alias("id_a"), b_id.alias("id_b"))
        .agg(
            F.count("*").alias("n_keys"),
            *[F.first(f"a.{c}").alias(f"{c}_a") for c in payload_cols],
            *[F.first(f"b.{c}").alias(f"{c}_b") for c in payload_cols],
        )
    )
