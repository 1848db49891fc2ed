"""The reference's flagship query, end to end: Matcher.Interpretations.

ref: EntityMatch/EntityMatch/Matcher.cs:43-51 — tokenize -> expand each
token through the alternatives chain (spelling within edit distance 1
at weight 1/(1+d) with exact short-circuit, then synonyms with
multiplicative weights; TestMatcher/Program.cs:262-273 wiring) ->
recognize spans (posting lookup with weight = altWeight x IDF, maximal
adjacent runs, score = weight / entity total, threshold) -> top-k spans
per (type, start).

Batch-of-queries semantics: instead of one utterance per call, the
whole `queries(query_id, text)` DataFrame flows through at once — the
per-query loop of the reference becomes one relational plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entitymatch_spark.functions.text import tokenize
from entitymatch_spark.operators.alternatives import spelling_alternatives
from entitymatch_spark.operators.posting import (
    build_posting,
    token_idf,
    total_token_weight,
)
from entitymatch_spark.operators.spans import extend_spans, topk_spans


@dataclass
class MatcherIndex:
    """Build-time artifacts (AddEntities + Compute, Matcher.cs:28-41)."""

    entities: DataFrame   # (entity_id, type, phrase)
    posting: DataFrame    # (entity_id, pos, token)
    idf: DataFrame        # (token, df, idf)
    totals: DataFrame     # (entity_id, total_weight)
    vocab: DataFrame      # (token) — the spelling trie's vocabulary


def build_matcher_index(entities: DataFrame) -> MatcherIndex:
    toks = entities.select("entity_id", tokenize("phrase").alias("tokens"))
    posting = build_posting(toks, id_col="entity_id")
    n = entities.count()
    idf = token_idf(posting, n_docs=n)
    totals = total_token_weight(posting, idf, "entity_id")
    vocab = posting.select("token").distinct()
    return MatcherIndex(entities, posting, idf, totals, vocab)


def interpret(
    queries: DataFrame,
    index: MatcherIndex,
    synonyms: DataFrame | None = None,
    spans_per_position: int = 1,
    threshold: float = 0.25,
    max_edit: int = 1,
) -> DataFrame:
    """(query_id, entity_id, type, phrase, start, length, score).

    Defaults mirror the reference REPL (spansPerPosition=1,
    threshold=0.25; TestMatcher/Program.cs:39-40).
    """
    qtok = queries.select(
        "query_id", F.posexplode(tokenize("text")).alias("qpos", "token")
    )
    # --- alternatives chain (SynonymAlternatives(SpellingAlternatives(Base)))
    probe = qtok.select("token").distinct()
    spelled = spelling_alternatives(probe, index.vocab, max_edit=max_edit).select(
        "token", "alt_token", "weight"
    )
    if synonyms is not None:
        # SynonymAlternatives is the OUTERMOST expander and *replaces* a
        # spelling alternative with its mapped synonyms, weights
        # multiplied (ref: Alternatives.cs:43-59 — a token present in
        # the map yields only the mapped alternatives, so the map must
        # contain the identity to keep it, exactly as the reference's
        # own example does: mouse -> {mouse 1.0, mice 0.9},
        # TestMatcher/Program.cs:279).
        # NOTE: alternatives.synonym_expand is the KEEP-IDENTITY
        # sibling of this replace-if-mapped block; the aliasing/
        # broadcast shape is deliberately the same — if a fix lands in
        # one (NULL keys, weight dedup), mirror it in the other.
        syn = synonyms.select(
            F.col("token").alias("__k"),
            F.col("alt_token").alias("__syn"),
            F.col("weight").alias("__w"),
        )
        mapped = (
            spelled.join(F.broadcast(syn), spelled["alt_token"] == F.col("__k"))
            .select(
                "token",
                F.col("__syn").alias("alt_token"),
                (spelled["weight"] * F.col("__w")).alias("weight"),
            )
        )
        unmapped = spelled.join(
            F.broadcast(syn.select("__k").distinct()),
            spelled["alt_token"] == F.col("__k"),
            "left_anti",
        ).select("token", "alt_token", "weight")
        alts = (
            unmapped.unionByName(mapped)
            .groupBy("token", "alt_token")
            .agg(F.max("weight").alias("weight"))
        )
    else:
        alts = spelled
    expanded_q = (
        qtok.join(alts, "token")
        .select(
            "query_id", "qpos",
            F.col("alt_token").alias("token"),
            F.col("weight"),
        )
    )
    spans = extend_spans(
        expanded_q, index.posting, index.idf, index.totals, threshold=threshold
    )
    typed = spans.join(
        F.broadcast(index.entities.select("entity_id", "type", "phrase")), "entity_id"
    )
    return topk_spans(
        typed,
        k=spans_per_position,
        partition_cols=("query_id", "type", "start"),
    ).select("query_id", "entity_id", "type", "phrase", "start", "length", "score")
