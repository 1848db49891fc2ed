"""entitymatch_spark — a PySpark-native record-linkage / entity-matching engine.

A from-scratch reimplementation of the capabilities of the reference
EntityMatch engine (C#, /root/reference) as an idiomatic Spark DataFrame
pipeline: normalize/tokenize -> inverted-index (posting) + IDF weights ->
blocking (token keys + MinHash-LSH, salted and skew-aware) -> batched
Arrow/pandas pair scoring (Jaro-Winkler, Levenshtein, TF-IDF cosine,
weighted containment) -> transitive clustering via iterative DataFrame
connected components -> stable cluster ids.

Nothing here is a port: the reference's tries, sorted-merge posting joins
and NFA edit lookups are execution strategies for a single process; on
Spark the same semantics are expressed as relational plans that Catalyst
optimizes (hash joins, window gap-and-island, broadcast dictionaries).

The top level re-exports the headline entry points (the README pipeline
diagram's surface) so a user program never needs the module map::

    import entitymatch_spark as em

    spark = em.get_spark()
    result = em.match_pipeline(pages, em.MatchConfig(id_col="url"))
    result.clusters.show()

Deeper dials (operators/, plans/, streaming/, functions/) stay import-
able by module for power users.
"""

from __future__ import annotations

__version__ = "0.1.0"

# session
from entitymatch_spark.session import ensure_workers_can_import, get_spark

# flagship match pipeline
from entitymatch_spark.plans.pipeline import (
    MatchConfig,
    MatchResult,
    match_pipeline,
    prepare_docs,
)
from entitymatch_spark.operators.scoring import score_pairs
from entitymatch_spark.operators.clustering import (
    assign_clusters,
    connected_components,
)

# incremental lifecycle (grow / recalibrate / delete / upsert / persist)
from entitymatch_spark.plans.incremental import (
    IncrementalResult,
    MatchState,
    commit_increment,
    incremental_match,
    initial_state,
    load_state,
    remove_docs,
    rethreshold,
    save_state,
    upsert_pages,
)

# corpus curation / training-data hygiene
from entitymatch_spark.plans.curate import CurateConfig, curate, split_assign
from entitymatch_spark.operators.decontam import (
    contamination_report,
    decontaminate,
    fuzzy_contamination_report,
)
from entitymatch_spark.operators.dedup import dedup_survivors, exact_dedup
from entitymatch_spark.operators.pii import redact_pii
from entitymatch_spark.operators.urlnorm import canonical_url, latest_snapshot
from entitymatch_spark.operators.textstats import (
    lang_id,
    quality_at_least,
    quality_score,
    repetition_signals,
    token_count,
)

# streaming
from entitymatch_spark.streaming.stateful import sessionize_stream

__all__ = [
    "__version__",
    # session
    "get_spark",
    "ensure_workers_can_import",
    # match pipeline
    "MatchConfig",
    "MatchResult",
    "match_pipeline",
    "prepare_docs",
    "score_pairs",
    "connected_components",
    "assign_clusters",
    # incremental lifecycle
    "MatchState",
    "IncrementalResult",
    "initial_state",
    "incremental_match",
    "rethreshold",
    "remove_docs",
    "upsert_pages",
    "save_state",
    "load_state",
    "commit_increment",
    # curation
    "CurateConfig",
    "curate",
    "split_assign",
    "contamination_report",
    "fuzzy_contamination_report",
    "decontaminate",
    "exact_dedup",
    "dedup_survivors",
    "redact_pii",
    "canonical_url",
    "latest_snapshot",
    "quality_score",
    "quality_at_least",
    "lang_id",
    "token_count",
    "repetition_signals",
    # streaming
    "sessionize_stream",
]
