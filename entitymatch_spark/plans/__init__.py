from entitymatch_spark.plans.pipeline import (  # noqa: F401
    MatchConfig,
    MatchResult,
    match_pipeline,
    prepare_docs,
)
