from entitymatch_spark.operators.posting import (  # noqa: F401
    build_posting,
    collect_idf_map,
    token_idf,
    total_token_weight,
)
