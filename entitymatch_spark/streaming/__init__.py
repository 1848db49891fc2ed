from entitymatch_spark.streaming.incremental import (  # noqa: F401
    incremental_fingerprints,
    incremental_minhash_keys,
    streaming_event_counts,
)
