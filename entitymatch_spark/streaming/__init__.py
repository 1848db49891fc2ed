from entitymatch_spark.streaming.incremental import (  # noqa: F401
    incremental_fingerprints,
    incremental_match,
    incremental_minhash_keys,
    streaming_event_counts,
)
from entitymatch_spark.streaming.stateful import (  # noqa: F401
    sessionize_stream,
)
