from entitymatch_spark.functions.text import (  # noqa: F401
    NORMALIZE_PAREN_RE,
    TOKEN_RE,
    normalize_text,
    py_normalize,
    py_tokenize,
    tokenize,
    tokenize_with_offsets,
)
