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
"""

__version__ = "0.1.0"
