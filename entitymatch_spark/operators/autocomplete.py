"""Fuzzy-prefix lookup + autocomplete completions, relationally.

Reference semantics:

- ``PairwiseEditDist.prefixcheck(s1, s2, k)`` (ref:
  AutoComplete/Common/EditDistance.cs:174-253): banded DP that returns
  every prefix-end position j of s1 with lev(s2, s1[0:j]) <= k — i.e.
  "which prefixes of the dictionary word are within k edits of the
  query".
- Autocomplete completion (ref: AutoComplete/EditTrie/Trie.cs:277-282
  AppendChar(c, retArray, l) -> FindEntityList :608-647, distance-sorted
  active nodes via ActiveNodes.DistanceSort :97-149): after typing a
  prefix, the active trie nodes (nodes whose path is within k edits of
  the typed prefix) are visited min-distance-first and their descendant
  entities collected until L completions are found.

The trie + NFA is a single-process execution strategy. Spark-first, the
same semantics are a LENGTH-BLOCKED PREFIX JOIN:

    lev(query, prefix) <= k  =>  |len(prefix) - len(query)| <= k

so each query fans out to the 2k+1 candidate prefix lengths, the
vocabulary fans out to its prefixes (one row per (token, prefix_len) —
O(total chars), computed once and reusable across query batches), and
the join is a plain equi-join on ``prefix_len`` verified by the JVM's
banded 3-arg ``levenshtein`` — whole-stage codegen, no Python.

At scale: the query side of an autocomplete workload is tiny (it is
broadcast); the exploded vocabulary-prefix table is linear in corpus
vocabulary size and partitions on ``prefix_len``/token like any posting
table. Completion ranking is a per-query top-L window — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def vocab_prefixes(vocab: DataFrame, token_col: str = "token") -> DataFrame:
    """(token, prefix_len, prefix): every prefix of every vocab token.

    One row per character of the vocabulary — the relational analog of
    the trie's node set (each trie node IS a distinct prefix). Build
    once, reuse across query batches.
    """
    # empty/NULL tokens have no prefixes — and sequence(1, 0) is the
    # DESCENDING [1, 0], so an unfiltered "" would emit two bogus rows
    # whose prefix='' then matches every short query at distance
    # len(q), silently eating top-L slots
    v = (
        vocab.select(token_col)
        .filter(F.length(token_col) >= 1)
        .distinct()
    )
    return (
        v.withColumn(
            "prefix_len", F.explode(F.sequence(F.lit(1), F.length(token_col)))
        )
        .withColumn("prefix", F.expr(f"substring({token_col}, 1, prefix_len)"))
    )


def prefix_edit_lookup(
    queries: DataFrame,
    vocab: DataFrame,
    max_edit: int = 1,
    query_col: str = "query",
    token_col: str = "token",
) -> DataFrame:
    """(query, token, prefix_len, distance): all prefix-end positions of
    each vocabulary token within ``max_edit`` of the query — the
    reference's ``prefixcheck`` (EditDistance.cs:174-253) as a join.

    The band ``|prefix_len - len(query)| <= max_edit`` is exact (an edit
    distance can never be less than the length difference), so the
    equi-join on prefix_len loses nothing; the banded JVM levenshtein
    (3-arg, returns -1 above the band) verifies.
    """
    q = queries.select(query_col).distinct()
    qx = q.withColumn(
        "prefix_len",
        F.explode(
            F.sequence(
                F.greatest(F.lit(1), F.length(query_col) - max_edit),
                F.length(query_col) + max_edit,
            )
        ),
    )
    vx = vocab_prefixes(vocab, token_col)
    d = F.levenshtein(F.col(query_col), F.col("prefix"), max_edit)
    # BROADCAST the query side: typed prefixes are tiny by nature, and
    # prefix_len alone has a handful of distinct values — a shuffle join
    # on it would put the whole vocabulary-prefix table on a few skewed
    # reducers. Broadcasting keeps the big side partition-local.
    return (
        vx.join(F.broadcast(qx), "prefix_len")
        .withColumn("distance", d)
        .filter(F.col("distance") >= 0)  # 3-arg levenshtein: -1 = above band
        .select(query_col, token_col, "prefix_len", "distance")
    )


def complete_topl(
    queries: DataFrame,
    vocab: DataFrame,
    max_edit: int = 1,
    top_l: int = 5,
    query_col: str = "query",
    token_col: str = "token",
    weight_col: str | None = None,
) -> DataFrame:
    """(query, token, distance[, weight], rnk): top-L completions per
    query — vocabulary tokens some prefix of which is within
    ``max_edit`` of the typed query, ranked min-distance-first (the
    trie's DistanceSort bucket order, ActiveNodes.cs:97-149) then by
    descending ``weight_col`` (e.g. document frequency — the analog of
    the trie's precomputed descendant lists preferring indexed order),
    ties broken by token for determinism.
    """
    hits = prefix_edit_lookup(queries, vocab, max_edit, query_col, token_col)
    per_tok = hits.groupBy(query_col, token_col).agg(
        F.min("distance").alias("distance")
    )
    order = [F.asc("distance")]
    if weight_col is not None:
        # one weight PER TOKEN (max), not .distinct() on the pair: a
        # vocab token appearing with two weight values would fan each
        # completion into two ranked rows and eat top-L slots
        w = vocab.groupBy(token_col).agg(F.max(weight_col).alias(weight_col))
        # no broadcast hint: w is VOCABULARY-sized (the big side at
        # corpus scale — forcing it to the driver inverts the design),
        # while per_tok is queries x candidates (small for interactive
        # batches but unbounded for offline ones). Let the planner/AQE
        # pick the build side from actual sizes.
        per_tok = per_tok.join(w, token_col)
        order.append(F.desc(weight_col))
    order.append(F.asc(token_col))
    win = Window.partitionBy(query_col).orderBy(*order)
    return (
        per_tok.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= top_l)
    )
