"""Inverted index (posting) + IDF weights as DataFrames.

Reference semantics:

- Posting build (ref: EntityMatch/EntityMatch/EntitiesDictionary.cs:39-62):
  for each entity, for each token position, an (entity, position) entry
  under the token. Here: ``posexplode`` of the token array — the posting
  *is* the blocking-key table, repartitioned by token for the join.

- IDF (ref: EntitiesDictionary.cs:69-79):
      weight(t) = max( ln((N + 0.5 - df) / (df + 0.5)), 1e-5 )
  where N = number of entities and df = the posting-list length for t —
  i.e. **token occurrences, counting duplicate positions**, exactly as
  the reference's ``positions.Count()``.
  Edge case: for df >= N + 0.5 the C# expression is ln(negative) = NaN;
  we clamp the ratio to a tiny positive so hot tokens get the 1e-5 floor
  instead of NaN (documented divergence — NaN is unusable downstream).

- Entity total weight (ref: EntitiesDictionary.cs:85-96): sum of the
  IDF weights of the entity's token *occurrences* (duplicates counted).

At scale: the posting groupBy is a map-side-combinable hash aggregate;
the IDF table is tiny relative to the corpus (vocabulary-sized) and is
broadcast into every downstream join (north_star requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDF_FLOOR = 1e-5
_RATIO_FLOOR = 1e-12


def build_posting(
    df: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """(id, pos, token) — one row per token occurrence (posexplode)."""
    return df.select(
        F.col(id_col), F.posexplode(tokens_col).alias("pos", "token")
    )


def token_idf(posting: DataFrame, n_docs: int) -> DataFrame:
    """(token, df, idf) with the reference's BM25-style IDF formula.

    ``df`` counts posting rows (occurrences), not distinct documents —
    faithful to positions.Count() in the reference.
    """
    ratio = (F.lit(float(n_docs)) + 0.5 - F.col("df")) / (F.col("df") + 0.5)
    return (
        posting.groupBy("token")
        .agg(F.count("*").alias("df"))
        .withColumn(
            "idf",
            F.greatest(
                F.log(F.greatest(ratio, F.lit(_RATIO_FLOOR))), F.lit(IDF_FLOOR)
            ),
        )
    )


def total_token_weight(
    posting: DataFrame, idf: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, total_weight): per-document sum of occurrence IDF weights —
    the score denominator (ref: EntitiesDictionary.cs:85-96).

    The IDF side is vocabulary-sized → broadcast, so this is a map-side
    join followed by a partial+final hash aggregate (no posting shuffle
    beyond the groupBy on id).
    """
    return (
        posting.join(F.broadcast(idf.select("token", "idf")), "token")
        .groupBy(id_col)
        .agg(F.sum("idf").alias("total_weight"))
    )


def tfidf_doc_profiles(
    posting: DataFrame, idf: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, wmap map<token,double>, nrm): per-doc tf-idf weight vector +
    L2 norm, built in ONE pass over the posting.

    The map-shaped profile exists so pair scoring can evaluate the
    whole tf-idf subplan ONCE: the naive relational form (weights CTE
    referenced by a-side, b-side and norms; DuckDB materializes the CTE)
    re-executes the posting aggregation per DataFrame reference in
    Spark — three posting scans plus their shuffles. Profiles fold
    weights and norms into one table consumed by one join (see
    tfidf_cosine_for_pairs). Two shuffles: (id, token) tf aggregate,
    then per-id map assembly; the IDF side is broadcast.
    """
    w = (
        posting.groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
        .join(F.broadcast(idf.select("token", "idf")), "token")
        .select(id_col, "token", (F.col("tf") * F.col("idf")).alias("w"))
    )
    return w.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("token", "w"))).alias("wmap"),
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"),
    )


def tfidf_cosine_for_pairs(
    pairs: DataFrame, profiles: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id_a, id_b, cosine): tf-idf cosine for candidate pairs, with the
    profile table evaluated ONCE.

    Each pair explodes into its two sides, joins the profile table a
    single time on doc id, and reassembles per pair (exactly 2 rows per
    group) — so the plan holds one profile subtree and one join,
    instead of the classic form's two pair references + three weight
    references that Spark would each recompute. The dot product is a
    JVM map_zip_with/aggregate over the two weight maps — no UDF.
    Pairs whose side has no profile (docs with no tokens) are dropped,
    matching the inner-join norms semantics of the relational form.

    At scale: sides/profiles co-shuffle on doc id once (or the
    profiles side broadcasts under AQE when small); per-pair state is
    two bounded maps — no skewed key can exceed the blocking cap
    upstream.
    """
    sides = pairs.select(
        "id_a",
        "id_b",
        F.explode(
            F.array(
                F.struct(F.col("id_a").alias("doc"), F.lit("a").alias("side")),
                F.struct(F.col("id_b").alias("doc"), F.lit("b").alias("side")),
            )
        ).alias("s"),
    ).select("id_a", "id_b", F.col("s.doc").alias(id_col), F.col("s.side").alias("side"))
    joined = sides.join(profiles, id_col)
    per_pair = joined.groupBy("id_a", "id_b").agg(
        F.first(F.when(F.col("side") == "a", F.col("wmap")), ignorenulls=True).alias("wa"),
        F.first(F.when(F.col("side") == "b", F.col("wmap")), ignorenulls=True).alias("wb"),
        F.first(F.when(F.col("side") == "a", F.col("nrm")), ignorenulls=True).alias("na"),
        F.first(F.when(F.col("side") == "b", F.col("nrm")), ignorenulls=True).alias("nb"),
    )
    dot = F.aggregate(
        F.map_values(
            F.map_zip_with("wa", "wb", lambda k, x, y: F.coalesce(x * y, F.lit(0.0)))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        per_pair.filter(F.col("wa").isNotNull() & F.col("wb").isNotNull())
        .select("id_a", "id_b", (dot / (F.col("na") * F.col("nb"))).alias("cosine"))
    )


def collect_idf_map(idf: DataFrame) -> dict[str, float]:
    """Vocabulary IDF as a plain dict for sc.broadcast into pandas UDFs."""
    return {r["token"]: r["idf"] for r in idf.select("token", "idf").collect()}


def collect_idf_map_bounded(
    idf: DataFrame, max_entries: int
) -> tuple[dict[str, float], float]:
    """(idf_map, default_idf) with the map capped at ``max_entries``.

    At 10^12-doc web scale the raw vocabulary does not fit in a driver
    dict / executor broadcast, so the map keeps only the ``max_entries``
    most FREQUENT tokens — the ones whose weights span the whole IDF
    range and so carry all the discriminative signal. Every dropped
    token is rarer than the boundary, which pins its true IDF into the
    narrow band [boundary idf, ceiling]; the returned ``default_idf``
    (df-weighted mean IDF of the dropped tail, i.e. mean over token
    *occurrences* — what the cosine actually sums over) approximates
    that band with bounded relative error. Callers pass ``default_idf``
    through to the scorer instead of the 1e-5 floor (which would
    near-zero rare tokens — exactly backwards: unseen tokens are rare,
    hence heavy).
    """
    top = (
        idf.orderBy(F.col("df").desc(), "token")
        .limit(max_entries)
        .select("token", "idf")
        .collect()
    )
    mp = {r["token"]: r["idf"] for r in top}
    if len(mp) < max_entries:  # nothing dropped
        return mp, IDF_FLOOR
    tail = idf.join(
        F.broadcast(
            idf.sparkSession.createDataFrame(
                [(t,) for t in mp.keys()], "token string"
            )
        ),
        "token",
        "left_anti",
    )
    row = tail.agg(
        (F.sum(F.col("idf") * F.col("df")) / F.sum("df")).alias("d")
    ).collect()[0]
    default = row["d"] if row["d"] is not None else IDF_FLOOR
    return mp, float(default)
