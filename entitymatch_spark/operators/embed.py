"""Document embeddings without a network: the hashing trick, JVM-side.

The reference's embedding source is a stubbed HTTP call to
text-embedding-ada-002 (ref: OpenAI/Program.cs:4-16) — a network
dependency this engine deliberately does not take. The stand-in is the
classic FEATURE-HASHING embedding (Weinberger et al., 2009): each token
hashes to one of ``dim`` slots with a ±1 sign, occurrences accumulate,
and the vector is L2-normalized. Deterministic, content-only, and
entirely relational (explode -> hash agg -> dense-vector rebuild), so
it is DuckDB-oracle-checkable and scales like any posting aggregation
(map-side combine on (doc, slot)).

It is also genuinely useful at 100 TB: hash embeddings feed the same
ANN / embedding-dedup operators (operators/ann.py, dedup_embedding) as
learned embeddings would, making the whole vector path testable without
a model server. A production deployment swaps in a real embedding
service at exactly this call site — same (id, embedding array<double>)
contract.

Hash portability: slot/sign derive from md5 hex substrings (not
xxhash64) so the DuckDB oracle can reproduce them bit-for-bit; the
accumulated slot values are integer sums of ±tf, so the only floats
are the final normalization — stable to far beyond the driver's
rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_embed(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, embedding array<double>): L2-normalized feature-hash vector
    of the token multiset. Docs with no tokens get no row (a zero
    vector has no direction).

    slot(t) = md5_60bit(t) mod dim; sign(t) = parity of the next hex
    nibble; v[j] = sum of sign(t) * tf(t) over tokens in slot j.
    """
    # NULL tokens are not tokens (md5(NULL) would propagate into a
    # NULL map key and kill the job with NULL_MAP_KEY on one dirty row)
    posting = docs.select(
        F.col(id_col), F.explode(tokens_col).alias("token")
    ).filter(F.col("token").isNotNull())
    h = F.md5(F.col("token"))
    slot = F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(dim))
    sign = F.when(
        F.pmod(F.conv(F.substring(h, 16, 1), 16, 10).cast("long"), F.lit(2)) == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    vals = (
        posting.withColumn("slot", slot)
        .withColumn("sgn", sign)
        .groupBy(id_col, "slot")
        .agg(F.sum("sgn").alias("v"))
    )
    dense = (
        vals.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("slot", "v"))
            ).alias("m")
        )
        .select(
            F.col(id_col),
            F.expr(
                f"transform(sequence(0, {dim - 1}),"
                " j -> coalesce(element_at(m, cast(j as long)), 0.0d))"
            ).alias("raw"),
        )
    )
    # Materialize the norm as a column so normalization is O(dim) per
    # doc — an aggregate() inside the transform lambda would rerun the
    # O(dim) sum for every element (O(dim^2) per doc).
    norm = F.sqrt(F.expr("aggregate(raw, 0D, (acc, x) -> acc + x * x)"))
    return (
        dense.withColumn("nrm", norm)
        .filter(F.col("nrm") > 0)
        .select(
            F.col(id_col),
            F.expr("transform(raw, x -> x / nrm)").alias("embedding"),
        )
    )
