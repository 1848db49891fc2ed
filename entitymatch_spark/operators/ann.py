"""Approximate nearest neighbor over embedding columns.

- ``cosine_topk``: exact brute-force top-k (the baseline). Dot products
  are zip_with/aggregate column expressions — JVM-side, codegen'd; the
  top-k is a rank-limited window (per-partition top-k sort, no global
  sort).
- ``rp_lsh_topk``: the scale path — random-hyperplane LSH. Seeded
  hyperplanes (content-independent, partition-independent) hash each
  vector to one bucket per table via a vectorized numpy pandas UDF
  (one matmul per Arrow batch); queries probe their buckets, candidates
  are exact-reranked. Tunables: n_planes (bucket granularity) x
  n_tables (recall boost).

At 100 TB the brute-force path is a cartesian shuffle — only valid for
small query sets against broadcastable corpora; rp_lsh turns it into a
bucket equi-join with bounded candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a: str, b: str) -> Column:
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
    na = F.sqrt(F.expr(f"aggregate({a}, 0D, (acc, v) -> acc + v * v)"))
    nb = F.sqrt(F.expr(f"aggregate({b}, 0D, (acc, v) -> acc + v * v)"))
    # Zero-magnitude guard: without it a zero vector yields NaN, and in
    # Spark's ordering NaN sorts ABOVE every number — one dead (all-zero)
    # embedding would rank FIRST in every top-k window it reaches. A
    # zero vector has no direction: similarity 0 to everything.
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """(qid, nid, cosine, rnk): exact top-k by cosine, deterministic ties.

    ``exclude_self`` assumes queries and corpus share ONE id namespace
    (the self-search shape: every doc queries the rest of the corpus)
    and drops qid == nid. Pass False when the two tables have
    independent id spaces — otherwise a corpus vector whose id happens
    to equal a query id is silently excluded from that query's results.
    The same flag exists on every top-k variant in this module."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("ea")
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("eb")
    )
    pairs = q.crossJoin(c).filter(
        ~F.lit(exclude_self) | (F.col("qid") != F.col("nid"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        pairs.withColumn("cosine", cosine_expr("ea", "eb"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("qid", "nid", "cosine", "rnk")
    )


def _bucket_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float64)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    def batch(vecs: pd.Series) -> pd.Series:
        arrs = []
        for i, v in enumerate(vecs):
            a = None if v is None else np.asarray(v, dtype=np.float64)
            if a is None or a.ndim != 1 or a.shape[0] != dim:
                # a null or ragged embedding otherwise dies inside
                # np.stack with an opaque shape error — name the row
                raise ValueError(
                    f"embedding at batch offset {i} must be a length-"
                    f"{dim} vector, got "
                    f"{'null' if a is None else f'shape {a.shape}'}; "
                    "filter or fix corrupt rows before LSH bucketing"
                )
            arrs.append(a)
        m = np.stack(arrs)
        out = []
        for t in range(n_tables):
            bits = (m @ planes[t].T) > 0  # (batch, n_planes)
            out.append(bits @ powers + (t << n_planes))
        return pd.Series(list(np.stack(out, axis=1)))

    return F.pandas_udf(batch, "array<long>")


def rp_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 10,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): one bucket per table per vector (seeded hyperplanes)."""
    udf = _bucket_udf(dim, n_planes, n_tables, seed)
    return df.select(
        F.col(id_col),
        F.explode(udf(F.col(vec_col).cast("array<double>"))).alias("bucket"),
    )


def rp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 10,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: bucket-join candidates, exact cosine rerank."""
    qb = rp_lsh_buckets(queries, dim, n_planes, n_tables, seed, id_col, vec_col)
    cb = rp_lsh_buckets(corpus, dim, n_planes, n_tables, seed, id_col, vec_col)
    cand = (
        qb.select(F.col(id_col).alias("qid"), "bucket")
        .join(cb.select(F.col(id_col).alias("nid"), "bucket"), "bucket")
        .filter(~F.lit(exclude_self) | (F.col("qid") != F.col("nid")))
        .select("qid", "nid")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("ea")
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("eb")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        cand.join(q, "qid").join(c, "nid")
        .withColumn("cosine", cosine_expr("ea", "eb"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("qid", "nid", "cosine", "rnk")
    )


def rp_md5_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, key): random-hyperplane buckets in the PORTABLE variant —
    plane components are md5-derived integers in [-1000, 1000]
    (w(t,p,d) = md5_60bit('rp:t:p:d') mod 2001 - 1000), dot products
    are a relational explode-join-agg, bucket key = table id + ordered
    sign-bit string. Every step is reproducible in DuckDB, so the ANN
    LSH path can be value-checked end-to-end (the production variant
    keeps seeded gaussian planes + one numpy matmul per Arrow batch —
    faster, but no relational equivalent).
    """
    one = df.sparkSession.range(1)
    planes = (
        one.select(
            F.explode(F.sequence(F.lit(0), F.lit(n_tables - 1))).alias("t")
        )
        .select("t", F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("p"))
        .select("t", "p", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("d"))
        .withColumn(
            "w",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit("rp"), "t", "p", "d")), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(2001),
            )
            - 1000,
        )
    )
    comps = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "x"),
    )
    dots = (
        comps.join(F.broadcast(planes), "d")
        .groupBy(id_col, "t", "p")
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
    )
    bits = dots.withColumn("b", (F.col("dot") > 0).cast("int"))
    return (
        bits.groupBy(id_col, "t")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "b"))),
                    lambda s: s["b"].cast("string"),
                ),
                "",
            ).alias("bs")
        )
        .select(
            F.col(id_col),
            F.concat(F.col("t").cast("string"), F.lit(":"), F.col("bs")).alias("key"),
        )
    )


def rp_lsh_md5_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """rp_lsh_topk semantics over the portable md5-plane buckets —
    bucket-join candidates, exact cosine rerank, deterministic ties."""
    qb = rp_md5_buckets(queries, dim, n_planes, n_tables, id_col, vec_col)
    cb = rp_md5_buckets(corpus, dim, n_planes, n_tables, id_col, vec_col)
    cand = (
        qb.select(F.col(id_col).alias("qid"), "key")
        .join(cb.select(F.col(id_col).alias("nid"), "key"), "key")
        .filter(~F.lit(exclude_self) | (F.col("qid") != F.col("nid")))
        .select("qid", "nid")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("ea")
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("eb")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        cand.join(q, "qid").join(c, "nid")
        .withColumn("cosine", cosine_expr("ea", "eb"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("qid", "nid", "cosine", "rnk")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
    nprobe: int = 1,
) -> DataFrame:
    """(id, cent_id, crank): each vector's ``nprobe`` nearest centroids
    by cosine (crank 1 = nearest; ties broken by centroid id).

    The centroid table is tiny -> broadcast; assignment is a narrow
    broadcast-join + window per vector, no corpus shuffle.
    """
    c = centroids.select(
        F.col(cent_id), F.col(cent_vec).cast("array<double>").alias("cv")
    )
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("ev"))
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc(cent_id))
    return (
        v.crossJoin(F.broadcast(c))
        .withColumn("csim", cosine_expr("ev", "cv"))
        .withColumn("crank", F.row_number().over(w).cast("long"))
        .filter(F.col("crank") <= nprobe)
        .select(id_col, cent_id, "crank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus vectors are partitioned into
    centroid cells (cell assignment = nearest centroid); a query probes
    its ``nprobe`` nearest cells and exact-reranks only their members.

    Centroids here are supplied by the caller (deterministic — e.g. a
    fixed sample of the corpus, or offline k-means output); the
    operator itself has no iterative/seeded step, which also makes it
    verifiable against a relational oracle. At scale: the corpus is
    repartitioned by cell once (one shuffle, reusable across query
    batches), queries touch nprobe/|C| of the data.
    """
    cells = ivf_assign(corpus, centroids, id_col, vec_col, cent_id, cent_vec, nprobe=1)
    probes = ivf_assign(queries, centroids, id_col, vec_col, cent_id, cent_vec, nprobe=nprobe)
    cand = (
        probes.select(F.col(id_col).alias("qid"), cent_id)
        .join(cells.select(F.col(id_col).alias("nid"), cent_id), cent_id)
        .filter(~F.lit(exclude_self) | (F.col("qid") != F.col("nid")))
        .select("qid", "nid")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("ea")
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("eb")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        cand.join(q, "qid").join(c, "nid")
        .withColumn("cosine", cosine_expr("ea", "eb"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("qid", "nid", "cosine", "rnk")
    )
