"""Similarity search over embedding columns (array<float>).

- :func:`cosine` is a strict left-fold dot product so results are
  bit-identical to a DuckDB ``list_reduce`` oracle (no reassociation).
- :func:`ann_topk_bruteforce` — the exact baseline: broadcast the query
  set, score every (query, item) pair, window top-k. At 100 TB the item
  side stays partitioned; only queries (small) are broadcast, so the scan
  is one map stage + a top-k aggregation.
- :func:`ann_topk_lsh` — the scale path: random-hyperplane signatures
  bucket both sides; only same-bucket pairs are scored. Approximate
  (recall < 1), so it is correctness-checked structurally (rows-only),
  not value-hashed.

No Python/pandas UDFs: dot products are `zip_with`+`aggregate` column
expressions, evaluated in the JVM.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Strict left-fold Σ a_i·b_i (deterministic association order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def ann_topk_bruteforce(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest items.

    queries (small) is broadcast; scoring is a single map stage over items;
    ranking = window over query id with deterministic (sim desc, item id)
    tie-break. Output: (query_id, item_id, sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    it = items.select(
        F.col(id_col).alias("item_id"), _as_double(F.col(vec_col)).alias("iv")
    )
    scored = (
        it.join(F.broadcast(q), F.col("item_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("iv")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", F.round("sim", 6).alias("sim"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane (SRP) bucket id: bit i = sign(v · h_i)."""
    bucket = F.lit(0).cast("long")
    for i, h in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in h]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def ann_topk_lsh(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed ANN: score only same-bucket (query, item) pairs.

    2^n_planes buckets; expected candidate fraction 2^-n_planes per probe.
    Bucket join shuffles on the bucket id — at scale, skewed buckets are
    handled by AQE skew-join. Approximate: recall depends on n_planes.
    """
    planes = _hyperplanes(dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", lsh_bucket(F.col("qv"), planes))
    it = items.select(
        F.col(id_col).alias("item_id"), _as_double(F.col(vec_col)).alias("iv")
    ).withColumn("bucket", lsh_bucket(F.col("iv"), planes))
    scored = (
        it.join(F.broadcast(q), "bucket")
        .where(F.col("item_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("iv")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", F.round("sim", 6).alias("sim"), "rank")
    )


def embedding_near_dup_pairs(
    items: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact, for the oracle gate).

    Brute-force all-pairs is the exact baseline; the LSH bucket join above
    is the 100 TB path (same output filtered to candidates). Pair space is
    halved with id< ordering; norms are computed once per row before the
    join, not per pair.
    """
    base = items.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("n", l2norm(F.col("v")))
    a = base.select(F.col("id").alias("id1"), F.col("v").alias("v1"), F.col("n").alias("n1"))
    b = base.select(F.col("id").alias("id2"), F.col("v").alias("v2"), F.col("n").alias("n2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("sim", dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")))
        .where(F.col("sim") >= threshold)
        .select("id1", "id2", F.round("sim", 6).alias("sim"))
    )
