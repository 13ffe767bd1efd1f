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

Determinism discipline: every float reduction (signature projections,
norms, pair dots) is a *strict left fold* — in column form via
`zip_with`+`aggregate` (:func:`dot`, the readable reference), and in the
hot paths via Arrow-batched `np.cumsum` (:func:`dot_strict_udf`,
:func:`bands_signature_udf`), which performs the identical left-to-right
float64 addition sequence. Both therefore hash-match the DuckDB
``list_reduce`` oracle bit-for-bit while the batch form runs vectorized
(interpreted higher-order folds don't whole-stage-codegen — the simhash
lesson generalized to the whole similarity family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Strict left-fold Σ a_i·b_i (deterministic association order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_strict_udf():
    """Arrow-batched pair dot product, bit-identical to :func:`dot`.

    The column-expression fold is interpreted (no codegen for higher-order
    functions) — fine for a handful of rows, ~µs/pair×dims at scoring
    scale. ``np.cumsum(A*B, axis=1)[:, -1]`` performs the same strictly
    left-to-right float64 additions, so scores hash-match the DuckDB
    ``list_reduce`` oracle while running vectorized."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="float64")
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        return pd.Series(np.cumsum(A * B, axis=1)[:, -1])

    return pair_dot


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
    pd_dot = dot_strict_udf()
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", F.sqrt(pd_dot(F.col("qv"), F.col("qv"))))
    it = items.select(
        F.col(id_col).alias("item_id"), _as_double(F.col(vec_col)).alias("iv")
    ).withColumn("inorm", F.sqrt(pd_dot(F.col("iv"), F.col("iv"))))
    scored = (
        it.join(F.broadcast(q), F.col("item_id") != F.col("query_id"))
        .withColumn(
            "sim", pd_dot(F.col("qv"), F.col("iv")) / (F.col("qn") * F.col("inorm"))
        )
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
    agreement p, the standard LSH recall/cost knob.

    Column-expression reference implementation (one interpreted fold per
    plane): readable and oracle-shaped, but n_planes folds/row don't
    codegen — table-scale signatures use :func:`bands_signature_udf`,
    which produces bit-identical buckets."""
    return F.array(
        *[
            lsh_bucket(vec, planes[t * band_size : (t + 1) * band_size])
            for t in range(n_bands)
        ]
    )


def bands_signature_udf(planes: list[list[float]], n_bands: int, band_size: int):
    """Arrow-batched SRP band signatures: ``array<double> → array<long>``.

    Per batch: one (rows × dim) matrix, each plane's projection computed as
    ``np.cumsum(V * h, axis=1)[:, -1]`` — cumsum accumulates strictly
    left-to-right in float64, the exact addition sequence of the Catalyst /
    DuckDB left fold (0.0 + p_0 ≡ p_0 under IEEE), so bucket signs are
    bit-identical to :func:`lsh_band_buckets` while the arithmetic is
    vectorized C instead of n_planes interpreted folds per row.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    H = np.asarray(planes, dtype=np.float64)  # (n_planes_total, dim)
    weights = 1 << np.arange(band_size, dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def sig(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype=object)
        V = np.stack(col.to_numpy()).astype(np.float64)  # (n, dim)
        bits = np.empty((V.shape[0], H.shape[0]), dtype=np.int64)
        for i in range(H.shape[0]):
            bits[:, i] = np.cumsum(V * H[i], axis=1)[:, -1] > 0
        bands = np.stack(
            [
                bits[:, t * band_size : (t + 1) * band_size] @ weights
                for t in range(n_bands)
            ],
            axis=1,
        )
        return pd.Series(list(bands))

    return sig


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
    sig = bands_signature_udf(planes, n_bands, n_planes)
    pd_dot = dot_strict_udf()
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        )
        .withColumn("bands", sig(F.col("qv")))
        .withColumn("qn", F.sqrt(pd_dot(F.col("qv"), F.col("qv"))))
    )
    # r12 (guide §4): keep the signature and the norm on SEPARATE item
    # frames. Chained withColumns put BOTH Arrow UDFs on both consumer
    # legs (the before plan ran sig+norm twice over all items — 4
    # corpus-wide Python passes for 2 functions); and the norm is now
    # evaluated AFTER the candidate join, so it touches candidate rows
    # only, not the whole corpus (same per-row arithmetic ⇒ identical
    # sims and hashes).
    it_base = items.select(
        F.col(id_col).alias("item_id"), _as_double(F.col(vec_col)).alias("iv")
    )
    q_ex = q.select(
        "query_id", F.posexplode("bands").alias("band", "bucket")
    )
    it_ex = it_base.select(
        "item_id", F.posexplode(sig(F.col("iv"))).alias("band", "bucket")
    )
    cand = (
        it_ex.join(F.broadcast(q_ex), ["band", "bucket"])
        .where(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id")
        .distinct()
    )
    # inorm and sim in the SAME withColumns block after the (1:1) query
    # broadcast join, so both Arrow UDF calls land in one ArrowEvalPython
    # stage over candidate rows (a separate pre-join withColumn measured
    # +0.3 s of extra Python stage overhead; arithmetic is unchanged)
    scored = (
        cand.join(it_base, "item_id")
        .join(F.broadcast(q.select("query_id", "qv", "qn")), "query_id")
        .withColumn("inorm", F.sqrt(pd_dot(F.col("iv"), F.col("iv"))))
        .withColumn(
            "sim", pd_dot(F.col("qv"), F.col("iv")) / (F.col("qn") * F.col("inorm"))
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", F.round("sim", 6).alias("sim"), "rank")
    )


#: Knuth multiplicative constant — pseudo-random but *engine-portable*
#: seed ranking (plain integer arithmetic both Spark and DuckDB evaluate
#: identically), unlike xxhash64 which DuckDB lacks. Keys are masked to
#: 31 bits BEFORE the multiply so the product stays inside int64 on
#: both engines (DuckDB raises out-of-range past key ~3.47e9).
_KNUTH = 2654435761
_KNUTH_MOD = 1 << 32


def _knuth_seed_rows(base: DataFrame, n: int) -> list:
    """The first ``n`` rows of ``base`` ranked by the Knuth hash of
    item_id (ties → lowest id), in RANK order — the shared trainless
    seed set. One TakeOrdered pass + control-plane collect; callers that
    need both a quantizer and a codebook collect max(n1, n2) once and
    slice prefixes (prefix-by-rank == an independent smaller collect)."""
    rank_key = F.pmod(
        F.pmod(F.col("item_id"), F.lit(1 << 31)) * F.lit(_KNUTH),
        F.lit(_KNUTH_MOD),
    )
    return base.orderBy(rank_key, F.col("item_id")).limit(n).collect()


def _ivf_quantizer(base: DataFrame, n_cells: int, seed_rows: list | None = None):
    """Trainless IVF coarse quantizer: centroids are the ``n_cells``
    vectors ranked first by the Knuth multiplicative hash of their id.
    Returns (cids, C, cn): centroid ids (ascending), the centroid matrix,
    and strict-fold centroid norms. ``base`` must carry (item_id, iv).

    Control-plane collect: n_cells rows, same footprint as the LSH plane
    literals — never corpus-scale. ``seed_rows`` (rank-ordered, from
    :func:`_knuth_seed_rows`, ≥ n_cells rows) lets a caller share one
    collect across quantizer and codebook (r12: saves a TakeOrdered
    corpus pass per query build)."""
    rows = list(
        seed_rows[:n_cells]
        if seed_rows is not None
        else _knuth_seed_rows(base, n_cells)
    )
    rows.sort(key=lambda r: r["item_id"])  # argmax tie → lowest cid
    cids = np.array([r["item_id"] for r in rows], dtype=np.int64)
    C = np.array([r["iv"] for r in rows], dtype=np.float64)
    # centroid norms via cumsum = the oracle's strict fold
    cn = np.sqrt(np.cumsum(C * C, axis=1)[:, -1])
    return cids, C, cn


def _ivf_cell_udfs(cids: np.ndarray, C: np.ndarray, cn: np.ndarray, n_probe: int):
    """(cell_of, probes_of) Arrow-batched assignment UDFs for a fixed
    quantizer: argmax-cosine cell (ties → lowest cid) and the n_probe
    nearest cells per query — cosines via cumsum, bit-identical to the
    oracle's strict left fold."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    def _sims(V: np.ndarray) -> np.ndarray:
        nv = np.sqrt(np.cumsum(V * V, axis=1)[:, -1])
        sims = np.empty((V.shape[0], C.shape[0]), dtype=np.float64)
        for i in range(C.shape[0]):
            sims[:, i] = np.cumsum(V * C[i], axis=1)[:, -1] / (nv * cn[i])
        return sims

    @pandas_udf(LongType())
    def cell_of(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype="int64")
        sims = _sims(np.stack(col.to_numpy()).astype(np.float64))
        return pd.Series(cids[np.argmax(sims, axis=1)])  # first max = lowest cid

    @pandas_udf(ArrayType(LongType()))
    def probes_of(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype=object)
        sims = _sims(np.stack(col.to_numpy()).astype(np.float64))
        # stable sort on -sim keeps cid-ascending order within ties,
        # matching ORDER BY sim DESC, cid ASC
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(cids[order]))

    return cell_of, probes_of



def _ivf_prepare_items(base: DataFrame, cell_of, pd_dot) -> DataFrame:
    """(item_id, iv, cell, inorm): the indexed-item frame — ONE home,
    shared by the in-memory query and the index build so the persisted
    path can never fork from the oracle's arithmetic."""
    return base.withColumn("cell", cell_of(F.col("iv"))).withColumn(
        "inorm", F.sqrt(pd_dot(F.col("iv"), F.col("iv")))
    )


def _ivf_score_topk(it: DataFrame, q: DataFrame, pd_dot, k: int) -> DataFrame:
    """Probe join → strict-fold cosine → per-query top-k; shared verbatim
    by the in-memory and served paths (same reason as above)."""
    scored = (
        it.join(F.broadcast(q), "cell")
        .where(F.col("item_id") != F.col("query_id"))
        .withColumn(
            "sim", pd_dot(F.col("qv"), F.col("iv")) / (F.col("qn") * F.col("inorm"))
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", F.round("sim", 6).alias("sim"), "rank")
    )


def ann_topk_ivf(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-flat ANN: coarse-quantize items into ``n_cells`` inverted lists,
    probe the ``n_probe`` nearest cells per query, search exactly inside.

    The quantizer is data-sampled (the classic IVF trainless variant):
    centroids are the ``n_cells`` vectors ranked first by the Knuth
    multiplicative hash of their id — deterministic, engine-portable, and
    cheap (no k-means iterations to replicate in an oracle). Assignment is
    argmax cosine with ties to the lowest centroid id.

    100 TB shape: centroids are control-plane data (``n_cells`` rows
    collected once, shipped in the UDF closure — same footprint as the LSH
    planes); assignment is one Arrow-batched map stage over items (BLAS,
    no shuffle); the probe join is an equi-join on cell id; exact scoring
    touches only probed cells, ~``n_probe/n_cells`` of the corpus. Recall
    is the standard IVF trade tuned by ``n_probe``; results stay
    deterministic and hash-match the DuckDB oracle because every float op
    (cumsum folds, ``dot/(n_q·n_i)``) reproduces the oracle's strict
    left-fold arithmetic bit-for-bit.
    """
    base = items.select(
        F.col(id_col).alias("item_id"), _as_double(F.col(vec_col)).alias("iv")
    )
    cids, C, cn = _ivf_quantizer(base, n_cells)
    cell_of, probes_of = _ivf_cell_udfs(cids, C, cn, n_probe)
    pd_dot = dot_strict_udf()
    it = _ivf_prepare_items(base, cell_of, pd_dot)
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        )
        .withColumn("cell", F.explode(probes_of(F.col("qv"))))
        .withColumn("qn", F.sqrt(pd_dot(F.col("qv"), F.col("qv"))))
    )
    return _ivf_score_topk(it, q, pd_dot, k)


def embedding_near_dup_pairs(
    items: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact near-dup baseline).

    Block-pair matmul plan, fully executor-side (nothing touches the
    driver): rows hash to one of ``B = n_blocks`` blocks, each row is
    replicated to the B unordered block pairs containing its block (one
    explode — shuffle volume n·B vectors), and each ``(bi, bj)`` group
    computes its (n/B)×(n/B) similarity block with one BLAS matmul in
    ``applyInPandas``. All B(B+1)/2 blocks of the pair matrix are covered
    exactly once: cross-block groups emit every qualifying pair as
    (min id, max id); diagonal groups keep the strict upper triangle.

    Scale knobs: pick B ≈ n·d·8 / (executor-memory budget) so one block's
    matrix fits comfortably per task, and B(B+1)/2 ≳ cluster cores so every
    core gets a block pair; the shuffle grows linearly in B while per-task
    memory shrinks linearly — the standard all-pairs trade. Unlike a
    driver-collect + broadcast plan there is no 2 GB broadcast ceiling and
    no driver OOM at 100×. Skewed block sizes don't arise (blocks are
    hash-assigned), so AQE has nothing to re-split. For corpora where even
    n·B replication is too hot, :func:`ann_topk_lsh`'s bucket join is the
    sub-quadratic path.

    Pair space halved with id< ordering; emitted sims are raw float64 —
    callers round. BLAS accumulation order differs from a strict left-fold
    in the last ulp; at 6-decimal rounding this is invisible.
    """
    import pandas as pd

    B = int(n_blocks)
    base = items.select(
        F.col(id_col).cast("long").alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("blk", F.pmod(F.xxhash64(F.col("id")), F.lit(B)).cast("int"))
    pair_keys = F.array_distinct(
        F.array(
            *[
                F.struct(
                    F.least(F.col("blk"), F.lit(o)).alias("bi"),
                    F.greatest(F.col("blk"), F.lit(o)).alias("bj"),
                )
                for o in range(B)
            ]
        )
    )
    replicated = base.select(
        "id", "v", "blk", F.explode(pair_keys).alias("p")
    ).select(F.col("p.bi").alias("bi"), F.col("p.bj").alias("bj"), "blk", "id", "v")

    def score(key, pdf):
        bi, bj = key
        left = pdf[pdf["blk"] == bi]
        right = pdf[pdf["blk"] == bj]
        if not len(left) or not len(right):
            return pd.DataFrame(
                {
                    "id1": pd.Series([], dtype="int64"),
                    "id2": pd.Series([], dtype="int64"),
                    "sim": pd.Series([], dtype="float64"),
                }
            )
        ids_l = left["id"].to_numpy()
        ids_r = right["id"].to_numpy()
        ml = np.stack(left["v"].to_numpy()).astype(np.float64)
        mr = np.stack(right["v"].to_numpy()).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            sims = (ml @ mr.T) / np.outer(
                np.linalg.norm(ml, axis=1), np.linalg.norm(mr, axis=1)
            )
        mask = sims >= threshold
        if bi == bj:
            mask &= ids_l[:, None] < ids_r[None, :]
        ii, jj = np.nonzero(mask)
        return pd.DataFrame(
            {
                "id1": np.minimum(ids_l[ii], ids_r[jj]),
                "id2": np.maximum(ids_l[ii], ids_r[jj]),
                "sim": sims[ii, jj],
            }
        )

    paired = replicated.groupBy("bi", "bj").applyInPandas(
        score, "id1 long, id2 long, sim double"
    )
    return paired.select("id1", "id2", F.round("sim", 6).alias("sim"))


def embedding_near_dup_blocked(
    items: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 8,
    band_size: int = 6,
    dim: int = 64,
    seed: int = 43,
) -> DataFrame:
    """Near-duplicate pairs via exact-collapse + SRP-band LSH blocking
    (VERDICT r5 #5 — replaces the all-pairs matmul as the registry path;
    :func:`embedding_near_dup_pairs` stays available as the exact
    verifier for sampled audits).

    Two layers kill the quadratic:

    1. **Exact-collapse** — byte-identical vectors (the dominant duplicate
       class in crawled corpora) are grouped first (``groupBy(v)``, one
       shuffle); all candidate generation runs over the *unique* vectors.
       Duplicate multiplicity never multiplies pair work — it only expands
       the output linearly at the end (two equi-joins from rep-pairs to
       member ids).
    2. **SRP-band blocking** — unique vectors get ``n_bands`` bucket ids
       of ``band_size`` sign bits each (seeded hyperplanes, deterministic);
       rep pairs are candidates iff they collide in ≥1 band (equi-join on
       the (band, bucket) key — never a cross join). Exact strict-fold
       cosine then verifies candidates against ``threshold``.

    Recall model (standard OR-amplified SRP): a pair at cosine ``s``
    collides per plane with ``p = 1 − arccos(s)/π`` and survives blocking
    with ``R(s) = 1 − (1 − p^band_size)^n_bands``; with the defaults
    (6×8): R(1.0) = 1 (identical vectors collide in every band — the
    exact-collapse layer additionally guarantees them), R(0.9) ≈ 0.98,
    R(0.7) ≈ 0.77, R(0.4) ≈ 0.41. Raise ``n_bands`` for recall, raise
    ``band_size`` for sparser buckets (pair work ~ Σ|bucket|² over unique
    vectors per band). The emitted set is a deterministic subset of the
    exact τ-pairs, reproduced bit-for-bit by the DuckDB oracle (same
    planes, same strict folds), so the hash gate stays exact even though
    the operator is approximate w.r.t. the full pair set.

    100 TB shape: one shuffle to collapse, one map stage for signatures,
    one equi-join on (band, bucket) for candidates (AQE splits hot
    buckets), exact scoring only on candidates, linear output expansion.
    No stage is quadratic in corpus size for bounded bucket sizes.
    """
    planes = _hyperplanes(dim, n_bands * band_size, seed=seed)
    sig = bands_signature_udf(planes, n_bands, band_size)
    pd_dot = dot_strict_udf()

    base = items.select(
        F.col(id_col).cast("long").alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
    )
    # one exchange on v, reused by both branches (member map + unique reps);
    # runtime exchange/subquery reuse shares the collapse window across
    # consumers. The r12 persist fences on uniq/members/bands were a
    # measured full-session regression (2.2 s -> 12-50 s in four full
    # 200-query runs; the after-plan grew 42 InMemoryRelation nodes whose
    # cache-build barriers serialize the query) and were removed in r13 —
    # the ArrowEvalPython recompute they saved (20 -> 17 nodes) never paid
    # for the materialization barriers.
    wv = W.partitionBy("v")
    m = base.withColumn("rep", F.min("id").over(wv))
    uniq = (
        m.where(F.col("id") == F.col("rep"))
        .select("rep", "v")
        .withColumn("nrm", F.sqrt(pd_dot(F.col("v"), F.col("v"))))
    )
    members = m.select("id", "rep")

    bands = uniq.select(
        "rep", F.posexplode(sig(F.col("v"))).alias("band", "bucket")
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.rep") < F.col("b.rep")),
        )
        .select(F.col("a.rep").alias("rep1"), F.col("b.rep").alias("rep2"))
        .distinct()
    )
    u1 = uniq.select(
        F.col("rep").alias("rep1"), F.col("v").alias("v1"), F.col("nrm").alias("n1")
    )
    u2 = uniq.select(
        F.col("rep").alias("rep2"), F.col("v").alias("v2"), F.col("nrm").alias("n2")
    )
    scored = (
        cand.join(u1, "rep1")
        .join(u2, "rep2")
        .withColumn("sim", pd_dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")))
        .where(F.col("sim") >= F.lit(threshold))
        .select("rep1", "rep2", "sim")
    )
    m1 = members.select(F.col("rep").alias("rep1"), F.col("id").alias("ida"))
    m2 = members.select(F.col("rep").alias("rep2"), F.col("id").alias("idb"))
    cross = (
        scored.join(m1, "rep1")
        .join(m2, "rep2")
        .select(
            F.least("ida", "idb").alias("id1"),
            F.greatest("ida", "idb").alias("id2"),
            "sim",
        )
    )
    selfsim = (
        uniq.withColumn(
            "sim", pd_dot(F.col("v"), F.col("v")) / (F.col("nrm") * F.col("nrm"))
        )
        .where(F.col("sim") >= F.lit(threshold))
        .select(F.col("rep").alias("srep"), "sim")
    )
    intra = (
        members.alias("x")
        .join(
            members.alias("y"),
            (F.col("x.rep") == F.col("y.rep")) & (F.col("x.id") < F.col("y.id")),
        )
        .join(selfsim, F.col("x.rep") == F.col("srep"))
        .select(
            F.col("x.id").alias("id1"), F.col("y.id").alias("id2"), F.col("sim")
        )
    )
    out = cross.unionByName(intra)
    return out.select("id1", "id2", F.round("sim", 6).alias("sim"))


def semantic_dedup(
    items: DataFrame,
    threshold: float = 0.4,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_target: int = 64,
    n_items: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column:
    coarse-cluster with the trainless IVF quantizer, then mark any vector
    that has a lower-id neighbor with cosine ≥ ``threshold`` *within its
    cell* as a duplicate (the kept copy is the lowest id, mirroring the
    exact-dedup canonical-min convention).

    Returns (id, cell, is_dup ∈ {0,1}) for every input vector.

    100 TB shape: assignment is one Arrow-batched map stage (centroids are
    control-plane data); candidate pairs are generated by a *cell* equi-
    join, so pair count is Σ|cell|² over cells rather than n² — the same
    reason SemDeDup clusters before comparing. Cross-cell duplicates are
    out of scope by construction (the documented recall trade; raise
    n_cells for smaller cells, or run LSH dedup for recall guarantees).
    All pair cosines are strict-fold (cumsum) — bit-identical to the
    DuckDB oracle, so the threshold predicate decides identically.
    """
    base = items.select(
        F.col(id_col).alias("item_id"), _as_double(F.col(vec_col)).alias("iv")
    )
    if n_cells is None:
        # adaptive quantizer: a FIXED cell count makes cell sizes grow
        # linearly with the corpus and within-cell pair work grow
        # quadratically (measured x8.5 wall at 10x data) — bound the
        # expected cell size instead. One control-plane count() (cheap on
        # parquet: row-group-metadata aggregate), eager like the seed
        # collect below; callers that know the corpus size pass n_items
        # to skip it
        n_cells = max(16, (n_items if n_items is not None else base.count()) // cell_target)
    cids, C, cn = _ivf_quantizer(base, n_cells)
    cell_of, _probes = _ivf_cell_udfs(cids, C, cn, n_probe=1)
    pd_dot = dot_strict_udf()
    # persist: both sides of the within-cell pair join read asg, and the
    # Arrow assignment+norm stage is NOT exchange-bounded, so reuse
    # cannot dedupe it. Re-measured in r13 with BOTH protocols after the
    # r12 "wash" verdict: interleaved isolated medians 1.6-1.8 s with the
    # fence vs 2.1-3.0 s without; full-session medians ~1.8 s with vs
    # ~3.6 s without — one frame, two consumers, the fence pays here
    # (unlike embedding_near_dup's three stacked fences, removed r13).
    asg = base.withColumn("cell", cell_of(F.col("iv"))).withColumn(
        "inorm", F.sqrt(pd_dot(F.col("iv"), F.col("iv")))
    ).persist()
    a = asg.select(
        F.col("item_id").alias("a_id"),
        F.col("iv").alias("a_iv"),
        F.col("inorm").alias("a_n"),
        F.col("cell").alias("a_cell"),
    )
    b = asg.select(
        F.col("item_id").alias("b_id"),
        F.col("iv").alias("b_iv"),
        F.col("inorm").alias("b_n"),
        F.col("cell").alias("b_cell"),
    )
    dups = (
        a.join(b, (F.col("a_cell") == F.col("b_cell")) & (F.col("a_id") < F.col("b_id")))
        .withColumn(
            "sim", pd_dot(F.col("a_iv"), F.col("b_iv")) / (F.col("a_n") * F.col("b_n"))
        )
        .where(F.col("sim") >= threshold)
        .select(F.col("b_id").alias("dup_id"))
        .distinct()
    )
    return (
        asg.join(dups, asg["item_id"] == dups["dup_id"], "left")
        .select(
            F.col("item_id").alias(id_col),
            F.col("cell"),
            F.when(F.col("dup_id").isNotNull(), 1).otherwise(0).cast("long").alias("is_dup"),
        )
    )


def _pq_codebook(base: DataFrame, k: int, seed_rows: list | None = None) -> np.ndarray:
    """Trainless PQ codebook: the ``k`` Knuth-hash-ranked vectors, sorted
    by donor id so code j is the j-th donor. Control-plane collect
    (k rows). ``base`` must carry (item_id, iv). ``seed_rows``
    (rank-ordered, from :func:`_knuth_seed_rows`, ≥ k rows) lets a caller
    share one collect with the IVF quantizer (r12)."""
    rows = list(
        seed_rows[:k] if seed_rows is not None else _knuth_seed_rows(base, k)
    )
    rows.sort(key=lambda r: r["item_id"])  # code j = j-th donor by id
    return np.array([r["iv"] for r in rows], dtype=np.float64)  # (k, D)


def pq_encode(
    items: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: "np.ndarray | None" = None,
) -> DataFrame:
    """Product-quantization encoding: split each vector into ``m``
    subspaces and replace each subvector with the index of its nearest
    codebook centroid — the memory-bound ANN scale path (IVF-PQ): a
    64-dim float32 vector (256 B) compresses to ``m`` byte codes, letting
    a 100 TB embedding corpus's index live in RAM while exact vectors
    stay in object storage for re-ranking.

    Codebooks are trainless (the IVF quantizer convention): the ``k``
    Knuth-hash-ranked vectors donate their subvectors as centroids, code
    j = rank of the donor id — deterministic and oracle-replicable, no
    k-means to mirror. Assignment is argmin squared L2 per subspace with
    first-min (lowest code) tie-break; distances are strict-fold
    (cumsum), bit-identical to the DuckDB ``list_reduce`` oracle.

    Returns (id, subspace, code, qdist): the code and the quantization
    error contribution per subspace (``qdist`` rounded at the output
    boundary only). One Arrow-batched map stage over items; the codebook
    is control-plane data in the UDF closure.
    """
    base = items.select(
        F.col(id_col).alias("item_id"), _as_double(F.col(vec_col)).alias("iv")
    )
    # callers that already collected the codebook (ann_topk_ivfpq shares
    # one seed set across quantizer and encoder) pass it in — saves a
    # full Knuth-rank sort + driver collect per call
    C = _pq_codebook(base, k) if codebook is None else codebook  # (k, D)
    dim = C.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    subdim = dim // m

    schema = "vec_id long, subspace long, code long, qdist double"

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["iv"].to_numpy()).astype(np.float64)  # (n, D)
            n = V.shape[0]
            for s in range(m):
                Vs = V[:, s * subdim : (s + 1) * subdim]
                d = np.empty((n, k), dtype=np.float64)
                for j in range(k):
                    Cs = C[j, s * subdim : (s + 1) * subdim]
                    # cumsum = the oracle's strict left fold over (x-c)^2
                    d[:, j] = np.cumsum((Vs - Cs) ** 2, axis=1)[:, -1]
                code = np.argmin(d, axis=1)  # first min = lowest code
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["item_id"].to_numpy(),
                        "subspace": np.full(n, s, dtype=np.int64),
                        "code": code.astype(np.int64),
                        "qdist": d[np.arange(n), code],
                    }
                )

    out = base.mapInPandas(encode, schema=schema)
    return out.select(
        F.col("vec_id").alias(id_col),
        "subspace",
        "code",
        F.round("qdist", 6).alias("qdist"),
    )


def ann_topk_ivfpq(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 4,
    k_codes: int = 16,
    rerank: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full IVF-PQ retrieval: coarse probe (IVF) → asymmetric-distance
    scoring on PQ codes (ADC) → exact cosine re-rank of the best
    ``rerank`` candidates → top-k.

    This is the memory-bound ANN architecture at corpus scale: the index
    the candidate stage touches is (cell id + m byte codes) per item —
    ~20 B instead of a 256 B raw vector — and the expensive exact scoring
    reads true vectors for only ``rerank`` candidates per query.

    Determinism end-to-end: shared trainless quantizer/codebook (Knuth-
    ranked donors), strict-fold distances, the per-candidate ADC sum
    written as the explicit left-to-right chain d0+d1+…+d(m-1) (a float
    sum aggregate would have engine-defined order), and integer id
    tie-breaks at both the rerank cut and the final top-k — so the whole
    approximate retrieval value-hash-matches the DuckDB oracle.

    100 TB shape: items are touched by one assignment/encode map stage;
    the candidate join is (probe cells ⋈ cell-keyed codes) — an equi-join
    on a small integer key; the ADC distance table is per-query
    control-plane data (m·k_codes doubles) broadcast with the query set.
    """
    base = items.select(
        F.col(id_col).alias("item_id"), _as_double(F.col(vec_col)).alias("iv")
    )
    # one Knuth-rank TakeOrdered pass feeds BOTH the quantizer and the
    # codebook (r12, guide §1.2: don't compute things twice — the two
    # seed sets are rank prefixes of the same ordering)
    seed = _knuth_seed_rows(base, max(n_cells, k_codes))
    cids, C, cn = _ivf_quantizer(base, n_cells, seed_rows=seed)
    cell_of, probes_of = _ivf_cell_udfs(cids, C, cn, n_probe)
    CB = _pq_codebook(base, k_codes, seed_rows=seed)  # (k_codes, D)
    dim = CB.shape[1]
    subdim = dim // m
    pd_dot = dot_strict_udf()

    # --- item side: cell + PQ codes (the compressed index) -----------------
    asg = base.withColumn("cell", cell_of(F.col("iv")))
    codes = pq_encode(
        items, m=m, k=k_codes, id_col=id_col, vec_col=vec_col, codebook=CB
    ).select(F.col(id_col).alias("item_id"), "subspace", "code")

    # --- query side: probe cells + ADC distance table ----------------------
    qbase = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )

    def dtable(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack(pdf["qv"].to_numpy()).astype(np.float64)
            n = Q.shape[0]
            for s in range(m):
                Qs = Q[:, s * subdim : (s + 1) * subdim]
                for j in range(k_codes):
                    Cs = CB[j, s * subdim : (s + 1) * subdim]
                    d = np.cumsum((Qs - Cs) ** 2, axis=1)[:, -1]  # strict fold
                    yield pd.DataFrame(
                        {
                            "query_id": pdf["query_id"].to_numpy(),
                            "subspace": np.full(n, s, dtype=np.int64),
                            "code": np.full(n, j, dtype=np.int64),
                            "qd": d,
                        }
                    )

    qd = qbase.mapInPandas(dtable, schema="query_id long, subspace long, code long, qd double")
    probes = qbase.withColumn("cell", F.explode(probes_of(F.col("qv")))).select(
        "query_id", "cell"
    )

    # --- ADC candidate scoring over the compressed index -------------------
    cand = (
        probes.join(asg.select("item_id", "cell"), "cell")
        .where(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id")
    )
    scored = cand.join(codes, "item_id").join(
        F.broadcast(qd), ["query_id", "subspace", "code"]
    )
    pvt = (
        scored.groupBy("query_id", "item_id")
        .pivot("subspace", list(range(m)))
        .agg(F.first("qd"))
    )
    approx = None
    for s in range(m):  # explicit left-to-right chain — deterministic FP order
        term = F.col(str(s))
        approx = term if approx is None else approx + term
    shortlist = pvt.select("query_id", "item_id", approx.alias("adc"))
    w_cut = W.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("item_id"))
    short = (
        shortlist.withColumn("rn", F.row_number().over(w_cut))
        .where(F.col("rn") <= rerank)
        .select("query_id", "item_id")
    )

    # --- exact re-rank of the shortlist ------------------------------------
    it = base.withColumn("inorm", F.sqrt(pd_dot(F.col("iv"), F.col("iv"))))
    qn = qbase.withColumn("qnorm", F.sqrt(pd_dot(F.col("qv"), F.col("qv"))))
    exact = (
        short.join(it, "item_id")
        .join(F.broadcast(qn), "query_id")
        .withColumn(
            "sim", pd_dot(F.col("qv"), F.col("iv")) / (F.col("qnorm") * F.col("inorm"))
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("item_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "item_id", F.round("sim", 6).alias("sim"), "rank")
    )


# --- deterministic k-means (round 4) ---------------------------------------

KMEANS_SCALE = 1_000_000


def kmeans_int_assignments(
    items: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
) -> DataFrame:
    """Lloyd k-means over embeddings, made hash-verifiable by running
    entirely in integer space: components quantize once via
    ``floor(x · scale)`` (exact IEEE product + floor — no rounding-mode
    divergence between engines), distances are exact int64 squared-L2,
    and centroid updates are ``floor(sum / count)`` where the int64 sum is
    association-order-independent — the one float op per update is a
    single IEEE division of two exact integers. Every tie (equidistant
    vector, equal-coordinate argmin) breaks to the lowest cluster index,
    so ``n_iter`` full Lloyd rounds produce identical assignments on any
    engine and any partitioning.

    Seeds are the first ``k`` vectors by id (documented simplification —
    production would use k-means‖ sampling; determinism is the contract
    here). A cluster that loses all members simply drops out of the next
    round on both engines.

    Scale shape: centroids are control-plane (k·d ints collected per
    round, same footprint as the IVF quantizer); assignment is one
    Arrow-batched map stage per round (numpy int64 block matmul, no
    shuffle); the update is posexplode → (cluster, dim) hash aggregation —
    partial map-side combine reduces the shuffle to k·d rows per
    partition. Returns (id, cluster) with cluster ∈ [0, k).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def to_int(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype=object)
        V = np.stack(col.to_numpy()).astype(np.float64)
        return pd.Series(list(np.floor(V * float(scale)).astype(np.int64)))

    base = items.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("v"))
    ib = base.withColumn("vi", to_int(F.col("v"))).select("item_id", "vi").persist()

    seed_rows = ib.orderBy("item_id").limit(k).collect()
    if not seed_rows:
        # empty input: empty assignment preserving the caller's id type
        # (a hardcoded long id would give the empty edge case a different
        # schema than non-empty output for string/int ids)
        ib.unpersist()
        return items.select(F.col(id_col)).limit(0).withColumn(
            "cluster", F.lit(None).cast("long")
        )
    C = np.array([r["vi"] for r in seed_rows], dtype=np.int64)
    cl_ids = np.arange(len(C), dtype=np.int64)

    def make_assign(Cm: np.ndarray, ids: np.ndarray):
        @pandas_udf(LongType())
        def assign(col: pd.Series) -> pd.Series:
            if not len(col):
                return pd.Series([], dtype="int64")
            V = np.stack(col.to_numpy()).astype(np.int64)
            # exact int64 squared-L2 to every centroid; argmin takes the
            # first minimum = lowest cluster index (ids are ascending)
            d = ((V[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2)
            return pd.Series(ids[np.argmin(d, axis=1)])

        return assign

    assigned = None
    for it in range(n_iter):
        assign = make_assign(C, cl_ids)
        assigned = ib.withColumn("cluster", assign(F.col("vi")))
        if it == n_iter - 1:
            break
        stats = (
            assigned.select("cluster", F.posexplode("vi").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("c"))
            .collect()
        )
        import math

        by_cl: dict[int, dict[int, int]] = {}
        for r in stats:
            by_cl.setdefault(r["cluster"], {})[r["pos"]] = math.floor(r["s"] / r["c"])
        cl_ids = np.array(sorted(by_cl), dtype=np.int64)
        C = np.array(
            [[by_cl[cl][p] for p in range(len(by_cl[cl]))] for cl in cl_ids],
            dtype=np.int64,
        )
    # the cache earned its keep across the iteration collects; release it
    # rather than pin a full quantized copy of the table for the session
    # lifetime (the final assignment re-runs the stateless to_int map once
    # when the caller materializes — one Arrow stage, the cheaper trade)
    ib.unpersist()
    return assigned.select(
        F.col("item_id").alias(id_col), F.col("cluster").cast("long").alias("cluster")
    )


def ivf_build_index(
    items: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
) -> None:
    """Materialize an IVF-flat index: the quantizer's centroid table
    (control-plane, n_cells rows) plus the assigned item table written as
    cell-partitioned parquet — the offline index-build job of a serving
    pipeline. Precomputed ``inorm`` rides along so serving never
    recomputes item norms; parquet doubles are lossless, so the served
    sims are bit-identical to the build-time arithmetic."""
    base = items.select(
        F.col(id_col).alias("item_id"), _as_double(F.col(vec_col)).alias("iv")
    )
    cids, C, cn = _ivf_quantizer(base, n_cells)
    cell_of, _ = _ivf_cell_udfs(cids, C, cn, 1)
    pd_dot = dot_strict_udf()
    it = _ivf_prepare_items(base, cell_of, pd_dot)
    it.write.mode("overwrite").partitionBy("cell").parquet(
        f"{index_dir}/items"
    )
    spark = items.sparkSession
    cent = spark.createDataFrame(
        [
            (int(cid), [float(x) for x in C[i]], float(cn[i]))
            for i, cid in enumerate(cids)
        ],
        "cid long, cv array<double>, cn double",
    )
    cent.coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids")


def ann_topk_ivf_served(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Serve IVF top-k from a persisted index (:func:`ivf_build_index`):
    reload the centroid table (control-plane), compute each query's probe
    cells, and scan ONLY the probed cell partitions — the probe-cell set
    is collected (≤ n_cells ids) and pushed as a partition filter, so the
    index scan touches ~n_probe/n_cells of the corpus ON DISK, which is
    the point of persisting an index instead of re-deriving it per query.
    Results are bit-identical to :func:`ann_topk_ivf` (same quantizer,
    same strict-fold arithmetic, norms restored losslessly)."""
    cent_rows = sorted(
        spark.read.parquet(f"{index_dir}/centroids").collect(),
        key=lambda r: r["cid"],
    )
    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    C = np.array([r["cv"] for r in cent_rows], dtype=np.float64)
    cn = np.array([r["cn"] for r in cent_rows], dtype=np.float64)
    _, probes_of = _ivf_cell_udfs(cids, C, cn, n_probe)
    pd_dot = dot_strict_udf()
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        )
        .withColumn("cell", F.explode(probes_of(F.col("qv"))))
        .withColumn("qn", F.sqrt(pd_dot(F.col("qv"), F.col("qv"))))
    )
    # the probe-cell collect AND the join both consume q — persist its
    # |Q|·n_probe rows or the queries scan + probes_of UDF run twice
    q = q.persist()
    # bounded control-plane collect: the union of probe cells (≤ n_cells)
    probe_cells = [r["cell"] for r in q.select("cell").distinct().collect()]
    it = spark.read.parquet(f"{index_dir}/items").filter(
        F.col("cell").isin(probe_cells)
    )
    return _ivf_score_topk(it, q, pd_dot, k)
