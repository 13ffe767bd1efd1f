"""Correctness queries for similarity search over the embeddings table.

DuckDB oracles replicate the Spark dot product as a *strict left fold*
(``list_reduce(list_prepend(0.0, ...))``) so doubles are bit-identical —
no threshold/tie flakiness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..session import load_table
from . import register

_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
    "p -> (p[1] * p[2]))), (acc, x) -> acc + x)"
)


def _dot(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


_ANN_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt({_dot('embedding::DOUBLE[]', 'embedding::DOUBLE[]')}) AS n
      FROM embeddings
    )
    SELECT query_id, item_id, round(sim, 6) AS sim, rank FROM (
      SELECT q.vec_id AS query_id, i.vec_id AS item_id,
             {_dot('q.v', 'i.v')} / (sqrt({_dot('q.v', 'q.v')}) * sqrt({_dot('i.v', 'i.v')})) AS sim,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_dot('q.v', 'i.v')} / (sqrt({_dot('q.v', 'q.v')}) * sqrt({_dot('i.v', 'i.v')})) DESC,
                        i.vec_id) AS BIGINT) AS rank
      FROM e q JOIN e i ON i.vec_id != q.vec_id
      WHERE q.vec_id < 20
    ) WHERE rank <= 5
"""


@register("ann_cosine_topk", _ANN_ORACLE)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return similarity.ann_topk_bruteforce(emb, queries, k=5)


def _plane_sql(h: list[float]) -> str:
    return "[" + ", ".join(repr(float(x)) for x in h) + "]::DOUBLE[]"


#: SRP planes for the blocked near-dup path (seed 43, 8 bands × 6 bits).
#: Seeded and inlined as SQL literals so the DuckDB oracle reproduces the
#: candidate filter bit-for-bit — the emitted set is a deterministic
#: subset of the exact τ-pairs (recall model in
#: operators/similarity.py embedding_near_dup_blocked) and the hash gate
#: stays exact on an approximate operator.
_ND_BAND_SIZE, _ND_BANDS = 6, 8
_ND_PLANES = similarity._hyperplanes(
    dim=64, n_planes=_ND_BAND_SIZE * _ND_BANDS, seed=43
)


def _nd_band_sql(t: int) -> str:
    band = _ND_PLANES[t * _ND_BAND_SIZE : (t + 1) * _ND_BAND_SIZE]
    return " + ".join(
        f"(CASE WHEN {_dot('v', _plane_sql(h))} > 0 THEN {1 << i} ELSE 0 END)"
        for i, h in enumerate(band)
    )


_ND_BANDS_SELECT = ",\n             ".join(
    f"({_nd_band_sql(t)}) AS b{t}" for t in range(_ND_BANDS)
)
_ND_BANDS_MATCH = " OR ".join(f"a.b{t} = c.b{t}" for t in range(_ND_BANDS))

_NEAR_DUP_ORACLE = f"""
    WITH e AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    m AS (SELECT id, min(id) OVER (PARTITION BY v) AS rep FROM e),
    u AS (SELECT min(id) AS rep, v FROM e GROUP BY v),
    b AS (
      SELECT rep, v, sqrt({_dot('v', 'v')}) AS nrm,
             {_ND_BANDS_SELECT}
      FROM u
    ),
    scored AS (
      SELECT a.rep AS rep1, c.rep AS rep2,
             {_dot('a.v', 'c.v')} / (a.nrm * c.nrm) AS sim
      FROM b a JOIN b c ON a.rep < c.rep AND ({_ND_BANDS_MATCH})
      WHERE {_dot('a.v', 'c.v')} / (a.nrm * c.nrm) >= 0.4
    ),
    crossed AS (
      SELECT least(m1.id, m2.id) AS id1, greatest(m1.id, m2.id) AS id2,
             round(s.sim, 6) AS sim
      FROM scored s
      JOIN m m1 ON m1.rep = s.rep1
      JOIN m m2 ON m2.rep = s.rep2
    ),
    selfsim AS (
      SELECT rep, {_dot('v', 'v')} / (nrm * nrm) AS sim FROM b
      WHERE {_dot('v', 'v')} / (nrm * nrm) >= 0.4
    ),
    intra AS (
      SELECT m1.id AS id1, m2.id AS id2, round(s.sim, 6) AS sim
      FROM m m1 JOIN m m2 ON m1.rep = m2.rep AND m1.id < m2.id
      JOIN selfsim s ON s.rep = m1.rep
    )
    SELECT * FROM crossed UNION ALL SELECT * FROM intra
"""


@register("embedding_near_dup", _NEAR_DUP_ORACLE)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked near-dup (exact-collapse + SRP-band LSH candidate join +
    strict-fold verify) — the 100 TB path; the all-pairs exact form
    (:func:`similarity.embedding_near_dup_pairs`) remains as a sampled
    audit verifier, out of the registry hot path (VERDICT r5 #3/#5)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_blocked(emb, threshold=0.4)


#: The SRP planes are seeded (numpy PCG64, seed 42), so the banded-LSH
#: query is fully deterministic — inline the planes as SQL literals and
#: replicate every band's bucket computation in DuckDB. Both sides use the
#: same strict left-fold dot product over the same double literals, so
#: bucket signs, sims, and ranks are bit-identical: a full hash-match gate
#: on an "approximate" algorithm. Band t uses plane rows [t*b, (t+1)*b),
#: mirroring operators/similarity.py lsh_band_buckets.
_N_PLANES, _N_BANDS = 4, 8
_PLANES = similarity._hyperplanes(dim=64, n_planes=_N_PLANES * _N_BANDS, seed=42)


def _band_sql(t: int) -> str:
    band = _PLANES[t * _N_PLANES : (t + 1) * _N_PLANES]
    return " + ".join(
        f"(CASE WHEN {_dot('v', _plane_sql(h))} > 0 THEN {1 << i} ELSE 0 END)"
        for i, h in enumerate(band)
    )


_BANDS_SELECT = ",\n             ".join(
    f"({_band_sql(t)}) AS b{t}" for t in range(_N_BANDS)
)
_BANDS_MATCH = " OR ".join(f"q.b{t} = i.b{t}" for t in range(_N_BANDS))

_ANN_LSH_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    b AS (
      SELECT vec_id, v, sqrt({_dot('v', 'v')}) AS nrm,
             {_BANDS_SELECT}
      FROM e
    )
    SELECT query_id, item_id, round(sim, 6) AS sim, rank FROM (
      SELECT q.vec_id AS query_id, i.vec_id AS item_id,
             {_dot('q.v', 'i.v')} / (q.nrm * i.nrm) AS sim,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_dot('q.v', 'i.v')} / (q.nrm * i.nrm) DESC, i.vec_id
             ) AS BIGINT) AS rank
      FROM b q JOIN b i ON i.vec_id != q.vec_id AND ({_BANDS_MATCH})
      WHERE q.vec_id < 20
    ) WHERE rank <= 5
"""


@register("ann_cosine_topk_lsh", _ANN_LSH_ORACLE)
def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return similarity.ann_topk_lsh(emb, queries, k=5)


#: IVF probe structure replicated in SQL: seeds = Knuth-hash-ranked sample,
#: assignment/probes = row_number over per-(vector, centroid) cosine, all
#: dot products strict left folds — deterministic w.r.t. the Spark side's
#: cumsum arithmetic, so the "approximate" IVF result full-hash-matches.
_N_CELLS, _N_PROBE = 16, 4

_ANN_IVF_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    n AS (SELECT vec_id, v, sqrt({_dot('v', 'v')}) AS nrm FROM e),
    seeds AS (
      SELECT vec_id AS cid, v AS cv, sqrt({_dot('v', 'v')}) AS cn
      FROM e ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
      LIMIT {_N_CELLS}
    ),
    allsims AS (
      SELECT a.vec_id, a.v, a.nrm, s.cid,
             {_dot('a.v', 's.cv')} / (a.nrm * s.cn) AS csim
      FROM n a CROSS JOIN seeds s
    ),
    asg AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rn
        FROM allsims) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rn
        FROM allsims WHERE vec_id < 20) WHERE rn <= {_N_PROBE}
    )
    SELECT query_id, item_id, round(sim, 6) AS sim, rank FROM (
      SELECT p.query_id, i.vec_id AS item_id,
             {_dot('q.v', 'i.v')} / (q.nrm * i.nrm) AS sim,
             CAST(row_number() OVER (
               PARTITION BY p.query_id
               ORDER BY {_dot('q.v', 'i.v')} / (q.nrm * i.nrm) DESC, i.vec_id
             ) AS BIGINT) AS rank
      FROM probes p
      JOIN asg ia ON ia.cid = p.cid
      JOIN n i ON i.vec_id = ia.vec_id AND i.vec_id != p.query_id
      JOIN n q ON q.vec_id = p.query_id
    ) WHERE rank <= 5
"""


@register("ann_cosine_topk_ivf", _ANN_IVF_ORACLE)
def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return similarity.ann_topk_ivf(
        emb, queries, k=5, n_cells=_N_CELLS, n_probe=_N_PROBE
    )


_EMB_STATS_ORACLE = f"""
    SELECT label,
           count(*) AS n_vectors,
           CAST(sum(CAST(round(sqrt({_dot('embedding::DOUBLE[]', 'embedding::DOUBLE[]')}) * 1000000) AS BIGINT)) AS DOUBLE)
             / count(*) / 1000000.0 AS avg_norm
    FROM embeddings
    GROUP BY label
"""


@register("embedding_stats", _EMB_STATS_ORACLE)
def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table profile: vector count and mean L2 norm per label.
    Norms are strict-fold (cumsum UDF, oracle bit-identical); the mean
    goes through integer micro-units so the double sum is
    association-order-free — the money-math discipline applied to vector
    stats. One Arrow map stage + one tiny shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    pd_dot = similarity.dot_strict_udf()
    norm_micro = F.round(
        F.sqrt(pd_dot(F.col("embedding").cast("array<double>"),
                      F.col("embedding").cast("array<double>"))) * 1_000_000
    ).cast("long")
    return (
        emb.withColumn("nm", norm_micro)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            (F.sum("nm").cast("double") / F.count("*") / 1_000_000.0).alias(
                "avg_norm"
            ),
        )
    )


_SEMDEDUP_THRESHOLD = 0.4

#: adaptive cell count — cells of ~64 vectors keep within-cell pair work
#: linear in the corpus (floor 16 matches the fixed-_N_CELLS behavior on
#: the small driver tables, so sf0.01 hashes are unchanged)
_SEMDEDUP_CELL_TARGET = 64

_SEMDEDUP_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    n AS (SELECT vec_id, v, sqrt({_dot('v', 'v')}) AS nrm FROM e),
    seeds AS (
      SELECT cid, cv, cn FROM (
        SELECT vec_id AS cid, v AS cv, sqrt({_dot('v', 'v')}) AS cn,
               row_number() OVER (
                 ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id) AS srn
        FROM e)
      WHERE srn <= greatest(16, (SELECT count(*) FROM e) // {_SEMDEDUP_CELL_TARGET})
    ),
    allsims AS (
      SELECT a.vec_id, s.cid,
             {_dot('a.v', 's.cv')} / (a.nrm * s.cn) AS csim
      FROM n a CROSS JOIN seeds s
    ),
    asg AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rn
        FROM allsims) WHERE rn = 1
    ),
    dups AS (
      SELECT DISTINCT b.vec_id AS dup_id
      FROM asg a
      JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN n va ON va.vec_id = a.vec_id
      JOIN n vb ON vb.vec_id = b.vec_id
      WHERE {_dot('va.v', 'vb.v')} / (va.nrm * vb.nrm) >= {_SEMDEDUP_THRESHOLD}
    )
    SELECT a.vec_id, a.cid AS cell,
           CAST(CASE WHEN d.dup_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup
    FROM asg a LEFT JOIN dups d ON d.dup_id = a.vec_id
"""


@register("semantic_dedup", _SEMDEDUP_ORACLE)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: IVF coarse clustering, then
    within-cell cosine-threshold duplicate marking with lowest-id-kept
    canonicalization (:func:`..operators.similarity.semantic_dedup`).
    Pair work is Σ|cell|², not n² — the clustering bound that makes
    embedding dedup feasible at corpus scale; strict-fold cosines keep the
    threshold predicate engine-identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        emb, threshold=_SEMDEDUP_THRESHOLD, cell_target=_SEMDEDUP_CELL_TARGET
    )


_PQ_M, _PQ_K, _PQ_SUBDIM = 4, 16, 16

_PQ_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS cid, v AS cv,
             CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code
      FROM (SELECT vec_id, v FROM e
            ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
            LIMIT {_PQ_K})
    ),
    sub AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS s),
    dists AS (
      SELECT a.vec_id, sub.s AS subspace, seeds.code,
             list_reduce(list_prepend(0.0,
               list_transform(
                 list_zip(array_slice(a.v, sub.s * {_PQ_SUBDIM} + 1,
                                      sub.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}),
                          array_slice(seeds.cv, sub.s * {_PQ_SUBDIM} + 1,
                                      sub.s * {_PQ_SUBDIM} + {_PQ_SUBDIM})),
                 p -> (p[1] - p[2]) * (p[1] - p[2]))),
               (acc, x) -> acc + x) AS d
      FROM e a CROSS JOIN sub CROSS JOIN seeds
    )
    SELECT vec_id, subspace, code, round(d, 6) AS qdist FROM (
      SELECT vec_id, subspace, code, d,
             row_number() OVER (PARTITION BY vec_id, subspace
                                ORDER BY d, code) AS rn
      FROM dists) WHERE rn = 1
"""


@register("embedding_pq_codes", _PQ_ORACLE)
def q_embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes + per-subspace quantization error for
    every embedding (:func:`..operators.similarity.pq_encode`) — the
    compression layer of IVF-PQ. Trainless Knuth-ranked codebooks and
    strict-fold distances keep the argmin engine-identical, so even the
    'approximate' compressed representation value-hash-matches."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_encode(emb, m=_PQ_M, k=_PQ_K)


_PQ_RERANK = 32

_ANN_IVFPQ_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    n AS (SELECT vec_id, v, sqrt({_dot('v', 'v')}) AS nrm FROM e),
    seeds AS (
      SELECT vec_id AS cid, v AS cv, sqrt({_dot('v', 'v')}) AS cn
      FROM e ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
      LIMIT {_N_CELLS}
    ),
    cb AS (
      SELECT v AS cv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code
      FROM (SELECT vec_id, v FROM e
            ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
            LIMIT {_PQ_K})
    ),
    allsims AS (
      SELECT a.vec_id, s.cid,
             {_dot('a.v', 's.cv')} / (a.nrm * s.cn) AS csim
      FROM n a CROSS JOIN seeds s
    ),
    asg AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rn
        FROM allsims) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rn
        FROM allsims WHERE vec_id < 20) WHERE rn <= {_N_PROBE}
    ),
    sub AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS s),
    codes AS (
      SELECT vec_id AS item_id, subspace, code FROM (
        SELECT a.vec_id, sub.s AS subspace, cb.code,
               row_number() OVER (
                 PARTITION BY a.vec_id, sub.s
                 ORDER BY list_reduce(list_prepend(0.0,
                   list_transform(
                     list_zip(array_slice(a.v, sub.s * {_PQ_SUBDIM} + 1,
                                          sub.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}),
                              array_slice(cb.cv, sub.s * {_PQ_SUBDIM} + 1,
                                          sub.s * {_PQ_SUBDIM} + {_PQ_SUBDIM})),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))),
                   (acc, x) -> acc + x), cb.code) AS rn
        FROM e a CROSS JOIN sub CROSS JOIN cb) WHERE rn = 1
    ),
    qd AS (
      SELECT q.vec_id AS query_id, sub.s AS subspace, cb.code,
             list_reduce(list_prepend(0.0,
               list_transform(
                 list_zip(array_slice(q.v, sub.s * {_PQ_SUBDIM} + 1,
                                      sub.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}),
                          array_slice(cb.cv, sub.s * {_PQ_SUBDIM} + 1,
                                      sub.s * {_PQ_SUBDIM} + {_PQ_SUBDIM})),
                 p -> (p[1] - p[2]) * (p[1] - p[2]))),
               (acc, x) -> acc + x) AS qdv
      FROM e q CROSS JOIN sub CROSS JOIN cb
      WHERE q.vec_id < 20
    ),
    cand AS (
      SELECT p.query_id, ia.vec_id AS item_id
      FROM probes p JOIN asg ia ON ia.cid = p.cid
      WHERE ia.vec_id != p.query_id
    ),
    adc AS (
      SELECT c.query_id, c.item_id,
             max(CASE WHEN k.subspace = 0 THEN q.qdv END)
           + max(CASE WHEN k.subspace = 1 THEN q.qdv END)
           + max(CASE WHEN k.subspace = 2 THEN q.qdv END)
           + max(CASE WHEN k.subspace = 3 THEN q.qdv END) AS adist
      FROM cand c
      JOIN codes k ON k.item_id = c.item_id
      JOIN qd q ON q.query_id = c.query_id
              AND q.subspace = k.subspace AND q.code = k.code
      GROUP BY c.query_id, c.item_id
    ),
    short AS (
      SELECT query_id, item_id FROM (
        SELECT query_id, item_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adist, item_id) AS rn
        FROM adc) WHERE rn <= {_PQ_RERANK}
    )
    SELECT query_id, item_id, round(sim, 6) AS sim, rank FROM (
      SELECT s.query_id, s.item_id,
             {_dot('q.v', 'i.v')} / (q.nrm * i.nrm) AS sim,
             CAST(row_number() OVER (
               PARTITION BY s.query_id
               ORDER BY {_dot('q.v', 'i.v')} / (q.nrm * i.nrm) DESC, s.item_id
             ) AS BIGINT) AS rank
      FROM short s
      JOIN n i ON i.vec_id = s.item_id
      JOIN n q ON q.vec_id = s.query_id
    ) WHERE rank <= 5
"""


@register("ann_cosine_topk_ivfpq", _ANN_IVFPQ_ORACLE)
def q_ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF-PQ retrieval: coarse probe → asymmetric-distance scoring
    over the compressed (cell, codes) index → exact re-rank of the top
    candidates (:func:`..operators.similarity.ann_topk_ivfpq`). The entire
    approximate path — probes, PQ codes, the explicit left-to-right ADC
    sum, the rerank cut — is engine-deterministic, so even this doubly-
    approximate retrieval value-hash-matches the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return similarity.ann_topk_ivfpq(
        emb,
        queries,
        k=5,
        n_cells=_N_CELLS,
        n_probe=_N_PROBE,
        m=_PQ_M,
        k_codes=_PQ_K,
        rerank=_PQ_RERANK,
    )


# --- deterministic k-means clustering (round 4) ----------------------------

_KMEANS_ORACLE = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, v AS cv
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)
),
d1 AS (
  SELECT e.vec_id, c0.cl,
         list_sum(list_transform(generate_series(1, 64),
                  i -> (e.v[i] - c0.cv[i]) * (e.v[i] - c0.cv[i]))) AS dist
  FROM e CROSS JOIN c0
),
a1 AS (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
    FROM d1) WHERE rn = 1
),
s1 AS (
  SELECT a1.cl, g.i AS pos,
         CAST(floor(CAST(sum(e.v[g.i]) AS DOUBLE) / count(*)) AS BIGINT) AS cval
  FROM a1 JOIN e USING (vec_id)
  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
  GROUP BY a1.cl, g.i
),
c1 AS (SELECT cl, list(cval ORDER BY pos) AS cv FROM s1 GROUP BY cl),
d2 AS (
  SELECT e.vec_id, c1.cl,
         list_sum(list_transform(generate_series(1, 64),
                  i -> (e.v[i] - c1.cv[i]) * (e.v[i] - c1.cv[i]))) AS dist
  FROM e CROSS JOIN c1
)
SELECT vec_id, CAST(cl AS BIGINT) AS cluster FROM (
  SELECT vec_id, cl,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
  FROM d2) WHERE rn = 1
"""


@register("embedding_kmeans", _KMEANS_ORACLE)
def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two full Lloyd rounds of k=8 k-means over the embedding table,
    value-hash-verified — an *iterative* algorithm under the exact gate,
    possible because every step is integer-exact
    (:func:`..operators.similarity.kmeans_int_assignments`): floor-
    quantized components, int64 squared-L2, order-independent integer
    centroid sums. The oracle replays both rounds in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.kmeans_int_assignments(emb, k=8, n_iter=2)


_RECALL_ORACLE = f"""
WITH exact AS (FROM ({_ANN_ORACLE})),
     approx AS (FROM ({_ANN_LSH_ORACLE})),
     hits AS (
       SELECT exact.query_id, CAST(count(*) AS BIGINT) AS n_hits
       FROM exact JOIN approx
         ON exact.query_id = approx.query_id
        AND exact.item_id = approx.item_id
       GROUP BY exact.query_id
     ),
     base AS (
       SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
       FROM exact GROUP BY query_id
     )
SELECT base.query_id, n_exact,
       CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
       CAST(floor(COALESCE(n_hits, 0) * 1000000 / n_exact) AS BIGINT)
         AS recall_ppm
FROM base LEFT JOIN hits ON base.query_id = hits.query_id
"""


@register("ann_recall_at_k", _RECALL_ORACLE)
def q_ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the banded-SRP LSH index against the exact brute-force
    top-5, per query — the index-quality measurement a pipeline runs
    before trusting an ANN index for dedup/retrieval, here under the full
    exact gate (both rankings are deterministic, so recall is too).

    Scale shape: both retrieval legs are the already-audited bucketed /
    brute-force plans over the same scan; the recall join keys on
    (query_id, item_id) — k rows per query per leg, so the measurement
    adds only a |Q|·k-sized equi-join and a query-keyed aggregate on top.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    # both the hits join and the base aggregate consume the exact leg —
    # persist its |Q|·k rows or the brute-force scoring pass runs twice
    exact = (
        similarity.ann_topk_bruteforce(emb, queries, k=5)
        .select("query_id", "item_id")
        .persist()
    )
    approx = similarity.ann_topk_lsh(emb, queries, k=5).select(
        "query_id", "item_id"
    )
    hits = (
        exact.join(approx, ["query_id", "item_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    base = exact.groupBy("query_id").agg(F.count("*").cast("long").alias("n_exact"))
    return base.join(hits, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        # floor, not bare cast: Spark's double→long cast truncates while
        # DuckDB's rounds — floor is the one semantics both engines share
        F.floor(
            F.coalesce(F.col("n_hits"), F.lit(0)) * 1000000 / F.col("n_exact")
        )
        .cast("long")
        .alias("recall_ppm"),
    )


@register("ann_ivf_persisted", _ANN_IVF_ORACLE)
def q_ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index *lifecycle* face of IVF retrieval: build the index once
    (cell-partitioned parquet + centroid table,
    :func:`..operators.similarity.ivf_build_index`), then serve the same
    queries from the persisted artifact — under the SAME oracle as
    ``ann_cosine_topk_ivf``, because persisting and reloading must not
    change a single bit of the result (parquet doubles are lossless, the
    quantizer is deterministic).

    Scale shape: serving collects the probe-cell union (≤ n_cells ids,
    control-plane) and pushes it as a partition filter on the index scan
    — the on-disk read touches ~n_probe/n_cells of the corpus, which is
    what an index buys over re-deriving assignments per query. The build
    is the offline job; in production it runs once per corpus version,
    not per query.
    """
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    # build once per corpus *version*: the directory name is a digest of
    # the full source path + mtime + size + cell count, so (a) corpora in
    # different parents that share a basename can never collide, and (b)
    # a changed corpus builds into a DIFFERENT directory instead of
    # mode('overwrite')-ing one another session may be scanning. Publish
    # is atomic: build into a unique scratch dir, then a single
    # os.rename — a reader either sees the complete index (the BUILT
    # marker travels inside the renamed dir) or the old one, never a
    # partial write. Concurrent builders race on the rename; the loser's
    # scratch dir is discarded (both build identical content — the
    # quantizer is deterministic).
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    stamp = f"{os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}|{_N_CELLS}"
    digest = hashlib.sha256(stamp.encode()).hexdigest()[:16]
    index_dir = os.path.join(tempfile.gettempdir(), f"spark_graft_ivf_{digest}")
    marker = os.path.join(index_dir, "BUILT")
    if not os.path.exists(marker):
        build_dir = f"{index_dir}.build-{uuid.uuid4().hex[:8]}"
        similarity.ivf_build_index(emb, build_dir, n_cells=_N_CELLS)
        with open(os.path.join(build_dir, "BUILT"), "w") as fh:
            fh.write(stamp)
        if os.path.isdir(index_dir) and not os.path.exists(marker):
            # pre-atomic-layout leftover (no marker ⇒ never published)
            shutil.rmtree(index_dir, ignore_errors=True)
        try:
            os.rename(build_dir, index_dir)
        except OSError:
            shutil.rmtree(build_dir, ignore_errors=True)  # lost the race
    return similarity.ann_topk_ivf_served(
        spark, index_dir, queries, k=5, n_probe=_N_PROBE
    )


# --- centroid-distance outliers (round 6) ------------------------------------

_EMB_OUTLIER_ORACLE = """
WITH ex AS (
  SELECT vec_id, label,
         unnest(generate_series(1, len(embedding))) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS q
  FROM embeddings
),
cen AS (
  SELECT label, dim,
         CAST(sum(q) AS BIGINT) AS qsum,
         CAST(count(*) AS BIGINT) AS n
  FROM ex GROUP BY label, dim
),
dist AS (
  SELECT ex.vec_id, ex.label,
         CAST(sum(CAST(floor(
           (CAST(ex.q AS DOUBLE) / 1000000.0
             - CAST(cen.qsum AS DOUBLE) / CAST(cen.n AS DOUBLE) / 1000000.0)
           * (CAST(ex.q AS DOUBLE) / 1000000.0
             - CAST(cen.qsum AS DOUBLE) / CAST(cen.n AS DOUBLE) / 1000000.0)
           * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS ssum
  FROM ex JOIN cen ON cen.label = ex.label AND cen.dim = ex.dim
  GROUP BY ex.vec_id, ex.label
)
SELECT label, vec_id,
       round(sqrt(CAST(ssum AS DOUBLE) / 1000000000000.0), 6) AS dist,
       CAST(rk AS BIGINT) AS rank
FROM (
  SELECT label, vec_id, ssum,
         row_number() OVER (PARTITION BY label
                            ORDER BY ssum DESC, vec_id) AS rk
  FROM dist
) WHERE rk <= 5
"""


@register("embedding_outliers", _EMB_OUTLIER_ORACLE)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding anomaly scan: the 5 vectors farthest (L2) from their
    label's centroid — mislabeled or corrupted embeddings surface here
    before they poison contrastive training. All cross-row arithmetic is
    integer (per-component micro-quantization before the centroid sum,
    pico-quantized squared diffs before the distance sum, integer-keyed
    rank), so both engines agree bit-exactly despite double inputs —
    the money-math discipline applied to geometry.

    Scale shape: posexplode to (label, dim, component) longs → one
    map-side-combined aggregate builds centroids (|labels|·d rows —
    broadcast back) → one doc-keyed aggregate folds the 64 per-dim terms
    → rank-1..5 per label prunes under WindowGroupLimit. Two long-keyed
    shuffles, nothing quadratic, no driver collect. The columnar
    alternative (strict-fold Pandas UDF over a broadcast centroid map,
    as `embedding_stats` does for norms) trades the explode for Arrow
    batches when d is large."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "val"
        ),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("val") * 1_000_000 + 0.5).cast("long").alias("q"),
    )
    cen = ex.groupBy("label", "dim").agg(
        F.sum("q").cast("long").alias("qsum"),
        F.count("*").cast("long").alias("n"),
    )
    x = F.col("q").cast("double") / 1_000_000.0
    c = F.col("qsum").cast("double") / F.col("n").cast("double") / 1_000_000.0
    term = F.floor((x - c) * (x - c) * 1_000_000_000_000 + 0.5).cast("long")
    dist = (
        ex.join(F.broadcast(cen), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sum(term).cast("long").alias("ssum"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("label").orderBy(F.desc("ssum"), F.asc("vec_id"))
    return (
        dist.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select(
            "label",
            "vec_id",
            F.round(
                F.sqrt(F.col("ssum").cast("double") / 1_000_000_000_000.0), 6
            ).alias("dist"),
            F.col("rk").cast("long").alias("rank"),
        )
    )
