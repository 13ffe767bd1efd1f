"""Retrieval / selection queries a training-data pipeline runs over the
corpus: BM25 ranking, inverted-index statistics, PMI collocations, a
fixed-weight quality classifier, DSIR-style importance weighting,
deterministic training-shard assignment, and co-occurrence-graph triangle
counting.

Engine-portability discipline (same as the rest of the registry): every
score that a real pipeline computes with ``log``/``exp`` is expressed here
as an integer-quantized *rational* surrogate — products, divisions, and
``floor`` of IEEE doubles derived from exact integer counts, written with
identical association order in the Spark plan and the DuckDB oracle, so
both engines compute identical bits (each individual ``*`` ``/`` ``+`` is
correctly rounded; only the *order* could diverge, and we pin it).
Monotone transforms preserve every ranking the real pipeline would
produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import curation as cu
from ..session import load_table
from . import register

# fixed "search query" over the synthetic corpus vocabulary
BM25_TERMS = ("join", "hash", "scan", "spark")
_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in BM25_TERMS) + "]"


# --- BM25 ranked retrieval --------------------------------------------------

_BM25_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE list_contains({_TERMS_SQL}, w)
  GROUP BY doc_id, w
),
df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
scored AS (
  SELECT tf.doc_id,
         CAST(floor(1000000.0
              * ((CAST(n_docs - df AS DOUBLE) + 0.5) / (df + 0.5))
              * ((tf * 2.2)
                 / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl)))) AS BIGINT)
           AS contrib
  FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_terms_matched,
       CAST(sum(contrib) AS BIGINT) AS score
FROM scored
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT 10
"""


@register("bm25_retrieval", _BM25_ORACLE)
def q_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 over the corpus for a fixed 4-term query (k1=1.2,
    b=0.75, rational IDF ``(N-df+0.5)/(df+0.5)`` — the log of the classic
    formula is monotone in this ratio, and the ratio is engine-exact).
    Per-term contributions are floor-quantized to integers *before* the
    per-doc sum so the aggregate is order-independent.

    Scale shape: the token stream is filtered to the query terms *before*
    the (doc, term) aggregation, so the shuffle carries only matching
    postings (|q| ≤ 4 terms/doc), never the corpus. df and the (N, avgdl)
    scalars are one-row/4-row broadcasts. The final top-10 is
    ``ORDER BY … LIMIT`` — Spark plans TakeOrderedAndProject (per-partition
    top-k merged on the driver), which is the 100-TB-safe global top-k; no
    single-partition window.
    """
    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select("doc_id", F.size(F.split("text", " ", -1)).cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tok = docs.select("doc_id", F.explode(F.split("text", " ", -1)).alias("w"))
    tf = (
        tok.filter(F.col("w").isin(*BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_t = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    idf = ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    den = F.col("tf") + F.lit(1.2) * (
        F.lit(0.25) + (F.lit(0.75) * F.col("dl")) / F.col("avgdl")
    )
    contrib = F.floor(
        F.lit(1000000.0) * idf * ((F.col("tf") * F.lit(2.2)) / den)
    ).cast("long")
    scored = (
        tf.join(F.broadcast(df_t), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", contrib.alias("contrib"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms_matched"),
            F.sum("contrib").cast("long").alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


# --- inverted-index posting statistics --------------------------------------

_INVIDX_ORACLE = """
WITH tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY doc_id, w
)
SELECT w AS term,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS tf_total,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM tf
GROUP BY w
HAVING count(*) >= 10
"""


@register("inverted_index_stats", _INVIDX_ORACLE)
def q_inverted_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list statistics of the corpus inverted index (df ≥ 10
    terms): document frequency, total term frequency, and the doc-id span
    of each posting list — the metadata a retrieval/dedup system keeps per
    term.

    Scale shape: two-phase — the wide (doc, term) aggregation map-side
    combines within each document's partition before the term-keyed
    shuffle, so the exchange carries one row per distinct (doc, term), not
    per token. The df filter is on the aggregate (HAVING), applied at the
    reduce side; vocabulary (not corpus) cardinality bounds the output.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ", -1)).alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").cast("long").alias("tf"))
    return (
        tf.groupBy("w")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("tf_total"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .filter(F.col("df") >= 10)
        .withColumnRenamed("w", "term")
    )


# --- PMI collocations -------------------------------------------------------

_PMI_ORACLE = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
nu AS (SELECT CAST(count(*) AS BIGINT) AS n_uni FROM tok),
g AS (
  SELECT unnest(CASE WHEN len(ws) >= 2
                     THEN list_transform(generate_series(1, len(ws) - 1),
                                         i -> ws[i] || ' ' || ws[i + 1])
                     ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM (SELECT string_split(text, ' ') AS ws FROM documents)
),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_pair FROM g),
pair AS (
  SELECT string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2,
         CAST(count(*) AS BIGINT) AS c_pair
  FROM g GROUP BY 1, 2
)
SELECT w1, w2, c_pair,
       CAST(floor(1000000.0
            * (((CAST(c_pair AS DOUBLE) / n_pair) / (CAST(u1.c AS DOUBLE) / n_uni))
               / (CAST(u2.c AS DOUBLE) / n_uni))) AS BIGINT) AS pmi_q
FROM pair
JOIN uni u1 ON pair.w1 = u1.w
JOIN uni u2 ON pair.w2 = u2.w
CROSS JOIN nu CROSS JOIN np
WHERE c_pair >= 5
ORDER BY pmi_q DESC, w1, w2
LIMIT 50
"""


@register("pmi_bigrams", _PMI_ORACLE)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent-word collocations by pointwise mutual information.
    The score is the rational PMI ``p(xy) / (p(x)·p(y))`` (classic PMI is
    its log — monotone, so the ranking is identical), floor-quantized to
    ``pmi_q``; the three divisions are written innermost-first on both
    engines so the double bits match.

    Scale shape: bigram and unigram counts are both map-side-combined
    explodes of the same codegen token stream; the join back to the pair
    table keys on single words (vocabulary-sized build sides). The c_pair
    ≥ 5 support filter runs before the joins, and the global top-50 is
    TakeOrderedAndProject.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ", -1)).alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    nu = tok.agg(F.count("*").cast("long").alias("n_uni"))
    grams = cu.explode_ngrams(docs, "doc_id", "text", 2)
    np_ = grams.agg(F.count("*").cast("long").alias("n_pair"))
    pair = (
        grams.select(
            F.split("gram", " ", -1)[0].alias("w1"),
            F.split("gram", " ", -1)[1].alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c_pair"))
        .filter(F.col("c_pair") >= 5)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi_q = F.floor(
        F.lit(1000000.0)
        * (
            (
                (F.col("c_pair").cast("double") / F.col("n_pair"))
                / (F.col("c1").cast("double") / F.col("n_uni"))
            )
            / (F.col("c2").cast("double") / F.col("n_uni"))
        )
    ).cast("long")
    return (
        pair.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(np_))
        .select("w1", "w2", "c_pair", pmi_q.alias("pmi_q"))
        .orderBy(F.col("pmi_q").desc(), "w1", "w2")
        .limit(50)
    )


# --- fixed-weight quality classifier ---------------------------------------

_EN_SW_SQL = "['the', 'a', 'of', 'and', 'to', 'in', 'is']"

_LOGIT_ORACLE = f"""
SELECT doc_id,
       CAST(10 * sw_hits - n_words AS BIGINT) AS logit,
       CAST(CASE WHEN 10 * sw_hits - n_words > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS kept
FROM (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> list_contains({_EN_SW_SQL}, w))) AS BIGINT)
           AS sw_hits
  FROM documents
)
"""


@register("quality_logit_filter", _LOGIT_ORACLE)
def q_quality_logit_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-weight linear quality classifier (the inference half of a
    fastText-style filter, weights "trained offline"): logit =
    10·stopword_hits − n_words, keep when positive (> 10 % stopword
    density). All-integer features and weights, so the decision boundary
    is bit-exact on any engine — the real pipeline's sigmoid is monotone
    in this logit and never needs to be evaluated to filter.

    Scale shape: one codegen'd scan projecting two integer features per
    document; no shuffle, no UDF — the classifier is an expression, so
    Catalyst can push it beneath any downstream join like a plain filter.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ", -1)
    # occurrences-with-multiplicity of each stopword via size-difference
    # under array_remove — plain collection expressions, not a lambda HOF
    # (higher-order lambdas evaluate interpreted: 4.3x at the 10x probe)
    sw_hits = sum(
        (F.size(ws) - F.size(F.array_remove(ws, w)))
        for w in ("the", "a", "of", "and", "to", "in", "is")
    )
    logit = (F.lit(10) * sw_hits.cast("long") - F.size(ws).cast("long")).cast("long")
    return docs.select(
        "doc_id",
        logit.alias("logit"),
        F.when(logit > 0, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("kept"),
    )


# --- DSIR-style importance weighting ----------------------------------------

# char-feature bucket of a bigram: portable across engines (no engine hash
# function is shared between Spark and DuckDB, so the feature hash is plain
# arithmetic over code points — weaker mixing than xxhash, same shape)
_BUCKET_SQL = (
    "((length(gram) * 31 + ascii(substr(gram, 1, 1)) * 17"
    " + ascii(substr(gram, length(gram), 1)) * 7) % 64)"
)

_DSIR_ORACLE = f"""
WITH g AS (
  SELECT doc_id, source,
         unnest(CASE WHEN len(ws) >= 2
                     THEN list_transform(generate_series(1, len(ws) - 1),
                                         i -> ws[i] || ' ' || ws[i + 1])
                     ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents)
),
b AS (SELECT doc_id, source, {_BUCKET_SQL} AS bucket FROM g),
raw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rc FROM b GROUP BY bucket),
rtot AS (SELECT CAST(count(*) AS BIGINT) AS rt FROM b),
tgt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS tc FROM b
        WHERE source = 'src1' GROUP BY bucket),
ttot AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM b WHERE source = 'src1'),
ratio AS (
  SELECT raw.bucket,
         CAST(floor(1000000.0
              * ((CAST(COALESCE(tc, 0) + 1 AS DOUBLE) / (tt + 64))
                 / (CAST(rc + 1 AS DOUBLE) / (rt + 64)))) AS BIGINT) AS rq
  FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN rtot CROSS JOIN ttot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(rq) AS BIGINT) AS importance,
       CAST(CASE WHEN sum(rq) > count(*) * 1000000 THEN 1 ELSE 0 END AS BIGINT)
         AS kept
FROM b JOIN ratio USING (bucket)
GROUP BY doc_id
"""


@register("dsir_importance", _DSIR_ORACLE)
def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): hashed-bigram bucket
    distributions for a target domain (source = src1) vs the raw corpus;
    each document scores the sum of its buckets' add-one-smoothed
    likelihood ratios, kept when the mean ratio exceeds 1. The per-bucket
    ratio is floor-quantized *before* the per-doc sum (integer sum ⇒
    order-independent); the real pipeline's log-ratio sum is replaced by
    the ratio sum — same selection pressure, engine-exact.

    Scale shape: the bucket tables are ≤ 64 rows — broadcast joined back
    to the exploded gram stream, which then aggregates per document with
    map-side combine. The corpus is never shuffled on text; the only wide
    exchange keys on doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    # source rides through the explode (no corpus-wide re-join on doc_id)
    grams = cu.explode_ngrams_carry(
        docs.select("doc_id", "source", "text"), "doc_id", "text", 2, ["source"]
    )
    bucket = (
        F.length("gram") * 31
        + F.ascii(F.substring("gram", 1, 1)) * 17
        + F.ascii(F.expr("substr(gram, length(gram), 1)")) * 7
    ) % 64
    # five consumers (raw/rtot/tgt/ttot + the per-doc agg) read this frame;
    # Spark has no cross-branch common-subplan reuse, so persist or the
    # scan+explode re-runs per consumer (same class as the 16.5x e2e case)
    b = grams.select(
        "doc_id", "source", bucket.cast("long").alias("bucket")
    ).persist()
    raw = b.groupBy("bucket").agg(F.count("*").cast("long").alias("rc"))
    rtot = b.agg(F.count("*").cast("long").alias("rt"))
    tgt = (
        b.filter(F.col("source") == "src1")
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("tc"))
    )
    ttot = b.filter(F.col("source") == "src1").agg(
        F.count("*").cast("long").alias("tt")
    )
    rq = F.floor(
        F.lit(1000000.0)
        * (
            ((F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double") / (F.col("tt") + 64))
            / ((F.col("rc") + 1).cast("double") / (F.col("rt") + 64))
        )
    ).cast("long")
    ratio = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ttot))
        .select("bucket", rq.alias("rq"))
    )
    return (
        b.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("rq").cast("long").alias("importance"),
        )
        .select(
            "doc_id",
            "n_grams",
            "importance",
            F.when(
                F.col("importance") > F.col("n_grams") * 1000000, F.lit(1)
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("kept"),
        )
    )


# --- deterministic training-shard assignment --------------------------------

_SHARDS_ORACLE = """
WITH h AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ((doc_id % 2147483648) * 2654435761) % 4294967296 AS hs
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens, hs % 8 AS shard,
         row_number() OVER (PARTITION BY hs % 8 ORDER BY hs, doc_id) AS rn,
         count(*) OVER (PARTITION BY hs % 8) AS n
  FROM h
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(max(n) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS first_doc,
       CAST(max(CASE WHEN rn = n THEN doc_id END) AS BIGINT) AS last_doc
FROM r
GROUP BY shard
"""


@register("training_shards", _SHARDS_ORACLE)
def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards: every document
    is assigned shard = knuth(doc_id) mod 8 and a within-shard position by
    (hash, doc_id) — the reproducible corpus permutation a training run
    uses for epoch ordering (no rand(): re-running the pipeline yields
    byte-identical shards). Output is the per-shard manifest (count, token
    budget, first/last doc in shard order).

    Scale shape: in production this is exactly
    ``df.repartitionByRange/repartition(N, shard).sortWithinPartitions``
    followed by a parquet write — one shuffle keyed on the 8-byte hash.
    Here the manifest reduces each shard with a window + aggregate; the
    window partitions by shard (parallel across shards), never a global
    sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
        F.pmod(F.pmod(F.col("doc_id"), F.lit(1 << 31)) * F.lit(2654435761), F.lit(1 << 32)).alias("hs"),
    )
    w = Window.partitionBy(F.pmod("hs", F.lit(8))).orderBy("hs", "doc_id")
    r = h.select(
        "doc_id",
        "n_tokens",
        F.pmod("hs", F.lit(8)).cast("long").alias("shard"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(
            Window.partitionBy(F.pmod("hs", F.lit(8)))
        ).alias("n"),
    )
    return r.groupBy("shard").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).cast("long").alias("first_doc"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("doc_id")))
        .cast("long")
        .alias("last_doc"),
    )


# --- triangle counting on the co-purchase graph -----------------------------

_TRI_ORACLE = """
WITH e AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1
  JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                  AND l1.l_partkey < l2.l_partkey
  JOIN orders o ON l1.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority = '1-URGENT'
)
SELECT CAST((SELECT count(DISTINCT x) FROM
              (SELECT a AS x FROM e UNION ALL SELECT b FROM e)) AS BIGINT)
         AS n_nodes,
       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT count(*)
             FROM e e1 JOIN e e2 ON e1.b = e2.a
                       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS BIGINT)
         AS n_triangles
"""


@register("copurchase_triangles", _TRI_ORACLE)
def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the co-purchase graph (parts appearing in the
    same urgent order), plus node/edge counts — the clustering-coefficient
    numerator used to characterize near-dup/citation graphs. Edges are
    canonical a < b pairs, so each triangle a < b < c is counted exactly
    once by the wedge join (a,b)+(b,c) closed by (a,c).

    Scale shape: the order self-join is bounded — TPC-H orders have ≤ 7
    lineitems, so edge instances are ≤ 21 per order (linear in orders, not
    quadratic in lineitem). The wedge join keys on the shared middle node;
    the canonical orientation (every edge points low→high) is the standard
    degree-bound trick that keeps per-node wedge fan-out to the
    out-degree, and the closing check is a join on the (a, c) edge key.
    AQE handles any hot-part skew in the wedge exchange.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li_u = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_partkey"
    )
    l1 = li_u.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    l2 = li_u.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    e = (
        l1.join(l2, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    e.persist()
    n_nodes = (
        e.select(F.col("a").alias("x"))
        .unionAll(e.select(F.col("b").alias("x")))
        .agg(F.countDistinct("x").cast("long").alias("n_nodes"))
    )
    n_edges = e.agg(F.count("*").cast("long").alias("n_edges"))
    wedges = e.select(F.col("a"), F.col("b").alias("m")).join(
        e.select(F.col("a").alias("m"), F.col("b").alias("c")), "m"
    )
    tri = wedges.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    ).agg(F.count("*").cast("long").alias("n_triangles"))
    return n_nodes.crossJoin(n_edges).crossJoin(tri)


# --- composed selection pipeline -------------------------------------------

_SELECTION_ORACLE = f"""
WITH kept AS (
  SELECT doc_id, source, text FROM documents
  WHERE 10 * len(list_filter(string_split(text, ' '),
                             w -> list_contains({_EN_SW_SQL}, w)))
        - len(string_split(text, ' ')) > 0
),
ded AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text),
surv AS (SELECT k.doc_id, k.source, k.text FROM kept k JOIN ded USING (doc_id)),
g AS (
  SELECT doc_id, source,
         unnest(CASE WHEN len(ws) >= 2
                     THEN list_transform(generate_series(1, len(ws) - 1),
                                         i -> ws[i] || ' ' || ws[i + 1])
                     ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM (SELECT doc_id, source, string_split(text, ' ') AS ws FROM surv)
),
b AS (SELECT doc_id, source, {_BUCKET_SQL} AS bucket FROM g),
raw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rc FROM b GROUP BY bucket),
rtot AS (SELECT CAST(count(*) AS BIGINT) AS rt FROM b),
tgt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS tc FROM b
        WHERE source = 'src1' GROUP BY bucket),
ttot AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM b WHERE source = 'src1'),
ratio AS (
  SELECT raw.bucket,
         CAST(floor(1000000.0
              * ((CAST(COALESCE(tc, 0) + 1 AS DOUBLE) / (tt + 64))
                 / (CAST(rc + 1 AS DOUBLE) / (rt + 64)))) AS BIGINT) AS rq
  FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN rtot CROSS JOIN ttot
),
imp AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(rq) AS BIGINT) AS importance
  FROM b JOIN ratio USING (bucket)
  GROUP BY doc_id
),
final AS (SELECT doc_id FROM imp WHERE importance > n_grams * 1000000),
h AS (
  SELECT s.doc_id,
         CAST(len(string_split(s.text, ' ')) AS BIGINT) AS n_tokens,
         ((s.doc_id % 2147483648) * 2654435761) % 4294967296 AS hs
  FROM surv s JOIN final USING (doc_id)
),
r AS (
  SELECT doc_id, n_tokens, hs % 8 AS shard,
         row_number() OVER (PARTITION BY hs % 8 ORDER BY hs, doc_id) AS rn,
         count(*) OVER (PARTITION BY hs % 8) AS n
  FROM h
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(max(n) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS first_doc,
       CAST(max(CASE WHEN rn = n THEN doc_id END) AS BIGINT) AS last_doc
FROM r
GROUP BY shard
"""


@register("selection_pipeline_e2e", _SELECTION_ORACLE)
def q_selection_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed data-selection pipeline, end to end in ONE Spark plan:
    quality-logit gate → exact dedup (min-id survivor per byte-identical
    text) → DSIR importance selection (ratios re-estimated on the deduped
    survivors, the order a real pipeline uses) → deterministic shard
    manifest of the final corpus. The output contract is the 8-row shard
    manifest a training run consumes; docs with < 2 words carry no bigram
    evidence and drop at the DSIR stage on both engines.

    Scale shape: the stage composition adds no new shuffle classes — the
    gate is a pushable expression, dedup is one text-keyed aggregate
    (production: digest-keyed), DSIR re-broadcasts a ≤64-row ratio table,
    and the manifest windows by shard. Catalyst fuses the gate into the
    scans of every downstream branch; lineage stays a DAG with the
    survivor frame feeding both the ratio estimate and the final join,
    which AQE reuses as a shuffle stage rather than recomputing the scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ", -1)
    sw_hits = sum(
        (F.size(ws) - F.size(F.array_remove(ws, w)))
        for w in ("the", "a", "of", "and", "to", "in", "is")
    )
    kept = docs.filter(
        F.lit(10) * sw_hits.cast("long") - F.size(ws).cast("long") > 0
    ).select("doc_id", "source", "text")
    ded = kept.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    # the survivor frame feeds the gram explode, the target/raw moment
    # aggregates, and the final manifest join — persist it once or every
    # branch re-runs the full-corpus gate scan (measured 16.5x at the 10x
    # probe without this, 42 s of which was ~12 re-scans of the gate)
    surv = kept.join(ded, "doc_id").persist()
    grams = cu.explode_ngrams_carry(surv, "doc_id", "text", 2, ["source"])
    bucket = (
        F.length("gram") * 31
        + F.ascii(F.substring("gram", 1, 1)) * 17
        + F.ascii(F.expr("substr(gram, length(gram), 1)")) * 7
    ) % 64
    b = grams.select(
        "doc_id", "source", bucket.cast("long").alias("bucket")
    ).persist()
    raw = b.groupBy("bucket").agg(F.count("*").cast("long").alias("rc"))
    rtot = b.agg(F.count("*").cast("long").alias("rt"))
    tgt = (
        b.filter(F.col("source") == "src1")
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("tc"))
    )
    ttot = b.filter(F.col("source") == "src1").agg(
        F.count("*").cast("long").alias("tt")
    )
    rq = F.floor(
        F.lit(1000000.0)
        * (
            ((F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double") / (F.col("tt") + 64))
            / ((F.col("rc") + 1).cast("double") / (F.col("rt") + 64))
        )
    ).cast("long")
    ratio = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ttot))
        .select("bucket", rq.alias("rq"))
    )
    imp = (
        b.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("rq").cast("long").alias("importance"),
        )
    )
    final = imp.filter(F.col("importance") > F.col("n_grams") * 1000000).select(
        "doc_id"
    )
    h = surv.join(final, "doc_id").select(
        "doc_id",
        F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
        F.pmod(F.pmod(F.col("doc_id"), F.lit(1 << 31)) * F.lit(2654435761), F.lit(1 << 32)).alias("hs"),
    )
    w = Window.partitionBy(F.pmod("hs", F.lit(8))).orderBy("hs", "doc_id")
    r = h.select(
        "doc_id",
        "n_tokens",
        F.pmod("hs", F.lit(8)).cast("long").alias("shard"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(F.pmod("hs", F.lit(8)))).alias("n"),
    )
    return r.groupBy("shard").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).cast("long").alias("first_doc"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("doc_id")))
        .cast("long")
        .alias("last_doc"),
    )


# --- hybrid retrieval: BM25 candidates re-ranked by embedding cosine --------


def _hybrid_oracle() -> str:
    from .similarity_queries import _dot

    return f"""
WITH cands AS (FROM ({_BM25_ORACLE})),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
it AS (SELECT c.doc_id, c.score, e.v
       FROM cands c LEFT JOIN e ON e.vec_id = c.doc_id),
s AS (
  SELECT doc_id, score,
         CASE WHEN v IS NULL OR q IS NULL THEN NULL
              ELSE {_dot('q', 'v')}
                   / (sqrt({_dot('q', 'q')}) * sqrt({_dot('v', 'v')})) END
           AS sim
  FROM it LEFT JOIN qv ON TRUE
)
SELECT doc_id, score AS bm25_score, round(sim, 6) AS sim,
       CAST(row_number() OVER (ORDER BY sim DESC NULLS LAST, doc_id) AS BIGINT)
         AS rerank
FROM s
"""


@register("hybrid_retrieval_rerank", _hybrid_oracle())
def q_hybrid_retrieval_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search, the modern RAG retrieval shape: the lexical leg
    (BM25 top-10) proposes candidates, the dense leg re-ranks them by
    cosine against a fixed query embedding (vec_id 0) — all under the
    exact gate because both legs are deterministic and the dot products
    are strict left folds on both engines.

    Scale shape: the candidate set is k rows by construction, so the
    re-rank stage — embedding join, broadcast 1-row query vector, cosine,
    rank window — touches k rows regardless of corpus size; the only
    corpus-scale work is the already-audited BM25 leg. The rank window's
    input is the k-row frame, so its single partition is the point, not a
    bottleneck.
    """
    from ..operators.similarity import _as_double, dot_strict_udf

    cands = q_bm25_retrieval(spark, sf_dir).select("doc_id", "score")
    emb = load_table(spark, sf_dir, "embeddings")
    pd_dot = dot_strict_udf()
    qv = (
        emb.filter(F.col("vec_id") == 0)
        .select(_as_double(F.col("embedding")).alias("qv"))
        .withColumn("qn", F.sqrt(pd_dot(F.col("qv"), F.col("qv"))))
    )
    # LEFT join both legs: lexical-only candidates (no dense vector) stay
    # in the result, and a MISSING QUERY VECTOR degrades every candidate
    # to lexical-only instead of emptying the result (join on TRUE keeps
    # the items rows when qv is empty — same on both engines). Persist the
    # k-row frame: both union branches consume it, and without the persist
    # the candidates-join-embeddings subtree executes twice.
    items = (
        cands.join(
            emb.select("vec_id", _as_double(F.col("embedding")).alias("iv")),
            cands.doc_id == F.col("vec_id"),
            "left",
        )
        .join(F.broadcast(qv), F.lit(True), "left")
        .persist()
    )
    # the Arrow dot UDF must only see non-null vectors (conditional
    # expressions don't gate vectorized UDF evaluation) — score the
    # embedded leg, union the vector-less leg back with a NULL sim
    has_vecs = F.col("iv").isNotNull() & F.col("qv").isNotNull()
    dense = (
        items.filter(has_vecs)
        .withColumn("inorm", F.sqrt(pd_dot(F.col("iv"), F.col("iv"))))
        .select(
            "doc_id",
            "score",
            (pd_dot(F.col("qv"), F.col("iv")) / (F.col("qn") * F.col("inorm"))).alias(
                "sim"
            ),
        )
    )
    lexical_only = items.filter(~has_vecs).select(
        "doc_id", "score", F.lit(None).cast("double").alias("sim")
    )
    scored = dense.unionByName(lexical_only)
    w = Window.orderBy(F.col("sim").desc_nulls_last(), "doc_id")
    return scored.select(
        "doc_id",
        F.col("score").alias("bm25_score"),
        F.round("sim", 6).alias("sim"),
        F.row_number().over(w).cast("long").alias("rerank"),
    )


# --- perceptron distillation of the quality gate (round 6, late) -------------

#: Full-batch rounds. Round 1's update set is every row (all margins are
#: 0 at w = 0); n_miss then collapses to the linear model's residual
#: disagreement with the nonlinear teacher — the convergence readout.
_PERC_ROUNDS = 3

#: Teacher threshold: documents with quality_score >= this are the
#: positive class. 0.62 splits the synthetic corpus non-degenerately
#: (the production gate's 0.45 keeps everything at these SFs).
_PERC_TH = 0.62

#: Feature scaling: ratios quantized to integers so the whole training
#: loop is exact int64 on both engines.
_PERC_BIAS = 1000


def _perceptron_oracle() -> str:
    from ..operators import text_analysis as ta

    all_sw = ta.all_stopwords_sql()
    quality = ta.quality_score_sql()
    names = ("w_bias", "w_cpw", "w_sw", "w_alpha")
    xs = ("x0", "x1", "x2", "x3")
    dot = lambda cte: " + ".join(f"{cte}.{n} * {x}" for n, x in zip(names, xs))
    sums = ", ".join(
        f"CAST(sum(y * {x}) AS BIGINT) AS {n}" for n, x in zip(names, xs)
    )
    parts = [
        f"""raw AS (
      SELECT CASE WHEN ({quality}) >= {_PERC_TH} THEN 1 ELSE -1 END AS y,
             CAST(length(text) AS BIGINT) AS nc,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> list_contains({all_sw}, w)))
                  AS BIGINT) AS sw,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                  AS BIGINT) AS al
      FROM documents
    ),
    feats AS (
      SELECT y,
             CAST({_PERC_BIAS} AS BIGINT) AS x0,
             ((nc - (nw - 1)) * 100) // nw AS x1,
             (sw * 1000) // nw AS x2,
             CASE WHEN nc = 0 THEN 0 ELSE (al * 100) // nc END AS x3
      FROM raw
    ),
    r1 AS (
      SELECT CAST(count(*) AS BIGINT) AS n_miss, {sums} FROM feats
    )"""
    ]
    for r in range(2, _PERC_ROUNDS + 1):
        upd = ", ".join(
            f"r{r - 1}.{n} + COALESCE((SELECT CAST(sum(y * {x}) AS BIGINT)"
            f" FROM m{r}), 0) AS {n}"
            for n, x in zip(names, xs)
        )
        parts.append(
            f"""m{r} AS (
      SELECT f.* FROM feats f, r{r - 1}
      WHERE y * ({dot(f"r{r - 1}")}) <= 0
    ),
    r{r} AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM m{r}) AS n_miss, {upd}
      FROM r{r - 1}
    )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, n_miss, {', '.join(names)} FROM r{r}"
        for r in range(1, _PERC_ROUNDS + 1)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + selects


@register("perceptron_train", _perceptron_oracle())
def q_perceptron_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distill the nonlinear quality gate into a fast linear router by
    full-batch perceptron training — the TRAINING half of a
    fastText-style filter whose fixed-weight inference half is
    ``quality_logit_filter``. The teacher label is the production
    quality score (``operators/text_analysis.quality_score``) gated at
    {th}; the student sees three integer ratio features (chars-per-word
    x100, stopwords-per-1000-words, alpha-percent — the same ratios the
    teacher combines nonlinearly) plus a scaled bias. Each round adds
    Σ y·x over currently-misclassified rows to the weight vector;
    everything is int64, so an *iterative training loop* sits under the
    exact hash gate (the ``embedding_kmeans`` / ``bpe_train_merges``
    discipline). Emitted: (round, n_miss before the update, weights
    after it) — n_miss collapses from |corpus| (round 1, all margins 0)
    to the linear model's small residual disagreement with the teacher,
    then plateaus: the convergence evidence AND the honest statement of
    what a linear student can and cannot express.

    Scale shape: the feature frame is one scan-stage projection
    (persisted: |docs| x 5 ints, never text); each round is ONE
    partial-combined all-reduce aggregate over it, with the previous
    round's 1-row weight frame broadcast onto the features. Rounds are a
    small fixed constant; the driver never sees per-row data. At 100 TB
    this is the textbook data-parallel full-batch update.
    """
    from ..operators import text_analysis as ta

    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    words = F.split(text, " ", -1)
    sw_arr = F.array(
        *[F.lit(w) for ws in ta.LANG_STOPWORDS.values() for w in ws]
    )
    nc = F.length(text).cast("long")
    nw = F.size(words).cast("long")
    sw = F.size(F.filter(words, lambda w: F.array_contains(sw_arr, w))).cast(
        "long"
    )
    al = F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).cast("long")

    from ..functions.intmath import exact_floordiv as fdiv

    y = (
        F.when(ta.quality_score(text) >= F.lit(_PERC_TH), 1)
        .otherwise(-1)
        .cast("long")
    )
    names = ("w_bias", "w_cpw", "w_sw", "w_alpha")
    xs = ("x0", "x1", "x2", "x3")
    feats = docs.select(
        y.alias("y"),
        F.lit(_PERC_BIAS).cast("long").alias("x0"),
        fdiv((nc - (nw - 1)) * 100, nw).alias("x1"),
        fdiv(sw * 1000, nw).alias("x2"),
        F.when(nc == 0, F.lit(0).cast("long"))
        .otherwise(fdiv(al * 100, nc))
        .alias("x3"),
    ).persist()

    r = feats.agg(
        F.count("*").cast("long").alias("n_miss"),
        *[
            F.coalesce(F.sum(F.col("y") * F.col(x)), F.lit(0))
            .cast("long")
            .alias(n)
            for n, x in zip(names, xs)
        ],
    )
    rounds = [r]
    for _ in range(2, _PERC_ROUNDS + 1):
        prior = rounds[-1].select(*names)
        margin = None
        for n, x in zip(names, xs):
            term = F.col(n) * F.col(x)
            margin = term if margin is None else margin + term
        miss = feats.crossJoin(F.broadcast(prior)).where(
            F.col("y") * margin <= 0
        )
        delta = miss.agg(
            F.count("*").cast("long").alias("n_miss"),
            *[
                F.coalesce(F.sum(F.col("y") * F.col(x)), F.lit(0))
                .cast("long")
                .alias(f"d_{n}")
                for n, x in zip(names, xs)
            ],
        )
        nxt = prior.crossJoin(F.broadcast(delta)).select(
            F.col("n_miss"),
            *[
                (F.col(n) + F.col(f"d_{n}")).cast("long").alias(n)
                for n in names
            ],
        )
        rounds.append(nxt)
    out = None
    for i, rr in enumerate(rounds, start=1):
        sel = rr.select(
            F.lit(i).cast("long").alias("round"), "n_miss", *names
        )
        out = sel if out is None else out.unionByName(sel)
    return out


q_perceptron_train.__doc__ = q_perceptron_train.__doc__.format(th=_PERC_TH)


# --- k-core peeling on the co-purchase graph (round 6, late) ------------------

#: Core order and peeling rounds. k = 8 produces genuine multi-round
#: dynamics on this graph (removals cascade: 107 -> 3 -> 1 at sf0.01);
#: three rounds reach the fixpoint at every SF tested, and the round
#: table makes convergence itself the oracle-checked output.
_KCORE_K = 8
_KCORE_ROUNDS = 3

_KCORE_EDGES_SQL = """
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1
  JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                  AND l1.l_partkey < l2.l_partkey
  JOIN orders o ON l1.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority = '1-URGENT'
"""


def _kcore_oracle() -> str:
    parts = [f"e0 AS ({_KCORE_EDGES_SQL})"]
    selects = []
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(f"""d{r} AS (
      SELECT x, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT a AS x FROM e{r - 1} UNION ALL SELECT b FROM e{r - 1})
      GROUP BY x
    ),
    bad{r} AS (SELECT x FROM d{r} WHERE c < {_KCORE_K}),
    e{r} AS (
      SELECT * FROM e{r - 1}
      WHERE a NOT IN (SELECT x FROM bad{r})
        AND b NOT IN (SELECT x FROM bad{r})
    )""")
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS round,"
            f" (SELECT CAST(count(*) AS BIGINT) FROM bad{r}) AS n_removed,"
            f" (SELECT CAST(count(DISTINCT x) AS BIGINT) FROM"
            f"   (SELECT a AS x FROM e{r} UNION ALL SELECT b FROM e{r}))"
            f"   AS n_nodes,"
            f" (SELECT CAST(count(*) AS BIGINT) FROM e{r}) AS n_edges"
        )
    return "WITH " + ",\n    ".join(parts) + "\n    " + " UNION ALL ".join(selects)


@register("kcore_peeling", _kcore_oracle())
def q_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition by iterative degree peeling on the
    co-purchase graph (k = {k}): each round drops every node with degree
    < k and the edges touching it, and removals CASCADE — a pruned
    neighbor can push a surviving node under the threshold next round —
    so this is a monotone fixpoint loop, a different iterative primitive
    from label propagation (dedup_clusters), power iteration
    (dedup_graph_pagerank), and wedge closure (copurchase_triangles).
    The emitted table is one row per round (nodes removed, nodes/edges
    surviving): convergence dynamics under the exact hash gate, with the
    oracle unrolling the loop as CTE stages. The k-core is the standard
    dense-subgraph seed (community mining, spam/boilerplate cluster
    detection over near-dup graphs).

    Scale shape: per round ONE degree aggregate (map-side combined over
    the endpoint stream) and two anti-joins against the broadcast-sized
    removal set — the removal set, not the graph, is what moves between
    rounds (at k-core scale the bad set shrinks geometrically; round
    edges persist so each round reads the previous round's frame, not
    the lineage). Rounds are a fixed small constant; the monotonicity of
    peeling makes the 3-round table a certificate of the fixpoint when
    the last round removes 0."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    l1 = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b")
    )
    # eager localCheckpoint per stage (the dedup_graph_pagerank
    # discipline): each round's frame materializes ONCE and later rounds
    # read blocks, not lineage — without it the three per-round
    # aggregates each re-derive the edge-build self-join (measured 60 s
    # -> ~6 s at sf0.01)
    edges = (
        l1.join(l2, "ok")
        .where(F.col("a") < F.col("b"))
        .join(urgent, l1["ok"] == urgent["o_orderkey"], "left_semi")
        .select("a", "b")
        .distinct()
        .localCheckpoint()
    )
    rows = []
    cur = edges
    for r in range(1, _KCORE_ROUNDS + 1):
        nodes = cur.select(F.col("a").alias("x")).unionAll(
            cur.select(F.col("b").alias("x"))
        )
        deg = nodes.groupBy("x").agg(F.count("*").cast("long").alias("c"))
        bad = deg.where(F.col("c") < _KCORE_K).select("x").localCheckpoint()
        nxt = (
            cur.join(
                F.broadcast(bad), cur["a"] == bad["x"], "left_anti"
            )
            .join(F.broadcast(bad), F.col("b") == bad["x"], "left_anti")
            .localCheckpoint()
        )
        n_removed = bad.agg(F.count("*").cast("long").alias("n_removed"))
        n_nodes = (
            nxt.select(F.col("a").alias("x"))
            .unionAll(nxt.select(F.col("b").alias("x")))
            .agg(F.countDistinct("x").cast("long").alias("n_nodes"))
        )
        n_edges = nxt.agg(F.count("*").cast("long").alias("n_edges"))
        rows.append(
            n_removed.crossJoin(F.broadcast(n_nodes))
            .crossJoin(F.broadcast(n_edges))
            .select(
                F.lit(r).cast("long").alias("round"),
                "n_removed",
                "n_nodes",
                "n_edges",
            )
        )
        cur = nxt
    out = rows[0]
    for rr in rows[1:]:
        out = out.unionByName(rr)
    return out


q_kcore_peeling.__doc__ = q_kcore_peeling.__doc__.format(k=_KCORE_K)
