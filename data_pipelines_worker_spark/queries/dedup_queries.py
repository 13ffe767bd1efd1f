"""Correctness queries for the dedup operator family."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from ..session import load_table
from . import register

#: Reusable CTE prefix (also the base of the cluster oracle in
#: scale_queries.py): exact 3-gram Jaccard pairs at threshold 0.6 as ``jp``.
JACCARD_CTES = """
    d AS (
      SELECT doc_id,
             list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                            for i in generate_series(1, len(words) - 2)]) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE len(words) >= 3
    ),
    inv AS (SELECT doc_id, unnest(sh) AS s FROM d),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jp AS (
      SELECT d1, d2, round(j, 6) AS jaccard FROM (
        SELECT d1, d2,
               common / (len(da.sh) + len(db.sh) - common) AS j
        FROM pairs JOIN d da ON da.doc_id = d1 JOIN d db ON db.doc_id = d2
      ) WHERE j >= 0.6
    )
"""

_JACCARD_ORACLE = f"WITH {JACCARD_CTES} SELECT d1, d2, jaccard FROM jp"

#: Scale variant (VERDICT r4 #4) — mirrors dedup.jaccard_pairs(df_cap="auto")
#: clause by clause: exact-collapse byte-identical texts to a min-id
#: representative; drop shingles in > max(50, ceil(1% · n_uniq)) unique
#: texts from candidate generation; verify DISTINCT rep pairs against the
#: FULL shingle sets (list_intersect — J values stay exact); expand rep
#: pairs to member pairs (within-group pairs are identical texts, J = 1.0).
JACCARD_CTES_CAPPED = """
    grp AS (SELECT doc_id AS doc, md5(text) AS gid FROM documents),
    rep AS (SELECT gid, min(doc) AS rep FROM grp GROUP BY gid),
    d AS (
      SELECT doc_id,
             list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                            for i in generate_series(1, len(words) - 2)]) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE len(words) >= 3
        AND doc_id IN (SELECT rep FROM rep)
    ),
    inv AS (SELECT doc_id, unnest(sh) AS s FROM d),
    cap AS (
      SELECT greatest(50, CAST(ceil(0.01 * count(*)) AS BIGINT)) AS v FROM d
    ),
    hot AS (
      SELECT s FROM inv GROUP BY s HAVING count(*) > (SELECT v FROM cap)
    ),
    invc AS (SELECT doc_id, s FROM inv WHERE s NOT IN (SELECT s FROM hot)),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM invc a JOIN invc b ON a.s = b.s AND a.doc_id < b.doc_id
    ),
    rp AS (
      SELECT d1 AS r1, d2 AS r2, round(j, 6) AS jaccard FROM (
        SELECT d1, d2,
               len(list_intersect(da.sh, db.sh))
                 / (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))) AS j
        FROM cand JOIN d da ON da.doc_id = d1 JOIN d db ON db.doc_id = d2
      ) WHERE j >= 0.6
    ),
    members AS (SELECT g.doc, r.rep FROM grp g JOIN rep r ON r.gid = g.gid),
    jp AS (
      SELECT least(ma.doc, mb.doc) AS d1, greatest(ma.doc, mb.doc) AS d2,
             rp.jaccard
      FROM rp JOIN members ma ON ma.rep = rp.r1
              JOIN members mb ON mb.rep = rp.r2
      UNION ALL
      SELECT wa.doc AS d1, wb.doc AS d2, 1.0 AS jaccard
      FROM members wa JOIN members wb
        ON wa.rep = wb.rep AND wa.doc < wb.doc
      WHERE wa.rep IN (SELECT doc_id FROM d)
    )
"""

_JACCARD_ORACLE_CAPPED = (
    f"WITH {JACCARD_CTES_CAPPED} SELECT d1, d2, jaccard FROM jp"
)


@register(
    "dedup_exact",
    """
    SELECT event_id,
           min(event_id) OVER (PARTITION BY user_id || '|' || event_type) AS canonical_id,
           event_id != min(event_id) OVER (PARTITION BY user_id || '|' || event_type)
             AS is_duplicate
    FROM events
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content key (here (user_id, event_type) — the
    documents table has no planted byte-identical dups, events do)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "__key", F.concat(F.col("user_id").cast("string"), F.lit("|"), F.col("event_type"))
    )
    out = dedup.exact_dedup(ev, "event_id", "__key")
    return out.select("event_id", "canonical_id", "is_duplicate")


@register("dedup_ngram_jaccard", _JACCARD_ORACLE_CAPPED)
def q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs with the hot-shingle df-cap (VERDICT r4
    #4): candidate generation drops shingles in > max(50, 1% of docs)
    documents; verification still uses full shingle sets so reported
    Jaccard values are exact. Oracle mirrors the cap clause by clause."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(docs, "doc_id", "text", threshold=0.6, k=3, df_cap="auto")


@register("dedup_minhash_lsh", _JACCARD_ORACLE)
def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates + exact verify; oracle is the exact-Jaccard pair set
    (LSH miss probability at the planted J≈0.9 dups: ~1e-23)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.6, k=3)


def _simhash_oracle() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (code * {dedup.PLANE_A[i]} + {dedup.PLANE_B[i]}) % {dedup.MOD} % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS v{i}"
        for i in range(dedup.N_PLANES)
    )
    fp = " + ".join(f"CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(dedup.N_PLANES))
    return f"""
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM (
      SELECT doc_id, {votes}
      FROM (
        SELECT doc_id,
               CAST(ascii(w[1]) + length(w) AS BIGINT) AS code
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      ) GROUP BY doc_id
    )
    """


@register("dedup_simhash", _simhash_oracle())
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-shaped SimHash (explode → one codegen groupBy pass); the
    fold variant dedup.simhash16 computes identical values but runs 16
    interpreted higher-order folds per row (~10× slower at sf0.1)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash16_agg(docs, "doc_id", "text")


@register(
    "dedup_stats",
    """
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique,
           round(1.0 - count(DISTINCT md5(text)) / CAST(count(*) AS DOUBLE), 6)
             AS dup_rate
    FROM documents
    GROUP BY source
    """,
)
def q_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplication profile per source — the go/no-go number a
    training-data pipeline reports before dedup runs at full scale.

    The distinct side counts ``md5(text)``, not ``text``: countDistinct
    turns its argument into an expand-mode *grouping key*, so counting raw
    bodies would re-shuffle the entire scan at 100 TB (VERDICT r3 #4). The
    128-bit digest is a 32-char fixed-size key with no collision caveat at
    corpus scale, and both engines ship the same md5, so the oracle changes
    by one expression only."""
    docs = load_table(spark, sf_dir, "documents")
    digest = F.md5(F.col("text"))
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(digest).alias("n_unique"),
        F.round(
            1.0 - F.countDistinct(digest) / F.count("*").cast("double"), 6
        ).alias("dup_rate"),
    )


# --- sub-document dedup (round 4) ------------------------------------------

_BLOCK_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
b AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(ceil(len(ws) / 20.0) AS BIGINT) - 1))
           AS blk_idx,
         ws
  FROM t
),
b2 AS (
  SELECT doc_id, blk_idx,
         array_to_string(
           list_slice(ws, blk_idx * 20 + 1, least((blk_idx + 1) * 20, len(ws))),
           ' ') AS blk
  FROM b
),
r AS (
  SELECT doc_id, blk_idx, blk,
         row_number() OVER (PARTITION BY md5(blk) ORDER BY doc_id, blk_idx) AS rn
  FROM b2
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(coalesce(
         string_agg(CASE WHEN rn = 1 THEN blk END, ' ' ORDER BY blk_idx), ''))
         AS kept_fp
FROM r GROUP BY doc_id
"""


@register("chunk_dedup", _BLOCK_ORACLE)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style sub-document exact dedup at aligned 20-word blocks: a
    block survives only at its first corpus-wide occurrence (min (doc_id,
    blk_idx)); output is per-doc survival stats + an md5 fingerprint of
    the reassembled deduplicated text (the oracle checks reconstruction
    bytes without hauling text through the hash gate). See
    :func:`..operators.dedup.block_dedup_stats` for the shuffle story."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.block_dedup_stats(docs, "doc_id", "text", size=20)


_COVER_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, unnest(generate_series(1, len(ws) - 7)) AS pos, ws
  FROM t WHERE len(ws) >= 8
),
gd AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(ws, pos, pos + 7), ' ')) AS gdg
  FROM g
),
m AS (SELECT doc_id, count(*) OVER (PARTITION BY gdg) AS c FROM gd)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_pos,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         AS dup_frac
FROM m GROUP BY doc_id
"""


@register("dup_ngram_coverage", _COVER_ORACLE)
def q_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-text coverage (Lee et al. 2021): per document, the count
    and fraction of word 8-gram positions whose gram occurs more than once
    in the corpus — the exact-substring-dedup cut signal. Shuffle carries
    (doc_id, digest) pairs only; see
    :func:`..operators.dedup.dup_ngram_coverage`."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dup_ngram_coverage(docs, "doc_id", "text", n=8)


_SPAN_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, unnest(generate_series(1, len(ws) - 7)) AS pos, ws
  FROM t WHERE len(ws) >= 8
),
gd AS (
  SELECT doc_id, pos,
         md5(array_to_string(list_slice(ws, pos, pos + 7), ' ')) AS gdg
  FROM g
),
m AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY gdg) AS c FROM gd
  ) WHERE c > 1
),
sw AS (
  SELECT doc_id, pos,
         max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_end
  FROM m
),
rem AS (
  SELECT doc_id,
         sum(greatest(0, (pos + 8) - greatest(coalesce(prev_end, pos), pos)))
           AS n_dup_tokens
  FROM sw GROUP BY doc_id
),
tot AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM t WHERE len(ws) >= 8
)
SELECT tot.doc_id, tot.n_tokens,
       CAST(coalesce(rem.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
       CAST(tot.n_tokens - coalesce(rem.n_dup_tokens, 0) AS DOUBLE) / tot.n_tokens
         AS keep_frac
FROM tot LEFT JOIN rem USING (doc_id)
"""


@register("dup_span_removal", _SPAN_ORACLE)
def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring-dedup removal accounting (Lee et al. 2021, second
    half): tokens inside the union of corpus-duplicated 8-gram spans —
    what span-removal dedup would actually delete per document. The span
    union is a sorted-interval sweep as one window per doc; see
    :func:`..operators.dedup.dup_span_removal`."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dup_span_removal(docs, "doc_id", "text", n=8)


def _pagerank_oracle(n_iter: int = 3, damping_pct: int = 85) -> str:
    from ..operators.graph import PR_SCALE as scale

    # derived exactly as the operator derives them (graph.pagerank_int) —
    # re-hardcoding here would silently desync oracle and implementation
    base = (scale * (100 - damping_pct)) // 100
    damping = damping_pct / 100.0
    stages = [f"""
e AS (
  SELECT d1 AS s, d2 AS t FROM jp
  UNION ALL
  SELECT d2 AS s, d1 AS t FROM jp
),
dg AS (SELECT s AS node, count(*) AS deg FROM e GROUP BY s),
r0 AS (SELECT node, deg, CAST({scale} AS BIGINT) AS r FROM dg)"""]
    for i in range(1, n_iter + 1):
        stages.append(f"""
r{i} AS (
  SELECT dg.node, dg.deg,
         CAST({base} + floor({damping} * sum(
           CAST(floor(CAST(p.r AS DOUBLE) / p.deg) AS BIGINT)))
           AS BIGINT) AS r
  FROM e
  JOIN r{i - 1} p ON p.node = e.s
  JOIN dg ON dg.node = e.t
  GROUP BY dg.node, dg.deg
)""")
    return (
        "WITH " + JACCARD_CTES_CAPPED.rstrip() + "," + ",".join(stages)
        + f"\nSELECT node, deg, r AS rank_int FROM r{n_iter}"
    )


@register("dedup_graph_pagerank", _pagerank_oracle())
def q_dedup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of integer-quantized PageRank over the exact near-dup
    pair graph — authority-based canonical ranking within dup clusters,
    hash-verified like the other iterative operators (kmeans, BPE): all
    rank state in integer 1e-6 units, floor-quantized contributions and
    damped updates, identical on any engine/partitioning. The oracle
    unrolls the three rounds over the shared exact-Jaccard CTE prefix.
    See :func:`..operators.graph.pagerank_int`."""
    from ..operators import graph

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(docs, "doc_id", "text", threshold=0.6, k=3, df_cap="auto")
    return graph.pagerank_int(pairs, "d1", "d2", n_iter=3)


_INCR_ORACLE = """
WITH newd AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
idx AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
dn AS (
  SELECT doc_id,
         list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                        for i in generate_series(1, len(words) - 2)]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM newd)
  WHERE len(words) >= 3
),
dx AS (
  SELECT doc_id,
         list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                        for i in generate_series(1, len(words) - 2)]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM idx)
  WHERE len(words) >= 3
),
invn AS (SELECT doc_id AS nd, unnest(sh) AS s FROM dn),
invx AS (SELECT doc_id AS xd, unnest(sh) AS s FROM dx),
common AS (
  SELECT nd, xd, count(*) AS c FROM invn JOIN invx USING (s) GROUP BY nd, xd
),
scored AS (
  SELECT nd, xd,
         round(c / (len(a.sh) + len(b.sh) - c), 6) AS j
  FROM common JOIN dn a ON a.doc_id = nd JOIN dx b ON b.doc_id = xd
  WHERE c / (len(a.sh) + len(b.sh) - c) >= 0.6
),
best AS (
  SELECT nd, xd, j FROM (
    SELECT nd, xd, j,
           row_number() OVER (PARTITION BY nd ORDER BY j DESC, xd) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT n.doc_id,
       (md5(n.text) IN (SELECT md5(text) FROM idx)) AS exact_dup,
       CAST(best.xd AS BIGINT) AS best_match_id,
       best.j AS best_jaccard
FROM newd n LEFT JOIN best ON best.nd = n.doc_id
"""


@register("incremental_dedup", _INCR_ORACLE)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operational increment path: documents with doc_id % 10 = 0
    play the incoming batch, the rest the standing corpus; each new doc
    reports whether its digest already exists and its best near-dup
    index match (max J, ties to the smallest index id). Candidate work
    is NEW⋈INDEX on the inverted index — proportional to the increment,
    never index². See :func:`..operators.dedup.incremental_near_dup`."""
    docs = load_table(spark, sf_dir, "documents")
    new_df = docs.where(F.col("doc_id") % 10 == 0)
    idx_df = docs.where(F.col("doc_id") % 10 != 0)
    return dedup.incremental_near_dup(new_df, idx_df, "doc_id", "text")


#: Asymmetric-containment oracle — mirrors operators/dedup.py
#: containment_pairs clause by clause, all three scale layers: exact-
#: collapse byte-identical texts to a min-id representative; capped
#: inverted-index candidates over unique texts (same cap rule as the
#: Jaccard oracle), full-set verify, per-pair direction pick (container =
#: larger set, ties to smaller id), per-contained-rep argmax by
#: (containment desc, container asc); then the member lift — every
#: non-representative member is contained in its representative at
#: exactly 1.0 (byte-identical text), emitted only when the rep shingled.
_CONTAINMENT_ORACLE = """
WITH grp AS (SELECT doc_id AS doc, md5(text) AS gid FROM documents),
rep AS (SELECT gid, min(doc) AS rep FROM grp GROUP BY gid),
members AS (SELECT g.doc, r.rep FROM grp g JOIN rep r ON r.gid = g.gid),
d AS (
  SELECT doc_id,
         list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                        for i in generate_series(1, len(words) - 2)]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
  WHERE len(words) >= 3
    AND doc_id IN (SELECT rep FROM rep)
),
inv AS (SELECT doc_id, unnest(sh) AS s FROM d),
cap AS (
  SELECT greatest(50, CAST(ceil(0.01 * count(*)) AS BIGINT)) AS v FROM d
),
hot AS (SELECT s FROM inv GROUP BY s HAVING count(*) > (SELECT v FROM cap)),
invc AS (SELECT doc_id, s FROM inv WHERE s NOT IN (SELECT s FROM hot)),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM invc a JOIN invc b ON a.s = b.s AND a.doc_id < b.doc_id
),
v AS (
  SELECT d1, d2,
         len(list_intersect(da.sh, db.sh)) AS common,
         len(da.sh) AS n1, len(db.sh) AS n2
  FROM cand JOIN d da ON da.doc_id = d1 JOIN d db ON db.doc_id = d2
),
dirs AS (
  SELECT d2 AS doc_id, d1 AS container_id, common / CAST(n2 AS DOUBLE) AS c
  FROM v WHERE n1 >= n2
  UNION ALL
  SELECT d1, d2, common / CAST(n1 AS DOUBLE) FROM v WHERE n2 > n1
),
r AS (
  SELECT doc_id, container_id, c,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY c DESC, container_id ASC) AS rn
  FROM dirs WHERE c >= 0.8
)
SELECT doc_id, container_id, round(c, 6) AS containment FROM r WHERE rn = 1
UNION ALL
SELECT m.doc AS doc_id, m.rep AS container_id, 1.0 AS containment
FROM members m
WHERE m.doc != m.rep AND m.rep IN (SELECT doc_id FROM d)
"""


@register("containment_dedup", _CONTAINMENT_ORACLE)
def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment dedup (RefinedWeb-style): flag docs
    ≥80%-covered by a strictly larger (or equal-size, smaller-id) doc and
    point each at its best container. Catches short-inside-long
    duplication that symmetric Jaccard scores low. See
    :func:`..operators.dedup.containment_pairs`."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.containment_pairs(docs, "doc_id", "text", threshold=0.8, k=3)


_NOVELTY_ORACLE = """
WITH d AS (
  SELECT doc_id,
         list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                        for i in generate_series(1, len(words) - 2)]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
  WHERE len(words) >= 3
),
inv AS (SELECT doc_id, unnest(sh) AS s FROM d),
first AS (SELECT s, min(doc_id) AS first_doc FROM inv GROUP BY s)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS novelty
FROM inv JOIN first USING (s)
GROUP BY doc_id
"""


@register("shingle_novelty", _NOVELTY_ORACLE)
def q_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc first-seen shingle novelty in crawl (id) order — recrawl
    and syndication router. See :func:`..operators.dedup.shingle_novelty`."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.shingle_novelty(docs, "doc_id", "text", k=3)
