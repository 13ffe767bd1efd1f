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


_NEAR_DUP_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    n AS (SELECT vec_id, v, sqrt({_dot('v', 'v')}) AS nrm FROM e)
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round({_dot('a.v', 'b.v')} / (a.nrm * b.nrm), 6) AS sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_dot('a.v', 'b.v')} / (a.nrm * b.nrm) >= 0.4
"""


@register("embedding_near_dup", _NEAR_DUP_ORACLE)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(emb, threshold=0.4)


@register("ann_cosine_topk_lsh", None)  # approximate: rows-only check
def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return similarity.ann_topk_lsh(emb, queries, k=5)
