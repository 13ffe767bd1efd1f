"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the reference's canonical pipeline
spine: scan → JSONPath fan-out → scalar transform → ordered gather →
join_strings) on sf0.001.

``queries()`` / ``oracle_sql()`` — built from the package's query registry
(data_pipelines_worker_spark/queries/*): one entry per implemented operator
from SURVEY.md §2, plus the beyond-reference scale operators (dedup,
similarity search, text analysis).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipelines_worker_spark.queries import load_all

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: explode → wrap_text → gather → join_strings over the
    documents table (the yt-short pipeline spine, SURVEY §7 M1)."""
    registry = load_all()
    fn, _ = registry["gather_join_strings"]
    return fn(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle
        for name, (_fn, oracle) in load_all().items()
        if oracle is not None
    }
