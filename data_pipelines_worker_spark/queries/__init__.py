"""Query catalog: every implemented operator gets a (spark_fn, oracle_sql)
pair here. ``__spark_entry__.queries()`` / ``oracle_sql()`` are built from
this registry; tests iterate it too.

``spark_fn(spark, sf_dir) -> DataFrame``; ``oracle_sql`` is ANSI SQL DuckDB
runs over the same parquet (views: region nation customer supplier part
orders lineitem events documents embeddings), or ``None`` for ops that are
not SQL-expressible (driver then records a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

#: name -> (spark_fn, oracle_sql | None)
REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, tuple[SparkQuery, str | None]]:
    """Import every query module (side-effect: fills REGISTRY)."""
    from . import dataflow_queries  # noqa: F401
    from . import relational_queries  # noqa: F401
    from . import dedup_queries  # noqa: F401
    from . import similarity_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import pipeline_queries  # noqa: F401
    from . import media_queries  # noqa: F401
    from . import scale_queries  # noqa: F401
    from . import curation_queries  # noqa: F401
    from . import tpch_queries  # noqa: F401
    from . import probe_queries  # noqa: F401
    from . import sketch_queries  # noqa: F401
    from . import retrieval_queries  # noqa: F401
    from . import profiling_queries  # noqa: F401
    from . import warehouse_queries  # noqa: F401
    from . import matching_queries  # noqa: F401
    from . import planner_queries  # noqa: F401  (must follow its kernels)

    return REGISTRY
