"""SparkSession factory and table loading.

Local test harness runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the same
configuration choices (AQE, sane shuffle partitions, Arrow) are what you'd
deploy on a 1000-executor cluster — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor (TPC-H
#: region/nation/supplier scale sub-linearly; at SF100k they are still MBs).
BROADCASTABLE = frozenset({"region", "nation", "supplier"})


def get_spark(app_name: str = "data_pipelines_worker_spark") -> SparkSession:
    """Build (or reuse) the SparkSession.

    - AQE on: runtime coalescing + skew-join mitigation matter at 100 TB.
    - ``spark.sql.shuffle.partitions`` ~ cores locally; AQE coalesces down
      anyway, and on a real cluster this would be set to ~2-3x total cores.
    - Arrow on: all pandas-UDF operators (media, LLM, ANN) batch via Arrow.
    - Session timezone pinned UTC so timestamp semantics match the DuckDB
      oracle used by correctness gates.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # A long-lived engine JVM compiles one generated class per codegen
        # stage; ~370 query executions put the default 240 MB code cache at
        # 68% (BENCH_LOCAL_r07 env side-channel: 162.8 MB used, profiled
        # segment at 72% — the UseCodeCacheFlushing threshold). Past it the
        # sweeper flushes warm methods and expression-heavy queries
        # (64-agg minhash signatures, higher-order folds) re-JIT or run
        # interpreted at 5-15x. 512 MB keeps steady-state compilation
        # unconditional; on a real cluster this is a spark-defaults knob.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def local_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Small control-plane frame as a LocalRelation (Arrow), never a
    parallelized Python RDD.

    ``createDataFrame(list)`` spreads the rows over
    ``defaultParallelism`` Python partitions; every downstream action then
    pays one Python-worker round-trip *per partition* (~150 ms each), so a
    3-row status write costs ~5 s under ``coalesce(1)``. Routing through
    pandas + Arrow yields a ``LocalTableScan`` — pure JVM, no Python
    workers — ~20× faster for the metadata/fan-out frames the pipeline
    runner creates. (Table-scale data never comes from Python lists.)
    """
    import pandas as pd
    from pyspark.sql.types import _parse_datatype_string

    # parse the DDL properly — naive string-splitting on ',' mis-splits
    # types that contain commas (decimal(10,2), map<string,int>, struct<>)
    names = [f.name for f in _parse_datatype_string(schema).fields]
    return spark.createDataFrame(pd.DataFrame(rows, columns=names), schema)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Parquet scan → pushdown + pruning free.

    Caller-owned sessions (the correctness driver builds its own plain
    SparkSession) won't carry our session configs, so the two that change
    query *semantics* are (re)applied dynamically here:

    - UTC session timezone — timestamp literals / to_date must bin the same
      as the (UTC-naive) DuckDB oracle;
    - ``nanosAsLong`` — some generations of the synthetic data write
      ``events.ts`` as TIMESTAMP(NANOS) parquet, which Spark's reader
      otherwise rejects; we read long nanos and truncate to microseconds,
      exactly what micro-precision engines (DuckDB included) do with nanos
      parquet. Micro-precision generations read as a timestamp directly and
      need no conversion — detect by the materialized type, not by fiat.

    Parquet TIMESTAMP-without-zone columns surface as TIMESTAMP_NTZ in Spark
    4; they are normalized to plain TimestampType here (identical instants
    under the pinned UTC session zone) so downstream epoch arithmetic
    (``cast(ts as bigint)``, window math) keeps working across data
    generations.
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views (for spark.sql)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
