"""Unit + oracle tests for the corpus-curation operator family
(operators/curation.py, queries/curation_queries.py) and the round-3
TPC-H-shaped relational queries (queries/tpch_queries.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from data_pipelines_worker_spark.operators import curation as cu
from data_pipelines_worker_spark.session import TABLES
from tools.check_oracle import value_hash


# --- operator-level unit tests ---------------------------------------------


def test_pii_redact_all_kinds(spark):
    df = spark.createDataFrame(
        [
            ("reach me at bob.smith+x@corp.example.org thanks",),
            ("call 555-0123-4567 or visit 192.168.0.1 now",),
            ("no pii here",),
            ("two mails a@b.io c@d.co one ip 10.0.0.255",),
        ],
        "t string",
    )
    out = df.select(
        cu.pii_redact(F.col("t")).alias("red"), *[c.alias(n) for n, c in cu.pii_counts(F.col("t")).items()]
    ).collect()
    assert out[0].red == "reach me at <EMAIL> thanks"
    assert (out[0].n_email, out[0].n_phone, out[0].n_ip) == (1, 0, 0)
    assert out[1].red == "call <PHONE> or visit <IP> now"
    assert out[2].red == "no pii here"
    assert (out[3].n_email, out[3].n_ip) == (2, 1)
    assert out[3].red == "two mails <EMAIL> <EMAIL> one ip <IP>"


def test_ngrams_and_top_count(spark):
    df = spark.createDataFrame([(["a", "b", "a", "b", "a"],), (["x"],)], "ws array<string>")
    out = df.select(
        cu.ngrams(F.col("ws"), 2).alias("g2"),
        cu.top_count(F.col("ws")).alias("top"),
    ).collect()
    assert out[0].g2 == ["a b", "b a", "a b", "b a"]
    assert out[0].top == 3
    # single token: no 2-grams (guarded against Spark's descending sequence)
    assert out[1].g2 == []
    assert out[1].top == 1


def test_repetition_profile_values(spark):
    df = spark.createDataFrame([("the cat the cat sat",)], "text string")
    prof = cu.repetition_profile(F.split(F.col("text"), " ", -1))
    row = df.select(*[c.alias(n) for n, c in prof.items()]).collect()[0]
    assert row.n_words == 5
    assert row.n_distinct_words == 3
    assert row.top_word_n == 2
    assert row.n_2grams == 4
    # "the cat" appears twice
    assert row.n_distinct_2grams == 3
    assert row.top_2gram_n == 2


def test_chunking_covers_every_char(spark):
    df = spark.createDataFrame([("x" * 473,)], "text string")
    rows = df.select(
        F.explode(cu.chunk_starts(F.col("text"))).alias("s"), F.col("text")
    ).select(
        F.col("s"), F.length(cu.chunk_at(F.col("text"), F.col("s"))).alias("n")
    ).collect()
    starts = sorted(r.s for r in rows)
    assert starts == [0, 150, 300, 450]
    total_cover = max(r.s + r.n for r in rows)
    assert total_cover == 473
    # overlap: every chunk except the last is full-size
    assert sorted(r.n for r in rows)[-1] == cu.CHUNK_SIZE


def test_pack_id_monotone(spark):
    df = spark.createDataFrame([(0,), (511,), (512,), (1024,)], "c long")
    out = [r[0] for r in df.select(cu.pack_id(F.col("c"))).collect()]
    assert out == [0, 0, 1, 2]


# --- oracle parity for a fast subset of the new queries --------------------

NEW_FAST = [
    "pii_redact",
    "sequence_packing",
    "doc_chunking",
    "q4_order_priority",
    "q13_customer_distribution",
    "q17_small_qty_revenue",
]


@pytest.mark.parametrize("name", NEW_FAST)
def test_new_query_matches_duckdb(spark, sf_dir, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sdf = qs[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(oracles[name])
    drows = rel.fetchall()
    assert len(srows) == len(drows)
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert value_hash(srows, sdf.columns) == value_hash(drows, rel.columns)


def test_greedy_packing_respects_budget(spark, sf_dir):
    # property: no pack exceeds the budget unless it is a single over-
    # budget document; docs stay whole and consecutive within a stream
    from data_pipelines_worker_spark.operators.curation import (
        PACK_BUDGET,
        sequence_packing_greedy,
    )
    from data_pipelines_worker_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    packed = sequence_packing_greedy(docs)
    agg = (
        packed.groupBy("stream", "pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("n"))
        .collect()
    )
    assert agg
    for r in agg:
        assert r.tot <= PACK_BUDGET or r.n == 1, (r.stream, r.pack_id, r.tot, r.n)


def test_top_p_selection_budget_and_top1(spark, sf_dir):
    from data_pipelines_worker_spark.queries.curation_queries import q_top_p_selection

    out = q_top_p_selection(spark, sf_dir)
    rows = out.collect()
    assert rows, "selection must be non-empty"
    # per source: ranks are 1..n_selected contiguous, budget respected
    # except possibly the always-kept rank-1 row
    import collections

    by_src = collections.defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert rs[0].rank == 1  # top-1 always kept
        # cum_tokens strictly increasing with rank
        cums = [r.cum_tokens for r in rs]
        assert cums == sorted(cums)
        # quality non-increasing with rank
        qs = [r.quality for r in rs]
        assert all(a >= b for a, b in zip(qs, qs[1:]))
