"""Invariant tests for the warehouse-maintenance family (the oracle gate
checks value equality; these pin the *semantic contracts* that make the
operators correct by construction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_worker_spark.queries import load_all

SF = "/root/testdata/sf0.001"


def _q(name, spark, sf=SF):
    fn, _ = load_all()[name]
    return fn(spark, sf)


def test_latest_snapshot_one_row_per_user(spark):
    from data_pipelines_worker_spark.session import load_table

    snap = _q("latest_snapshot", spark)
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert snap.count() == n_users
    assert snap.groupBy("user_id").count().filter("count > 1").count() == 0


def test_scd2_version_counts(spark):
    scd = _q("scd2_customer_merge", spark)
    per_key = scd.groupBy("c_custkey").agg(
        F.count("*").alias("n"),
        F.sum("is_current").alias("n_current"),
        F.max("version").alias("maxv"),
    )
    # every key has exactly one current version; updated keys (custkey
    # ≡ 3 mod 10) have 2 versions, others 1
    assert per_key.filter("n_current != 1").count() == 0
    assert per_key.filter(
        "(c_custkey % 10 = 3 AND n != 2) OR (c_custkey % 10 != 3 AND n != 1)"
    ).count() == 0


def test_salted_join_matches_plain_join(spark):
    from data_pipelines_worker_spark.session import load_table

    salted = {
        r.event_type: (r.n_events, r.n_matched, r.matched_value_cents)
        for r in _q("skew_salted_join", spark).collect()
    }
    ev = load_table(spark, SF, "events")
    cust = load_table(spark, SF, "customer").select("c_custkey")
    plain = (
        ev.join(cust, ev.user_id == cust.c_custkey, "left")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("c_custkey").isNotNull(), 1).otherwise(0)).alias(
                "n_matched"
            ),
            F.sum(
                F.when(
                    F.col("c_custkey").isNotNull(),
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
                ).otherwise(0)
            ).alias("mvc"),
        )
    )
    for r in plain.collect():
        assert salted[r.event_type] == (r.n_events, r.n_matched, r.mvc)


def test_backlog_balances_to_zero(spark):
    # every order with lineitems opens once and closes once, so the final
    # cumulative open count must return to zero
    rows = sorted(
        _q("order_backlog_timeline", spark).collect(),
        key=lambda r: r.month_idx,
    )
    assert rows[-1].open_orders == 0
    # and the timeline is the running sum of its own net changes
    run = 0
    for r in rows:
        run += r.net_change
        assert r.open_orders == run
        assert run >= 0  # can never have negative open orders


def test_char_coverage_total_is_million_ppm(spark):
    rows = sorted(_q("char_coverage", spark).collect(), key=lambda r: r.rank)
    assert rows[-1].cum_ppm == 1000000
    # ranks are dense 1..n and cumulative counts are monotone
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(
        rows[i].cum_ppm <= rows[i + 1].cum_ppm for i in range(len(rows) - 1)
    )


def test_corpus_snapshot_diff_partitions_and_reconstructs(spark):
    # the four statuses partition the union of both versions, and the
    # labeled deltas reconstruct the set-algebra of the two snapshots
    rows = _q("corpus_snapshot_diff", spark).collect()
    by = {}
    for r in rows:
        by.setdefault(r.status, set()).add(r.doc_id)
    assert set(by) <= {"added", "removed", "changed", "unchanged"}
    # a doc appears exactly once
    assert sum(len(s) for s in by.values()) == len(rows)
    # added rows have no old fingerprint; removed rows have no new one
    for r in rows:
        if r.status == "added":
            assert r.fp_old is None and r.fp_new is not None
        elif r.status == "removed":
            assert r.fp_new is None and r.fp_old is not None
        elif r.status == "changed":
            assert r.fp_old is not None and r.fp_new != r.fp_old
        else:
            assert r.fp_new == r.fp_old
    # the %7==2 rewrite slice is labeled changed wherever both versions
    # carry the doc; %11==3 (absent from v1) is added, %13==5 removed
    for r in rows:
        if r.doc_id % 11 == 3:
            assert r.status == "added"
        elif r.doc_id % 13 == 5:
            assert r.status == "removed"
        elif r.doc_id % 7 == 2:
            assert r.status == "changed"
        else:
            assert r.status == "unchanged"


def test_zorder_key_matches_python_morton(spark):
    """The Spark interleave and a pure-Python Morton encode agree on a
    grid of values, and the SQL twin is generated from the same loop."""
    import duckdb

    from data_pipelines_worker_spark.operators.zonemap import (
        zorder_key,
        zorder_key_sql,
    )

    def morton(x, y, bits=10):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pairs = [(x, y) for x in (0, 1, 5, 150, 1023) for y in (0, 2, 77, 1023)]
    df = spark.createDataFrame(pairs, "x long, y long").select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), 10).alias("z")
    )
    for row in df.collect():
        assert row.z == morton(row.x, row.y), (row.x, row.y)
    con = duckdb.connect()
    for x, y in pairs:
        (got,) = con.execute(
            f"SELECT {zorder_key_sql(str(x), str(y), 10)}"
        ).fetchone()
        assert got == morton(x, y), (x, y)


def test_zorder_layout_invariants(spark):
    """Both layouts cover every row exactly once, select the same row
    set, and scanned rows always contain the selected rows (no false
    skips — the envelope test is conservative by construction)."""
    rows = {r.layout: r for r in _q("zorder_layout", spark).collect()}
    assert set(rows) == {"natural", "zorder"}
    nat, zo = rows["natural"], rows["zorder"]
    assert nat.rows_total == zo.rows_total
    assert nat.rows_selected == zo.rows_selected
    for r in (nat, zo):
        assert r.rows_scanned >= r.rows_selected
        assert r.files_scanned <= r.n_files
    # the whole point: z-order scans no more than natural for a 2-D box
    assert zo.rows_scanned <= nat.rows_scanned


def test_bloom_zone_skipping_contracts(spark):
    """Bloom never false-negatives (truth ⊆ bloom-scanned ⊆ minmax-
    scanned), the absent key is fully skipped, and present keys show the
    point-lookup win: bloom scans no more zones than minmax."""
    rows = {r.probe_key: r for r in _q("bloom_zone_skipping", spark).collect()}
    assert 555555 in rows and rows[555555].zones_minmax == 0
    for r in rows.values():
        assert r.never_miss is True
        assert r.zones_truth <= r.zones_bloom <= r.zones_minmax <= r.n_zones


def test_bloom_zone_plan_is_two_aggregates_no_join(spark):
    df = _q("bloom_zone_skipping", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("FileScan parquet") == 1
