"""Round-6 query family: entity resolution, fuzzy decontamination, EWMA,
CUBE profile, KMV set-intersection sketches — semantic properties plus the
plan shapes that matter at scale (the oracle gate pins exact values; these
tests pin *why* the answers are right and how they execute)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipelines_worker_spark.queries import load_all
from data_pipelines_worker_spark.session import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def q(registry, name, spark):
    fn, _ = registry[name]
    return fn(spark, SF)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestEntityResolution:
    def test_every_dirty_record_relinks_to_its_master(self, spark, registry):
        # transposition keeps the 16-char block prefix, so blocking has
        # perfect recall here and the true master is always distance <= 2
        rows = q(registry, "entity_resolution", spark).collect()
        n_dirty = (
            load_table(spark, SF, "customer")
            .filter(F.col("c_custkey") % 10 == 7)
            .count()
        )
        assert len(rows) == n_dirty > 0
        assert all(r.is_correct == 1 for r in rows)
        assert all(r.dist <= 2 for r in rows)

    def test_plan_blocked_equi_join_no_cartesian(self, spark, registry):
        plan = plan_of(q(registry, "entity_resolution", spark))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # rank-1 best-match keeps one candidate per key per partition
        # before the final exchange
        assert "WindowGroupLimit" in plan


class TestDecontaminateMinhash:
    def test_match_perms_bounded_and_self_excluded(self, spark, registry):
        rows = q(registry, "decontaminate_minhash", spark).collect()
        assert rows, "corpus side must be non-empty"
        assert all(0 <= r.max_match_perms <= 64 for r in rows)
        assert all(r.doc_id % 97 != 0 for r in rows)
        assert all(
            r.contaminated == (1 if r.max_match_perms >= 32 else 0) for r in rows
        )

    def test_plan_benchmark_side_is_broadcast(self, spark, registry):
        # the deliberate BNLJ: inner side is the broadcast-sized benchmark
        # (a band pre-filter would break the exact >=32-of-64 contract)
        plan = plan_of(q(registry, "decontaminate_minhash", spark))
        assert "BroadcastNestedLoopJoin" in plan
        assert "CartesianProduct" not in plan


class TestEwmaEvents:
    def test_fold_matches_reference_recursion(self, spark, registry):
        rows = {r.user_id: r for r in q(registry, "ewma_events", spark).collect()}
        ev = (
            load_table(spark, SF, "events")
            .select("user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "value")
            .collect()
        )
        by_user: dict[int, list] = {}
        for r in ev:
            by_user.setdefault(r.user_id, []).append((r.ts_us, r.event_id, r.value))
        uid, seq = next(iter(sorted(by_user.items())))
        acc = 0.0
        for _, _, v in sorted(seq):
            acc = acc * 0.5 + v * 0.5
        import math

        assert rows[uid].ewma_bits == math.floor(acc * 34359738368)
        assert rows[uid].n_events == len(seq)

    def test_one_shuffle_no_python(self, spark, registry):
        plan = plan_of(q(registry, "ewma_events", spark))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # one key-hashed exchange feeds the fold (AQE may add a final
        # coalesce read, but only one hashpartitioning exchange exists)
        assert plan.count("Exchange hashpartitioning") == 1


class TestCubeSegmentMetrics:
    def test_lattice_levels_consistent(self, spark, registry):
        rows = q(registry, "cube_segment_metrics", spark).collect()
        total = [r for r in rows if r.gid == 3]
        assert len(total) == 1
        n_orders = load_table(spark, SF, "orders").count()
        assert total[0].n_orders == n_orders
        # each rollup level re-partitions the same order set
        for gid in (0, 1, 2):
            assert sum(r.n_orders for r in rows if r.gid == gid) == n_orders
        # cents are additive across the lattice
        assert sum(r.total_cents for r in rows if r.gid == 0) == total[0].total_cents

    def test_plan_expand_single_scan_broadcast_dim(self, spark, registry):
        plan = plan_of(q(registry, "cube_segment_metrics", spark))
        assert "Expand" in plan
        assert "BroadcastHashJoin" in plan
        assert plan.count("Scan parquet") == 2  # orders + customer, once each


class TestKmvSetIntersection:
    def test_sketch_estimates_track_exact(self, spark, registry):
        rows = q(registry, "kmv_set_intersection", spark).collect()
        assert len(rows) == 10  # C(5,2) event-type pairs
        ev = load_table(spark, SF, "events").select(
            "event_type",
            (
                F.col("user_id") * 100000
                + F.expr("unix_micros(ts) div 86400000000")
            ).alias("e"),
        )
        exact = {
            r.event_type: r.n
            for r in ev.distinct()
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for r in rows:
            # KMV rsd ~ 1/sqrt(k-1) ~ 9 %; allow 4 sigma plus integer slack
            for t, est in ((r.t1, r.est_card_1), (r.t2, r.est_card_2)):
                assert abs(est - exact[t]) <= max(0.4 * exact[t], 8), (t, est, exact[t])
            assert r.rho <= 128
            assert r.est_intersection <= r.est_union + 1

    def test_plan_rank_pushdown(self, spark, registry):
        plan = plan_of(q(registry, "kmv_set_intersection", spark))
        # per-type top-k must keep k rows per partition pre-shuffle
        assert "WindowGroupLimit" in plan
        assert "CartesianProduct" not in plan
