"""Contract tests for the round-5 portable sketch operators
(queries/sketch_queries.py): the DuckDB oracle pins their integer
contents bit-exactly; these tests pin the *statistical contracts* the
hash gate deliberately leaves out (estimate quality, no false negatives,
rank bracketing, budget conservation)."""

from __future__ import annotations

import math

import pytest

from data_pipelines_worker_spark.queries import load_all

SF = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_hll_estimate_quality_both_regimes(spark, registry):
    from data_pipelines_worker_spark.queries.sketch_queries import HLL_M

    fn, _ = registry["hll_registers"]
    for sf, tol in ((SF, 0.25), (SF_MID, 0.25)):
        for r in fn(spark, sf).collect():
            if r.n_zero_regs > 0:
                # small-range regime: linear counting over the zero count
                est = HLL_M * math.log(HLL_M / r.n_zero_regs)
            else:
                est = r.hll_est
            assert abs(est - r.exact_users) <= tol * r.exact_users, (
                sf, r.event_type, est, r.exact_users
            )


def test_hll_registers_are_saturating_and_bounded(spark, registry):
    from data_pipelines_worker_spark.queries.sketch_queries import (
        HLL_M,
        HLL_WBITS,
    )

    fn, _ = registry["hll_registers"]
    small = {r.event_type: r for r in fn(spark, SF).collect()}
    big = {r.event_type: r for r in fn(spark, SF_MID).collect()}
    for et, s in small.items():
        b = big[et]
        assert 0 <= s.n_zero_regs <= HLL_M
        assert s.reg_max <= HLL_WBITS + 1
        # more distincts can only fill registers and raise maxima
        assert b.n_zero_regs <= s.n_zero_regs
        assert b.reg_sum >= s.reg_sum
        assert b.z_scaled <= s.z_scaled  # harmonic sum shrinks as regs grow


def test_bloom_never_false_negative_and_fp_bounded(spark, registry):
    fn, _ = registry["bloom_join_prune"]
    for sf in (SF, SF_MID):
        rows = fn(spark, sf).collect()
        assert rows
        for r in rows:
            # a Bloom filter admits supersets: every true match passes
            assert r.n_pass >= r.n_true
            assert r.n_false_pos == r.n_pass - r.n_true
            # sizing contract: 4096 bits / k=3 over ≤600 build keys keeps
            # the FP rate on non-members under ~5 %
            non_members = r.n_probe - r.n_true
            assert r.n_false_pos <= max(5, 0.05 * non_members)


def test_binned_quantiles_bracket_exact_ranks(spark, registry):
    import duckdb

    from data_pipelines_worker_spark.queries.sketch_queries import QBIN_WIDTH

    fn, _ = registry["approx_quantile_binned"]
    con = duckdb.connect()
    for sf in (SF, SF_MID):
        exact = {
            et: (p50, p95)
            for et, p50, p95 in con.execute(
                f"""SELECT event_type,
                           quantile_cont(value, 0.5), quantile_cont(value, 0.95)
                    FROM '{sf}/events.parquet' GROUP BY event_type"""
            ).fetchall()
        }
        for r in fn(spark, sf).collect():
            p50, p95 = exact[r.event_type]
            assert r.p50_bin <= r.p95_bin
            # the true quantile falls inside (or within one bin of) the
            # reported bin — equality at bin edges allows ±1
            assert r.p50_bin * QBIN_WIDTH <= p50 + QBIN_WIDTH
            assert (r.p50_bin + 1) * QBIN_WIDTH >= p50 - QBIN_WIDTH
            assert r.p95_bin * QBIN_WIDTH <= p95 + QBIN_WIDTH
            assert (r.p95_bin + 1) * QBIN_WIDTH >= p95 - QBIN_WIDTH


def test_mixture_temperature_flattens_toward_uniform(spark, registry):
    from data_pipelines_worker_spark.queries.sketch_queries import MIX_BUDGET

    fn, _ = registry["mixture_temperature"]
    for sf in (SF, SF_MID):
        rows = fn(spark, sf).collect()
        total_target = sum(r.n_target for r in rows)
        # integer quotas never overshoot the budget; floor loses < 1/source
        assert total_target <= MIX_BUDGET
        assert total_target >= MIX_BUDGET - len(rows)
        mean_docs = sum(r.n_docs for r in rows) / len(rows)
        for r in rows:
            # sqrt temperature moves every share toward uniform: sources
            # below the mean gain (or keep) share, sources above lose
            if r.n_docs < mean_docs:
                assert r.temp_ppm >= r.nat_ppm
            elif r.n_docs > mean_docs:
                assert r.temp_ppm <= r.nat_ppm
        # ordering is preserved: bigger source never gets a smaller quota
        by_docs = sorted(rows, key=lambda r: (r.n_docs, r.source))
        for a, b in zip(by_docs, by_docs[1:]):
            if a.n_docs < b.n_docs:
                assert a.quota_scaled <= b.quota_scaled


def test_minhash_estimator_within_binomial_error(spark, registry):
    fn, _ = registry["minhash_similarity_estimate"]
    for sf in (SF, SF_MID):
        rows = fn(spark, sf).collect()
        assert rows
        bad = 0
        for r in rows:
            j = r.exact_common / r.exact_union
            est = r.match_perms / 64
            # 3σ binomial: σ = sqrt(J(1-J)/64) ≤ 0.0625
            if abs(est - j) > 3 * math.sqrt(max(j * (1 - j), 0.004) / 64):
                bad += 1
        # ~99.7 % of pairs should sit inside 3σ; allow a small tail
        assert bad <= max(1, len(rows) // 50), f"{bad}/{len(rows)} outside 3σ"


def test_hll_rho_max_register_w_zero_keys(spark):
    # keys whose mixed hash is < 64 give w = hv div 64 = 0 ⇒ ρ = WBITS+1
    # = 26 — the maximal register. The harmonic term must stay a
    # POSITIVE integer (2^(ZBITS−26) = 1); with the old 2^WBITS scaling
    # the shift was −1, which Spark masks to shift 63 = Long.MIN_VALUE.
    import datetime

    from data_pipelines_worker_spark.queries.sketch_queries import (
        HLL_WBITS,
        HLL_ZBITS,
        _hll_mix_col,
    )
    from data_pipelines_worker_spark.streaming.sketches import windowed_hll
    from pyspark.sql import functions as F

    w_zero_keys = [14517781, 85368838, 117097010]  # brute-forced: mix(k) < 64
    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    ev = spark.createDataFrame(
        [(t0, "t", k) for k in w_zero_keys] + [(t0, "t", 12345)],
        "ts timestamp, event_type string, user_id bigint",
    )
    hv = [
        r[0]
        for r in ev.select(F.pmod(_hll_mix_col(F.col("user_id")), F.lit(1 << 31))).collect()
    ]
    assert sum(1 for h in hv if h < 64) == 3  # the planted w=0 keys
    row = windowed_hll(ev).collect()[0]
    assert row.z_scaled > 0
    assert row.hll_est >= 1
    # a w=0 register holds the maximal rho and contributes exactly 1
    assert row.reg_sum >= (HLL_WBITS + 1)
    assert row.z_scaled < 64 * (1 << HLL_ZBITS) + 1
