"""Planted-ground-truth tests for the second analytics6 stretch:
Fellegi–Sunter linkage, hash-Poisson bootstrap CI, Cramér–von Mises.

- Fellegi–Sunter: a 4-customer block where exactly one record is
  corrupted on ALL THREE fields (key ≡ 0 mod 4, 5 and 7) must be the
  only missed match; cross pairs never clear the threshold (name
  disagreement dominates) → tp=3, fp=0, recall 750‰, precision 1000‰.
- bootstrap: constant daily revenue makes every replicate mean equal
  the point mean exactly → CI collapses to a point.
- CvM: identical samples score exactly 0; fully separated samples
  approach nm/(3(n+m)).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest

from filemapreduce_spark.queries import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_fellegi_sunter_planted_block(spark, registry):
    """Keys 0-3, one nation, one segment: key 0 is perturbed on name
    (0%4), balance (0%5) AND segment (0%7) → all-disagree score −7.4
    misses; keys 1-3 are untouched → exact-agree 10.15 matches.
    Cross pairs disagree on name and balance (same segment):
    −2.99 − 2.28 + 1.79 < 3 → zero false positives."""
    d = tempfile.mkdtemp(prefix="fmr_a6b_cust_")
    try:
        rows = [
            (k, f"Customer#{k:09d}", 0, 100.0 * (k + 1), "BUILDING")
            for k in range(4)
        ]
        spark.createDataFrame(
            rows,
            "c_custkey long, c_name string, c_nationkey long,"
            " c_acctbal double, c_mktsegment string",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "customer.parquet")
        )
        out = registry["fellegi_sunter_entity_match"].fn(spark, d).collect()
        assert len(out) == 1
        r = out[0]
        assert r.segment == "BUILDING"
        assert r.n_pairs == 16  # 4×4, one block
        assert r.tp == 3 and r.fp == 0
        assert r.n_declared == 3
        assert r.recall_milli == 750
        assert r.precision_milli == 1000
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bootstrap_ci_degenerate_point(spark, registry):
    """30 days of identical daily revenue: every Poisson-weighted
    replicate mean equals the point mean exactly, so the CI collapses
    to [mean, mean]."""
    d = tempfile.mkdtemp(prefix="fmr_a6b_orders_")
    try:
        rows = [
            (i, 7.77, dt.date(2024, 1, 1 + i)) for i in range(30)
        ]
        spark.createDataFrame(
            rows, "o_orderkey long, o_totalprice double, o_orderdate date"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "orders.parquet")
        )
        r = registry["bootstrap_ci_daily_revenue"].fn(spark, d).collect()[0]
        assert r.n_days == 30
        assert r.mean_cents == 777.0
        assert r.ci_lo_cents == 777.0
        assert r.ci_hi_cents == 777.0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_cvm_identical_zero_separated_large(spark, registry):
    """Type 'click' values identical to 'view' → T exactly 0; type
    'error' fully separated from 'view' → T ≈ nm/(3(n+m)) (for
    n=m=100: ≈16.6, so t_micro > 10M)."""
    d = tempfile.mkdtemp(prefix="fmr_a6b_events_")
    try:
        rows = []
        i = 0
        for v in range(100):  # view baseline: values 0..99
            rows.append((i, dt.datetime(2024, 1, 5), 1, "view",
                         float(v), "{}"))
            i += 1
        for v in range(100):  # click: identical distribution
            rows.append((i, dt.datetime(2024, 1, 6), 1, "click",
                         float(v), "{}"))
            i += 1
        for v in range(100):  # error: disjoint, shifted by +1000
            rows.append((i, dt.datetime(2024, 1, 7), 1, "error",
                         1000.0 + v, "{}"))
            i += 1
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        out = {
            r.pair: r.t_micro
            for r in registry["cramer_von_mises_vs_view"]
            .fn(spark, d)
            .collect()
        }
        assert out["click"] == 0
        assert out["error"] > 10_000_000
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_anova_hand_computed_f(spark, registry):
    """Two groups {0,2} and {4,6}: SSB=16, SSW=4, k=2, N=4 →
    F = (16/1)/(4/2) = 8 exactly (scale-invariant in cents)."""
    d = tempfile.mkdtemp(prefix="fmr_a6b_anova_")
    try:
        rows = [
            (0, dt.datetime(2024, 1, 2), 1, "click", 0.0, "{}"),
            (1, dt.datetime(2024, 1, 2), 1, "click", 2.0, "{}"),
            (2, dt.datetime(2024, 1, 2), 1, "view", 4.0, "{}"),
            (3, dt.datetime(2024, 1, 2), 1, "view", 6.0, "{}"),
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        r = registry["anova_f_value_by_type"].fn(spark, d).collect()[0]
        assert r.k == 2 and r.n == 4
        assert r.f_micro == 8_000_000
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_cohort_ltv_planted_curve(spark, registry):
    """Two users signed up Jan 1 2024 (a Monday → its own week
    cohort); purchases at ages 0 and 2 produce the exact cumulative
    and per-user LTV steps."""
    d = tempfile.mkdtemp(prefix="fmr_a6b_ltv_")
    try:
        rows = [
            (0, dt.datetime(2024, 1, 1, 8), 1, "signup", 0.0, "{}"),
            (1, dt.datetime(2024, 1, 1, 9), 2, "signup", 0.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 10), 1, "purchase", 10.0, "{}"),
            (3, dt.datetime(2024, 1, 3, 10), 1, "purchase", 5.0, "{}"),
            (4, dt.datetime(2024, 1, 3, 11), 2, "purchase", 20.0, "{}"),
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        out = registry["cohort_ltv_curve"].fn(spark, d).collect()
        got = [
            (r.cohort, r.age_day, r.n_users, r.cum_rev_cents,
             r.ltv_per_user_cents)
            for r in out
        ]
        assert got == [
            ("2024-01-01", 0, 2, 1000, 500),
            ("2024-01-01", 2, 2, 3500, 1750),
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)
