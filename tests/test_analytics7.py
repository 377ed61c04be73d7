"""Planted-ground-truth tests for the analytics7 operators.

- Neyman: three strata with hand-computable SDs (one zero-variance)
  give the exact largest-remainder allocation 333/0/667.
- walk-forward: on real data, every fold's train rows must sit
  strictly beyond the embargo gap from the fold's first test day,
  and the purged band must be exactly the gap.
- conformal: a planted calibration set with residuals 1..9 cents
  makes q̂ the 9th smallest (⌈0.9·10⌉); the test period covers
  exactly the residuals ≤ q̂.
- WOE/IV: a label independent of price (alternating) makes every
  decile's WOE exactly 0 and IV exactly 0.
- DP ledger: the Laplace noise is reproduced bit-for-bit from the
  md5 inverse-CDF in pure Python.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os
import shutil
import tempfile

import pytest

from filemapreduce_spark.queries import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _write_events(spark, rows, d=None):
    d = d or tempfile.mkdtemp(prefix="fmr_a7_ev_")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def test_neyman_exact_largest_remainder(spark, registry):
    """Strata A {0,2}, B {0,0}, C {0,4}: weights 1/3, 0, 2/3 →
    largest-remainder allocation 333/0/667 (sums to exactly 1000)."""
    rows = [
        (0, dt.datetime(2024, 1, 2), 1, "A", 0.0, "{}"),
        (1, dt.datetime(2024, 1, 2), 1, "A", 2.0, "{}"),
        (2, dt.datetime(2024, 1, 2), 1, "B", 0.0, "{}"),
        (3, dt.datetime(2024, 1, 2), 1, "B", 0.0, "{}"),
        (4, dt.datetime(2024, 1, 2), 1, "C", 0.0, "{}"),
        (5, dt.datetime(2024, 1, 2), 1, "C", 4.0, "{}"),
    ]
    d = _write_events(spark, rows)
    try:
        out = {
            r.event_type: r
            for r in registry["neyman_allocation_by_type"]
            .fn(spark, d)
            .collect()
        }
        assert out["A"].n_alloc == 333
        assert out["B"].n_alloc == 0
        assert out["C"].n_alloc == 667
        assert sum(r.n_alloc for r in out.values()) == 1000
        assert out["B"].sd_milli == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_walkforward_embargo_invariants(spark, registry):
    """On the shipped sf0.001 data: per fold, train min_gap_check
    must exceed the 2-day embargo, purged bands span exactly the
    embargo days, and roles never overlap day ranges."""
    out = registry["walkforward_purged_folds"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    byfold = {}
    for r in out:
        byfold.setdefault(r.fold, {})[r.role] = r
    assert set(byfold) == {1, 2, 3}
    for fold, roles in byfold.items():
        assert {"train", "test", "purged"} <= set(roles)
        assert roles["train"].min_gap_check > 2
        assert roles["purged"].n_days == 2
        assert roles["train"].last_day < roles["purged"].first_day
        assert roles["purged"].last_day < roles["test"].first_day
    # expanding window: later folds have strictly more train days
    tr = [byfold[k]["train"].n_days for k in (1, 2, 3)]
    assert tr[0] < tr[1] < tr[2]


def test_conformal_planted_qhat_and_coverage(spark, registry):
    """Train: constant 10.00 (mean 1000 cents). Calibration: 9
    residuals 1..9 cents → q̂ = 9 (the ⌈0.9·10⌉-th smallest). Test:
    residuals {5, 20} → coverage exactly 500‰."""
    rows = []
    i = 0
    for k in range(5):  # train period, constant value
        rows.append((i, dt.datetime(2024, 1, 2 + k), 1, "click",
                     10.0, "{}"))
        i += 1
    for k in range(1, 10):  # calibration: residual k cents
        rows.append((i, dt.datetime(2024, 1, 12), 1, "click",
                     10.0 + k / 100.0, "{}"))
        i += 1
    rows.append((i, dt.datetime(2024, 1, 22), 1, "click", 10.05, "{}"))
    rows.append((i + 1, dt.datetime(2024, 1, 23), 1, "click",
                 10.20, "{}"))
    d = _write_events(spark, rows)
    try:
        r = registry["conformal_interval_coverage"].fn(spark, d).collect()
        assert len(r) == 1
        row = r[0]
        assert row.n_cal == 9
        assert row.q_hat_cents == 9
        assert row.n_test == 2
        assert row.coverage_milli == 500
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_woe_iv_independent_label_zero(spark, registry):
    """100 orders, price = rank, status F on alternating ids: every
    decile holds 5 pos / 5 neg → identical smoothed shares → WOE and
    IV terms exactly 0 in every bin."""
    d = tempfile.mkdtemp(prefix="fmr_a7_orders_")
    try:
        rows = [
            (i, 100.0 + i, "F" if i % 2 == 0 else "O",
             dt.date(2024, 1, 1))
            for i in range(100)
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_totalprice double, o_orderstatus string,"
            " o_orderdate date",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "orders.parquet")
        )
        out = registry["woe_iv_price_deciles"].fn(spark, d).collect()
        assert len(out) == 10
        for r in out:
            assert r.n == 10 and r.n_pos == 5
            assert r.woe_micro == 0
            assert r.iv_term_micro == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dp_noise_reproduced_in_python(spark, registry):
    """The Laplace draw is pure inverse-CDF over an md5 uniform —
    reproduce n_noisy_milli exactly in Python for every type on the
    shipped sf0.001 data."""
    out = registry["dp_noisy_counts_ledger"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) > 0
    for r in out:
        u = (
            int(hashlib.md5(f"dp:{r.event_type}".encode()).hexdigest()[:8],
                16)
            / 4294967296.0
        )
        lap = -(1.0) * (1.0 if u >= 0.5 else -1.0) * math.log(
            1.0 - 2.0 * abs(u - 0.5)
        )
        assert r.n_noisy_milli == round(1000.0 * (r.n_true + lap))
        assert r.eps_spent_milli == 1000
