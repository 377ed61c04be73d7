"""Planted-ground-truth tests for the analytics6 operators.

Beyond the DuckDB-oracle gate (Spark ≡ oracle on the shipped corpora),
assert the operators' THEORETICAL contracts on synthetic inputs:

- PSI: two periods with IDENTICAL binned distributions must score
  exactly 0 (the smoothed terms cancel term-by-term); a hard
  distribution shift must clear the conventional 0.2 action gate.
- changepoint: a planted level shift must be located exactly, with
  exact segment means.
- Nelson–Aalen: a 3-subject cohort with one censoring reproduces the
  hand-computed H(t) = Σ d/n and its variance Σ d/n².
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


def _write_events(spark, rows):
    """Write an events.parquet with the driver schema into a temp dir
    usable as an sf_dir. rows: (event_id, ts, user_id, event_type,
    value)."""
    d = tempfile.mkdtemp(prefix="fmr_a6_fixture_")
    df = spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for (i, ts, u, et, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def test_psi_identical_periods_zero(spark, registry):
    """Mirrored value distributions in baseline and current periods →
    every smoothed term cancels → psi_micro exactly 0."""
    rows = []
    i = 0
    for day in (1, 20):  # day 1 < split < day 20
        for v in range(100):  # identical 100-value set in each period
            rows.append(
                (i, dt.datetime(2024, 1, day, 12, 0, 0), 1, "click",
                 float(v))
            )
            i += 1
    d = _write_events(spark, rows)
    try:
        out = registry["psi_value_drift"].fn(spark, d).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_base == 100 and r.n_cur == 100
        assert r.psi_micro == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_psi_hard_shift_clears_action_gate(spark, registry):
    """Baseline uniform over [0,100), current uniform over [500,600)
    — total distribution displacement must far exceed the 0.2
    industry action threshold (psi_micro > 200_000)."""
    rows = []
    i = 0
    for v in range(100):
        rows.append((i, dt.datetime(2024, 1, 2), 1, "click", float(v)))
        i += 1
    for v in range(100):
        rows.append(
            (i, dt.datetime(2024, 1, 25), 1, "click", 500.0 + v)
        )
        i += 1
    d = _write_events(spark, rows)
    try:
        r = registry["psi_value_drift"].fn(spark, d).collect()[0]
        assert r.psi_micro > 200_000
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_changepoint_locates_planted_level_shift(spark, registry):
    """10 events/day on Jan 1-10, 30/day on Jan 11-20: the max-gain
    split must land exactly at Jan 11 with exact segment means."""
    rows = []
    i = 0
    for day in range(1, 21):
        per_day = 10 if day <= 10 else 30
        for k in range(per_day):
            rows.append(
                (i, dt.datetime(2024, 1, day, 8, 0, k % 60), 1,
                 "view", 1.0)
            )
            i += 1
    d = _write_events(spark, rows)
    try:
        r = registry["changepoint_sse_split"].fn(spark, d).collect()[0]
        assert r.split_date == "2024-01-11"
        assert r.n_days == 20
        assert r.mean_left_milli == 10_000
        assert r.mean_right_milli == 30_000
        # gain = sl²/k + sr²/(n−k) − s²/n
        #      = 100²/10 + 300²/10 − 400²/20 = 2000.0
        assert r.gain_micro == 2_000_000_000
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_nelson_aalen_hand_computed_cohort(spark, registry):
    """3 signups on Jan 1; purchases at t=1 and t=3 days; one subject
    censored at the Jan 31 horizon: H(1)=1/3, H(3)=1/3+1/2; variance
    1/9, 1/9+1/4 (6dp)."""
    rows = [
        (0, dt.datetime(2024, 1, 1), 10, "signup", 0.0),
        (1, dt.datetime(2024, 1, 1), 11, "signup", 0.0),
        (2, dt.datetime(2024, 1, 1), 12, "signup", 0.0),
        (3, dt.datetime(2024, 1, 2), 10, "purchase", 5.0),
        (4, dt.datetime(2024, 1, 4), 11, "purchase", 5.0),
    ]
    d = _write_events(spark, rows)
    try:
        out = registry["nelson_aalen_cumhaz"].fn(spark, d).collect()
        assert [(r.t_days, r.n_risk, r.d) for r in out] == [
            (1, 3, 1),
            (3, 2, 1),
        ]
        assert out[0].cumhaz == round(1 / 3, 6)
        assert out[1].cumhaz == round(1 / 3 + 1 / 2, 6)
        assert out[0].var_est == round(1 / 9, 6)
        assert out[1].var_est == round(1 / 9 + 1 / 4, 6)
    finally:
        shutil.rmtree(d, ignore_errors=True)
