"""Planted-ground-truth tests for the llm12 / RMST batch.

- RMST: half the cohort converts on day 2 -> S = 1 for 2 days then
  0.5 to tau=90 -> RMST = 2 + 0.5*88 = 46 days exactly.
- P/R/F1: the kappa fixture's confusion matrix gives en
  precision 2/3, recall 1, F1 0.8; unpredicted classes surface with
  zero-guarded metrics.
- Burstiness: counts {4,1} over 3 docs give VMR = 26/15 exactly.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pytest

from filemapreduce_spark.queries import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, f"{name}.parquet"))


def test_rmst_half_convert_day2(spark, registry):
    """4 signups on Jan 1; users 0,1 purchase on Jan 3 (t=2 days);
    users 2,3 censored at the horizon. S = 1 on [0,2), 0.5 on
    [2,90] -> RMST(90) = 2 + 0.5*88 = 46 days."""
    s0 = dt.datetime(2024, 1, 1)
    p0 = dt.datetime(2024, 1, 3)
    rows, eid = [], 0
    for uid in range(4):
        rows.append((eid, s0, uid, "signup", 0.0, "{}")); eid += 1
    for uid in (0, 1):
        rows.append((eid, p0, uid, "purchase", 1.0, "{}")); eid += 1
    d = tempfile.mkdtemp(prefix="fmr_llm12_rmst_")
    _write(spark, d, "events", rows, _EV_SCHEMA)
    out = registry["rmst_signup_purchase"].fn(spark, d).collect()[0]
    assert out["tau_days"] == 90
    assert out["first_event_day"] == 2
    assert out["rmst_micro_days"] == 46_000_000


def test_langid_prf_hand_counted(spark, registry):
    """CM: (en,en)=2, (fr,en)=1, (de,und)=1 -> en: P=2/3 R=1 F1=0.8;
    fr/de: all-zero with guards; und: predicted-only, zeros."""
    docs = [
        (1, "the the the", "en", "s", 1),
        (2, "the of and", "en", "s", 1),
        (3, "the", "fr", "s", 1),
        (4, "xyz qqq", "de", "s", 1),
    ]
    d = tempfile.mkdtemp(prefix="fmr_llm12_prf_")
    _write(spark, d, "documents", docs, _DOC_SCHEMA)
    out = {
        r["class"]: r
        for r in registry["langid_precision_recall_f1"].fn(spark, d).collect()
    }
    assert set(out) == {"en", "fr", "de", "und"}
    en = out["en"]
    assert (en["tp"], en["fp"], en["fn"]) == (2, 1, 0)
    assert en["precision_milli"] == 667
    assert en["recall_milli"] == 1000
    assert en["f1_milli"] == 800
    assert out["fr"]["precision_milli"] == 0  # never predicted
    assert out["und"]["recall_milli"] == 0  # never true


def test_burstiness_exact(spark, registry):
    """'z z z z' / 'z' / 'q' over 3 docs: term z has counts {4,1,0}
    -> VMR = (17 - 25/3)/5 = 26/15; term q -> (1 - 1/3)/1 = 2/3."""
    docs = [
        (1, "z z z z", "en", "s", 1),
        (2, "z", "en", "s", 1),
        (3, "q", "en", "s", 1),
    ]
    d = tempfile.mkdtemp(prefix="fmr_llm12_burst_")
    _write(spark, d, "documents", docs, _DOC_SCHEMA)
    out = {
        r["term"]: r
        for r in registry["term_burstiness_top20"].fn(spark, d).collect()
    }
    assert (out["z"]["total_c"], out["z"]["df"]) == (5, 2)
    assert out["z"]["vmr_milli"] == round(1000 * 26 / 15)  # 1733
    assert out["q"]["vmr_milli"] == round(1000 * 2 / 3)  # 667
