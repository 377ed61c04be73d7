"""Planted-ground-truth tests for the analytics13 batch.

- McNemar: 2 docs only the classifier gets right vs 1 only the
  baseline gets right -> chi2 = 1/3.
- Cohen's d: arms {1.00,3.00} vs {2.00,4.00} -> d = 100/sqrt(20000).
- Cliff's delta: arm1 {2.00,3.00} vs arm0 {1.00,2.00} -> gt=3,
  tie=1 -> delta = 0.75, via the midrank identity.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import tempfile

import pytest

from filemapreduce_spark.queries import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
_BASE = dt.datetime(2024, 1, 1)


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, f"{name}.parquet"))


def test_mcnemar_discordant_cells(spark, registry):
    """Two de docs only the classifier gets right (b=2), one
    marker-less en doc only the baseline gets right (c=1):
    chi2 = (2-1)^2/3 = 1/3."""
    docs = [
        (1, "der die das", "de", "s", 1),  # A: de (right), B: en (wrong)
        (2, "der und ein", "de", "s", 1),  # same -> b = 2
        (3, "xyz qqq", "en", "s", 1),  # A: und (wrong), B: en (right)
        (4, "the of and", "en", "s", 1),  # both right (concordant)
    ]
    d = tempfile.mkdtemp(prefix="fmr_a13_mcn_")
    _write(spark, d, "documents", docs, _DOC_SCHEMA)
    out = registry["mcnemar_langid_vs_baseline"].fn(spark, d).collect()[0]
    assert (out["n_docs"], out["a_correct"], out["b_correct"]) == (4, 3, 2)
    assert (out["a_only"], out["b_only"]) == (2, 1)
    assert out["chi2_milli"] == round(1000 / 3)  # 333


def test_cohens_d_exact(spark, registry):
    """Arm 0 (even users) {1.00, 3.00}, arm 1 (odd) {2.00, 4.00}:
    means 200/300 cents, pooled SS = 40000, df 2 -> s = sqrt(20000),
    d = 100/s."""
    rows = [
        (1, _BASE, 0, "purchase", 1.00, "{}"),
        (2, _BASE, 2, "purchase", 3.00, "{}"),
        (3, _BASE, 1, "purchase", 2.00, "{}"),
        (4, _BASE, 3, "purchase", 4.00, "{}"),
    ]
    d = tempfile.mkdtemp(prefix="fmr_a13_d_")
    _write(spark, d, "events", rows, _EV_SCHEMA)
    out = registry["cohens_d_arms"].fn(spark, d).collect()[0]
    assert (out["n0"], out["n1"]) == (2, 2)
    assert (out["mean0_milli"], out["mean1_milli"]) == (200000, 300000)
    assert out["d_micro"] == round(1e6 * 100 / math.sqrt(20000))


def test_cliffs_delta_midrank_identity(spark, registry):
    """Arm 1 {2.00, 3.00} vs arm 0 {1.00, 2.00}: gt=3, lt=0, tie=1
    over 4 pairs -> delta = 0.75; 2U1 = 13 - 6 = 7."""
    rows = [
        (1, _BASE, 0, "purchase", 1.00, "{}"),
        (2, _BASE, 2, "purchase", 2.00, "{}"),
        (3, _BASE, 1, "purchase", 2.00, "{}"),
        (4, _BASE, 3, "purchase", 3.00, "{}"),
    ]
    d = tempfile.mkdtemp(prefix="fmr_a13_cd_")
    _write(spark, d, "events", rows, _EV_SCHEMA)
    out = registry["cliffs_delta_arms"].fn(spark, d).collect()[0]
    assert (out["n0"], out["n1"], out["n_pairs"]) == (2, 2, 4)
    assert out["u1_x2"] == 7
    assert out["delta_micro"] == 750000
