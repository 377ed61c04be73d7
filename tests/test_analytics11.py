"""Planted-ground-truth tests for the analytics11 / llm9 batch.

- Holt: a hand-computed 4-day series gives l=14.5625, b=1.09375
  exactly (alpha=beta=1/2 keeps every step dyadic).
- Theil: equal values give exactly 0; a {1.00, 3.00} nation gives
  the quantized two-term sum.
- Mann-Kendall: a strictly increasing 4-day series gives S=6,
  18*Var=156 and the continuity-corrected z of the Python mirror.
- Kneser-Ney: a 6-token corpus reproduces the exact interpolated-KN
  probabilities of a pure-Python mirror.
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


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
_O_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
_C_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
    " c_mktsegment string"
)
_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

_ODATE = dt.datetime(1995, 1, 1)


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, f"{name}.parquet"))


def test_holt_hand_computed(spark, registry):
    """Daily cents 10,12,17,13 with alpha=beta=1/2: every step is
    dyadic, final l=14.5625 b=1.09375, forecast l+7b=22.21875."""
    rows = [
        (i, dt.datetime(2024, 1, i + 1), 1, "t", v, "{}")
        for i, v in enumerate([0.10, 0.12, 0.17, 0.13])
    ]
    d = tempfile.mkdtemp(prefix="fmr_a11_holt_")
    _write(spark, d, "events", rows, _EV_SCHEMA)
    out = registry["holt_linear_by_type"].fn(spark, d).collect()[0]
    assert out["n_days"] == 4
    assert out["level_milli"] == 14563  # round(14562.5) half-up
    assert out["trend_milli"] == 1094  # round(1093.75)
    assert out["forecast7_milli"] == 22219  # round(22218.75)


def test_theil_equal_and_two_point(spark, registry):
    """Nation 0 has two equal orders (T=0); nation 1 has {1.00,
    3.00}: terms 0.5*ln(0.5) and 1.5*ln(1.5) quantized to micro."""
    o_rows = [
        (1, 10, "F", 2.0, _ODATE, "x"),
        (2, 10, "F", 2.0, _ODATE, "x"),
        (3, 20, "F", 1.0, _ODATE, "x"),
        (4, 20, "F", 3.0, _ODATE, "x"),
    ]
    c_rows = [(10, "a", 0, 0.0, "B"), (20, "b", 1, 0.0, "B")]
    d = tempfile.mkdtemp(prefix="fmr_a11_theil_")
    _write(spark, d, "orders", o_rows, _O_SCHEMA)
    _write(spark, d, "customer", c_rows, _C_SCHEMA)
    out = {
        r["nationkey"]: r
        for r in registry["theil_index_by_nation"].fn(spark, d).collect()
    }
    assert out[0]["theil_micro"] == 0
    t_lo = round(1e6 * 0.5 * math.log(0.5))
    t_hi = round(1e6 * 1.5 * math.log(1.5))
    assert out[1]["theil_micro"] == round((t_lo + t_hi) / 2)
    assert out[1]["mean_milli"] == 200000


def test_mann_kendall_increasing(spark, registry):
    """Strictly increasing 4-day series: S = 6 (all pairs up), no
    ties, 18*Var = 4*3*13 = 156, z = 5/sqrt(156/18)."""
    rows = [
        (i, dt.datetime(2024, 1, i + 1), 1, "t", v, "{}")
        for i, v in enumerate([0.10, 0.20, 0.30, 0.40])
    ]
    d = tempfile.mkdtemp(prefix="fmr_a11_mk_")
    _write(spark, d, "events", rows, _EV_SCHEMA)
    out = registry["mann_kendall_trend"].fn(spark, d).collect()[0]
    assert (out["n_days"], out["s_stat"], out["var18"]) == (4, 6, 156)
    assert out["z_micro"] == round(1e6 * 5 / math.sqrt(156 / 18.0))


def _kn(c_vw, c_v, n1p_v, n1p_w, n_types, d=0.75):
    return max(c_vw - d, 0.0) / c_v + d * n1p_v / c_v * n1p_w / n_types


def test_kneser_ney_tiny_corpus(spark, registry):
    """'a b a b a c': bigram counts (a,b)=2 (b,a)=2 (a,c)=1; context
    stats a:(3,2) b:(2,1); continuations a:1 b:1 c:1; 3 types. The
    output probabilities must equal the pure-Python mirror."""
    d = tempfile.mkdtemp(prefix="fmr_llm9_kn_")
    _write(spark, d, "documents", [(1, "a b a b a c", "en", "s", 11)], _DOC_SCHEMA)
    out = {
        (r["v"], r["w"]): r
        for r in registry["kneser_ney_bigram_probs"].fn(spark, d).collect()
    }
    assert set(out) == {("a", "b"), ("b", "a"), ("a", "c")}
    assert out[("a", "b")]["p_kn_micro"] == round(1e6 * _kn(2, 3, 2, 1, 3))
    assert out[("b", "a")]["p_kn_micro"] == round(1e6 * _kn(2, 2, 1, 1, 3))
    assert out[("a", "c")]["p_kn_micro"] == round(1e6 * _kn(1, 3, 2, 1, 3))
    # discounted mass conservation: P(b|a)+P(c|a) < 1 (mass reserved)
    assert out[("a", "b")]["c_vw"] == 2 and out[("a", "c")]["c_vw"] == 1
