"""Planted-ground-truth tests for the coverage8 batch.

- l-diversity: a homogeneous class (3 rows, 1 segment) violates l=3
  while a 3-segment class passes.
- Cochran-Armitage: rates 1.0/0.5/0.0 down an ordered ladder give
  T=-2, Var=1, z=-2 exactly.
- Brier/ECE: one mid-confidence miss among two perfect predictions
  gives Brier 250000/3 and ECE 500000/3 micro.
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


_C_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
    " c_mktsegment string"
)
_O_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
_ODATE = dt.datetime(1995, 1, 1)


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, f"{name}.parquet"))


def test_l_diversity_homogeneous_class(spark, registry):
    """Nation 0 band 0: three BUILDING rows -> l=1, violates.
    Nation 1 band 0: three distinct segments -> l=3, passes."""
    rows = [
        (1, "a", 0, 100.0, "BUILDING"),
        (2, "b", 0, 200.0, "BUILDING"),
        (3, "c", 0, 300.0, "BUILDING"),
        (4, "d", 1, 100.0, "BUILDING"),
        (5, "e", 1, 200.0, "MACHINERY"),
        (6, "f", 1, 300.0, "FURNITURE"),
    ]
    d = tempfile.mkdtemp(prefix="fmr_c8_ldiv_")
    _write(spark, d, "customer", rows, _C_SCHEMA)
    out = {
        (r["nation"], r["bal_band"]): r
        for r in registry["l_diversity_audit"].fn(spark, d).collect()
    }
    assert out[(0, 0)]["l_distinct"] == 1 and out[(0, 0)]["violates_l3"]
    assert out[(1, 0)]["l_distinct"] == 3 and not out[(1, 0)]["violates_l3"]


def test_cochran_armitage_exact(spark, registry):
    """Priorities 1/2/3 with 2 orders each and 2/1/0 finalized:
    T = 4 - 3*12/6 = -2, Var = 0.25*(28 - 24) = 1, z = -2."""
    rows = []
    ok = 0
    for s, n_f in ((1, 2), (2, 1), (3, 0)):
        for i in range(2):
            ok += 1
            status = "F" if i < n_f else "O"
            rows.append((ok, 1, status, 10.0, _ODATE, f"{s}-X"))
    d = tempfile.mkdtemp(prefix="fmr_c8_ca_")
    _write(spark, d, "orders", rows, _O_SCHEMA)
    out = registry["cochran_armitage_trend"].fn(spark, d).collect()[0]
    assert (out["n_orders"], out["n_events"]) == (6, 3)
    assert out["z_micro"] == -2_000_000


def test_brier_ece_hand_computed(spark, registry):
    """p = c/max(c): purchase at 1.00 (p=1, y=1) and view at 0.00
    (p=0, y=0) are perfect; view at 0.50 (p=0.5, y=0) contributes
    (0.5)^2 -> Brier = 250000/3 micro; its bin has |conf-acc| =
    500000 mass -> ECE = 500000/3 micro."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "purchase", 1.00, "{}"),
        (2, base, 2, "view", 0.00, "{}"),
        (3, base, 3, "view", 0.50, "{}"),
    ]
    d = tempfile.mkdtemp(prefix="fmr_c8_brier_")
    _write(spark, d, "events", rows, _EV_SCHEMA)
    out = registry["brier_ece_score"].fn(spark, d).collect()[0]
    assert out["n_events"] == 3
    assert out["brier_micro"] == round(250000 / 3)
    assert out["ece_micro"] == round(500000 / 3)
