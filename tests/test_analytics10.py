"""Planted-ground-truth tests for the analytics10 batch.

- LCC: a triangle {4,8,12} with a pendant 16 gives coefficients
  1/3, 1, 1 and excludes the degree-1 pendant.
- Link prediction: a 3-node path predicts exactly its missing
  endpoint pair with Jaccard 1.
- Ridge: a planted 6-order design reproduces the exact Cramer
  solution of a pure-Python mirror of the same algebra.
- Jackknife: two nations with hand-computable delete-one means give
  SE = 100000 milli-cents exactly.
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


_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp"
)
_O_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
_C_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
    " c_mktsegment string"
)

_SHIP = dt.datetime(1995, 6, 1)
_ODATE = dt.datetime(1995, 1, 1)


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, f"{name}.parquet"))


def _li(ok, pk, ln):
    return (ok, pk, 1, ln, 1.0, 10.0, 0.0, 0.0, "N", "O", _SHIP)


def test_lcc_triangle_plus_pendant(spark, registry):
    """Order 1 buys parts {4,8,12} (a triangle), order 2 buys {4,16}
    (pendant): lcc(4)=1/3, lcc(8)=lcc(12)=1, 16 excluded (deg 1)."""
    rows = [_li(1, 4, 1), _li(1, 8, 2), _li(1, 12, 3),
            _li(2, 4, 1), _li(2, 16, 2)]
    d = tempfile.mkdtemp(prefix="fmr_a10_lcc_")
    _write(spark, d, "lineitem", rows, _LI_SCHEMA)
    out = {
        r["node"]: r
        for r in registry["local_clustering_coefficient"].fn(spark, d).collect()
    }
    assert set(out) == {4, 8, 12}
    assert (out[4]["degree"], out[4]["triangles"]) == (3, 1)
    assert out[4]["lcc_milli"] == 333
    for n in (8, 12):
        assert (out[n]["degree"], out[n]["triangles"]) == (2, 1)
        assert out[n]["lcc_milli"] == 1000


def test_link_prediction_path(spark, registry):
    """Path 6-12-18 (orders {6,12} and {12,18}): the only candidate
    is the missing pair (6,18) with cn=1 and Jaccard 1/(1+1-1)=1."""
    rows = [_li(1, 6, 1), _li(1, 12, 2), _li(2, 12, 1), _li(2, 18, 2)]
    d = tempfile.mkdtemp(prefix="fmr_a10_lp_")
    _write(spark, d, "lineitem", rows, _LI_SCHEMA)
    out = registry["common_neighbors_link_prediction"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"], r["cn"], r["jaccard_milli"]) == (6, 18, 1, 1000)


def _ridge_mirror(rows, lam):
    """Pure-Python Cramer mirror of the ridge normal equations."""
    n = float(len(rows))
    s1 = float(sum(x1 for x1, _, _ in rows))
    s2 = float(sum(x2 for _, x2, _ in rows))
    s11 = float(sum(x1 * x1 for x1, _, _ in rows))
    s12 = float(sum(x1 * x2 for x1, x2, _ in rows))
    s22 = float(sum(x2 * x2 for _, x2, _ in rows))
    sy = float(sum(y for _, _, y in rows))
    s1y = float(sum(x1 * y for x1, _, y in rows))
    s2y = float(sum(x2 * y for _, x2, y in rows))
    a11, a12, a13 = n, s1, s2
    a22, a23, a33 = s11 + lam, s12, s22 + lam
    v1, v2, v3 = sy, s1y, s2y
    det = (a11 * (a22 * a33 - a23 * a23)
           - a12 * (a12 * a33 - a23 * a13)
           + a13 * (a12 * a23 - a22 * a13))
    det0 = (v1 * (a22 * a33 - a23 * a23)
            - a12 * (v2 * a33 - a23 * v3)
            + a13 * (v2 * a23 - a22 * v3))
    det1 = (a11 * (v2 * a33 - a23 * v3)
            - v1 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * v3 - v2 * a13))
    det2 = (a11 * (a22 * v3 - v2 * a23)
            - a12 * (a12 * v3 - v2 * a13)
            + v1 * (a12 * a23 - a22 * a13))
    return tuple(round(1e6 * dd / det) for dd in (det0, det1, det2))


def test_ridge_matches_python_mirror(spark, registry):
    """Six orders with (n_lines, total_qty) features and totalprice
    targets: beta_micro must equal the pure-Python Cramer mirror."""
    li_rows, o_rows, feats = [], [], []
    specs = [  # (orderkey, quantities, totalprice dollars)
        (1, [5.0], 10.0),
        (2, [3.0, 4.0], 25.0),
        (3, [1.0, 2.0, 3.0], 31.0),
        (4, [10.0], 18.0),
        (5, [2.0, 2.0], 22.0),
        (6, [7.0, 1.0, 1.0], 40.0),
    ]
    for ok, qtys, price in specs:
        for ln, q in enumerate(qtys, start=1):
            li_rows.append(
                (ok, ok * 4, 1, ln, q, 10.0, 0.0, 0.0, "N", "O", _SHIP)
            )
        o_rows.append((ok, 1, "F", price, _ODATE, "1-URGENT"))
        feats.append((len(qtys), int(sum(qtys)), round(price * 100)))
    d = tempfile.mkdtemp(prefix="fmr_a10_ridge_")
    _write(spark, d, "lineitem", li_rows, _LI_SCHEMA)
    _write(spark, d, "orders", o_rows, _O_SCHEMA)
    out = registry["ridge_normal_equations"].fn(spark, d).collect()[0]
    b0, b1, b2 = _ridge_mirror(feats, 10000)
    assert out["n_orders"] == 6
    assert (out["b0_micro"], out["b1_micro"], out["b2_micro"]) == (b0, b1, b2)


def test_jackknife_two_nations_exact(spark, registry):
    """Nation 0 holds orders {1.00, 2.00}, nation 1 holds {3.00,
    4.00}: delete-one means are 350000 / 150000 milli-cents, grand
    mean 250000, jackknife SE exactly 100000."""
    o_rows = [
        (1, 10, "F", 1.0, _ODATE, "x"),
        (2, 10, "F", 2.0, _ODATE, "x"),
        (3, 20, "F", 3.0, _ODATE, "x"),
        (4, 20, "F", 4.0, _ODATE, "x"),
    ]
    c_rows = [
        (10, "a", 0, 0.0, "BUILDING"),
        (20, "b", 1, 0.0, "BUILDING"),
    ]
    d = tempfile.mkdtemp(prefix="fmr_a10_jk_")
    _write(spark, d, "orders", o_rows, _O_SCHEMA)
    _write(spark, d, "customer", c_rows, _C_SCHEMA)
    out = registry["jackknife_nation_mean_se"].fn(spark, d).collect()[0]
    assert (out["n_groups"], out["n_all"]) == (2, 4)
    assert out["grand_mean_milli"] == 250000
    # loo means 350000/150000; var = (1/2)*((350000-250000)^2+(150000-250000)^2)
    assert out["jack_se_milli"] == 100000
