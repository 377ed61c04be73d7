"""Planted-ground-truth tests for the coverage7 batch.

- RBO: a 3-part graph with swapped top-2 rankings gives overlap
  0/2/3 at depths 1/2/3+ and the exact integer-rational partial sums
  of a Fraction-based mirror.
- Boilerplate: a planted 3-doc shared head dominates the prefix
  table with an exact share.
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


_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp"
)
_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_SHIP = dt.datetime(1995, 6, 1)


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, f"{name}.parquet"))


def _rbo_mirror(overlaps):
    """Exact integer-rational mirror of the term/partial algebra."""
    partials, acc = [], 0
    for d, ov in enumerate(overlaps, start=1):
        a = 100000 * ov * 9 ** (d - 1)
        b = d * 10 ** (d - 1)
        acc += (2 * a + b) // (2 * b)
        partials.append(acc)
    return partials


def test_rbo_swapped_top2(spark, registry):
    """Revenue ranks p4,p8,p12; quantity ranks p8,p4,p12: overlap is
    0 at depth 1, 2 at depth 2, 3 from depth 3 on; partial RBO must
    equal the exact integer mirror at every depth."""
    rows = [
        (1, 4, 1, 1, 2.0, 3.0, 0.0, 0.0, "N", "O", _SHIP),
        (2, 8, 1, 1, 5.0, 2.0, 0.0, 0.0, "N", "O", _SHIP),
        (3, 12, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _SHIP),
    ]
    d = tempfile.mkdtemp(prefix="fmr_c7_rbo_")
    _write(spark, d, "lineitem", rows, _LI_SCHEMA)
    out = registry["rbo_rank_agreement"].fn(spark, d).collect()
    assert [r["d"] for r in out] == list(range(1, 16))
    overlaps = [r["overlap_d"] for r in out]
    assert overlaps == [0, 2] + [3] * 13
    assert [r["agreement_milli"] for r in out][:3] == [0, 1000, 1000]
    assert [r["rbo_partial_micro"] for r in out] == _rbo_mirror(overlaps)


def test_boilerplate_prefix_exact(spark, registry):
    """Three docs share the head 'x y z'; two others are unique:
    top prefix is 'x y z' with n=3 and share 3/5."""
    docs = [
        (1, "x y z alpha beta", "en", "s", 1),
        (2, "x y z gamma", "en", "s", 1),
        (3, "x y z delta eps", "en", "s", 1),
        (4, "p q r s", "en", "s", 1),
        (5, "u v w", "en", "s", 1),
    ]
    d = tempfile.mkdtemp(prefix="fmr_c7_bp_")
    _write(spark, d, "documents", docs, _DOC_SCHEMA)
    out = registry["boilerplate_prefix_mass"].fn(spark, d).collect()
    assert out[0]["prefix"] == "x y z"
    assert out[0]["n_docs"] == 3
    assert out[0]["share_milli"] == 600
    assert {r["prefix"] for r in out} == {"x y z", "p q r", "u v w"}
