"""Planted-ground-truth tests for the llm10 batch.

- Kappa: a 4-doc corpus with hand-countable confusion marginals
  gives kappa = 0.2 exactly.
- Bigram MI: 'a b a b a c' reproduces the quantize-the-log mirror.
- HLL intersection: tiny audiences stay in sparse (exact) sketch
  mode, so the exact twins and both contracts are checkable.
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


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, f"{name}.parquet"))


def test_kappa_hand_counted(spark, registry):
    """CM: (en,en)=2, (fr,en)=1, (de,und)=1 -> po=1/2, rows
    (en2,fr1,de1,und0), cols (en3,und1), chance=2*3=6, pe=6/16,
    kappa=(0.5-0.375)/0.625 = 0.2."""
    docs = [
        (1, "the the the", "en", "s", 1),
        (2, "the of and", "en", "s", 1),
        (3, "the", "fr", "s", 1),  # en markers win -> predicted en
        (4, "xyz qqq", "de", "s", 1),  # no markers -> und
    ]
    d = tempfile.mkdtemp(prefix="fmr_llm10_k_")
    _write(spark, d, "documents", docs, _DOC_SCHEMA)
    out = registry["cohens_kappa_langid"].fn(spark, d).collect()[0]
    assert (out["n_docs"], out["agree"]) == (4, 2)
    assert out["po_micro"] == 500000
    assert out["pe_micro"] == 375000
    assert out["kappa_micro"] == 200000


def test_bigram_mi_matches_mirror(spark, registry):
    """'a b a b a c': bigrams (a,b)x2 (b,a)x2 (a,c)x1; the output
    must equal a pure-Python mirror of the quantize-the-log
    accumulation."""
    d = tempfile.mkdtemp(prefix="fmr_llm10_mi_")
    _write(spark, d, "documents", [(1, "a b a b a c", "en", "s", 11)], _DOC_SCHEMA)
    out = registry["bigram_mutual_information"].fn(spark, d).collect()[0]
    c = {("a", "b"): 2, ("b", "a"): 2, ("a", "c"): 1}
    cv = {"a": 3, "b": 2}
    cw = {"b": 2, "a": 2, "c": 1}
    nn = 5
    mi_num = sum(
        round(1e6 * math.log(cvw * nn / (cv[v] * cw[w]))) * cvw
        for (v, w), cvw in c.items()
    )
    cond_num = sum(
        round(1e6 * math.log(cvw / cv[v])) * cvw
        for (v, w), cvw in c.items()
    )
    hw_num = sum(
        round(1e6 * math.log(n / nn)) * n for n in cw.values()
    )
    assert (out["n_bigrams"], out["n_types"]) == (5, 3)
    assert out["mi_micro"] == round(mi_num / nn)
    assert out["h_w_given_v_micro"] == round(-cond_num / nn)
    assert out["h_w_micro"] == round(-hw_num / nn)


def test_hll_intersection_tiny_exact(spark, registry):
    """view={1,2,3}, click={3}, purchase={2,3,4}: sketches stay in
    sparse (exact) mode, so both contracts hold and the exact twins
    are hand-countable."""
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for et, uids in (
        ("view", [1, 2, 3]),
        ("click", [3]),
        ("purchase", [2, 3, 4]),
    ):
        for u in uids:
            rows.append((eid, base, u, et, 0.0, "{}"))
            eid += 1
    d = tempfile.mkdtemp(prefix="fmr_llm10_hll_")
    _write(spark, d, "events", rows, _EV_SCHEMA)
    out = {
        r["pair"]: r
        for r in registry["hll_intersection_overlap"].fn(spark, d).collect()
    }
    assert set(out) == {"view^purchase", "click^purchase", "view^click"}
    assert (out["view^purchase"]["exact_inter"],
            out["view^purchase"]["exact_union"]) == (2, 4)
    assert (out["click^purchase"]["exact_inter"],
            out["click^purchase"]["exact_union"]) == (1, 3)
    assert (out["view^click"]["exact_inter"],
            out["view^click"]["exact_union"]) == (1, 3)
    for r in out.values():
        assert r["union_est_within_2pct"]
        assert r["inter_within_5pct_of_union"]


def test_hll_intersection_empty_pair_kept(spark, registry):
    """A pair with ZERO common users must still emit its row with
    exact_inter=0 (the oracle's correlated COUNT always produces all
    three pairs; an inner join on the exact-intersection groups used
    to drop it — round-7 review finding): view={1,2}, purchase={3,4}
    (disjoint), click={1,3}."""
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for et, uids in (
        ("view", [1, 2]),
        ("click", [1, 3]),
        ("purchase", [3, 4]),
    ):
        for u in uids:
            rows.append((eid, base, u, et, 0.0, "{}"))
            eid += 1
    d = tempfile.mkdtemp(prefix="fmr_llm10_hll0_")
    _write(spark, d, "events", rows, _EV_SCHEMA)
    out = {
        r["pair"]: r
        for r in registry["hll_intersection_overlap"].fn(spark, d).collect()
    }
    assert set(out) == {"view^purchase", "click^purchase", "view^click"}
    assert (out["view^purchase"]["exact_inter"],
            out["view^purchase"]["exact_union"]) == (0, 4)
    assert (out["click^purchase"]["exact_inter"],
            out["click^purchase"]["exact_union"]) == (1, 3)
    assert (out["view^click"]["exact_inter"],
            out["view^click"]["exact_union"]) == (1, 3)
