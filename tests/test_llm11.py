"""Planted-ground-truth tests for the llm11 / analytics12 batch.

- MAP: a 3-doc candidate set gives AP = (P@1 + P@3)/2 with the exact
  quantized P@k values.
- ESS: lengths {1,3} give ESS = 16/10 = 1.6 exactly.
- Two-proportion z: arms converting 0/2 vs 2/2 give z = 2 exactly.
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


def test_map_hand_ranked(spark, registry):
    """Query 1 (spark/join/merge): doc1 hits all 3 terms (tf 3,
    relevant), doc2 hits 1 term twice (tf 2, NOT relevant), doc3
    hits 2 terms (tf 2, relevant). Ranking: doc1, doc2, doc3.
    AP = (P@1 + P@3)/2 = (1e6 + round(2e6/3))/2."""
    docs = [
        (1, "spark join merge", "en", "s", 1),
        (2, "spark spark", "en", "s", 1),
        (3, "join merge", "en", "s", 1),
    ]
    d = tempfile.mkdtemp(prefix="fmr_llm11_map_")
    _write(spark, d, "documents", docs, _DOC_SCHEMA)
    out = registry["map_retrieval_audit"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["qid"], r["n_candidates"], r["n_rel"]) == (1, 3, 2)
    assert r["ap_micro"] == round((1_000_000 + round(2e6 / 3)) / 2)


def test_ess_two_lengths(spark, registry):
    """Token counts {1, 3}: ESS = (1+3)^2/(1+9) = 1.6, ratio 0.8."""
    docs = [
        (1, "a", "en", "s0", 1),
        (2, "a b c", "en", "s0", 5),
    ]
    d = tempfile.mkdtemp(prefix="fmr_llm11_ess_")
    _write(spark, d, "documents", docs, _DOC_SCHEMA)
    out = registry["ess_importance_weights"].fn(spark, d).collect()[0]
    assert out["n_docs"] == 2
    assert out["ess_milli"] == 1600
    assert out["ess_ratio_milli"] == 800


def test_two_proportion_z_exact(spark, registry):
    """Arm 0 (users 0,2) converts 0/2; arm 1 (users 1,3) converts
    2/2: pooled 1/2, z = 1/sqrt(0.25*1) = 2."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 0, "view", 0.0, "{}"),
        (1, base, 2, "view", 0.0, "{}"),
        (2, base, 1, "purchase", 1.0, "{}"),
        (3, base, 3, "purchase", 1.0, "{}"),
    ]
    d = tempfile.mkdtemp(prefix="fmr_llm11_z_")
    _write(spark, d, "events", rows, _EV_SCHEMA)
    out = registry["two_proportion_ztest"].fn(spark, d).collect()[0]
    assert (out["n0"], out["n1"], out["conv0"], out["conv1"]) == (2, 2, 0, 2)
    assert (out["p0_micro"], out["p1_micro"]) == (0, 1_000_000)
    assert out["z_micro"] == 2_000_000
