"""Planted-ground-truth tests for the llm13 batch.

- SNM: three adjacent near-duplicate heads pair with distance 1; a
  far head in the same block is generated but filtered by the
  distance cap.
- Simpson: tokens {a,a,b} give D = 1/3 exactly.
"""

from __future__ import annotations

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


def _write_docs(spark, docs):
    d = tempfile.mkdtemp(prefix="fmr_llm13_")
    spark.createDataFrame(docs, _DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_snm_adjacent_neardups(spark, registry):
    """Heads 'aa alpha'/'aa alphb'/'aa alphc' sort adjacently in the
    ('en','aa') block and pair at distance 1; the 'aa' + q-run head
    is within the lead window but beyond the distance cap."""
    docs = [
        (1, "aa alpha one two", "en", "s", 1),
        (2, "aa alphb one two", "en", "s", 1),
        (3, "aa alphc one two", "en", "s", 1),
        (4, "aa " + "q" * 40, "en", "s", 1),
    ]
    d = _write_docs(spark, docs)
    out = registry["sorted_neighborhood_pairs"].fn(spark, d).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["edit_dist"] for r in out}
    assert pairs == {(1, 2): 1, (1, 3): 1, (2, 3): 1}


def test_simpson_exact(spark, registry):
    """Tokens {a,a,b}: D = 2/(3*2) = 1/3, diversity 2/3."""
    d = _write_docs(spark, [(1, "a a b", "en", "s0", 5)])
    out = registry["simpson_diversity_by_source"].fn(spark, d).collect()[0]
    assert (out["n_tokens"], out["vocab"]) == (3, 2)
    assert out["simpson_micro"] == 333333
    assert out["diversity_micro"] == 666667
