"""Invariant tests for search.py (trigram inverted-index search)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filemapreduce_spark.queries import load_all
from filemapreduce_spark.queries.search import _TERMS

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_trigram_search_has_no_false_negatives(spark, registry):
    """The index guarantees recall: every document that truly contains
    a term holds all its trigrams, so n_verified must equal the direct
    LIKE count, and candidates can only overshoot (n_candidates >=
    n_verified)."""
    rows = {
        r["term"]: r
        for r in registry["trigram_index_search"].fn(spark, SF_SMALL).collect()
    }
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    for term in _TERMS:
        truth = docs.where(
            F.lower(F.col("text")).contains(term)
        ).count()
        if truth == 0:
            assert term not in rows or rows[term]["n_verified"] == 0
            continue
        r = rows[term]
        assert r["n_verified"] == truth
        assert r["n_candidates"] >= r["n_verified"]


def test_bm25_scores_positive_and_ranked(spark, registry):
    rows = registry["bm25_search_topk"].fn(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 10
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
