"""Planted-ground-truth tests for the llm6 operators.

Beyond the DuckDB-oracle gate, assert theoretical contracts on
synthetic inputs:

- stupid backoff: hand-computed scores at every backoff depth
  (trigram hit, bigram backoff, unigram backoff, OOV floor). The
  train/held-out split is content-hash based, so fixture texts are
  steered into the right split by whitespace padding — it changes
  md5(lower(text)) but not the token stream.
- JSD: identical sources score exactly 0; disjoint-vocabulary
  sources score far higher (and below the ln 2 bound).
- k-center: a planted 1-D configuration has a provable farthest-point
  traversal order and exact radii, and the radius curve is
  nonincreasing after step 2.
- canonical URL: planted id arithmetic yields a known raw→canonical
  collapse.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os
import shutil
import tempfile

import pytest

from filemapreduce_spark.queries import load_all

_TRAIN_GATE = 58982


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _bucket(text: str) -> int:
    return int(hashlib.md5(text.lower().encode()).hexdigest()[:4], 16)


def _steer(text: str, train: bool) -> str:
    """Append whitespace until the content hash lands in the desired
    split — tokenization (split on \\s+, empties dropped) is
    unchanged."""
    s = text
    for _ in range(200):
        b = _bucket(s)
        if (b < _TRAIN_GATE) == train:
            return s
        s += " "
    raise AssertionError("could not steer text into split")


def _write_documents(spark, rows):
    d = tempfile.mkdtemp(prefix="fmr_llm6_fixture_")
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def _write_embeddings(spark, rows):
    d = tempfile.mkdtemp(prefix="fmr_llm6_emb_")
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    return d


def test_stupid_backoff_every_depth(spark, registry):
    """Train 'a b c a b d'; held-out docs exercise each backoff rung:
    trigram hit (ln 1/2), bigram backoff (ln 0.4·1/2), unigram
    backoff (ln 0.16·1/6), OOV floor (ln 0.16/6)."""
    train = _steer("a b c a b d", True)
    h1 = _steer("a b c", False)  # tri (a,b,c): c3=1, c2(ab)=2
    h2 = _steer("x b c", False)  # bi (b,c): c2=1, c1(b)=2
    h3 = _steer("x y c", False)  # uni c: cnt=1, N=6
    h4 = _steer("x y z", False)  # OOV floor
    d = _write_documents(
        spark,
        [
            (0, train, "en", "s0", len(train)),
            (1, h1, "en", "s0", len(h1)),
            (2, h2, "en", "s0", len(h2)),
            (3, h3, "en", "s0", len(h3)),
            (4, h4, "en", "s0", len(h4)),
        ],
    )
    try:
        out = {
            r.doc_id: r
            for r in registry["stupid_backoff_trigram_score"]
            .fn(spark, d)
            .collect()
        }
        assert set(out) == {1, 2, 3, 4}
        exp = {
            1: math.log(1 / 2),
            2: math.log(0.4 * (1 / 2)),
            3: math.log(0.16 * (1 / 6)),
            4: math.log(0.16 / 6),
        }
        for doc_id, lp in exp.items():
            assert out[doc_id].n_tri == 1
            assert out[doc_id].avg_logscore_micro == round(1e6 * lp)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_jsd_identical_zero_disjoint_large(spark, registry):
    """Sources with identical token streams → JSD exactly 0; a
    disjoint-vocabulary source scores orders higher yet < ln 2."""
    ta = "alpha beta gamma delta " * 10
    tb = "omega psi chi phi " * 10
    d = _write_documents(
        spark,
        [
            (0, ta, "en", "s0", len(ta)),
            (1, ta, "en", "s1", len(ta)),
            (2, tb, "en", "s2", len(tb)),
        ],
    )
    try:
        out = {
            (r.source_a, r.source_b): r.jsd_micro
            for r in registry["jsd_pairwise_sources"].fn(spark, d).collect()
        }
        assert out[("s0", "s1")] == 0
        assert out[("s0", "s2")] > 100_000  # far from 0
        assert out[("s0", "s2")] < round(1e6 * math.log(2))
        assert out[("s0", "s2")] == out[("s1", "s2")]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_kcenter_planted_traversal(spark, registry):
    """Points on one axis at 0,100,50,75,25,12 (ids 0-5), seed id 0:
    Gonzalez traversal picks 1 (d²=10000), 2 (2500), then the 625
    tie breaks to the smaller id (3 before 4); radii nonincreasing."""
    def vec(x):
        return [float(x)] + [0.0] * 63

    rows = [
        (0, vec(0), 0),
        (1, vec(100), 0),
        (2, vec(50), 0),
        (3, vec(75), 0),
        (4, vec(25), 0),
        (5, vec(12), 0),
    ]
    d = _write_embeddings(spark, rows)
    try:
        out = registry["kcenter_coreset_selection"].fn(spark, d).collect()
        assert [(r.step, r.vec_id) for r in out] == [
            (1, 0), (2, 1), (3, 2), (4, 3), (5, 4),
        ]
        assert [r.radius for r in out] == [0.0, 10000.0, 2500.0,
                                           625.0, 625.0]
        radii = [r.radius for r in out[1:]]
        assert radii == sorted(radii, reverse=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_canonical_url_planted_collapse(spark, registry):
    """event_ids 4, 54, 104 with user_id=1, value=3.0: same path
    (4 mod 50), three distinct raw URLs (tracking/fragment noise),
    two canonical forms (?v=3 twice, bare once) → collapse 333‰."""
    d = tempfile.mkdtemp(prefix="fmr_llm6_ev_")
    try:
        rows = [
            (i, dt.datetime(2024, 1, 5), 1, "click", 3.0, "{}")
            for i in (4, 54, 104)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        r = registry["canonical_url_dedup"].fn(spark, d).collect()[0]
        assert r.n_urls == 3
        assert r.n_raw_distinct == 3
        assert r.n_canon_distinct == 2
        assert r.collapse_milli == 333
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_matryoshka_tail_information_loss(spark, registry):
    """Planted decisive case: query 0 carries half its information in
    dim 17 (outside the 16-dim prefix). Ten candidates share query
    0's EXACT prefix (all truncated cosines tie at 1, broken by id →
    trunc top-5 = ids 8-12) but only ids 13-17 align on the tail
    (full cosine 1 vs 0 → full top-5 = ids 13-17). Disjoint sets →
    recall@5 must be exactly 0 for query 0."""
    def vec(entries):
        v = [0.0] * 64
        for i, x in entries:
            v[i - 1] = float(x)
        return v

    rows = []
    # queries 0-7: q0 = e1 + e17; q1..q7 = e2..e8 (orthogonal, no tail)
    rows.append((0, vec([(1, 1), (17, 1)]), 0))
    for i in range(1, 8):
        rows.append((i, vec([(i + 1, 1)]), 0))
    # candidates 8-17: prefix = e1 (exactly q0's truncated direction);
    # tail dim17 = -1 for 8-12 (anti-aligned), +1 for 13-17 (aligned)
    for i in range(8, 13):
        rows.append((i, vec([(1, 1), (17, -1)]), 0))
    for i in range(13, 18):
        rows.append((i, vec([(1, 1), (17, 1)]), 0))
    d = _write_embeddings(spark, rows)
    try:
        out = {
            r.query_id: r
            for r in registry["matryoshka_truncation_recall"]
            .fn(spark, d)
            .collect()
        }
        assert set(out) == set(range(8))
        assert out[0].n_hits == 0
        assert out[0].recall_milli == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_curriculum_interleave_planted_order(spark, registry):
    """Sources A (3 docs) and B (2 docs): easiest-first within source,
    strict A/B alternation across positions 1..5."""
    rows = [
        (10, "x" * 30, "en", "A", 30),
        (11, "x" * 10, "en", "A", 10),
        (12, "x" * 20, "en", "A", 20),
        (20, "y" * 25, "en", "B", 25),
        (21, "y" * 5, "en", "B", 5),
    ]
    d = _write_documents(spark, rows)
    try:
        out = registry["curriculum_interleave_order"].fn(spark, d).collect()
        got = [(r.position, r.doc_id, r.source) for r in out]
        assert got == [
            (1, 11, "A"),  # A rank1 (10 chars)
            (2, 21, "B"),  # B rank1 (5 chars)
            (3, 12, "A"),  # A rank2 (20)
            (4, 20, "B"),  # B rank2 (25)
            (5, 10, "A"),  # A rank3 (30)
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_feature_hashing_hand_computed_margin(spark, registry):
    """One doc, two known tokens: margin must equal the hand-computed
    signed bucket-weight mean (hash → bucket, second hash → sign,
    Knuth-mix weight), reproduced in pure Python."""
    text = "spark shuffle"
    d = _write_documents(spark, [(0, text, "en", "s0", len(text))])
    try:
        exp_terms = []
        for w in text.split():
            h = int(
                hashlib.md5(f"fh:{w}".encode()).hexdigest()[:8], 16
            ) % 1024
            sg = (
                1
                if hashlib.md5(f"sg:{w}".encode()).hexdigest()[0]
                in "01234567"
                else -1
            )
            exp_terms.append(sg * (((h * 2654435761) % 1000 - 500) / 1000.0))
        exp_margin = round(1e6 * sum(exp_terms) / len(exp_terms))
        r = (
            registry["feature_hashing_classifier_score"]
            .fn(spark, d)
            .collect()[0]
        )
        assert r.n_tokens == 2
        assert r.margin_micro == exp_margin
        assert r.pred == (1 if exp_margin > 0 else 0)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_manifest_exactly_once_vs_naive_directory_read(spark, registry):
    """The manifest read must count each batch exactly once and match
    a direct aggregate of the source table; a naive recursive
    directory read of the same scratch root would see the orphaned
    batch-1 retry too (strictly more rows) — the failure mode the
    protocol kills."""
    sf = "/root/testdata/sf0.001"
    from pyspark.sql import functions as F

    out = {
        r.priority: (r.n_orders, r.sum_cents)
        for r in registry["sink_manifest_exactly_once"]
        .fn(spark, sf)
        .collect()
    }
    direct = {
        r.priority: (r.n_orders, r.sum_cents)
        for r in spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
        .collect()
    }
    assert out == direct


def test_skipgram_pmi_hand_computed(spark, registry):
    """'x y' repeated 10×: pair counts xy=10, yx=9, xx=9, yy=9 over
    37 windowed pairs and 20 tokens (c_x=c_y=10); each PMI is
    hand-computable and the ordering is by PMI then lexicographic."""
    text = ("x y " * 10).strip()
    d = _write_documents(spark, [(0, text, "en", "s0", len(text))])
    try:
        out = [
            (r.a, r.b, r.c_ab, r.pmi_micro)
            for r in registry["skipgram_pmi_pairs"].fn(spark, d).collect()
        ]
        def pmi(c_ab):
            return round(1e6 * math.log((c_ab / 37) / ((10 / 20) ** 2)))
        exp = sorted(
            [
                ("x", "y", 10, pmi(10)),
                ("y", "x", 9, pmi(9)),
                ("x", "x", 9, pmi(9)),
                ("y", "y", 9, pmi(9)),
            ],
            key=lambda r: (-r[3], r[0], r[1]),
        )
        assert out == exp
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_power_iteration_planted_dominant_axis(spark, registry):
    """All vectors along e3 (c=1 and c=2): the gram matrix is rank-1
    on dim index 2, so rank-1 loading is dim 2 at exactly 1000 milli,
    every other loading is 0, and the Rayleigh quotient is
    5e12 (the scaled second moment) → rayleigh_e6 = 5,000,000."""
    def vec(c):
        v = [0.0] * 64
        v[2] = float(c)
        return v

    d = _write_embeddings(spark, [(0, vec(1.0), 0), (1, vec(2.0), 0)])
    try:
        out = registry["embedding_power_iteration"].fn(spark, d).collect()
        assert out[0].rank == 1
        assert out[0].dim == 2
        assert out[0].loading_milli == 1000
        assert out[0].rayleigh_e6 == 5_000_000
        for r in out[1:]:
            assert r.loading_milli == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ndcg_tf_ranking_vs_relevance(spark, registry):
    """Query 1 terms are spark/join/merge. Planted docs: doc 3 has
    'spark' ×10 (tf 10, rel 1) and outranks doc 1 (all three terms,
    rel 3) and doc 2 (two terms, rel 2) on tf — nDCG penalizes the
    inversion exactly as the hand-computed mirror predicts."""
    docs = [
        (1, "spark join merge", "en", "s0", 17),
        (2, "spark join", "en", "s0", 10),
        (3, " ".join(["spark"] * 10), "en", "s0", 59),
    ]
    d = _write_documents(spark, docs)
    try:
        out = {
            r.qid: r
            for r in registry["ndcg_retrieval_audit"].fn(spark, d).collect()
        }
        # tf ranking: doc3 (10), doc1 (3), doc2 (2); rel 1, 3, 2
        # ideal:      doc1 (3), doc2 (2), doc3 (1)
        def g(rel):
            return (2 ** rel - 1)
        dcg = (g(1) / math.log2(2) + g(3) / math.log2(3)
               + g(2) / math.log2(4))
        idcg = (g(3) / math.log2(2) + g(2) / math.log2(3)
                + g(1) / math.log2(4))
        r1 = out[1]
        assert r1.dcg_micro == round(1e6 * dcg)
        assert r1.idcg_micro == round(1e6 * idcg)
        assert r1.ndcg_milli == round(1000 * dcg / idcg)
        assert r1.ndcg_milli < 1000  # the inversion costs quality
    finally:
        shutil.rmtree(d, ignore_errors=True)
