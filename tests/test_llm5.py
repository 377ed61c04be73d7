"""Planted-ground-truth tests for the round-5 operators.

These go beyond the DuckDB-oracle gate (which proves Spark ≡ oracle on
the shipped corpora) by asserting the operators' THEORETICAL contracts
on adversarial synthetic inputs:

- winnowing: any shared substring of length ≥ k+w−1 chars GUARANTEES a
  shared fingerprint (Schleimer et al. 2003, theorem 1 direction used
  for dedup) — tested through the real registry query over a planted
  corpus written as documents.parquet in a temp dir.
- Misra–Gries vectorized merge: the COMBINE+PRUNE summary merge
  (Agarwal et al. 2013) preserves the frequent-items invariant — every
  token with frequency > n/K survives — under random batched streams.
- MMR: the greedy contract — step 1 is the most relevant candidate,
  and no step repeats a selection.
- rendezvous hashing: the minimal-disruption property — zero illegal
  moves — is already an output column; assert it on real data.
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile

import pandas as pd
import pytest

from filemapreduce_spark.queries import load_all

SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _write_documents(spark, rows):
    """Write a documents.parquet with the driver schema into a temp
    dir usable as an sf_dir."""
    d = tempfile.mkdtemp(prefix="fmr_llm5_fixture_")
    df = spark.createDataFrame(
        [(i, text, "en", f"src{i % 3}", len(text)) for i, text in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_winnowing_guarantee_planted_overlap(spark, registry):
    """Two documents sharing a planted ≥(k+w−1)-char substring MUST
    share ≥1 fingerprint; the query (threshold lowered to 1 via the
    shared-count column) must pair them. Disjoint-alphabet docs must
    never pair."""
    rng = random.Random(7)

    def rand_text(alpha, n):
        return "".join(rng.choice(alpha) for _ in range(n))

    shared = "the quick brown fox jumps over the lazy dog"  # 43 chars
    a = rand_text("abcdefgh ", 120) + shared + rand_text("abcdefgh ", 120)
    b = rand_text("qrstuvwx ", 120) + shared + rand_text("qrstuvwx ", 120)
    c = rand_text("01234567 ", 300)  # disjoint from a and b
    sf = _write_documents(spark, [(1, a), (2, b), (3, c)])
    try:
        # run the real query but inspect the pre-threshold pair counts
        # by lowering the reported threshold: the registered query
        # filters at >= _WIN_MIN_SHARED, so assert through a planted
        # overlap large enough to clear it (43 shared chars yield many
        # shared window minima)
        out = registry["winnowing_shared_fingerprints"].fn(spark, sf)
        pdf = out.toPandas()
        pairs = set(zip(pdf["doc_a"], pdf["doc_b"]))
        assert (1, 2) in pairs, f"planted overlap not detected: {pdf}"
        assert all(3 not in p for p in pairs), (
            f"disjoint doc paired: {pdf}"
        )
    finally:
        shutil.rmtree(sf, ignore_errors=True)


def test_misra_gries_merge_invariant():
    """The vectorized COMBINE+PRUNE merge used in heavy_hitters phase 1
    keeps the MG guarantee: any token with stream frequency > n/K is
    in the final summary, and the summary never exceeds K entries."""
    import numpy as np

    K = 20
    rng = random.Random(3)
    for trial in range(20):
        n = rng.randint(200, 2000)
        # zipf-ish stream over a vocab much larger than K
        vocab = [f"t{i}" for i in range(300)]
        weights = [1.0 / (i + 1) for i in range(300)]
        stream = rng.choices(vocab, weights=weights, k=n)
        batches = []
        i = 0
        while i < n:
            step = rng.randint(1, 400)
            batches.append(pd.Series(stream[i : i + step], name="tok"))
            i += step

        # the same merge as llm4.mg_partition, K-parameterized
        summary = pd.Series(dtype="int64")
        for s in batches:
            vc = s.value_counts()
            summary = (
                vc
                if summary.empty
                else summary.add(vc, fill_value=0).astype("int64")
            )
            if len(summary) > K:
                vals = np.partition(
                    summary.to_numpy(), len(summary) - K - 1
                )
                thresh = vals[len(summary) - K - 1]
                summary = summary[summary > thresh] - thresh

        assert len(summary) <= K
        from collections import Counter

        true = Counter(stream)
        for tok, c in true.items():
            if c * K > n:
                assert tok in summary.index, (
                    f"trial {trial}: heavy token {tok} ({c}/{n}, K={K}) "
                    "evicted from MG summary"
                )


def test_mmr_greedy_contract(spark, registry):
    """Step 1 must be the relevance argmax; selections never repeat;
    scores are the λ-tradeoff of reported rel (sanity on step 2)."""
    out = registry["mmr_diversified_topk"].fn(spark, SF_ORACLE).toPandas()
    assert list(out["step"]) == [1, 2, 3, 4, 5]
    assert out["vec_id"].nunique() == 5
    assert out.loc[0, "mmr_score"] == out.loc[0, "rel"]
    # later steps: score = 0.7·rel − 0.3·maxsim with maxsim ∈ [−1, 1]
    # (cosine may be negative, so the penalty term can be additive)
    dev = (out.loc[1:, "mmr_score"] - 0.7 * out.loc[1:, "rel"]).abs()
    assert (dev <= 0.3 + 1e-9).all()


def test_rendezvous_minimal_disruption(spark, registry):
    """HRW guarantee on real keys: zero illegal moves, every move
    targets the new shard, aggregate moved fraction ≈ 1/9."""
    out = registry["rendezvous_shard_move_audit"].fn(
        spark, SF_ORACLE
    ).toPandas()
    assert (out["n_illegal"] == 0).all()
    total, moved = out["n_keys"].sum(), out["n_moved"].sum()
    assert 0.05 < moved / total < 0.18  # expected 1/9 ≈ 0.111
