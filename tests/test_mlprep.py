"""Invariant tests for mlprep.py (RFM, LOO encoding, hard negatives)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filemapreduce_spark.queries import load_all
from filemapreduce_spark.queries.mlprep import _HN_K

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_rfm_covers_all_users_with_valid_scores(spark, registry):
    rows = registry["rfm_quintile_segments"].fn(spark, SF_SMALL).collect()
    total_users = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == total_users
    for r in rows:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 5


def test_loo_encoding_excludes_self(spark, registry):
    """Category mean of the LOO values must equal the plain category
    mean (LOO redistributes, never shifts the mean), and no row may
    equal the plain mean when its own value differs from it."""
    out = registry["loo_target_encoding"].fn(spark, SF_SMALL)
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    j = out.join(o, "o_orderkey")
    stats = (
        j.groupBy("o_orderpriority")
        .agg(
            F.avg("loo_milli").alias("loo_mean"),
            (F.avg("x") * 1000).alias("plain_mean_milli"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    for s in stats:
        if s["n"] > 1:
            # identity: mean over rows of (S-x)/(n-1) == S/n
            assert abs(s["loo_mean"] - s["plain_mean_milli"]) < 2.0


def test_hard_negatives_never_share_label(spark, registry):
    out = registry["hard_negative_mining"].fn(spark, SF_SMALL)
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        "vec_id", "label"
    )
    j = (
        out.join(
            emb.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("ql"),
            ),
            "query_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("neg_id"), F.col("label").alias("nl")
            ),
            "neg_id",
        )
    )
    assert j.where(F.col("ql") == F.col("nl")).count() == 0
    per_q = out.groupBy("query_id").count().collect()
    assert all(r["count"] <= _HN_K for r in per_q)


def test_class_balance_is_exact_and_subset(spark, registry):
    rows = registry["class_balance_downsample"].fn(spark, SF_SMALL).collect()
    assert rows
    kept_sizes = {r["n_kept"] for r in rows}
    assert len(kept_sizes) == 1, "all labels must keep the same count"
    m = kept_sizes.pop()
    for r in rows:
        assert r["n_kept"] <= r["n_orig"]
        assert m == min(x["n_orig"] for x in rows)


def test_group_kfold_has_no_leakage(spark, registry):
    rows = registry["group_kfold_assignment"].fn(spark, SF_SMALL).collect()
    assert rows
    total_users = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == total_users
    for r in rows:
        assert r["max_folds_per_user"] == 1


def test_stump_split_beats_all_other_splits(spark, registry):
    """The reported split must minimize the Gini cost: recompute the
    cost curve independently and check no candidate is lower."""
    row = registry["decision_stump_split"].fn(spark, SF_SMALL).collect()[0]
    e = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        F.round(F.col("value") * 100).cast("long").alias("c"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    pts = sorted(
        (r["c"], r["y"]) for r in e.collect()
    )
    n_total = len(pts)
    a_total = sum(y for _, y in pts)

    def cost_at(split):
        nl = sum(1 for c, _ in pts if c <= split)
        al = sum(y for c, y in pts if c <= split)
        nr, ar = n_total - nl, a_total - al
        if nl == 0 or nr == 0:
            return None
        gl = (nl * nl - al * al - (nl - al) ** 2) / nl
        gr = (nr * nr - ar * ar - (nr - ar) ** 2) / nr
        return gl + gr

    best = cost_at(row["split_cents"])
    assert best is not None
    distinct = sorted({c for c, _ in pts})[:-1]
    for s in distinct:
        c = cost_at(s)
        assert c is None or c >= best - 1e-9
    assert row["n_left"] + row["n_right"] == n_total
    assert row["pos_left"] + row["pos_right"] == a_total


def test_mutual_information_nonnegative_and_bounded(spark, registry):
    """MI >= 0 always; MI <= H(Y) <= ln(2) for a binary label."""
    import math

    rows = registry["mutual_information_features"].fn(
        spark, SF_SMALL
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert -1e-6 <= r["mi_nats"] <= math.log(2) + 1e-6


def test_eb_shrinkage_pulls_toward_prior(spark, registry):
    """Every shrunk rate must lie between the raw rate and the global
    prior (within rounding)."""
    rows = registry["empirical_bayes_rate_shrinkage"].fn(
        spark, SF_SMALL
    ).collect()
    gx = sum(r["x"] for r in rows)
    gn = sum(r["n"] for r in rows)
    p0_milli = 1000.0 * gx / gn
    for r in rows:
        lo = min(r["raw_milli"], p0_milli) - 1
        hi = max(r["raw_milli"], p0_milli) + 1
        assert lo <= r["shrunk_milli"] <= hi


def test_stratified_adjustment_internal_consistency(spark, registry):
    rows = registry["stratified_adjusted_difference"].fn(
        spark, SF_SMALL
    ).collect()
    assert rows
    for r in rows:
        assert r["n_treated"] > 0 and r["n_control"] > 0
        assert 0 <= r["stratum"] <= 3
        assert r["x_treated"] >= 0 and r["x_control"] >= 0
        assert -1000 <= r["rate_diff_milli"] <= 1000
