"""Single-row-group boundary: groups with exactly one member hit
n-1 = 0 denominators in sample-variance math. The oracle side
(DuckDB) yields NULL for double/0 while ANSI Spark raises — the
pct=1 degenerate-fixture sweep (round 8) caught two queries doing
the raising. These tests pin the NULL arm with a constructed
fixture so the ephemeral /tmp sweep fixtures aren't the only guard.
"""

from __future__ import annotations

import os

import pytest

from filemapreduce_spark.queries import load_all


@pytest.fixture(scope="module")
def tiny_dir(spark, tmp_path_factory):
    """events.parquet where 'click' has many rows but 'signup' has
    exactly ONE user with ONE row (n_users=1 → n-1 = 0)."""
    d = tmp_path_factory.mktemp("single_row")
    rows = [("click", i % 3 + 1, 10.0 + i, f"2024-01-{(i % 5) + 1:02d}")
            for i in range(12)]
    rows.append(("signup", 99, 42.0, "2024-01-03"))
    df = spark.createDataFrame(
        [(et, u, v) for et, u, v, _ in rows],
        "event_type STRING, user_id BIGINT, value DOUBLE",
    )
    from pyspark.sql import functions as F

    df = df.withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-01-03 10:00:00")),
    )
    df.write.mode("overwrite").parquet(os.path.join(str(d), "events.parquet"))
    return str(d)


def test_dispersion_single_user_type_is_null(spark, tiny_dir):
    reg = load_all()
    out = {
        r["event_type"]: r
        for r in reg["dispersion_index_by_type"].fn(spark, tiny_dir).collect()
    }
    # 'signup' has one user: variance undefined -> NULL, not an error
    assert out["signup"]["n_users"] == 1
    assert out["signup"]["dispersion_milli"] is None
    assert out["click"]["dispersion_milli"] is not None


def test_neyman_single_row_stratum_is_null(spark, tiny_dir):
    reg = load_all()
    out = {
        r["event_type"]: r
        for r in reg["neyman_allocation_by_type"].fn(spark, tiny_dir).collect()
    }
    # the 1-row stratum has undefined SD -> NULL sd/share/alloc; the
    # other stratum still gets a real allocation
    assert out["signup"]["sd_milli"] is None
    assert out["signup"]["n_alloc"] is None
    assert out["click"]["n_alloc"] is not None


def test_assortativity_zero_variance_graph_is_null(spark, tmp_path):
    """A co-purchase graph where every node has the same degree has
    zero degree variance: the correlation denominator is 0 and the
    oracle's double/0 is NULL — ANSI Spark raised instead (3%-of-
    sf0.01 fixture finding, round 8). Orders of exactly two unique
    parts, parts never shared across orders -> all degrees 1."""
    import pyspark.sql.functions as F  # noqa: F401 (schema literals)

    rows = []
    for o in range(1, 4):
        rows.append((o, o * 8))        # l_partkey % 4 == 0 passes
        rows.append((o, o * 8 + 4))    # second unique part, also % 4
    df = spark.createDataFrame(rows, "l_orderkey BIGINT, l_partkey BIGINT")
    df.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )
    reg = load_all()
    out = reg["degree_assortativity_copurchase"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    assert out[0]["n_endpoints"] > 0       # pairs DO exist
    assert out[0]["assortativity_milli"] is None  # zero variance -> NULL


def test_welch_single_row_arm_is_null(spark, tiny_dir):
    """Welch vs-'view' t-test with a single-row arm: undefined
    variance -> NULL t/df like the oracle's double/0 (the tiny_dir
    fixture has no 'view' rows, so build one inline instead)."""
    import pyspark.sql.functions as F

    rows = [("view", i % 3 + 1, 10.0 + i) for i in range(9)]
    rows.append(("signup", 99, 42.0))  # single-row arm
    df = spark.createDataFrame(
        rows, "event_type STRING, user_id BIGINT, value DOUBLE"
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-03 10:00:00")))
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    reg = load_all()
    out = {
        r["event_type"]: r
        for r in reg["welch_ttest_vs_view"].fn(spark, d).collect()
    }
    assert out["signup"]["n_a"] == 1
    assert out["signup"]["t_milli"] is None
    assert out["signup"]["df_milli"] is None


def test_logrank_missing_arm_totals_are_zero(spark, tmp_path):
    """An arm with NO subjects must enter the at-risk math as 0, not
    NULL: the pivot gave NULL for the absent arm and the NULL
    poisoned n1 -> nt -> e1 (float 0/0 NaN — ANSI does not guard
    double division), while the oracle's scalar COUNT(*) is 0
    (n=1-per-group fixture finding). One even-user subject -> arm 1
    is empty; expected deaths for arm 0 must equal observed (1)."""
    import pyspark.sql.functions as F

    rows = [
        ("signup", 2, 1.0, "2024-01-01 00:00:00"),
        ("purchase", 2, 5.0, "2024-01-04 00:00:00"),
    ]
    df = spark.createDataFrame(
        [(et, u, v) for et, u, v, _ in rows],
        "event_type STRING, user_id BIGINT, value DOUBLE",
    ).withColumn(
        "ts",
        F.to_timestamp(
            F.lit("2024-01-01 00:00:00")
        )
        + F.when(F.col("event_type") == "purchase", F.expr("INTERVAL 3 DAYS"))
        .otherwise(F.expr("INTERVAL 0 DAYS")),
    )
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    reg = load_all()
    out = reg["logrank_test_arms"].fn(spark, d).collect()
    assert len(out) == 1 and out[0]["grp"] == 0
    assert out[0]["observed"] == 1
    assert out[0]["expected_milli"] == 1000  # was NULL before the fix


def test_constant_values_null_correlation_and_d(spark, tmp_path):
    """Zero-spread with n >= 2: constant measures give well-defined
    means but 0 variance — correlation/slope and Cohen's d
    denominators are 0, which the oracle NULLs (constant-value
    fixture finding, round 8)."""
    import pyspark.sql.functions as F  # noqa: F401

    li = spark.createDataFrame(
        [(int(i), "A", 10, 100.0) for i in range(8)],
        "l_orderkey BIGINT, l_returnflag STRING, l_quantity BIGINT,"
        " l_extendedprice DOUBLE",
    )
    li.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )
    reg = load_all()
    out = reg["stats_corr_regression"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["corr_qty_price"] is None
    assert out[0]["slope_cents_per_qty"] is None
