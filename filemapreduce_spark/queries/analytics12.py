"""Round-5 analytics batch 8: two-proportion z-test.

Reference parity: not in the reference (its surface stops at
scan/filter/map/reduce, `/root/reference/interfaces.go`); north-star
extension row for SURVEY.md §2 Part B.

The two-proportion z-test is the workhorse of conversion-rate A/B
readouts — the registry has the mean-comparison family (Welch t,
Mann-Whitney U, paired t, CUPED, DiD) but not the proportion test
those dashboards actually start with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filemapreduce_spark.queries import register
from filemapreduce_spark.sources.tables import load_table as t


@register(
    "two_proportion_ztest",
    """
    WITH u AS (
      SELECT user_id, user_id % 2 AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ), g AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM u GROUP BY arm
    ), s AS (
      SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
             MAX(CASE WHEN arm = 1 THEN n END) AS n1,
             MAX(CASE WHEN arm = 0 THEN conv END) AS c0,
             MAX(CASE WHEN arm = 1 THEN conv END) AS c1
      FROM g
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           CAST(c0 AS BIGINT) AS conv0, CAST(c1 AS BIGINT) AS conv1,
           CAST(round(1000000.0 * c0 / n0) AS BIGINT) AS p0_micro,
           CAST(round(1000000.0 * c1 / n1) AS BIGINT) AS p1_micro,
           CASE WHEN (c0 + c1) > 0 AND (c0 + c1) < (n0 + n1) THEN
             CAST(round(1000000.0
               * (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
               / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1))) AS BIGINT)
           ELSE 0 END AS z_micro
    FROM s
    """,
    tags=("stats", "experiment", "test"),
)
def two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test (the pooled-variance conversion test
    behind every A/B dashboard): arms = user_id % 2, conversion =
    "user has ≥1 purchase event"; z = (p1 − p0)/√(p̂(1−p̂)(1/n0+1/n1))
    with the pooled rate p̂ — completing the registry's experiment
    family (Welch t and Mann-Whitney compare VALUES; CUPED and DiD
    adjust them; this tests the binary outcome those start from).
    Degenerate pools (0% or 100% conversion, zero variance) report
    z = 0 identically on both engines. All counts are exact
    integers; z is one row-local double chain.

    Scale shape: one map-side-combined per-user reduction (MAX of an
    indicator), one 2-row arm agg, then algebra on a pivoted 1-row
    summary — a single scan, no joins, no windows.
    """
    e = t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).alias("arm"), "converted"
    )
    g = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    s = g.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c1"),
    )
    pool = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (
        1000000.0
        * (
            F.col("c1").cast("double") / F.col("n1")
            - F.col("c0").cast("double") / F.col("n0")
        )
        / F.sqrt(
            pool * (1.0 - pool) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
        )
    )
    return s.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.col("c0").cast("long").alias("conv0"),
        F.col("c1").cast("long").alias("conv1"),
        F.round(1000000.0 * F.col("c0") / F.col("n0"))
        .cast("long")
        .alias("p0_micro"),
        F.round(1000000.0 * F.col("c1") / F.col("n1"))
        .cast("long")
        .alias("p1_micro"),
        F.when(
            (F.col("c0") + F.col("c1") > 0)
            & (F.col("c0") + F.col("c1") < F.col("n0") + F.col("n1")),
            F.round(z).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("z_micro"),
    )
