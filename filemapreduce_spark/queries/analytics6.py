"""Round-5 analytics batch 2: distribution-shift and time-series
structure operators.

Reference parity: none of these exist in the reference (its surface
stops at scan/filter/map/reduce, `/root/reference/interfaces.go`);
north-star extension rows for SURVEY.md §2 Part B.

- PSI (population stability index): THE industry drift gate for
  deployed models/features — decile-binned baseline-vs-current
  distribution divergence, with the conventional smoothing so empty
  bins stay finite.
- Changepoint via binary segmentation (first split): the exact
  single best SSE-reducing split of a daily series — step one of the
  classic binary-segmentation changepoint recursion (Scott & Knott
  1974 lineage).
- Nelson–Aalen cumulative hazard: the counting-process twin of the
  registry's Kaplan–Meier row (Nelson 1972, Aalen 1978) — Σ dᵢ/nᵢ
  over event days, the estimator whose slope reads as the hazard
  rate itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from filemapreduce_spark.queries import register
from filemapreduce_spark.sources.tables import load_table as t

_PSI_SPLIT = "2024-01-16"  # baseline = days before, current = from here
_PSI_EDGES = tuple(i / 10 for i in range(1, 10))  # decile edges


def _psi_edge_sql() -> str:
    return ", ".join(
        f"CAST(percentile_disc({p}) WITHIN GROUP (ORDER BY c) AS BIGINT)"
        f" AS e{i}"
        for i, p in enumerate(_PSI_EDGES, start=1)
    )


@register(
    "psi_value_drift",
    f"""
    WITH cents AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS c,
             CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 0 ELSE 1 END
               AS period
      FROM events
    ), edges AS (
      SELECT event_type, {_psi_edge_sql()}
      FROM cents WHERE period = 0 GROUP BY event_type
    ), binned AS (
      SELECT c.event_type, c.period,
             ({" + ".join(f"CASE WHEN c.c > e.e{i} THEN 1 ELSE 0 END" for i in range(1, 10))})
               AS bin
      FROM cents c JOIN edges e ON e.event_type = c.event_type
    ), grid AS (
      SELECT e.event_type, b.bin
      FROM (SELECT DISTINCT event_type FROM edges) e
      CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) b
    ), cnt AS (
      SELECT g.event_type, g.bin,
             COALESCE(SUM(CASE WHEN x.period = 0 THEN 1 ELSE 0 END), 0)
               AS n0,
             COALESCE(SUM(CASE WHEN x.period = 1 THEN 1 ELSE 0 END), 0)
               AS n1
      FROM grid g
      LEFT JOIN binned x
        ON x.event_type = g.event_type AND x.bin = g.bin
      GROUP BY g.event_type, g.bin
    ), tot AS (
      SELECT event_type,
             CAST(SUM(n0) AS BIGINT) AS t0,
             CAST(SUM(n1) AS BIGINT) AS t1
      FROM cnt GROUP BY event_type
    )
    SELECT c.event_type AS event_type, t.t0 AS n_base, t.t1 AS n_cur,
           CAST(round(1000000.0 * SUM(
             ((c.n1 + 1)::DOUBLE / (t.t1 + 10)
              - (c.n0 + 1)::DOUBLE / (t.t0 + 10))
             * ln(((c.n1 + 1)::DOUBLE / (t.t1 + 10))
                  / ((c.n0 + 1)::DOUBLE / (t.t0 + 10)))
           )) AS BIGINT) AS psi_micro
    FROM cnt c JOIN tot t ON t.event_type = c.event_type
    GROUP BY c.event_type, t.t0, t.t1
    ORDER BY c.event_type
    """,
    tags=("stats", "drift", "mlprep"),
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index per event_type: decile edges from
    the BASELINE period (exact percentile_disc over integer cents —
    actual data values), both periods binned against those edges, and
    PSI = Σ (p_cur − p_base)·ln(p_cur/p_base) over the 10 bins with
    add-one smoothing ((n+1)/(N+10)) so empty bins stay finite — the
    standard model-monitoring drift gate (PSI > 0.2 ≈ action). All
    counts exact integers; the per-bin float term is micro-rounded
    after the 10-term sum (the registry's float-parity contract).

    Scale shape: one scan feeds the baseline percentile agg
    (percentile_disc state is per-group, map-side combinable); the
    9-edge-per-type bounds table broadcasts back for row-local
    binning; the (type, bin) count grid is #types × 10 rows —
    config-bounded, never data-volume-bounded. Two shuffles total,
    both on event_type.
    """
    e = t(spark, sf_dir, "events")
    cents = e.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
        F.when(F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp"), 0)
        .otherwise(1)
        .alias("period"),
    )
    cents.where(F.col("period") == 0).createOrReplaceTempView("_psi_base")
    edges = spark.sql(
        f"SELECT event_type, {_psi_edge_sql()} FROM _psi_base "
        "GROUP BY event_type"
    )
    bin_col = sum(
        F.when(F.col("c") > F.col(f"e{i}"), 1).otherwise(0)
        for i in range(1, 10)
    ).alias("bin")
    binned = cents.join(F.broadcast(edges), "event_type").select(
        "event_type", "period", bin_col
    )
    grid = (
        edges.select("event_type")
        .crossJoin(
            spark.range(10).select(F.col("id").cast("int").alias("bin"))
        )
    )
    cnt = (
        grid.join(binned, ["event_type", "bin"], "left")
        .groupBy("event_type", "bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("period") == 0, 1).otherwise(0)),
                F.lit(0),
            ).alias("n0"),
            F.coalesce(
                F.sum(F.when(F.col("period") == 1, 1).otherwise(0)),
                F.lit(0),
            ).alias("n1"),
        )
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("n0").cast("long").alias("t0"),
        F.sum("n1").cast("long").alias("t1"),
    )
    j = cnt.join(F.broadcast(tot), "event_type")
    pc = (F.col("n1") + 1).cast("double") / (F.col("t1") + 10)
    pb = (F.col("n0") + 1).cast("double") / (F.col("t0") + 10)
    return (
        j.groupBy("event_type", "t0", "t1")
        .agg(
            F.round(1000000.0 * F.sum((pc - pb) * F.log(pc / pb)))
            .cast("long")
            .alias("psi_micro")
        )
        .select(
            "event_type",
            F.col("t0").alias("n_base"),
            F.col("t1").alias("n_cur"),
            "psi_micro",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------
# Changepoint: exact best single SSE split (binary segmentation).
# --------------------------------------------------------------------
@register(
    "changepoint_sse_split",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), pre AS (
      SELECT event_type, day, y,
             ROW_NUMBER() OVER w AS k,
             SUM(y) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS sl,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(y) OVER (PARTITION BY event_type) AS s
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), gains AS (
      SELECT event_type, day, k, n, sl, s,
             round(
               (sl::DOUBLE * sl) / k
               + ((s - sl)::DOUBLE * (s - sl)) / (n - k)
               - (s::DOUBLE * s) / n, 6) AS gain
      FROM pre WHERE k < n
    ), best AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY gain DESC, day) AS rk
      FROM gains
    )
    SELECT event_type,
           strftime(day + INTERVAL 1 DAY, '%Y-%m-%d') AS split_date,
           CAST(n AS BIGINT) AS n_days,
           CAST(round(1000.0 * sl / k) AS BIGINT) AS mean_left_milli,
           CAST(round(1000.0 * (s - sl) / (n - k)) AS BIGINT)
             AS mean_right_milli,
           CAST(round(1000000.0 * gain) AS BIGINT) AS gain_micro
    FROM best WHERE rk = 1
    ORDER BY event_type
    """,
    tags=("timeseries", "stats", "changepoint"),
)
def changepoint_sse_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact single-changepoint detection per event_type — the first
    step of binary segmentation: over the daily count series, find
    the split k minimizing SSE_left + SSE_right, equivalently
    maximizing the between-segment gain
    sl²/k + (s−sl)²/(n−k) − s²/n (all sums exact integers, so the
    float divisions have identical operands in both engines; gain is
    6dp-rounded before the argmax so ties break on the earlier day
    deterministically). Reported: the first day of the right segment,
    segment means (milli), and the SSE reduction (micro).

    Scale shape: raw events collapse to the (type, day) grain first
    (map-side-combined agg); every window after that runs over the
    day-grain series — bounded by the calendar horizon per type,
    never by event volume — and is PARTITIONED BY event_type (no
    global window). One shuffle on event_type.
    """
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    wo = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "day",
        F.row_number().over(wo).alias("k"),
        F.sum("y")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sl"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("y").over(wall).alias("s"),
    )
    sl, s = F.col("sl").cast("double"), F.col("s").cast("double")
    k, n = F.col("k"), F.col("n")
    gain = F.round(
        sl * F.col("sl") / k
        + (s - sl) * (F.col("s") - F.col("sl")) / (n - k)
        - s * F.col("s") / n,
        6,
    )
    gains = pre.where(k < n).withColumn("gain", gain)
    best = gains.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("gain").desc(), "day"
            )
        ),
    ).where(F.col("rk") == 1)
    return best.select(
        "event_type",
        F.date_format(F.date_add("day", 1), "yyyy-MM-dd").alias(
            "split_date"
        ),
        F.col("n").cast("long").alias("n_days"),
        F.round(1000.0 * F.col("sl") / k).cast("long").alias(
            "mean_left_milli"
        ),
        F.round(1000.0 * (F.col("s") - F.col("sl")) / (n - k))
        .cast("long")
        .alias("mean_right_milli"),
        F.round(1000000.0 * F.col("gain")).cast("long").alias("gain_micro"),
    ).orderBy("event_type")


# --------------------------------------------------------------------
# Nelson–Aalen cumulative hazard (counting-process twin of KM).
# --------------------------------------------------------------------
_HORIZON = "2024-01-31"  # same censoring horizon as kaplan_meier row


@register(
    "nelson_aalen_cumhaz",
    f"""
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts
      GROUP BY e.user_id
    ), subjects AS (
      SELECT s.user_id,
             CASE WHEN p.p_ts IS NOT NULL
                  THEN date_diff('day', CAST(s.s_ts AS DATE),
                                 CAST(p.p_ts AS DATE))
                  ELSE date_diff('day', CAST(s.s_ts AS DATE),
                                 DATE '{_HORIZON}')
             END AS t_days,
             CASE WHEN p.p_ts IS NOT NULL THEN 1 ELSE 0 END AS event
      FROM s LEFT JOIN p ON p.user_id = s.user_id
    ), grid AS (
      SELECT t_days,
             CAST(SUM(event) AS BIGINT) AS d,
             COUNT(*) AS leaving
      FROM subjects GROUP BY t_days
    ), risk AS (
      SELECT t_days, d,
             CAST((SELECT COUNT(*) FROM subjects)
                  - COALESCE(SUM(leaving) OVER (ORDER BY t_days
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM grid
    )
    SELECT t_days, n_risk, d,
           round(SUM(CAST(d AS DOUBLE) / n_risk)
                 OVER (ORDER BY t_days
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS cumhaz,
           round(SUM(CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE) * n_risk))
                 OVER (ORDER BY t_days
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS var_est
    FROM risk WHERE d > 0
    ORDER BY t_days
    """,
    tags=("survival", "timeseries", "stats"),
)
def nelson_aalen_cumhaz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard for signup → first purchase
    under right censoring: H(t) = Σ_{{tᵢ≤t}} dᵢ/nᵢ with the standard
    variance estimate Σ dᵢ/nᵢ² (Nelson 1972, Aalen 1978) — the
    counting-process twin of this registry's Kaplan–Meier row, whose
    slope reads directly as the hazard rate and which feeds the
    Breslow baseline in Cox models. Same subjects/grid derivation as
    `kaplan_meier_signup_purchase`; dᵢ and nᵢ are exact integers, the
    two float chains are ordered window sums of identical-operand
    divisions, rounded 6dp.

    Scale shape: per-user reduction (two map-side-combined aggs + one
    keyed join) then the day-grain grid; the unpartitioned windows run
    over that grid — bounded by the observation horizon in days (the
    same allowlisted shape as the KM row), never by user count.
    """
    e = t(spark, sf_dir, "events")
    s = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    horizon = F.lit(_HORIZON).cast("date")
    subjects = s.join(p, "user_id", "left").select(
        "user_id",
        F.when(
            F.col("p_ts").isNotNull(),
            F.datediff(
                F.col("p_ts").cast("date"), F.col("s_ts").cast("date")
            ),
        )
        .otherwise(F.datediff(horizon, F.col("s_ts").cast("date")))
        .cast("long")
        .alias("t_days"),
        F.when(F.col("p_ts").isNotNull(), 1).otherwise(0).alias("event"),
    )
    grid = subjects.groupBy("t_days").agg(
        F.sum("event").cast("long").alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    n_total = subjects.agg(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    wo = Window.orderBy("t_days")
    risk = grid.crossJoin(F.broadcast(n_total)).select(
        "t_days",
        "d",
        (
            F.col("n_total")
            - F.coalesce(
                F.sum("leaving").over(
                    wo.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        )
        .cast("long")
        .alias("n_risk"),
    )
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        risk.where(F.col("d") > 0)
        .select(
            "t_days",
            "n_risk",
            "d",
            F.round(
                F.sum(
                    F.col("d").cast("double") / F.col("n_risk")
                ).over(wc),
                6,
            ).alias("cumhaz"),
            F.round(
                F.sum(
                    F.col("d").cast("double")
                    / (F.col("n_risk").cast("double") * F.col("n_risk"))
                ).over(wc),
                6,
            ).alias("var_est"),
        )
        .orderBy("t_days")
    )
