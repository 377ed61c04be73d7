"""Round-5 analytics batch 6: node-level graph structure, link
prediction, closed-form regularized regression, and jackknife
uncertainty.

Reference parity: none of these exist in the reference (its surface
stops at scan/filter/map/reduce, `/root/reference/interfaces.go`);
north-star extension rows for SURVEY.md §2 Part B.

- Local clustering coefficient (Watts & Strogatz 1998): per-node
  triangle density 2T/(k(k-1)) over the part co-purchase graph —
  the node-level refinement of the registry's global triangle count.
- Common-neighbors / Jaccard link prediction (Liben-Nowell &
  Kleinberg 2003): scores NON-adjacent pairs by shared-neighbor
  overlap — the classic "who should be connected next" primitive
  behind recommendation candidate generation.
- Ridge regression by normal equations (Hoerl & Kennard 1970):
  (X'X + λI)β = X'y solved in closed form by Cramer's rule on a
  3x3 system whose sufficient statistics are one pass of exact
  DECIMAL accumulators — the "distribute the co-moments, solve on
  the driver-sized row" pattern (same family as the covariance
  matrix and OLS rows).
- Jackknife leave-one-group-out variance (Quenouille 1956; Tukey
  1958): the standard error of the grand mean from G delete-one-
  nation replicates — computable exactly from per-group partial
  sums, no resampling pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filemapreduce_spark.operators.money import cents
from filemapreduce_spark.queries import register
from filemapreduce_spark.sources.tables import load_table as t

# ------------------------------------------------------------------
# Local clustering coefficient over the part co-purchase graph.
# ------------------------------------------------------------------
_LCC_MOD = 4  # same sparse slice as triangle_count_copurchase
_LCC_TOP = 20


@register(
    "local_clustering_coefficient",
    f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey % {_LCC_MOD} = 0
    ), e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY node
    ), tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), tcount AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
        SELECT a AS node FROM tri UNION ALL
        SELECT b AS node FROM tri UNION ALL
        SELECT c AS node FROM tri
      ) GROUP BY node
    )
    SELECT d.node, d.degree,
           CAST(COALESCE(tc.triangles, 0) AS BIGINT) AS triangles,
           CAST(round(1000.0 * 2 * COALESCE(tc.triangles, 0)
                      / (d.degree * (d.degree - 1))) AS BIGINT)
             AS lcc_milli
    FROM deg d LEFT JOIN tcount tc ON tc.node = d.node
    WHERE d.degree >= 2
    ORDER BY lcc_milli DESC, d.degree DESC, d.node
    LIMIT {_LCC_TOP}
    """,
    tags=("graph", "structure"),
)
def local_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Local clustering coefficient (Watts & Strogatz 1998) per node
    of the part co-purchase graph (same sparse slice as
    `triangle_count_copurchase`): 2·T_i / (k_i·(k_i−1)), the fraction
    of a node's neighbor pairs that are themselves connected. Each
    canonical triangle (a<b<c) credits all three corners; nodes with
    degree < 2 are undefined and excluded. Top-{K} by coefficient
    (ties broken by degree then node id — fully deterministic).

    Scale shape: edge generation shuffles on order key (bounded
    fanout); degrees are one map-side-combined agg over the edge
    endpoints; the triangle closure is the same two endpoint-keyed
    joins as the global count, re-aggregated per corner; the top-k is
    a TakeOrderedAndProject. Skew guard at 100 TB: cap or salt
    super-node degrees before the closure join (AQE skew-join
    handles moderate cases).
    """
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % _LCC_MOD == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .distinct()
        # the edge table feeds FIVE branches (deg twice, e1/e2/e3) —
        # persist so the li⨝li self-join + distinct behind it runs
        # once, not once per reference (round-6 audit: 44 exchanges)
        .persist()
    )
    # explode-of-array instead of a 2-way union: ONE reference to the
    # edge table, so the plan carries one scan of it, not two
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    # one reference to the triangle closure (not three union arms —
    # each arm re-plans the two closure joins)
    tcount = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    tr = F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
    return (
        deg.join(tcount, "node", "left")
        .filter(F.col("degree") >= 2)
        .select(
            "node",
            "degree",
            tr.alias("triangles"),
            F.round(
                1000.0
                * 2
                * tr
                / (F.col("degree") * (F.col("degree") - 1))
            )
            .cast("long")
            .alias("lcc_milli"),
        )
        .orderBy(
            F.col("lcc_milli").desc(), F.col("degree").desc(), "node"
        )
        .limit(_LCC_TOP)
    )


local_clustering_coefficient.__doc__ = (
    local_clustering_coefficient.__doc__.replace("{K}", str(_LCC_TOP))
)


# ------------------------------------------------------------------
# Common-neighbors / Jaccard link prediction.
# ------------------------------------------------------------------
_LP_MOD = 6  # sparser slice: candidate pairs grow with degree²
_LP_TOP = 15


@register(
    "common_neighbors_link_prediction",
    f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey % {_LP_MOD} = 0
    ), e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), adj AS (
      SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
    ), deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM adj GROUP BY u
    ), cand AS (
      SELECT x.u AS a, y.u AS b, CAST(COUNT(*) AS BIGINT) AS cn
      FROM adj x JOIN adj y ON x.v = y.v AND x.u < y.u
      GROUP BY x.u, y.u
    ), nonedge AS (
      SELECT c.a, c.b, c.cn FROM cand c
      LEFT JOIN e ON e.u = c.a AND e.v = c.b
      WHERE e.u IS NULL
    )
    SELECT n.a, n.b, n.cn,
           CAST(round(1000.0 * n.cn
                      / (da.degree + db.degree - n.cn)) AS BIGINT)
             AS jaccard_milli
    FROM nonedge n
    JOIN deg da ON da.node = n.a
    JOIN deg db ON db.node = n.b
    ORDER BY jaccard_milli DESC, n.cn DESC, n.a, n.b
    LIMIT {_LP_TOP}
    """,
    tags=("graph", "link-prediction"),
)
def common_neighbors_link_prediction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link prediction by neighborhood overlap (Liben-Nowell &
    Kleinberg 2003) on a sparse part co-purchase slice: every
    NON-adjacent pair sharing ≥1 neighbor is scored by Jaccard
    |Γa∩Γb| / |Γa∪Γb| — the "customers who bought these also bought
    together" candidate generator. Existing edges are anti-joined
    out; top-{K} by score with exact integer tie-breaks.

    Scale shape: candidate generation is the adjacency self-join on
    the SHARED NEIGHBOR (an inverted-index join — pairs are produced
    only where evidence exists, never enumerated); the anti-join and
    two degree lookups are key-bounded equi-joins. Super-node fanout
    is the quadratic term at 100 TB: cap or sample neighbor lists
    above a degree bound before the self-join (the same guard as the
    AllPairs set-similarity row).
    """
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % _LP_MOD == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .distinct()
        # read by the adj union (2×) and the non-edge anti-join —
        # persist so the self-join + distinct runs once (r6 audit: 34)
        .persist()
    )
    adj = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()  # read by deg and both sides of the candidate join
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    x, y = adj.alias("x"), adj.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.v") == F.col("y.v"))
            & (F.col("x.u") < F.col("y.u")),
        )
        .groupBy(F.col("x.u").alias("a"), F.col("y.u").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
    )
    nonedge = cand.join(
        e,
        (F.col("u") == F.col("a")) & (F.col("v") == F.col("b")),
        "left_anti",
    )
    da = deg.select(
        F.col("node").alias("na"), F.col("degree").alias("dega")
    )
    db = deg.select(
        F.col("node").alias("nb"), F.col("degree").alias("degb")
    )
    return (
        nonedge.join(da, F.col("a") == F.col("na"))
        .join(db, F.col("b") == F.col("nb"))
        .select(
            "a",
            "b",
            "cn",
            F.round(
                1000.0
                * F.col("cn")
                / (F.col("dega") + F.col("degb") - F.col("cn"))
            )
            .cast("long")
            .alias("jaccard_milli"),
        )
        .orderBy(
            F.col("jaccard_milli").desc(), F.col("cn").desc(), "a", "b"
        )
        .limit(_LP_TOP)
    )


common_neighbors_link_prediction.__doc__ = (
    common_neighbors_link_prediction.__doc__.replace("{K}", str(_LP_TOP))
)


# ------------------------------------------------------------------
# Ridge regression by normal equations (Cramer closed form).
# ------------------------------------------------------------------
_RIDGE_LAMBDA = 10000  # fixed regularizer on the two slopes (not b0)


@register(
    "ridge_normal_equations",
    f"""
    WITH f AS (
      SELECT l.l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS x1,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS x2
      FROM lineitem l GROUP BY l.l_orderkey
    ), xy AS (
      SELECT f.x1, f.x2,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS y
      FROM f JOIN orders o ON o.o_orderkey = f.l_orderkey
    ), s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(x1 AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(SUM(CAST(x2 AS HUGEINT)) AS HUGEINT) AS s2,
             CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
             CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
             CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
             CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
             CAST(SUM(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y
      FROM xy
    ), m AS (
      SELECT CAST(n AS DOUBLE) AS a11, CAST(s1 AS DOUBLE) AS a12,
             CAST(s2 AS DOUBLE) AS a13,
             CAST(s11 + {_RIDGE_LAMBDA} AS DOUBLE) AS a22,
             CAST(s12 AS DOUBLE) AS a23,
             CAST(s22 + {_RIDGE_LAMBDA} AS DOUBLE) AS a33,
             CAST(sy AS DOUBLE) AS v1, CAST(s1y AS DOUBLE) AS v2,
             CAST(s2y AS DOUBLE) AS v3,
             CAST(n AS BIGINT) AS n_orders
      FROM s
    )
    SELECT n_orders,
           CAST(round(1000000.0 *
             (v1*(a22*a33-a23*a23) - a12*(v2*a33-a23*v3)
              + a13*(v2*a23-a22*v3))
             / (a11*(a22*a33-a23*a23) - a12*(a12*a33-a23*a13)
                + a13*(a12*a23-a22*a13))) AS BIGINT) AS b0_micro,
           CAST(round(1000000.0 *
             (a11*(v2*a33-a23*v3) - v1*(a12*a33-a23*a13)
              + a13*(a12*v3-v2*a13))
             / (a11*(a22*a33-a23*a23) - a12*(a12*a33-a23*a13)
                + a13*(a12*a23-a22*a13))) AS BIGINT) AS b1_micro,
           CAST(round(1000000.0 *
             (a11*(a22*v3-v2*a23) - a12*(a12*v3-v2*a13)
              + v1*(a12*a23-a22*a13))
             / (a11*(a22*a33-a23*a23) - a12*(a12*a33-a23*a13)
                + a13*(a12*a23-a22*a13))) AS BIGINT) AS b2_micro
    FROM m
    """,
    tags=("mlprep", "regression", "closed-form"),
)
def ridge_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression (Hoerl & Kennard 1970) of order total price
    (cents) on two order features — line count x1 and total quantity
    x2 — solved in CLOSED FORM: one distributed pass accumulates the
    nine sufficient statistics (n, Σx, Σxx', Σxy) as exact DECIMAL
    integers, then (X'X + λ·diag(0,1,1))β = X'y is solved by
    Cramer's rule on the resulting 3×3 system in the final 1-row
    projection (the intercept is unpenalized, λ={L}). The determinant
    algebra is an identical op-for-op double chain of those exact
    integers on both engines.

    Scale shape: the feature build is one map-side-combined
    groupBy(orderkey) plus one equi-join to orders; the statistics
    agg collapses everything to ONE row — the classic "ship
    sufficient statistics, not data" distributed-regression pattern
    (same family as the covariance-matrix and OLS-slope rows). No
    iteration, no driver loop, no collect.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    f = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("x1"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("x2"),
    )
    xy = f.join(
        o.select("o_orderkey", cents("o_totalprice").alias("y")),
        f.l_orderkey == F.col("o_orderkey"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")
    s = xy.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d("x1")).alias("s1"),
        F.sum(d("x2")).alias("s2"),
        F.sum(d("x1") * F.col("x1")).alias("s11"),
        F.sum(d("x1") * F.col("x2")).alias("s12"),
        F.sum(d("x2") * F.col("x2")).alias("s22"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x1") * F.col("y")).alias("s1y"),
        F.sum(d("x2") * F.col("y")).alias("s2y"),
    )
    lam = F.lit(_RIDGE_LAMBDA)
    m = s.select(
        F.col("n").cast("double").alias("a11"),
        F.col("s1").cast("double").alias("a12"),
        F.col("s2").cast("double").alias("a13"),
        (F.col("s11") + lam).cast("double").alias("a22"),
        F.col("s12").cast("double").alias("a23"),
        (F.col("s22") + lam).cast("double").alias("a33"),
        F.col("sy").cast("double").alias("v1"),
        F.col("s1y").cast("double").alias("v2"),
        F.col("s2y").cast("double").alias("v3"),
        F.col("n").cast("long").alias("n_orders"),
    )
    a11, a12, a13 = F.col("a11"), F.col("a12"), F.col("a13")
    a22, a23, a33 = F.col("a22"), F.col("a23"), F.col("a33")
    v1, v2, v3 = F.col("v1"), F.col("v2"), F.col("v3")
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    det0 = (
        v1 * (a22 * a33 - a23 * a23)
        - a12 * (v2 * a33 - a23 * v3)
        + a13 * (v2 * a23 - a22 * v3)
    )
    det1 = (
        a11 * (v2 * a33 - a23 * v3)
        - v1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * v3 - v2 * a13)
    )
    det2 = (
        a11 * (a22 * v3 - v2 * a23)
        - a12 * (a12 * v3 - v2 * a13)
        + v1 * (a12 * a23 - a22 * a13)
    )
    return m.select(
        "n_orders",
        F.round(1000000.0 * det0 / det).cast("long").alias("b0_micro"),
        F.round(1000000.0 * det1 / det).cast("long").alias("b1_micro"),
        F.round(1000000.0 * det2 / det).cast("long").alias("b2_micro"),
    )


ridge_normal_equations.__doc__ = ridge_normal_equations.__doc__.replace(
    "{L}", str(_RIDGE_LAMBDA)
)


# ------------------------------------------------------------------
# Jackknife leave-one-nation-out variance of the grand mean.
# ------------------------------------------------------------------
@register(
    "jackknife_nation_mean_se",
    """
    WITH ov AS (
      SELECT c.c_nationkey AS nk,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), g AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS s_g
      FROM ov GROUP BY nk
    ), tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n_all,
             CAST(SUM(s_g) AS HUGEINT) AS s_all,
             CAST(COUNT(*) AS BIGINT) AS n_groups
      FROM g
    ), loo AS (
      SELECT CAST(round(1000.0 * (tot.s_all - g.s_g)
                        / (tot.n_all - g.n_g)) AS BIGINT) AS m_milli
      FROM g, tot WHERE tot.n_all > g.n_g
    ), acc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS gg,
             CAST(SUM(CAST(m_milli AS HUGEINT)) AS HUGEINT) AS sm,
             CAST(SUM(CAST(m_milli AS HUGEINT) * m_milli) AS HUGEINT)
               AS sm2
      FROM loo
    )
    SELECT tot.n_groups, tot.n_all,
           CAST(round(1000.0 * tot.s_all / tot.n_all) AS BIGINT)
             AS grand_mean_milli,
           CAST(round(sqrt(
             (CAST(acc.gg AS DOUBLE) - 1) / acc.gg
             * (CAST(acc.sm2 AS DOUBLE)
                - CAST(acc.sm AS DOUBLE) * acc.sm / acc.gg)))
             AS BIGINT) AS jack_se_milli
    FROM tot, acc
    """,
    tags=("stats", "uncertainty"),
)
def jackknife_nation_mean_se(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Jackknife standard error (Quenouille 1956; Tukey 1958) of the
    grand mean order value, with NATIONS as the delete-one groups
    (the grouped jackknife a clustered pipeline uses when rows within
    a group are dependent): each replicate mean drops one nation and
    re-derives the mean from the complement's EXACT partial sums —
    no second data pass, no resampling. Replicate means are
    quantized to integer milli-cents BEFORE accumulation, so the
    Σm and Σm² sums are exact integers and the variance algebra
    (G−1)/G · Σ(m−m̄)² is one deterministic double chain.

    Scale shape: one orders⨝customer equi-join, one
    map-side-combined groupBy(nation) (25 rows), a 1-row total
    broadcast onto those 25 rows, and a final 25-row agg — the
    delete-one replicates cost ALGEBRA, not scans, exactly why the
    grouped jackknife beats the bootstrap at 100 TB.
    """
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    ov = o.join(
        c.select("c_custkey", "c_nationkey"),
        o.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_nationkey").alias("nk"),
        cents("o_totalprice").alias("cents"),
    )
    # persisted: the per-nation summary (<= 25 rows) feeds the grand
    # total, the leave-one-out replicates AND (via tot) the final
    # projection — without the cache each branch re-ran the
    # orders⨝customer pass (static audit: 6 scans -> 2)
    g = (
        ov.groupBy("nk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("s_g"),
        )
        .persist()
    )
    tot = g.agg(
        F.sum("n_g").cast("long").alias("n_all"),
        F.sum("s_g").alias("s_all"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    loo = (
        g.crossJoin(F.broadcast(tot))
        .filter(F.col("n_all") > F.col("n_g"))
        .select(
            F.round(
                1000.0
                * (F.col("s_all") - F.col("s_g")).cast("double")
                / (F.col("n_all") - F.col("n_g"))
            )
            .cast("long")
            .alias("m_milli")
        )
    )
    acc = loo.agg(
        F.count(F.lit(1)).cast("long").alias("gg"),
        F.sum(F.col("m_milli").cast("decimal(38,0)")).alias("sm"),
        F.sum(
            F.col("m_milli").cast("decimal(38,0)") * F.col("m_milli")
        ).alias("sm2"),
    )
    return (
        tot.crossJoin(F.broadcast(acc))
        .select(
            "n_groups",
            "n_all",
            # try_divide: zero leave-one-out replicates (empty input,
            # gg=0) → NULL SE like the oracle's /0, not an ANSI error
            # (all-empty sweep finding)
            F.round(
                F.try_divide(
                    1000.0 * F.col("s_all").cast("double"), F.col("n_all")
                )
            )
            .cast("long")
            .alias("grand_mean_milli"),
            F.round(
                F.sqrt(
                    F.try_divide(
                        F.col("gg").cast("double") - 1, F.col("gg")
                    )
                    * (
                        F.col("sm2").cast("double")
                        - F.try_divide(
                            F.col("sm").cast("double")
                            * F.col("sm").cast("double"),
                            F.col("gg"),
                        )
                    )
                )
            )
            .cast("long")
            .alias("jack_se_milli"),
        )
    )
