"""ML feature-prep operators: RFM quintile segmentation, leave-one-out
target encoding, and hard-negative mining.

The feature-engineering steps between a relational store and a model:
score customers on recency/frequency/monetary quintiles (the classic
CRM segmentation), encode a categorical column by its target mean
WITHOUT self-leakage (leave-one-out), and mine the hard negatives
(most-similar items with a different label) contrastive training
feeds on. All exact arithmetic; all broadcast-small model state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from filemapreduce_spark.operators.money import cents
from filemapreduce_spark.operators.vectors import dot, norm, to_double
from filemapreduce_spark.queries import register
from filemapreduce_spark.sources.tables import load_table as t

_ASOF = "2024-01-31"


# --------------------------------------------------------------------
# RFM quintile segmentation (threshold-broadcast, no global ntile).
# --------------------------------------------------------------------
@register(
    "rfm_quintile_segments",
    f"""
    WITH rfm AS (
      SELECT user_id,
             date_diff('day', MAX(CAST(ts AS DATE)), DATE '{_ASOF}')
               AS r_days,
             COUNT(*) AS f_events,
             CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
               AS m_cents
      FROM events GROUP BY user_id
    ), th AS (
      SELECT quantile_disc(r_days, [0.2, 0.4, 0.6, 0.8]) AS tr,
             quantile_disc(f_events, [0.2, 0.4, 0.6, 0.8]) AS tf,
             quantile_disc(m_cents, [0.2, 0.4, 0.6, 0.8]) AS tm
      FROM rfm
    ), scored AS (
      SELECT CAST(1 + (CASE WHEN r_days > tr[1] THEN 1 ELSE 0 END)
                    + (CASE WHEN r_days > tr[2] THEN 1 ELSE 0 END)
                    + (CASE WHEN r_days > tr[3] THEN 1 ELSE 0 END)
                    + (CASE WHEN r_days > tr[4] THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_score,
             CAST(1 + (CASE WHEN f_events > tf[1] THEN 1 ELSE 0 END)
                    + (CASE WHEN f_events > tf[2] THEN 1 ELSE 0 END)
                    + (CASE WHEN f_events > tf[3] THEN 1 ELSE 0 END)
                    + (CASE WHEN f_events > tf[4] THEN 1 ELSE 0 END)
                  AS BIGINT) AS f_score,
             CAST(1 + (CASE WHEN m_cents > tm[1] THEN 1 ELSE 0 END)
                    + (CASE WHEN m_cents > tm[2] THEN 1 ELSE 0 END)
                    + (CASE WHEN m_cents > tm[3] THEN 1 ELSE 0 END)
                    + (CASE WHEN m_cents > tm[4] THEN 1 ELSE 0 END)
                  AS BIGINT) AS m_score,
             m_cents
      FROM rfm CROSS JOIN th
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_users,
           CAST(SUM(m_cents) AS BIGINT) AS segment_cents
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    tags=("ml", "segmentation", "stats"),
)
def rfm_quintile_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per user compute Recency (days since last
    event at the as-of date), Frequency (event count), Monetary
    (value sum in cents); quintile-score each dimension against
    exact discrete 20/40/60/80th-percentile thresholds; report users
    and monetary mass per (R,F,M) cell — the classic CRM cube.

    Scale — the reason for the threshold-broadcast shape: a global
    ntile(5) would sort every user on one task. Instead the
    thresholds are ONE 1-row exact-percentile aggregate (discrete →
    integer → hash-safe) broadcast back over the user summary, and
    scoring is row-local comparisons. The per-user summary is one
    map-side-combined agg; nothing global ever sees raw events.
    """
    e = t(spark, sf_dir, "events")
    asof = F.lit(_ASOF).cast("date")
    rfm = e.groupBy("user_id").agg(
        F.datediff(asof, F.max(F.col("ts").cast("date"))).alias("r_days"),
        F.count("*").alias("f_events"),
        F.sum(cents("value")).cast("long").alias("m_cents"),
    )
    qs = [0.2, 0.4, 0.6, 0.8]
    th = rfm.agg(
        F.expr(
            f"percentile_disc(array({','.join(map(str, qs))}))"
            " WITHIN GROUP (ORDER BY r_days)"
        ).alias("tr"),
        F.expr(
            f"percentile_disc(array({','.join(map(str, qs))}))"
            " WITHIN GROUP (ORDER BY f_events)"
        ).alias("tf"),
        F.expr(
            f"percentile_disc(array({','.join(map(str, qs))}))"
            " WITHIN GROUP (ORDER BY m_cents)"
        ).alias("tm"),
    )

    def score(metric: str, th_col: str):
        s = F.lit(1)
        for i in range(4):
            s = s + F.when(
                F.col(metric) > F.col(th_col)[i], 1
            ).otherwise(0)
        return s.cast("long")

    scored = rfm.crossJoin(F.broadcast(th)).select(
        score("r_days", "tr").alias("r_score"),
        score("f_events", "tf").alias("f_score"),
        score("m_cents", "tm").alias("m_score"),
        "m_cents",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("m_cents").cast("long").alias("segment_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# --------------------------------------------------------------------
# Leave-one-out target encoding (no self-leakage).
# --------------------------------------------------------------------
@register(
    "loo_target_encoding",
    """
    WITH stats AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS s
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           CASE WHEN st.n > 1
                THEN CAST(round(1000.0
                       * (st.s - CAST(round(o.o_totalprice*100) AS BIGINT))
                       / (st.n - 1)) AS BIGINT)
                ELSE NULL END AS loo_milli
    FROM orders o JOIN stats st USING (o_orderpriority)
    ORDER BY o.o_orderkey
    """,
    tags=("ml", "encoding"),
)
def loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    value: each row is encoded with the mean target of its category
    EXCLUDING itself — (S − x)/(n − 1) — the standard high-cardinality
    categorical encoding that avoids leaking a row's own label into
    its feature (Micci-Barreca 2001's LOO variant). Singleton
    categories encode NULL.

    Exactness: S and x are integer cents; the one division is the
    final derived double, milli-rounded identically in the oracle.

    Scale: category stats are one map-side-combined agg broadcast
    back over the fact table — encoding is a broadcast-join map, no
    per-row window, no shuffle of the facts. The same (n, S) state
    also serves fold-wise or time-sliced encodings by subtracting
    partial sums.
    """
    o = t(spark, sf_dir, "orders")
    stats = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(cents("o_totalprice")).cast("long").alias("s"),
    )
    x = cents("o_totalprice")
    return (
        o.join(F.broadcast(stats), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.when(
                F.col("n") > 1,
                F.round(
                    1000.0 * (F.col("s") - x) / (F.col("n") - 1)
                ).cast("long"),
            ).alias("loo_milli"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------
# Hard-negative mining (nearest neighbors with a DIFFERENT label).
# --------------------------------------------------------------------
_HN_K = 3
_QUERY_MOD = 50

_COS_AB = """
    round(
      list_sum(list_transform(range(1, 65), i -> qa[i]::DOUBLE * cb[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(range(1, 65), i -> qa[i]::DOUBLE * qa[i]::DOUBLE)))
       * sqrt(list_sum(list_transform(range(1, 65), i -> cb[i]::DOUBLE * cb[i]::DOUBLE)))),
      6)
"""


@register(
    "hard_negative_mining",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, label AS qlabel, embedding AS qa
      FROM embeddings WHERE vec_id % {_QUERY_MOD} = 0
    ), c AS (
      SELECT vec_id AS neg_id, label AS clabel, embedding AS cb
      FROM embeddings
    ), scored AS (
      SELECT query_id, neg_id, {_COS_AB} AS cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY {_COS_AB} DESC, neg_id) AS rank
      FROM q JOIN c ON q.qlabel != c.clabel
    )
    SELECT query_id, neg_id, cos, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= {_HN_K}
    ORDER BY query_id, rank
    """,
    tags=("ml", "ann", "embedding", "llm"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-3 most-similar corpus vectors with a DIFFERENT
    label — the negatives that sit closest to the decision boundary
    and carry most of the gradient signal (in-batch random negatives
    are mostly easy; mined hard negatives are what dense retrievers
    like DPR/ANCE train on).

    Scale shape: the query side (a deterministic id-sampled slice) is
    BROADCAST; the corpus streams once — no shuffle of the corpus,
    and the per-query top-k is a query-partitioned window that
    WindowGroupLimit prunes to k per task. At 100 TB swap the scored
    cross stream for the registry's IVF probe (same output contract)
    once |queries|×|corpus| outgrows one pass.
    """
    emb = t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % _QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        to_double(F.col("embedding")).alias("qa"),
    )
    c = emb.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("clabel"),
        to_double(F.col("embedding")).alias("cb"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("qlabel") != F.col("clabel"))
        .select(
            "query_id",
            "neg_id",
            F.round(
                dot(F.col("qa"), F.col("cb"))
                / (norm(F.col("qa")) * norm(F.col("cb"))),
                6,
            ).alias("cos"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cos").desc(), F.col("neg_id")
                )
            ),
        )
    )
    return (
        scored.where(F.col("rank") <= _HN_K)
        .select("query_id", "neg_id", "cos", F.col("rank").cast("long"))
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------
# Class-balanced downsampling (exact equal-per-label subset).
# --------------------------------------------------------------------
@register(
    "class_balance_downsample",
    """
    WITH counts AS (
      SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
    ), m AS (
      SELECT MIN(n) AS m FROM counts
    ), ranked AS (
      SELECT label, vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY label
               ORDER BY md5('bal:' || CAST(vec_id AS VARCHAR)), vec_id)
               AS rn
      FROM embeddings
    )
    SELECT r.label,
           CAST(c.n AS BIGINT) AS n_orig,
           COUNT(*) AS n_kept,
           CAST(bit_xor(('0x' || substring(md5(CAST(r.vec_id AS VARCHAR)),
                                           1, 15))::BIGINT) AS BIGINT)
             AS kept_set_checksum
    FROM ranked r
    JOIN counts c ON c.label = r.label
    CROSS JOIN m
    WHERE r.rn <= m.m
    GROUP BY r.label, c.n
    ORDER BY r.label
    """,
    tags=("ml", "sampling", "balance"),
)
def class_balance_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: undersample every label to the
    minority class's exact count, selecting rows by a deterministic
    md5 order (reproducible 'random' subset, no RNG state). The
    per-label XOR checksum of kept ids proves both engines select the
    IDENTICAL subset, not merely equally-sized ones — XOR is
    order-independent and mergeable, so the checksum also serves as
    the audit state for incremental rebalancing.

    Scale: per-label rank windows on one label shuffle
    (WindowGroupLimit prunes past the cutoff); the minority size is a
    1-row aggregate broadcast. At 100 TB prefer the registry's
    fixed-k md5 top-k sampler per label — same semantics, same plan.
    """
    emb = t(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(F.count("*").alias("n"))
    m = counts.agg(F.min("n").alias("m"))
    ranked = emb.select(
        "label",
        "vec_id",
        F.row_number()
        .over(
            Window.partitionBy("label").orderBy(
                F.md5(F.concat(F.lit("bal:"), F.col("vec_id").cast("string"))),
                "vec_id",
            )
        )
        .alias("rn"),
    )
    kept = (
        ranked.join(F.broadcast(m))
        .where(F.col("rn") <= F.col("m"))
        .join(F.broadcast(counts), "label")
    )
    vid_hash = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (
        kept.groupBy("label", "n")
        .agg(
            F.count("*").alias("n_kept"),
            F.expr(
                "bit_xor(CAST(conv(substring(md5(CAST(vec_id AS STRING)),"
                " 1, 15), 16, 10) AS BIGINT))"
            ).alias("kept_set_checksum"),
        )
        .select(
            "label",
            F.col("n").cast("long").alias("n_orig"),
            "n_kept",
            "kept_set_checksum",
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------
# Group-aware K-fold assignment (no group straddles folds).
# --------------------------------------------------------------------
_N_FOLDS = 5


@register(
    "group_kfold_assignment",
    f"""
    WITH assigned AS (
      SELECT user_id,
             ('0x' || substring(md5('fold:' || CAST(user_id AS VARCHAR)),
                                1, 8))::BIGINT % {_N_FOLDS} AS fold
      FROM (SELECT DISTINCT user_id FROM events)
    ), joined AS (
      SELECT a.fold, e.user_id FROM events e
      JOIN assigned a ON a.user_id = e.user_id
    ), leak AS (
      SELECT CAST(MAX(nf) AS BIGINT) AS max_folds_per_user
      FROM (SELECT user_id, COUNT(DISTINCT fold) AS nf
            FROM joined GROUP BY user_id)
    )
    SELECT fold,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           COUNT(*) AS n_rows,
           l.max_folds_per_user
    FROM joined CROSS JOIN leak l
    GROUP BY fold, l.max_folds_per_user
    ORDER BY fold
    """,
    tags=("ml", "cv", "split"),
)
def group_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware K-fold assignment (GroupKFold): every user's rows
    land in exactly one of 5 folds, assigned by a deterministic md5
    hash of the group key — the split that prevents the classic CV
    leak where one entity's rows appear in both train and validation.
    The output carries the leak audit inline: max distinct folds any
    user touches (must be 1 by construction, verified by the oracle).

    Scale: the assignment is row-local hashing on the group key (the
    distinct + join here exists to expose the audit; a production
    pipeline computes fold = hash(group) % K directly in the row
    projection with zero extra shuffles).
    """
    e = t(spark, sf_dir, "events")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _N_FOLDS
    )
    assigned = e.select("user_id").distinct().select(
        "user_id", fold.alias("fold")
    )
    joined = e.select("user_id").join(F.broadcast(assigned), "user_id")
    leak = (
        joined.groupBy("user_id")
        .agg(F.countDistinct("fold").alias("nf"))
        .agg(F.max("nf").cast("long").alias("max_folds_per_user"))
    )
    return (
        joined.crossJoin(F.broadcast(leak))
        .groupBy("fold", "max_folds_per_user")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count("*").alias("n_rows"),
        )
        .select(
            "fold", "n_users", "n_rows", "max_folds_per_user"
        )
        .orderBy("fold")
    )
