"""Distributed linear algebra over embedding columns.

The scale pattern for X^T·X-shaped reductions (gram/covariance
matrices, the core of distributed PCA, linear regression via normal
equations, and whitening): each partition computes a dense d×d
partial product with one numpy matmul over its Arrow batch, and only
the d×d partials — never row pairs — are shuffled. For d=64 that is
4096 longs per partition regardless of row count, so the reduction
cost is independent of corpus size.

Exactness: embedding floats are scaled by 1e6 and floored to BIGINT
on both engines (float→double widening is exact, one IEEE multiply,
floor — identical everywhere), so integer partials hash-match the
DuckDB oracle bit-for-bit with no float-summation order issues.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filemapreduce_spark.queries import register
from filemapreduce_spark.sources.tables import load_table as t

_DIM = 64
_SCALE = 1_000_000


# --------------------------------------------------------------------
# Gram matrix: G = X^T X over scaled-integer embeddings.
# --------------------------------------------------------------------
@register(
    "embedding_gram_matrix",
    f"""
    WITH v AS (
      SELECT vec_id, t.i AS i,
             CAST(floor(CAST(embedding[t.i+1] AS DOUBLE) * {_SCALE})
                  AS BIGINT) AS vi
      FROM embeddings, unnest(range({_DIM})) AS t(i)
    )
    SELECT a.i AS i, b.i AS j, CAST(SUM(a.vi * b.vi) AS BIGINT) AS gram_e12
    FROM v a JOIN v b USING (vec_id)
    GROUP BY a.i, b.i ORDER BY i, j
    """,
    tags=("linalg", "arrow", "llm"),
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix G[i,j] = Σ_rows x_i·x_j of the embedding corpus,
    computed the distributed-linear-algebra way: ``mapInArrow``
    produces one d×d int64 partial per Arrow batch (a single numpy
    matmul), and a groupBy(i,j) sums the partials — d² tiny rows
    shuffle, never O(rows²) pairs and never per-row d² fanout.

    The SQL oracle is the naive formulation (explode to (row, i, v_i),
    self-join on row, group by (i,j)) — same algebra, different
    physical plan; hash equality proves the matmul path correct.
    """
    from filemapreduce_spark.operators.vectors import gram_partials

    e = t(spark, sf_dir, "embeddings").select("embedding")
    partials = gram_partials(e, "embedding", _DIM, _SCALE)
    return (
        partials.groupBy(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
        )
        .agg(F.sum("gram_e12").alias("gram_e12"))
        .orderBy("i", "j")
    )


# --------------------------------------------------------------------
# Per-label centroids in exact scaled-integer space.
# --------------------------------------------------------------------
@register(
    "embedding_centroids_by_label",
    f"""
    WITH v AS (
      SELECT label, t.i AS i,
             CAST(floor(CAST(embedding[t.i+1] AS DOUBLE) * {_SCALE})
                  AS BIGINT) AS vi
      FROM embeddings, unnest(range({_DIM})) AS t(i)
    )
    SELECT label, i, CAST(SUM(vi) AS BIGINT) AS sum_e6,
           COUNT(*) AS n,
           (CAST(CAST(SUM(vi) AS BIGINT) AS DOUBLE) / COUNT(*))
             / {_SCALE}.0 AS centroid
    FROM v GROUP BY label, i ORDER BY label, i
    """,
    tags=("linalg", "agg", "llm"),
)
def embedding_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding corpus, one output row per
    (label, dimension). Sums accumulate as exact scaled BIGINTs
    (associative + commutative → partial-agg safe); the only float
    math is the final two-op divide, mirrored exactly in the oracle.

    Scale: posexplode fans each row to d rows but they fold map-side
    into (label, i) partials before the shuffle — wire traffic is
    |labels|·d rows per partition, not |rows|·d. (The mapInArrow
    partial-sum trick of embedding_gram_matrix applies here too; the
    explode form is kept to show the pure-DataFrame path.)
    """
    e = t(spark, sf_dir, "embeddings").select("label", "embedding")
    v = e.select(
        "label",
        F.posexplode("embedding").alias("i", "x"),
    ).select(
        "label",
        F.col("i").cast("long").alias("i"),
        F.floor(F.col("x").cast("double") * _SCALE).cast("long").alias("vi"),
    )
    return (
        v.groupBy("label", "i")
        .agg(F.sum("vi").alias("sum_e6"), F.count(F.lit(1)).alias("n"))
        .withColumn(
            "centroid",
            (F.col("sum_e6").cast("double") / F.col("n")) / float(_SCALE),
        )
        .orderBy("label", "i")
    )
