"""Round-5 coverage batch: infrastructure-planning operators.

Reference parity: none of these exist in the reference (its surface
stops at scan/filter/map/reduce, `/root/reference/interfaces.go`);
north-star extension rows for SURVEY.md §2 Part B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filemapreduce_spark.queries import register
from filemapreduce_spark.sources.tables import load_table as t

_HRW_OLD = 8  # shard count before scale-out
_HRW_NEW = 9  # shard count after


def _enc_sql(shard: int) -> str:
    """DuckDB rendezvous weight for (c_custkey, shard), encoded as
    weight·16 + shard so argmax is a plain integer MAX (ties on the
    32-bit weight break toward the larger shard id — identically in
    both engines, no struct-comparison semantics needed)."""
    return (
        f"(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':{shard}'),"
        f" 1, 8))::BIGINT * 16 + {shard})"
    )


@register(
    "rendezvous_shard_move_audit",
    f"""
    WITH a AS (
      SELECT c_custkey,
             greatest({", ".join(_enc_sql(s) for s in range(_HRW_OLD))}) % 16
               AS old_shard,
             greatest({", ".join(_enc_sql(s) for s in range(_HRW_NEW))}) % 16
               AS new_shard
      FROM customer
    )
    SELECT CAST(old_shard AS BIGINT) AS old_shard,
           COUNT(*) AS n_keys,
           CAST(SUM(CASE WHEN new_shard = {_HRW_NEW - 1} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved,
           CAST(SUM(CASE WHEN new_shard != old_shard
                          AND new_shard != {_HRW_NEW - 1} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_illegal,
           CAST((1000 * SUM(CASE WHEN new_shard = {_HRW_NEW - 1}
                                 THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
             AS moved_milli
    FROM a
    GROUP BY old_shard
    ORDER BY old_shard
    """,
    tags=("infra", "sharding", "hash"),
)
def rendezvous_shard_move_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing scale-out audit
    (Thaler & Ravishankar 1998): assign every customer key to
    argmax_s weight(key, s) over {OLD} shards and again over {NEW},
    and account the movement. HRW's minimal-disruption guarantee —
    a key moves ONLY if the new shard wins its rendezvous, so every
    move targets shard {NEWIDX} and the expected moved fraction is
    1/{NEW} — is verified exactly: ``n_illegal`` (moves to any other
    shard) must be 0 on every row, and ``moved_milli`` ≈ {EXP}‰.
    This is the audit run before resharding a 100-TB keyed store
    (shuffle state, bucketed tables, sticky routing) to bound the
    data that will actually migrate.

    Exactness: weights are the first 8 md5 hex digits of ``key:shard``
    — deterministic literals in both engines; the argmax is encoded
    as ``weight·16 + shard`` so a plain integer ``greatest`` resolves
    it (ties on the 32-bit weight break toward the larger shard id,
    identically everywhere — no struct-ordering semantics involved).

    Scale shape: entirely row-local (one scan, {TOT} md5s per key,
    no join); the single shuffle carries one row per (old_shard) —
    bounded by the shard count, not the key count.
    """
    enc = [
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("c_custkey").cast("string"),
                            F.lit(f":{s}"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            * 16
            + s
        )
        for s in range(_HRW_NEW)
    ]
    a = t(spark, sf_dir, "customer").select(
        (F.greatest(*enc[:_HRW_OLD]) % 16).alias("old_shard"),
        (F.greatest(*enc) % 16).alias("new_shard"),
    )
    new_idx = _HRW_NEW - 1
    moved = F.sum(F.when(F.col("new_shard") == new_idx, 1).otherwise(0))
    return (
        a.groupBy(F.col("old_shard").cast("long").alias("old_shard"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            moved.cast("long").alias("n_moved"),
            F.sum(
                F.when(
                    (F.col("new_shard") != F.col("old_shard"))
                    & (F.col("new_shard") != new_idx),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_illegal"),
            F.expr(f"CAST((1000 * sum(CASE WHEN new_shard = {new_idx}"
                   " THEN 1 ELSE 0 END)) div count(1) AS BIGINT)")
            .alias("moved_milli"),
        )
        .orderBy("old_shard")
    )


rendezvous_shard_move_audit.__doc__ = (
    rendezvous_shard_move_audit.__doc__
    .replace("{OLD}", str(_HRW_OLD))
    .replace("{NEWIDX}", str(_HRW_NEW - 1))
    .replace("{NEW}", str(_HRW_NEW))
    .replace("{EXP}", str(round(1000 / _HRW_NEW)))
    .replace("{TOT}", str(_HRW_NEW))
)
