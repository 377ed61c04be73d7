"""Relational table sources over the driver's parquet test data.

Column pruning + predicate pushdown reach the parquet scan because we
only ever wrap ``spark.read.parquet`` — no materialization between the
scan and the query plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Tables whose queries are dominated by per-row expression work
# (hashing, shingling, vector folds). The test files are single-row-
# group parquet (one scan task no matter what maxPartitionBytes says),
# so without an explicit split ALL that compute runs on one core. On a
# real multi-file dataset the scan already yields >= parallelism
# partitions and the repartition below becomes a no-op branch.
_COMPUTE_HEAVY = {"documents", "embeddings"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is TIMESTAMP(NANOS); the session reads nanos as int64
    # — truncate to microseconds (matches DuckDB's read of the file).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # parquet isAdjustedToUTC=false columns arrive as TIMESTAMP_NTZ;
    # the session timezone is pinned to UTC, so casting to TIMESTAMP is
    # value-preserving and keeps unix_micros()/window() applicable.
    ntz = [c for c, d in df.dtypes if d == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    if name in _COMPUTE_HEAVY:
        # Half the core count, floor 8: measured sweet spot between
        # per-task overhead (Python worker round-trips, tiny-task
        # scheduling) and per-row expression cost — 16-way beats both
        # 1-way (68s) and 32-way (8.5s → 6.0s) for the minhash
        # signature pipeline on local[32].
        target = max(8, spark.sparkContext.defaultParallelism // 2)
        if df.rdd.getNumPartitions() < target:
            # round-robin split so the downstream hash/fold expressions
            # use every core; the shuffled payload is just the raw rows
            df = df.repartition(target)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for ``spark.sql`` queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
