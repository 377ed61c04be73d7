"""Structured Streaming surface.

The reference has no streaming (verified — no watermark/window/state
anywhere in /root/reference), so this is north-star extension surface:
file-source streams with tumbling-window aggregation and gap-based
sessionization. The tumbling aggregation has an exact batch oracle (a
bounded file stream processed to completion computes the same answer
as the batch query); sessionization is implemented as the batch
window-function formulation with the same oracle.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from filemapreduce_spark.queries import register
from filemapreduce_spark.queries.relational import t


@register(
    "streaming_tumbling_counts",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value*100) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
    tags=("streaming", "window"),
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling-window counts computed by an actual Structured
    Streaming query (file source → window agg → memory sink, processed
    to completion with availableNow). The oracle is the batch
    equivalent — identical by the replayability of bounded streams."""
    static = t(spark, sf_dir, "events")
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    # the file stream source requires a DIRECTORY; expose the single
    # events.parquet through a temp dir (symlink — no data copy)
    stream_dir = tempfile.mkdtemp(prefix="fmr_stream_src_")
    os.symlink(f"{sf_dir}/events.parquet", f"{stream_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(stream_dir)
    if dict(stream.dtypes).get("ts") == "bigint":
        # same nanos→micros conversion as the batch loader
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (
        stream
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0)
            .cast("double")
            .alias("sum_value"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="fmr_stream_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("day", "event_type")
    )


@register(
    "sessionize_events",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ep, ts FROM events
    ), l AS (
      SELECT *, lag(ep) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM e
    ), f AS (
      SELECT *, CASE WHEN prev IS NULL OR ep - prev > 1800000000 THEN 1 ELSE 0 END AS new_s
      FROM l
    ), s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM f
    )
    SELECT user_id, CAST(sid AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ep) AS start_epoch_us,
           MAX(ep) - MIN(ep) AS duration_us
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_id
    """,
    tags=("streaming", "session"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative
    session index — one shuffle by user, fully distributed."""
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.unix_micros("ts").alias("ep")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = 1_800_000_000  # 30 min
    sess = (
        e.withColumn("prev", F.lag("ep").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull() | (F.col("ep") - F.col("prev") > gap_us), 1
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(wrun))
    )
    return (
        sess.groupBy("user_id", F.col("sid").alias("session_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ep").alias("start_epoch_us"),
            (F.max("ep") - F.min("ep")).alias("duration_us"),
        )
        .orderBy("user_id", "session_id")
    )
