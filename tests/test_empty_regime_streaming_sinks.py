"""Empty-regime hardening for the parts the degenerate-fixture sweep
axes don't reach (round-7 verdict item 2): streaming checkpoint
resume when the FIRST wave is empty, stream-stream joins with one
empty side, foreachBatch upsert whose first micro-batch is empty, and
sink writers on all-NULL cluster keys / zero-row inputs.

The fixture sweeps empty BOTH sides of everything at once; these
scenarios need asymmetric emptiness (empty-then-data, one-side-empty)
that no table-level fixture can express.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from filemapreduce_spark.sinks import (
    compact_files,
    write_bucketed,
    write_clustered,
    write_hilbert,
    write_zordered,
)

EVENT_SCHEMA = "user_id BIGINT, event_type STRING, value DOUBLE, ts TIMESTAMP"


def _events_df(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _rows(n, etype="click", base_min=0):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    return [
        (
            i % 5,
            etype,
            float(i),
            t0 + dt.timedelta(minutes=base_min + i),
        )
        for i in range(n)
    ]


# --------------------------------------------------------------------
# Streaming: exactly-once file-source accounting when wave 1 is EMPTY.
# --------------------------------------------------------------------
def test_incremental_arrival_empty_first_wave(spark, tmp_path):
    """Checkpoint resume over an empty first wave: run 1 sees a 0-row
    file (a landing dir that exists but delivered nothing), run 2 from
    the SAME checkpoint sees the real data. The final aggregate must
    equal the batch aggregate over all rows — wave 1 must not poison
    the file-source log and wave 2 must not be missed."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    stage = str(tmp_path / "stage")
    os.makedirs(src)
    name = f"empty_wave_{uuid.uuid4().hex[:8]}"

    # wave 1: a genuine 0-row parquet file lands
    empty = _events_df(spark, []).coalesce(1)
    empty.write.mode("overwrite").parquet(f"{stage}/w1")
    data = _events_df(spark, _rows(40)).coalesce(1)
    data.write.mode("overwrite").parquet(f"{stage}/w2")

    def land(wave):
        n = 0
        for f in sorted(os.listdir(f"{stage}/w{wave}")):
            if f.endswith(".parquet"):
                os.symlink(f"{stage}/w{wave}/{f}", f"{src}/w{wave}_{n}.parquet")
                n += 1
        assert n >= 1  # the empty wave still lands a real file

    def run_wave():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        agg = stream.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    land(1)
    run_wave()
    assert spark.table(name).count() == 0  # empty wave -> empty agg
    land(2)
    run_wave()  # same checkpoint: must pick up ONLY wave 2
    got = {r["user_id"]: (r["n"], r["cents"]) for r in spark.table(name).collect()}
    want = {
        r["user_id"]: (r["n"], r["cents"])
        for r in data.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == want


# --------------------------------------------------------------------
# Streaming: stream-stream join with ONE empty side.
# --------------------------------------------------------------------
def test_stream_stream_join_one_empty_side(spark, tmp_path):
    """A watermarked stream-stream inner join where one side's filter
    matches nothing must complete (not hang on watermark progress or
    crash on empty state) and produce zero rows."""
    src = str(tmp_path / "ss_src")
    _events_df(spark, _rows(30, "click")).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")  # matches NOTHING
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    pairs = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    name = f"ss_empty_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table(name).count() == 0


# --------------------------------------------------------------------
# Streaming: foreachBatch upsert whose FIRST micro-batch is empty.
# --------------------------------------------------------------------
def test_foreachbatch_first_batch_empty(spark, tmp_path):
    """State bootstrap from an empty first micro-batch: the merge loop
    must initialize zero-row state and still fold the later batches in
    exactly once (final state == batch aggregate of all rows)."""
    src = str(tmp_path / "fb_src")
    state_root = str(tmp_path / "fb_state")
    os.makedirs(src)
    os.makedirs(state_root)

    # file 0: empty; files 1-2: data (maxFilesPerTrigger=1 -> 3 batches,
    # lexicographic landing order makes the empty file batch 1)
    _events_df(spark, []).coalesce(1).write.parquet(f"{src}/b0")
    _events_df(spark, _rows(20)).coalesce(1).write.parquet(f"{src}/b1")
    _events_df(spark, _rows(20, base_min=100)).coalesce(1).write.parquet(
        f"{src}/b2"
    )

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    state = {"path": None, "gen": 0}

    def upsert(batch_df, batch_id):
        agg = batch_df.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        if state["path"] is None:
            merged = agg
        else:
            cur = batch_df.sparkSession.read.parquet(state["path"])
            merged = (
                cur.withColumnRenamed("n", "n0")
                .withColumnRenamed("cents", "c0")
                .join(agg, "user_id", "full")
                .select(
                    "user_id",
                    (
                        F.coalesce("n0", F.lit(0)) + F.coalesce("n", F.lit(0))
                    ).alias("n"),
                    (
                        F.coalesce("c0", F.lit(0))
                        + F.coalesce("cents", F.lit(0))
                    ).alias("cents"),
                )
            )
        state["gen"] += 1
        new_path = os.path.join(state_root, f"gen_{state['gen']}")
        merged.write.mode("overwrite").parquet(new_path)
        state["path"] = new_path

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "fb_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert state["path"] is not None
    got = {
        r["user_id"]: (r["n"], r["cents"])
        for r in spark.read.parquet(state["path"]).collect()
    }
    all_rows = _events_df(spark, _rows(20) + _rows(20, base_min=100))
    want = {
        r["user_id"]: (r["n"], r["cents"])
        for r in all_rows.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == want


# --------------------------------------------------------------------
# Sinks: all-NULL cluster keys with rows present (lo/hi both None but
# row count > 0 — a regime the 0-row test does not reach).
# --------------------------------------------------------------------
def test_curve_writers_all_null_cluster_keys_nonzero_rows(spark, tmp_path):
    rows = [(None, None, "t%d" % i) for i in range(25)]
    df = spark.createDataFrame(rows, "x int, y double, tag string")
    for writer, sub in ((write_zordered, "z"), (write_hilbert, "h")):
        out = str(tmp_path / f"allnull_{sub}")
        writer(df, out, ("x", "y"), n_files=3)
        back = spark.read.parquet(out)
        assert back.count() == 25
        assert back.filter(F.col("tag").startswith("t")).count() == 25


def test_clustered_write_empty_and_all_null_key(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, "a"), (None, "b")], "k int, v string"
    )
    out1 = str(tmp_path / "clustered_allnull")
    write_clustered(df, out1, ["k"], n_files=2)
    assert spark.read.parquet(out1).count() == 2
    out2 = str(tmp_path / "clustered_empty")
    write_clustered(df.filter("1=0"), out2, ["k"], n_files=2)
    assert spark.read.parquet(out2).count() == 0


# --------------------------------------------------------------------
# Sinks: bucketed table at 0 rows still joins shuffle-free.
# --------------------------------------------------------------------
def test_bucketed_write_zero_rows_joins_shuffle_free(spark):
    a = spark.createDataFrame([], "k bigint, v double")
    b = spark.createDataFrame([(1, "x")], "k bigint, tag string")
    write_bucketed(a, "empty_bkt_a", ["k"], 4, sort_by=["k"])
    write_bucketed(b, "empty_bkt_b", ["k"], 4, sort_by=["k"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("empty_bkt_a").join(
            spark.table("empty_bkt_b"), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS empty_bkt_a")
        spark.sql("DROP TABLE IF EXISTS empty_bkt_b")


def test_compact_files_empty_dataset(spark, tmp_path):
    src = str(tmp_path / "compact_src")
    dest = str(tmp_path / "compact_dest")
    spark.createDataFrame([], "a bigint, b string").coalesce(1).write.parquet(
        src
    )
    n = compact_files(spark, src, dest, target_file_bytes=1 << 20)
    assert n >= 1
    back = spark.read.parquet(dest)
    assert back.count() == 0
    assert set(back.columns) == {"a", "b"}
