"""Structured Streaming sink/semantics tests beyond the oracle-gated
streaming queries: foreachBatch file sink with multi-batch replay.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def test_foreach_batch_parquet_sink(spark, events, tmp_path):
    """foreachBatch: the escape hatch for sinks without native
    streaming support — each micro-batch lands as a batch write.
    maxFilesPerTrigger=1 over two source files forces >= 2 batches,
    proving per-batch (not per-query) invocation."""
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    half = events.count() // 2
    events.limit(half).write.parquet(str(src / "part1"))
    events.subtract(events.limit(half)).write.parquet(str(src / "part2"))

    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    seen_batches = []

    def sink(batch_df, batch_id):
        seen_batches.append(batch_id)
        batch_df.write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(seen_batches) >= 2, seen_batches
    assert spark.read.parquet(out).count() == events.count()


def test_checkpoint_recovery_exactly_once(spark, events, tmp_path):
    """Stop/restart with the same checkpoint must not reprocess
    delivered batches: file source + checkpoint = exactly-once into an
    idempotent (append-parquet counted) sink. This is the recovery
    contract a 100 TB ingestion pipeline leans on."""
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = events.limit(40)
    rest = events.subtract(first).limit(25)
    first.write.parquet(str(src / "f1"))

    schema = events.schema

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    run_stream()
    n1 = spark.read.parquet(out).count()
    assert n1 == 40

    # new file arrives while the stream is down; restart from checkpoint
    rest.write.parquet(str(src / "f2"))
    run_stream()
    got = spark.read.parquet(out)
    assert got.count() == 65  # 40 + 25, nothing replayed
    assert got.select("event_id").distinct().count() == 65
