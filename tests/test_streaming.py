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
