"""File sources: the engine's canonical ``files`` DataFrame.

The reference models a filesystem as ``List``/``Open`` over a rooted
tree (/root/reference/interfaces.go:89-94) with a disk implementation
(filesystem.go:15-42) and an in-memory virtual one for tests
(virtualFileSystem.go:9-33). The Spark-native equivalents:

- Disk: ``spark.read.format("binaryFile")`` with ``recursiveFileLookup``
  — Spark's InMemoryFileIndex does the listing/traversal (the
  reference's hand-rolled DFS at mapreduce.go:142-205), and
  ``pathGlobFilter`` provides listing-time pruning (the reference's
  ``CouldMatch`` subtree pruning, work.go:75-77). Works unchanged on
  HDFS/S3 via the Hadoop FS layer — this is the 100 TB path.
- In-memory: ``files_from_memory`` builds the same shape from a dict
  (the reference's StaticVirtualFileSystem).

Canonical schema: path STRING (relative, '/'-separated), content BINARY,
length LONG, mod_time TIMESTAMP.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from filemapreduce_spark.globs import Filter, as_filter

FILES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("length", T.LongType(), True),
        T.StructField("mod_time", T.TimestampType(), True),
    ]
)


def read_files(
    spark: SparkSession,
    root: str,
    path_filter: Filter | str | None = None,
) -> DataFrame:
    """Recursive binary scan rooted at ``root`` → canonical files DF.

    ``path_filter``'s final segment becomes a ``pathGlobFilter`` so
    non-matching files are pruned at listing time (never opened); the
    full anchored regex is applied on the relative path for exactness.
    """
    flt = as_filter(path_filter)
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
    )
    if flt is not None:
        glob = getattr(flt, "filename_glob", lambda: None)()
        if glob is not None and glob != "*":
            reader = reader.option("pathGlobFilter", glob)

    abs_root = os.path.abspath(root).rstrip("/")
    df = reader.load(abs_root)
    rel = F.regexp_replace(F.col("path"), "^.*?" + re.escape(abs_root) + "/", "")
    df = df.select(
        rel.alias("path"),
        F.col("content"),
        F.col("length"),
        F.col("modificationTime").alias("mod_time"),
    )
    if flt is not None:
        df = df.filter(F.col("path").rlike(flt.to_regex()))
    return df


def files_from_memory(
    spark: SparkSession, files: dict[str, str | bytes]
) -> DataFrame:
    """Virtual filesystem: dict of relative path → content.

    Parity: /root/reference/virtualFileSystem.go:9-33 (test double).
    """
    rows = []
    for path, content in files.items():
        data = content.encode("utf-8") if isinstance(content, str) else bytes(content)
        rows.append((path, data, len(data), None))
    return spark.createDataFrame(rows, FILES_SCHEMA)


def with_text(df: DataFrame, encoding: str = "UTF-8") -> DataFrame:
    """Add a decoded ``text`` column from ``content`` bytes."""
    return df.withColumn("text", F.decode(F.col("content"), encoding))
