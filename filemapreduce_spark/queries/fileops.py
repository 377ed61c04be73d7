"""File-engine semantics exposed as oracle-testable queries.

The full file-MapReduce surface (shared scan, parents inheritance) is
covered by the golden pytest suite over real file trees; these queries
make the path-predicate layer oracle-checkable by synthesizing paths
from the relational tables and applying the SAME compiled glob regex
in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filemapreduce_spark.globs import MultiFilter, PathFilter, compile_glob
from filemapreduce_spark.queries import register
from filemapreduce_spark.queries.relational import t

_GLOB = "src1*/*.txt"
_REGEX = compile_glob(_GLOB)  # ^src1[^/]*/[^/]*\.txt$


@register(
    "glob_path_filter",
    f"""
    SELECT source || '/' || CAST(doc_id AS VARCHAR) || '.txt' AS path, n_chars
    FROM documents
    WHERE regexp_matches(source || '/' || CAST(doc_id AS VARCHAR) || '.txt',
                         '{_REGEX}')
    ORDER BY path
    """,
    tags=("fileops", "glob"),
)
def glob_path_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The glob compiler's output applied as a path predicate — same
    anchored regex evaluated by Spark (rlike) and DuckDB
    (regexp_matches)."""
    d = t(spark, sf_dir, "documents")
    path = F.concat_ws(
        "/", F.col("source"), F.concat(F.col("doc_id").cast("string"), F.lit(".txt"))
    )
    return (
        d.select(path.alias("path"), "n_chars")
        .filter(F.col("path").rlike(_REGEX))
        .orderBy("path")
    )


_MULTI = MultiFilter("src2/*.txt", "src?/*.txt".replace("?", "3"))
_MREGEX = _MULTI.to_regex()


@register(
    "glob_multifilter_union",
    f"""
    SELECT source, COUNT(*) AS n
    FROM documents
    WHERE regexp_matches(source || '/' || CAST(doc_id AS VARCHAR) || '.txt',
                         '{_MREGEX}')
    GROUP BY source ORDER BY source
    """,
    tags=("fileops", "glob", "multifilter"),
)
def glob_multifilter_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultiFilter OR-combination compiled to an alternation regex
    (parity: /root/reference/glob.go:10-30)."""
    d = t(spark, sf_dir, "documents")
    path = F.concat_ws(
        "/", F.col("source"), F.concat(F.col("doc_id").cast("string"), F.lit(".txt"))
    )
    return (
        d.filter(path.rlike(_MREGEX))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .orderBy("source")
    )


@register(
    "hierarchical_rollup_paths",
    """
    WITH f AS (
      SELECT source || '/' || lang AS dir,
             source, lang, n_chars
      FROM documents
    )
    SELECT dir, COUNT(*) AS n_files, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM f GROUP BY dir, source, lang
    ORDER BY dir
    """,
    tags=("fileops", "hierarchy"),
)
def hierarchical_rollup_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-level rollup over a synthesized source/lang hierarchy
    (the 'aggregate per folder' file-engine pattern, relationally)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(
            F.concat_ws("/", "source", "lang").alias("dir"),
            F.col("n_chars"),
        )
        .groupBy("dir")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("dir")
    )
