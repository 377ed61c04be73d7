"""Directory-file propagation: hierarchical metadata inheritance.

The reference's distinctive feature (/root/reference/readme.md:25):
files matching ``Job.DirectoryFiles`` are parsed once per folder and
their contents pushed down to mappers of files in DESCENDANT folders as
a root-first ``parents`` stack (work.go:68-100, jobs.go:13). Scope
rules encoded by the goldens (mapreduce_test.go:403-503):

- a directory file applies to files in strict subfolders only — never
  to its own siblings (stacks are extended only in
  ``addSubfoldersToRemainingWork``, work.go:79-92);
- the stack is ordered root-first (work.go:83-91);
- stacks are per-job (each job has its own DirectoryFiles filter);
- the same file may be both a directory file and a mapped data file
  (mapreduce.go:152-184).

Spark-native design: directory metadata is by construction tiny
relative to the data (one payload per folder), so we build a small
``(meta_dir, depth, payload)`` DataFrame and BROADCAST it into a theta
join on path-prefix (``file_dir LIKE meta_dir || '/%'``). At 100 TB the
data side streams through executors while the broadcast side stays
resident — no shuffle of the big side at all. The root-first ordering
is reconstructed with ``array_sort`` over (depth, payload) structs, so
ordering is deterministic and computed JVM-side (no Python in the row
path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from filemapreduce_spark.globs import Filter, as_filter


def dir_of(path: Column) -> Column:
    """Parent-directory expression: '' for root-level paths.

    Mirrors the reference's path math (joinWithSlash,
    /root/reference/mapreduce.go:456-459): 'a/b/d.txt' → 'a/b',
    'd.txt' → ''.
    """
    return F.regexp_replace(path, "(^|/)[^/]*$", "")


def _depth(dir_col: Column) -> Column:
    """0 for root dir '', else number of segments."""
    return F.when(dir_col == "", F.lit(0)).otherwise(
        F.size(F.split(dir_col, "/"))
    )


def attach_parents(
    files_df: DataFrame,
    data_df: DataFrame,
    dir_filter: Filter | str,
    payload: Column,
    broadcast_dirs: bool = True,
) -> DataFrame:
    """Attach a root-first ``parents`` array column to ``data_df``.

    - ``files_df``: the full (shared, cached) files DF — directory
      files are discovered here, independent of the data filter.
    - ``data_df``: the job's filtered data files (must retain ``path``).
    - ``dir_filter``: glob/Filter selecting directory files.
    - ``payload``: expression over a directory-file row producing the
      parsed payload handed to mappers (e.g. ``from_json(decode(
      content,'UTF-8'), schema)``).

    - ``broadcast_dirs``: broadcast the per-directory parents table for
      the final equi-join (right default when distinct dirs × payload
      fit in the broadcast budget; set False on trees with tens of
      millions of folders to fall back to a shuffled equi-join).

    Returns ``data_df`` plus ``parents: ARRAY<payload_type>`` ordered
    root-first (empty array when no ancestors match).
    """
    flt = as_filter(dir_filter)
    meta = (
        files_df.filter(F.col("path").rlike(flt.to_regex()))
        .select(
            dir_of(F.col("path")).alias("_meta_dir"),
            payload.alias("_meta_payload"),
        )
        .withColumn("_meta_depth", _depth(F.col("_meta_dir")))
    )

    data = data_df.withColumn("_file_dir", dir_of(F.col("path")))

    # Parents are a property of the DIRECTORY, not the file: aggregate
    # the ancestor stack once per distinct dir (small), then equi-join
    # it back onto the data. At scale this keeps the expensive theta
    # join on a tiny (dirs × meta) input instead of (files × meta).
    dirs = data.select("_file_dir").distinct()

    # strict-descendant prefix condition (subfolders only, not siblings)
    cond = (
        (F.col("_meta_dir") == "") & (F.col("_file_dir") != "")
    ) | F.col("_file_dir").startswith(F.concat(F.col("_meta_dir"), F.lit("/")))

    dir_parents = (
        dirs.join(F.broadcast(meta), cond, "left")
        .groupBy("_file_dir")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_meta_dir").isNotNull(),
                        F.struct(
                            F.col("_meta_depth").alias("d"),
                            F.col("_meta_payload").alias("p"),
                        ),
                    )
                )
            ).alias("_stack")
        )
        .select(
            "_file_dir",
            F.transform(F.col("_stack"), lambda s: s["p"]).alias("parents"),
        )
    )

    if broadcast_dirs:
        dir_parents = F.broadcast(dir_parents)
    return data.join(dir_parents, "_file_dir", "left").drop("_file_dir")
