"""Sinks: partitioned writes must prune on read; bucketed tables must
join without a shuffle. These are plan-shape tests — the properties
that matter at 100 TB, asserted on the physical plan, not just row
counts.
"""

import pytest
from pyspark.sql import functions as F

from filemapreduce_spark.sinks import write_bucketed, write_partitioned

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_partitioned_write_roundtrip_and_pruning(spark, lineitem, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part_sink") / "lineitem_by_flag")
    write_partitioned(lineitem, out, ["l_returnflag"])

    back = spark.read.parquet(out)
    assert back.count() == lineitem.count()

    # a filter on the partition column must become a PartitionFilter
    # (directory pruning), not a row-level scan filter
    q = back.filter(F.col("l_returnflag") == "R")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "l_returnflag" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    exact = (
        lineitem.filter(F.col("l_returnflag") == "R").count()
    )
    assert q.count() == exact


def test_partitioned_write_max_records_splits_files(spark, lineitem, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part_sink") / "lineitem_small_files")
    write_partitioned(
        lineitem.repartition(1), out, ["l_linestatus"], max_records_per_file=500
    )
    back = spark.read.parquet(out)
    n_files = back.select(F.input_file_name()).distinct().count()
    assert back.count() == lineitem.count()
    # ~6k rows at 500/file → well more than one file per partition dir
    assert n_files >= lineitem.count() // 500


def test_bucketed_join_has_no_shuffle(spark, lineitem):
    # saveAsTable uses the session's default warehouse; tables are
    # managed and dropped (with their files) in the finally block
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    write_bucketed(
        lineitem, "li_bucketed", ["l_orderkey"], 8, sort_by=["l_orderkey"]
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "od_bucketed",
        ["l_orderkey"],
        8,
        sort_by=["l_orderkey"],
    )
    li = spark.table("li_bucketed")
    od = spark.table("od_bucketed")
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(od, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # sanity: result matches the plain parquet join
        expect = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert joined.count() == expect
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS od_bucketed")


def test_compact_files_reduces_file_count(spark, tmp_path):
    """compact_files rewrites a fragmented dataset into the file count
    implied by total-bytes / target — the small-files remedy."""
    from filemapreduce_spark.sinks import compact_files

    src = str(tmp_path / "frag")
    dest = str(tmp_path / "compact")
    # 200 tiny files
    spark.range(0, 20000).repartition(200).write.parquet(src)
    n_src = len([p for p in (tmp_path / "frag").iterdir()
                 if p.name.startswith("part-")])
    assert n_src == 200

    # target big enough that everything fits in a couple of files
    n_out = compact_files(spark, src, dest, target_file_bytes=512 * 1024)
    n_disk = len([p for p in (tmp_path / "compact").iterdir()
                  if p.name.startswith("part-")])
    assert n_out == n_disk
    assert n_out < 20  # ~200 tiny files collapsed
    # content preserved
    assert (
        spark.read.parquet(dest).agg({"id": "sum"}).collect()[0][0]
        == sum(range(20000))
    )


def test_clustered_write_disjoint_file_ranges(spark, lineitem, tmp_path):
    """write_clustered must produce files whose key ranges do not
    overlap (that disjointness is what makes parquet min/max footer
    stats skip whole files on range predicates)."""
    import glob as pyglob

    from filemapreduce_spark.sinks import write_clustered

    out = str(tmp_path / "clustered")
    write_clustered(lineitem, out, ["l_shipdate"], n_files=4)

    files = sorted(pyglob.glob(out + "/part-*.parquet"))
    assert len(files) == 4, files
    ranges = []
    for f in files:
        row = (
            spark.read.parquet(f)
            .agg(
                F.min("l_shipdate").alias("lo"),
                F.max("l_shipdate").alias("hi"),
                F.count("*").alias("n"),
            )
            .collect()[0]
        )
        assert row.n > 0
        ranges.append((row.lo, row.hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, ranges

    # content round-trip: clustering must not lose or duplicate rows
    assert spark.read.parquet(out).count() == lineitem.count()


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Schema evolution across file generations: an old writer's files
    lack a column added later. mergeSchema=true must union the
    schemas (missing column -> nulls); the default fast path reads
    one footer and may miss it. A 100 TB table accretes schema
    versions over years — this is the read contract that keeps old
    partitions queryable."""
    out = str(tmp_path / "evolving")
    spark.range(5).selectExpr("id", "id * 2 AS a").write.parquet(
        out + "/gen=1"
    )
    spark.range(5).selectExpr(
        "id + 10 AS id", "id * 3 AS a", "'new' AS b"
    ).write.parquet(out + "/gen=2")

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"id", "a", "b", "gen"}
    assert merged.count() == 10
    # old-generation rows surface the new column as null
    nulls = merged.filter("gen = 1 AND b IS NULL").count()
    assert nulls == 5


def test_file_metadata_hidden_columns(spark, lineitem, tmp_path):
    """Row-level provenance via the _metadata hidden struct on file
    sources: every row can report which file it came from, its size,
    and modification time — the lineage primitive audits and
    incremental reprocessing hang off (reprocess only rows whose
    source file changed)."""
    out = str(tmp_path / "prov")
    lineitem.limit(100).repartition(3).write.parquet(out)

    df = spark.read.parquet(out).select(
        "l_orderkey",
        F.col("_metadata.file_name").alias("src_file"),
        F.col("_metadata.file_size").alias("src_bytes"),
    )
    per_file = df.groupBy("src_file").count().collect()
    assert sum(r["count"] for r in per_file) == 100
    assert all(r["src_file"].endswith(".parquet") for r in per_file)
    assert len(per_file) == 3
    assert df.filter("src_bytes <= 0").count() == 0


def test_zordered_write_tight_ranges_both_dims(spark, lineitem, tmp_path):
    """write_zordered must keep per-file min/max ranges tight on BOTH
    cluster columns (multi-dim file skipping), where single-column
    range clustering leaves the second column's per-file range at
    ~full width."""
    import glob as pyglob

    from filemapreduce_spark.sinks import write_clustered, write_zordered

    zout = str(tmp_path / "zorder")
    rout = str(tmp_path / "range1d")
    write_zordered(lineitem, zout, ("l_orderkey", "l_partkey"), n_files=8)
    write_clustered(lineitem, rout, ["l_orderkey"], n_files=8)

    def mean_range_fraction(path, col):
        files = sorted(pyglob.glob(path + "/part-*.parquet"))
        assert len(files) == 8, files
        glo, ghi = lineitem.agg(F.min(col), F.max(col)).collect()[0]
        span = float(ghi - glo)
        fracs = []
        for f in files:
            lo, hi = spark.read.parquet(f).agg(F.min(col), F.max(col)).collect()[0]
            fracs.append((hi - lo) / span)
        return sum(fracs) / len(fracs)

    # z-order: both dims tight
    assert mean_range_fraction(zout, "l_orderkey") < 0.6
    assert mean_range_fraction(zout, "l_partkey") < 0.6
    # 1-D clustering: first dim perfect, second dim ~full width
    assert mean_range_fraction(rout, "l_orderkey") < 0.2
    assert mean_range_fraction(rout, "l_partkey") > 0.8

    # layout must not lose or duplicate rows
    assert spark.read.parquet(zout).count() == lineitem.count()


def test_compression_codec_tradeoff(spark, lineitem, tmp_path):
    """Codec choice is a first-order storage decision at 100 TB:
    zstd must compress tighter than snappy, snappy tighter than none,
    and every codec must round-trip identical data."""
    import glob as pyglob
    import os

    sizes = {}
    n = lineitem.count()
    for codec in ("none", "snappy", "zstd"):
        out = str(tmp_path / f"codec_{codec}")
        (
            lineitem.coalesce(1)
            .write.option("compression", codec)
            .parquet(out)
        )
        sizes[codec] = sum(
            os.path.getsize(f) for f in pyglob.glob(out + "/part-*.parquet")
        )
        assert spark.read.parquet(out).count() == n
    assert sizes["zstd"] < sizes["snappy"] < sizes["none"], sizes


def test_partition_evolution_union_read(spark, tmp_path):
    """Partition-layout evolution: an old generation partitioned by
    month and a new one by day must stay queryable as ONE dataset,
    with partition pruning still effective inside each generation
    (100 TB tables change their partitioning over the years; readers
    can't require a rewrite)."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 60).cast("int")).alias("d"),
    ).withColumn("month", F.date_format("d", "yyyy-MM")).withColumn(
        "day", F.date_format("d", "yyyy-MM-dd")
    )
    old = str(tmp_path / "gen_month")
    new = str(tmp_path / "gen_day")
    df.filter(F.col("d") < "2024-02-01").write.partitionBy("month").parquet(old)
    df.filter(F.col("d") >= "2024-02-01").write.partitionBy("day").parquet(new)

    merged = spark.read.parquet(old).unionByName(
        spark.read.parquet(new), allowMissingColumns=True
    )
    assert merged.count() == 100
    # a date filter prunes via month dirs in gen 1 and day dirs in gen 2
    jan = merged.filter(F.col("month") == "2024-01")
    feb10 = merged.filter(F.col("day") == "2024-02-10")
    assert jan.count() == df.filter(F.col("month") == "2024-01").count()
    assert feb10.count() == df.filter(F.col("day") == "2024-02-10").count()


def test_dynamic_partition_pruning_star_join(spark, lineitem, tmp_path):
    """Star-schema runtime pruning: a fact table partitioned by its
    dimension key, joined to a filtered dimension, must scan ONLY the
    partitions the dimension filter selects — Spark injects a
    dynamicpruningexpression into the fact scan's PartitionFilters at
    runtime (the dim side broadcasts first). At 100 TB this is the
    difference between scanning one nation's directories and scanning
    the whole table; the static planner can't do it because the
    surviving keys are only known after the dim filter runs."""
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    out = str(tmp_path / "cust_by_nation")
    write_partitioned(cust, out, ["c_nationkey"])
    fact = spark.read.parquet(out)
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet").filter(
        F.col("n_name") == "NATION_7"
    )
    q = fact.join(
        nation, fact.c_nationkey == nation.n_nationkey
    ).agg(F.count(F.lit(1)).alias("n"))

    plan = q._jdf.queryExecution().executedPlan().toString()
    # the fact scan (the only partitioned scan) must carry a runtime
    # dynamicpruningexpression in its PartitionFilters; plan paths are
    # truncated so match on the filter, not the directory name
    fact_scan = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln
        and "dynamicpruningexpression(c_nationkey" in ln.split(
            "PartitionFilters"
        )[-1]
    ]
    assert fact_scan, plan
    expected = cust.filter(F.col("c_nationkey") == 7).count()
    assert q.collect()[0]["n"] == expected


def test_hilbert_curve_bijection_and_adjacency():
    """The defining Hilbert properties (vs Morton): the index is a
    bijection on the grid AND successive curve positions are always
    Manhattan-adjacent cells — no quadrant jumps. Checked exhaustively
    at several grid sizes on the driver-side LUT generator."""
    import numpy as np

    from filemapreduce_spark.sinks import hilbert_xy2d

    for bits in (2, 3, 5, 8):
        n = 1 << bits
        xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        d = hilbert_xy2d(xs.ravel(), ys.ravel(), bits)
        assert sorted(d.tolist()) == list(range(n * n))
        order = np.argsort(d)
        step = np.abs(np.diff(xs.ravel()[order])) + np.abs(
            np.diff(ys.ravel()[order])
        )
        assert (step == 1).all()


def test_hilbert_write_tight_ranges_both_dims(spark, lineitem, tmp_path):
    """write_hilbert must keep per-file min/max ranges tight on BOTH
    cluster columns (the z-order contract) and round-trip losslessly."""
    import glob as pyglob

    from filemapreduce_spark.sinks import write_hilbert

    hout = str(tmp_path / "hilbert")
    write_hilbert(lineitem, hout, ("l_orderkey", "l_partkey"), n_files=8)

    def mean_range_fraction(path, col):
        files = sorted(pyglob.glob(path + "/part-*.parquet"))
        assert len(files) == 8, files
        glo, ghi = lineitem.agg(F.min(col), F.max(col)).collect()[0]
        span = float(ghi - glo)
        fracs = []
        for f in files:
            lo, hi = (
                spark.read.parquet(f).agg(F.min(col), F.max(col)).collect()[0]
            )
            fracs.append((hi - lo) / span)
        return sum(fracs) / len(fracs)

    assert mean_range_fraction(hout, "l_orderkey") < 0.6
    assert mean_range_fraction(hout, "l_partkey") < 0.6
    assert spark.read.parquet(hout).count() == lineitem.count()


def test_clustered_writers_null_and_empty_inputs(spark, tmp_path):
    """Degenerate-input contract for both curve writers: NULL cluster
    keys land in a dedicated leading cell (never clamped into the top
    corner, never dropped by the LUT join), and an empty input writes
    a valid empty dataset instead of raising on None min/max."""
    from filemapreduce_spark.sinks import write_hilbert, write_zordered

    rows = [(i, float(i % 7), "k%d" % i) for i in range(40)]
    rows += [(None, 3.0, "n1"), (5, None, "n2"), (None, None, "n3")]
    df = spark.createDataFrame(rows, "x int, y double, tag string")

    for writer, sub in ((write_zordered, "z"), (write_hilbert, "h")):
        out = str(tmp_path / f"nulls_{sub}")
        writer(df, out, ("x", "y"), n_files=4)
        back = spark.read.parquet(out)
        # no rows dropped (the hilbert LUT join must be LEFT)
        assert back.count() == 43
        assert (
            back.filter(F.col("x").isNull() | F.col("y").isNull()).count()
            == 3
        )
        # the null-key rows share ONE file (the dedicated -1 cell
        # region), so their presence never widens every file's stats
        import glob as pyglob

        files = sorted(pyglob.glob(out + "/part-*.parquet"))
        holding = [
            f
            for f in files
            if spark.read.parquet(f)
            .filter(F.col("x").isNull() | F.col("y").isNull())
            .count()
            > 0
        ]
        assert len(holding) == 1

    empty = df.filter("1=0")
    for writer, sub in ((write_zordered, "ez"), (write_hilbert, "eh")):
        out = str(tmp_path / f"empty_{sub}")
        writer(empty, out, ("x", "y"), n_files=2)
        back = spark.read.parquet(out)
        assert back.count() == 0
        assert set(back.columns) == {"x", "y", "tag"}
