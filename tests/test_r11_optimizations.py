"""Focused invariance tests for the round-11 optimizations.

Each optimization rewrote an operator's internals while promising an
IDENTICAL result set; these tests pin the equivalence against a naive
reference implementation on small synthetic frames (no parquet, no
oracle — the oracle gate is driver_sim; this pins the algebra).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window


@pytest.fixture(scope="module")
def spark():
    from filemapreduce_spark.session import get_spark

    s = get_spark(app_name="test_r11_opts")
    # get_spark getOrCreate-shares one session across test modules:
    # capture and restore the prior value so the override cannot leak
    # into later modules' plan shapes (r11 ADVICE)
    prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s
    s.conf.set("spark.sql.shuffle.partitions", prev)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_half_plane_offsets_equal_full_neighborhood(spark):
    """geo_radius r11: 5 half-plane offsets + least/greatest produce
    exactly the pair set of the 9-offset + id< form."""
    import itertools

    pts = [(i, (i * 37) % 11, (i * 53) % 7) for i in range(60)]
    df = spark.createDataFrame(pts, "id long, cx long, cy long")

    def pairs(offsets, guard_same_cell_only):
        off = [
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in offsets
        ]
        neigh = df.select(
            "id",
            "cx",
            "cy",
            F.explode(F.array(*off)).alias("d"),
        ).select(
            "id",
            (F.col("cx") + F.col("d.dx")).alias("cx"),
            (F.col("cy") + F.col("d.dy")).alias("cy"),
            ((F.col("d.dx") == 0) & (F.col("d.dy") == 0)).alias("same"),
        )
        b = df.select(
            F.col("id").alias("id_b"), "cx", "cy"
        )
        j = neigh.join(b, ["cx", "cy"])
        if guard_same_cell_only:
            j = j.where(~F.col("same") | (F.col("id") < F.col("id_b")))
            return j.select(
                F.least("id", "id_b").alias("a"),
                F.greatest("id", "id_b").alias("b"),
            )
        j = j.where(F.col("id") < F.col("id_b"))
        return j.select(F.col("id").alias("a"), F.col("id_b").alias("b"))

    full9 = list(itertools.product((-1, 0, 1), repeat=2))
    half5 = [(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
    ref = _rows(pairs(full9, False), ("a", "b"))
    new = _rows(pairs(half5, True), ("a", "b"))
    assert ref == new and len(new) == len(set(new))


def test_proration_window_total_matches_groupby_total(spark):
    """proration r11: the frame-less window sum equals the groupBy
    total joined back, per order, and allocations still sum exactly
    to the order total."""
    li = spark.createDataFrame(
        [(k, i, (k * 7 + i * 3) % 9 + 1) for k in range(1, 30) for i in range(1, 1 + k % 6)],
        "k long, ln long, qty long",
    )
    w_all = Window.partitionBy("k")
    via_window = li.withColumn("tq", F.sum("qty").over(w_all)).select("k", "tq").distinct()
    via_group = li.groupBy("k").agg(F.sum("qty").alias("tq"))
    assert _rows(via_window, ("k", "tq")) == _rows(via_group, ("k", "tq"))


def test_ks_grid_single_pass_equals_two_branch(spark):
    """ks_test r11: the tagged one-pass explode over the value grid
    equals the old two-branch union, including NULL-type dropping."""
    types = ["a", "b"]
    base = "view"
    ev = spark.createDataFrame(
        [((None, "a", "b", "view")[i % 4], (i * 13) % 5) for i in range(200)],
        "event_type string, c long",
    )
    # reference: two branches
    a = ev.where(F.col("event_type") != base).select(
        F.col("event_type").alias("pair"), "c",
        F.lit(1).alias("ca"), F.lit(0).alias("cb"))
    b = ev.where(F.col("event_type") == base).select(
        F.explode(F.array(*[F.lit(x) for x in types])).alias("pair"), "c",
        F.lit(0).alias("ca"), F.lit(1).alias("cb"))
    ref = (a.unionByName(b).groupBy("pair", "c")
           .agg(F.sum("ca").cast("long").alias("ca"),
                F.sum("cb").cast("long").alias("cb")))
    # new: grid + tagged explode
    g0 = (ev.where(F.col("event_type").isNotNull())
          .groupBy("event_type", "c").agg(F.count(F.lit(1)).alias("n")))
    base_side = F.array(*[
        F.struct(F.lit(x).alias("pair"), F.lit(0).cast("long").alias("ca"),
                 F.col("n").alias("cb")) for x in types])
    test_side = F.array(F.struct(
        F.col("event_type").alias("pair"), F.col("n").alias("ca"),
        F.lit(0).cast("long").alias("cb")))
    new = (g0.select("c", F.explode(
        F.when(F.col("event_type") == base, base_side).otherwise(test_side)
    ).alias("s")).select("c", "s.pair", "s.ca", "s.cb")
        .groupBy("pair", "c")
        .agg(F.sum("ca").cast("long").alias("ca"),
             F.sum("cb").cast("long").alias("cb")))
    assert _rows(ref, ("pair", "c", "ca", "cb")) == _rows(new, ("pair", "c", "ca", "cb"))


def test_distinct_grid_counts_match_row_level_distincts(spark):
    """canonical_url r11: counting over the distinct (key, url) grid
    reproduces the row-level COUNT(*) / COUNT(DISTINCT url) incl. the
    NULL-url membership rules."""
    rows = [("t%d" % (i % 2), None if i % 7 == 0 else "u%d" % (i % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, "et string, url string")
    ref = df.groupBy("et").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("url").alias("nd"),
    )
    grid = df.groupBy("et", "url").agg(F.count(F.lit(1)).alias("c"))
    new = grid.groupBy("et").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("url").cast("long").alias("nd"),
    )
    assert _rows(ref, ("et", "n", "nd")) == _rows(new, ("et", "n", "nd"))


def test_tagged_token_pass_matches_split_aggregates(spark):
    """repetition_quality r11: the tagged word+bigram explode equals
    the split word/bigram aggregates, including the below-bigram-floor
    doc dropping."""
    docs = spark.createDataFrame(
        [(1, ["x", "y", "x"]), (2, ["solo"]), (3, ["a", "a", "a", "b"])],
        "doc_id long, ws array<string>",
    )
    bigram = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 1),
            lambda i: F.concat_ws(" ", F.element_at("ws", i), F.element_at("ws", i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tagged = F.concat(
        F.transform("ws", lambda w: F.struct(F.lit(0).alias("tag"), w.alias("tok"))),
        F.transform(bigram, lambda g: F.struct(F.lit(1).alias("tag"), g.alias("tok"))),
    )
    tc = (docs.select("doc_id", F.explode(tagged).alias("t"))
          .groupBy("doc_id", "t.tag", "t.tok").agg(F.count(F.lit(1)).alias("c")))
    is_w, is_b = F.col("tag") == 0, F.col("tag") == 1
    fused = (tc.groupBy("doc_id").agg(
        F.sum(F.when(is_w, F.col("c"))).alias("n_words"),
        F.count(F.when(is_w, 1)).alias("n_distinct"),
        F.max(F.when(is_w, F.col("c"))).alias("top_cnt"),
        F.sum(F.when(is_b, F.col("c"))).alias("n_bigrams"),
        F.count(F.when(is_b, 1)).alias("n_distinct_bigrams"),
    ).where(F.col("n_bigrams").isNotNull()))
    got = {r["doc_id"]: (r["n_words"], r["n_distinct"], r["top_cnt"],
                         r["n_bigrams"], r["n_distinct_bigrams"])
           for r in fused.collect()}
    # doc 2 has one word -> no bigrams -> dropped (old inner join)
    assert set(got) == {1, 3}
    assert got[1] == (3, 2, 2, 2, 2)   # "x y","y x"
    assert got[3] == (4, 2, 3, 3, 2)   # "a a","a a","a b"


def test_matryoshka_rank_conjunction_equals_topk_join(spark):
    """matryoshka r11: filtering on rank_full<=K and counting
    rank_tr<=K equals left-joining the two independent top-K sets."""
    import random

    rnd = random.Random(7)
    rows = [(q, n, round(rnd.random(), 6), round(rnd.random(), 6))
            for q in range(3) for n in range(20)]
    df = spark.createDataFrame(rows, "q long, n long, cf double, ct double")
    K = 5
    wf = Window.partitionBy("q").orderBy(F.col("cf").desc(), "n")
    wt = Window.partitionBy("q").orderBy(F.col("ct").desc(), "n")
    ranked = df.select("q", "n", F.row_number().over(wf).alias("rf"),
                       F.row_number().over(wt).alias("rt"))
    new = (ranked.filter(F.col("rf") <= K).groupBy("q")
           .agg(F.sum(F.when(F.col("rt") <= K, 1).otherwise(0)).cast("long").alias("h")))
    full = ranked.filter(F.col("rf") <= K).select("q", "n")
    trunc = ranked.filter(F.col("rt") <= K).select(
        F.col("q").alias("tq"), F.col("n").alias("tn"))
    ref = (full.join(trunc, (F.col("q") == F.col("tq")) & (F.col("n") == F.col("tn")), "left")
           .groupBy("q").agg(F.count("tn").cast("long").alias("h")))
    assert _rows(ref, ("q", "h")) == _rows(new, ("q", "h"))
