#!/usr/bin/env python
"""Empirical scale probe: do the core plan shapes scale linearly?

Synthesizes a 10× dataset by unioning 10 copies of the sf0.1 tables
(keys offset per copy so join/group cardinalities scale too) and
compares steady-state runtimes against 1×. Near-linear ratios (≲12×
for 10× data on fixed cores) mean the plan's cost is data-bound, not
dominated by a super-linear stage (quadratic join, global sort,
driver collect).

Usage: python scripts/scale_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from filemapreduce_spark.operators.money import cents, disc_price_e4
from filemapreduce_spark.operators.textops import (
    minhash_signature,
    word_shingles,
    words,
)
from filemapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10


def replicate(
    df: DataFrame, key_cols: list[str], offset: int, copies: int = COPIES
) -> DataFrame:
    """Union `copies` copies, offsetting integer keys per copy so
    grouped/joined cardinalities scale with the data."""
    out = None
    for i in range(copies):
        c = df
        for k in key_cols:
            c = c.withColumn(k, F.col(k) + F.lit(i * offset))
        out = c if out is None else out.unionAll(c)
    return out


def timed(fn):
    best = None
    for _ in range(2):
        t0 = time.time()
        fn()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return round(best, 3)


def main():
    spark = get_spark(app_name="scale_probe")
    spark.range(1000).count()

    li1 = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li10 = replicate(li1, ["l_orderkey"], 10_000_000)
    li100 = replicate(li1, ["l_orderkey"], 10_000_000, copies=100)
    od1 = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    od10 = replicate(od1, ["o_orderkey"], 10_000_000)
    od100 = replicate(od1, ["o_orderkey"], 10_000_000, copies=100)
    dc1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(32)
    dc10 = replicate(dc1, ["doc_id"], 10_000_000)
    dc100 = replicate(dc1, ["doc_id"], 10_000_000, copies=100)

    def q1(li):
        return lambda: (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(disc_price_e4("l_extendedprice", "l_discount")).alias("s"),
                F.count("*").alias("n"),
            )
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    def join_agg(li, od):
        return lambda: (
            li.join(od, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum(cents("l_extendedprice")).alias("s"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    def minhash(dc):
        d2 = (
            dc.select("doc_id", words("text").alias("ws"))
            .filter(F.size("ws") >= 3)
            .select("doc_id", word_shingles(F.col("ws"), 3).alias("sh"))
        )
        return lambda: (
            d2.select("doc_id", minhash_signature(F.col("sh"), 8).alias("sig"))
            .select(F.sum(F.length(F.element_at("sig", 1))).alias("x"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    # gram matrix: d^2 partials per partition -> runtime should be
    # nearly FLAT under row-count growth (the reduction is constant
    # size; only the scan grows). 100 copies for a visible signal.
    from filemapreduce_spark.operators.vectors import gram_partials

    em1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(32)
    em100 = None
    for i in range(100):
        c = em1.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        em100 = c if em100 is None else em100.unionAll(c)

    def gram(em):
        return lambda: (
            gram_partials(em)
            .groupBy("i", "j")
            .agg(F.sum("gram_e12").alias("g"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    # round-3 families: posting-index build, SRP banding, grid join
    def trigram_postings(dc):
        return lambda: (
            dc.select(
                "doc_id",
                F.explode(
                    F.array_distinct(
                        # guard: sequence(1, stop<1) counts DOWN in
                        # Spark — short docs must yield empty arrays
                        F.expr(
                            "CASE WHEN length(text) >= 3 THEN"
                            " transform(sequence(1, length(lower(text)) - 2),"
                            " i -> substring(lower(text), i, 3))"
                            " ELSE array() END"
                        )
                    )
                ).alias("tri"),
            )
            .groupBy("tri")
            .agg(F.count("*").alias("df"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    from filemapreduce_spark.queries.llm3 import _PLANES
    from filemapreduce_spark.operators.vectors import dot, to_double

    em10 = replicate(em1, ["vec_id"], 10_000_000)

    def srp_bands(em):
        v = em.select("vec_id", to_double(F.col("embedding")).alias("_v"))
        sig = None
        for p, plane in enumerate(_PLANES):
            lit_plane = F.array([F.lit(w) for w in plane])
            bit = F.when(dot(F.col("_v"), lit_plane) >= 0, 1 << p).otherwise(0)
            sig = bit if sig is None else (sig + bit)
        return lambda: (
            v.select((sig % 256).alias("b"))
            .groupBy("b")
            .agg(F.count("*").alias("n"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    from filemapreduce_spark.queries.analytics5 import (
        _CELL_DEG,
        _coord_col,
    )

    cu1 = spark.read.parquet(f"{SF_DIR}/customer.parquet").repartition(32)
    cu10 = replicate(cu1, ["c_custkey"], 10_000_000)

    # --- interval join as a time-RANGE window frame (round-7) ---
    # range_join_signup_follows was rewritten from an equi+residual
    # join (whose intermediate explodes with followers-per-signup) to
    # count(*) over rangeBetween(+1us, +1h) partitioned by user. The
    # claim: the window form costs ONE exchange + sort regardless of
    # follow-window density. Replicating by user_id keeps per-user
    # density constant, so linear time in rows is the pass bar; the
    # join form is timed on the same replicated stream for the
    # constant-factor contrast (join_over_window below).
    # load_table inherits the canonical TIMESTAMP(NANOS)→micros
    # conversion (tables.py) — a local copy here could silently drift
    # from the convention the queries actually run under
    from filemapreduce_spark.sources.tables import load_table

    ev1 = load_table(spark, SF_DIR, "events").repartition(32)
    ev100 = replicate(ev1, ["user_id", "event_id"], 10_000_000, copies=100)

    def interval_window(ev):
        from pyspark.sql import Window

        w = (
            Window.partitionBy("user_id")
            .orderBy(F.unix_micros("ts"))
            .rangeBetween(1, 3_600_000_000)
        )
        return lambda: (
            ev.select("event_id", "user_id", "ts", "event_type")
            .withColumn("n", F.count(F.lit(1)).over(w))
            .filter(F.col("event_type") == "signup")
            .select(F.sum("n").alias("x"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    # --- survival shared base (round-7) ---
    # The KM/log-rank/RMST/Nelson-Aalen family shares one persisted
    # per-user subject table. The corpus-sized work is the two
    # event-type reductions + one keyed join that build it; everything
    # after runs on the day-grain grid (horizon-bounded). Claim:
    # end-to-end KM scales linearly in events with the grid cost
    # invisible. Replication offsets user_id, so subjects (per-user
    # rows) scale with the corpus while the day grid stays fixed.
    def km_subjects(ev):
        s = (
            ev.where(F.col("event_type") == "signup")
            .groupBy("user_id")
            .agg(F.min("ts").alias("s_ts"))
        )
        p = (
            ev.where(F.col("event_type") == "purchase")
            .join(s, "user_id")
            .where(F.col("ts") >= F.col("s_ts"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("p_ts"))
        )
        horizon = F.lit("2024-01-31").cast("date")
        subjects = s.join(p, "user_id", "left").select(
            F.when(
                F.col("p_ts").isNotNull(),
                F.datediff(
                    F.col("p_ts").cast("date"), F.col("s_ts").cast("date")
                ),
            )
            .otherwise(F.datediff(horizon, F.col("s_ts").cast("date")))
            .cast("long")
            .alias("t_days"),
            F.when(F.col("p_ts").isNotNull(), 1).otherwise(0).alias("event"),
        )
        grid = subjects.groupBy("t_days").agg(
            F.sum("event").alias("d"), F.count(F.lit(1)).alias("leaving")
        )
        return lambda: (
            grid.agg(
                F.sum("d").alias("dd"), F.sum("leaving").alias("ll")
            )
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    def interval_join(ev):
        s = ev.filter(F.col("event_type") == "signup").select(
            F.col("event_id").alias("sid"),
            F.col("user_id").alias("su"),
            F.col("ts").alias("sts"),
        )
        cond = (
            (F.col("user_id") == F.col("su"))
            & (F.col("ts") > F.col("sts"))
            & (F.col("ts") <= F.col("sts") + F.expr("INTERVAL 1 HOUR"))
        )
        return lambda: (
            s.join(ev, cond, "left")
            .groupBy("sid")
            .agg(F.count("event_id").alias("n"))
            .select(F.sum("n").alias("x"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    def geo_pairs(cu):
        pts = cu.select(
            F.col("c_custkey").alias("id"),
            _coord_col("lat", F.col("c_custkey")).alias("lat"),
            _coord_col("lon", F.col("c_custkey")).alias("lon"),
        )
        cells = pts.select(
            "id",
            F.floor(F.col("lat") / _CELL_DEG).cast("long").alias("cx"),
            F.floor(F.col("lon") / _CELL_DEG).cast("long").alias("cy"),
        )
        a = cells.select(F.col("id").alias("id_a"), "cx", "cy")
        b = cells.select(F.col("id").alias("id_b"), "cx", "cy")
        return a.join(b, ["cx", "cy"]).where(F.col("id_a") < F.col("id_b"))

    def geo_grid(cu):
        return lambda: (
            geo_pairs(cu)
            .agg(F.count("*").alias("n"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    # --- geo radius cell join at 100x (round-8 probe) ---
    # The cell equi-join's candidate set is data-intrinsic: a fixed
    # grid over 100x denser points holds ~density^2 pairs per cell,
    # so raw time ratio alone would read as a plan failure. The claim
    # to prove is OUTPUT-linearity (like srp_candidate_join_100x):
    # time_ratio <~ pair_count_ratio, i.e. the join costs what its
    # candidate set costs — never corpus x corpus.
    cu100 = replicate(cu1, ["c_custkey"], 10_000_000, copies=100)
    _geo_wanted = not sys.argv[1:] or "geo_cell_join_100x" in sys.argv[1:]
    geo_out = (
        {
            "pairs_1x": geo_pairs(cu1).count(),
            "pairs_100x": geo_pairs(cu100).count(),
        }
        if _geo_wanted
        else {}
    )
    if _geo_wanted:
        geo_out["pair_ratio"] = round(
            geo_out["pairs_100x"] / max(geo_out["pairs_1x"], 1), 1
        )

    # --- proration full-output materialization at 100x (round-8) ---
    # proration_largest_remainder's cost is the output itself: one
    # orderkey shuffle, partition-local windows, then EVERY row is
    # materialized (billing allocations are a full-output product).
    # Probe the exact shape including the final global order — at
    # 100x rows a linear-ish ratio proves the windows stay partition-
    # local and the range-partitioned sort doesn't go super-linear.
    def proration(li, od):
        from pyspark.sql import Window

        raw = li.select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_quantity").cast("long").alias("qty"),
        )
        w_seq = Window.partitionBy("l_orderkey").orderBy(
            "l_linenumber", "qty"
        )
        li_seq = raw.select(
            "l_orderkey",
            F.row_number().over(w_seq).cast("long").alias("line_seq"),
            "qty",
        )
        tot = (
            raw.groupBy("l_orderkey")
            .agg(F.sum("qty").alias("total_qty"))
            .join(
                od.select(
                    F.col("o_orderkey").alias("l_orderkey"),
                    cents("o_totalprice").alias("total_cents"),
                ),
                "l_orderkey",
            )
        )
        base = li_seq.join(tot, "l_orderkey").select(
            "l_orderkey",
            "line_seq",
            "total_cents",
            F.expr("(total_cents * qty) div total_qty").alias("base_cents"),
            (
                (F.col("total_cents") * F.col("qty")) % F.col("total_qty")
            ).alias("rem"),
        )
        w_order = Window.partitionBy("l_orderkey")
        w_rank = Window.partitionBy("l_orderkey").orderBy(
            F.col("rem").desc(), "line_seq"
        )
        ranked = base.select(
            "l_orderkey",
            "line_seq",
            "base_cents",
            (
                F.col("total_cents") - F.sum("base_cents").over(w_order)
            ).alias("short"),
            F.row_number().over(w_rank).cast("long").alias("rk"),
        )
        out = ranked.select(
            "l_orderkey",
            "line_seq",
            (
                F.col("base_cents")
                + F.when(F.col("rk") <= F.col("short"), 1).otherwise(0)
            ).alias("alloc_cents"),
        ).orderBy("l_orderkey", "line_seq")
        return lambda: (
            out.write.mode("overwrite").format("noop").save()
        )

    # --- banded-similarity CANDIDATE JOIN at 100x (round-5 probe) ---
    # The claim for the LSH family is OUTPUT-linearity: the band
    # self-join costs what its candidate set costs, never O(N^2) in
    # the corpus. Probe: same plan + same band config at 1x and 100x
    # vectors, report the time ratio NEXT TO the candidate-count
    # ratio — output-linear means time_ratio <~ candidate_ratio.
    # Copies are rotation-perturbed (rotating an embedding changes
    # its SRP signature) so replicas aren't 100-way exact twins that
    # would turn every bucket pathological; band keys use the full
    # 16 signature bits — the documented at-scale setting that holds
    # per-bucket occupancy down (llm3.py srp docstring).
    def replicate_rot(em, copies):
        out = None
        for i in range(copies):
            c = em.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
            r = i % 63
            if r:
                c = c.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", r + 1, 64 - r),
                        F.slice("embedding", 1, r),
                    ),
                )
            out = c if out is None else out.unionAll(c)
        return out

    em100r = replicate_rot(em1, 100)

    def srp_cand(em):
        v = em.select("vec_id", to_double(F.col("embedding")).alias("_v"))
        sig = None
        for p, plane in enumerate(_PLANES):
            lit_plane = F.array([F.lit(w) for w in plane])
            bit = F.when(dot(F.col("_v"), lit_plane) >= 0, 1 << p).otherwise(0)
            sig = bit if sig is None else (sig + bit)
        sigs = v.select("vec_id", sig.cast("long").alias("bv"))
        a = sigs.select(F.col("vec_id").alias("id_a"), "bv")
        b = sigs.select(F.col("vec_id").alias("id_b"), "bv")
        cand = (
            a.join(b, "bv")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        return cand

    _srp_wanted = not sys.argv[1:] or "srp_candidate_join_100x" in sys.argv[1:]
    srp_out = (
        {
            "cand_1x": srp_cand(em1).count(),
            "cand_100x": srp_cand(em100r).count(),
        }
        if _srp_wanted
        else {}
    )
    if _srp_wanted:
        srp_out["cand_ratio"] = round(
            srp_out["cand_100x"] / max(srp_out["cand_1x"], 1), 1
        )

    def srp_cand_agg(em):
        return lambda: (
            srp_cand(em)
            .agg(F.count("*").alias("n"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    # --- round-6 additions: the two newest candidate-join shapes ---
    # winnowing fingerprint/posting build (queries/llm5.py): KR gram
    # hash + window minima per doc (row-local) + one groupBy(f) —
    # linear-corpus-pass claim
    def win_fp(dc):
        d = dc.select("doc_id", F.lower("text").alias("txt")).withColumn(
            "cs",
            F.expr(
                "transform(split(txt, ''), ch -> CAST(ascii(ch) AS BIGINT))"
            ),
        )
        hs = F.expr(
            "CASE WHEN length(txt) >= 8 THEN"
            " transform(sequence(1, length(txt) - 4),"
            " i -> (element_at(cs, i)*4362470401"
            " + element_at(cs, i+1)*16974593 + element_at(cs, i+2)*66049"
            " + element_at(cs, i+3)*257 + element_at(cs, i+4))"
            " % 2147483647) ELSE array() END"
        )
        wmins = F.expr(
            "CASE WHEN size(hs) >= 4 THEN"
            " array_distinct(transform(sequence(1, size(hs) - 3),"
            " i -> array_min(slice(hs, i, 4)))) ELSE array() END"
        )
        fp = d.select("doc_id", hs.alias("hs")).select(
            "doc_id", F.explode(wmins).alias("f")
        )
        return lambda: (
            fp.groupBy("f")
            .agg(F.count("*").alias("df"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    # --- winnowing df-CAPPED posting JOIN at 100x (round-10 probe) ---
    # win_fp above probes the fingerprint BUILD; this probes the PAIR
    # stage with the registered query's actual df cap (llm5.py): at
    # 100x replicated docs every content-duplicated fingerprint's df
    # blows far past the cap and is PRUNED, so the join costs what the
    # surviving posting set costs — the cap is exactly what stops the
    # hot-fingerprint df² blow-up at scale. Reported next to the pair
    # counts so the time ratio can be read against the output ratio.
    def win_pairs(dc):
        from filemapreduce_spark.queries.llm5 import (
            _WIN_DFCAP,
            _WIN_MIN_SHARED,
        )

        d = dc.select("doc_id", F.lower("text").alias("txt")).withColumn(
            "cs",
            F.expr(
                "transform(split(txt, ''), ch -> CAST(ascii(ch) AS BIGINT))"
            ),
        )
        hs = F.expr(
            "CASE WHEN length(txt) >= 8 THEN"
            " transform(sequence(1, length(txt) - 4),"
            " i -> (element_at(cs, i)*4362470401"
            " + element_at(cs, i+1)*16974593 + element_at(cs, i+2)*66049"
            " + element_at(cs, i+3)*257 + element_at(cs, i+4))"
            " % 2147483647) ELSE array() END"
        )
        wmins = F.expr(
            "CASE WHEN size(hs) >= 4 THEN"
            " array_distinct(transform(sequence(1, size(hs) - 3),"
            " i -> array_min(slice(hs, i, 4)))) ELSE array() END"
        )
        fp = d.select("doc_id", hs.alias("hs")).select(
            "doc_id", F.explode(wmins).alias("f")
        )
        kept = (
            fp.groupBy("f")
            .agg(F.count("*").alias("df_f"))
            .filter(F.col("df_f") <= _WIN_DFCAP)
        )
        a = fp.select(F.col("doc_id").alias("doc_a"), "f")
        b = fp.select(F.col("doc_id").alias("doc_b"), "f")
        return (
            a.join(kept.select("f"), "f")
            .join(b, "f")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= _WIN_MIN_SHARED)
        )

    def win_join(dc):
        return lambda: (
            win_pairs(dc)
            .agg(F.count("*").alias("n"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    _win_wanted = (
        not sys.argv[1:] or "winnowing_capped_join_100x" in sys.argv[1:]
    )
    win_out = (
        {
            "pairs_1x": win_pairs(dc1).count(),
            "pairs_100x": win_pairs(dc100).count(),
        }
        if _win_wanted
        else {}
    )

    # --- canonical-URL normalization at 100x (round-10 probe) ---
    # canonical_url_dedup (llm6.py) is row-local parse/regex work in
    # whole-stage codegen plus one grouped distinct-agg; the claim is
    # plain linearity in input rows. The probe replays the registered
    # query's exact url synthesis + canonicalization on a replicated
    # event stream (event_id offset per copy so raw-distinct counts
    # scale too).
    def canon_url(ev):
        host = F.when(
            F.col("event_id") % 7 == 0,
            F.concat(
                F.lit("SHOP"),
                (F.col("user_id") % 3).cast("string"),
                F.lit(".Example.COM"),
            ),
        ).otherwise(
            F.concat(
                F.lit("shop"),
                (F.col("user_id") % 3).cast("string"),
                F.lit(".example.com"),
            )
        )
        vparam = (F.round("value").cast("long") % 10).cast("string")
        q = (
            F.when(
                F.col("event_id") % 3 == 0,
                F.concat(
                    F.lit("?v="),
                    vparam,
                    F.lit("&utm_source=news&utm_campaign=x"),
                ),
            )
            .when(
                F.col("event_id") % 3 == 1, F.concat(F.lit("?v="), vparam)
            )
            .otherwise(F.lit("?utm_source=mail"))
        )
        url = F.concat(
            F.lit("https://"),
            host,
            F.lit("/p/"),
            (F.col("event_id") % 50).cast("string"),
            F.when(F.col("event_id") % 2 == 0, F.lit("/")).otherwise(
                F.lit("")
            ),
            q,
            F.when(F.col("event_id") % 5 == 0, F.lit("&fbclid=AbC123"))
            .otherwise(F.lit("")),
            F.when(F.col("event_id") % 4 == 0, F.lit("#top")).otherwise(
                F.lit("")
            ),
        )
        curl = F.concat(
            F.lit("https://"),
            F.lower(F.regexp_extract(url, "https://([^/]+)", 1)),
            F.regexp_replace(
                F.regexp_extract(url, "https://[^/]+(/[^?#]*)", 1),
                "/$",
                "",
            ),
            F.when(
                F.regexp_extract(url, "[?&]v=(\\d+)", 1) != "",
                F.concat(
                    F.lit("?v="),
                    F.regexp_extract(url, "[?&]v=(\\d+)", 1),
                ),
            ).otherwise(F.lit("")),
        )
        return lambda: (
            ev.where(F.col("value").isNotNull())
            .select("event_type", url.alias("url"), curl.alias("curl"))
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_urls"),
                F.countDistinct("url").alias("n_raw"),
                F.countDistinct("curl").alias("n_canon"),
            )
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    # sorted-neighborhood ER candidates (queries/llm13.py): window
    # sort PARTITIONED by (lang, prefix) block + constant 3-lead
    # fan-out + fixed-width Levenshtein — block-local n log n claim
    def snm(dc):
        d = dc.select(
            "doc_id",
            "lang",
            F.substring("text", 1, 32).alias("head"),
            F.substring(F.lower("text"), 1, 2).alias("pre"),
        )
        from pyspark.sql import Window

        w = Window.partitionBy("lang", "pre").orderBy("head", "doc_id")
        ranked = d.select(
            "doc_id",
            "lang",
            "head",
            *[
                c
                for k in range(1, 4)
                for c in (
                    F.lead("doc_id", k).over(w).alias(f"id{k}"),
                    F.lead("head", k).over(w).alias(f"h{k}"),
                )
            ],
        )
        parts = [
            ranked.filter(F.col(f"id{k}").isNotNull()).select(
                F.levenshtein("head", f"h{k}").alias("ed")
            )
            for k in range(1, 4)
        ]
        pairs = parts[0]
        for p in parts[1:]:
            pairs = pairs.unionAll(p)
        return lambda: (
            pairs.filter(F.col("ed") <= 8)
            .agg(F.count("*").alias("n"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    # ranged ordered reduce (core/engine.py Job.sort_partitions): the
    # EXACT primitive the engine swaps in for the sort_key funnel —
    # repartitionByRange(N, leading_key) + full-key local sort + a
    # per-partition key-run pandas fold. Probed at N=32 for
    # sub-linearity, plus funnel (N=1) vs ranged at 10x for the
    # parallelism claim itself.
    _ranged_cache: dict[int, DataFrame] = {}

    def ranged_reduce(dc, n, tag=0):
        # Materialize the mapped stream before timing: the probe
        # isolates the REDUCE stage (shuffle + sort + fold), which is
        # what sort_partitions changes — and it mirrors the engine,
        # whose shared files DF is persisted. Unmaterialized input
        # would also penalize ranged twice: repartitionByRange makes
        # an extra boundary-sampling pass over its input.
        if tag not in _ranged_cache:
            _ranged_cache[tag] = (
                dc.select(
                    (F.col("doc_id") % 997).alias("grp"),
                    F.col("doc_id").alias("id"),
                    F.length("text").alias("v"),
                )
                # normalize layout: the replicate() union arrives as
                # copies x 32 near-empty partitions; a real mapped
                # stream is ~core-count partitions, and the 3200-task
                # launch floor would swamp what the probe measures
                .repartition(32)
                .persist()
            )
            _ranged_cache[tag].count()
        d = _ranged_cache[tag]
        if n > 1:
            s = d.repartitionByRange(n, "grp").sortWithinPartitions(
                "grp", "id"
            )
        else:
            s = d.repartition(1).sortWithinPartitions("grp", "id")

        def fold(it):
            import pandas as pd

            parts = list(it)
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            if pdf.empty:
                return
            out = (
                pdf.groupby("grp", sort=False)
                .agg(n=("v", "size"), tot=("v", "sum"))
                .reset_index()
            )
            yield out

        folded = s.mapInPandas(fold, "grp long, n long, tot long")
        return lambda: (
            folded.write.mode("overwrite").format("noop").save()
        )

    only = set(sys.argv[1:])  # optional probe-name filter

    results = {}
    # entries hold BUILDERS, not built thunks: building a probe can
    # have eager side effects (ranged_reduce persists + counts its
    # input), so construction must happen only after the `only` filter
    for name, mk1, mk10 in (
        ("groupby_agg", lambda: q1(li1), lambda: q1(li10)),
        (
            "ranged_reduce",
            lambda: ranged_reduce(dc1, 32, 1),
            lambda: ranged_reduce(dc10, 32, 10),
        ),
        (
            "ranged_reduce_100x",
            lambda: ranged_reduce(dc1, 32, 1),
            lambda: ranged_reduce(dc100, 32, 100),
        ),
        ("winnowing_postings", lambda: win_fp(dc1), lambda: win_fp(dc10)),
        (
            "winnowing_postings_100x",
            lambda: win_fp(dc1),
            lambda: win_fp(dc100),
        ),
        (
            "winnowing_capped_join_100x",
            lambda: win_join(dc1),
            lambda: win_join(dc100),
        ),
        (
            "canonical_url_100x",
            lambda: canon_url(ev1),
            lambda: canon_url(ev100),
        ),
        (
            "trigram_postings_100x",
            lambda: trigram_postings(dc1),
            lambda: trigram_postings(dc100),
        ),
        ("sorted_neighborhood", lambda: snm(dc1), lambda: snm(dc10)),
        (
            "fact_fact_join",
            lambda: join_agg(li1, od1),
            lambda: join_agg(li10, od10),
        ),
        # 100x rows for the two shapes that actually SHUFFLE heavy
        # state (join rows / per-doc signatures): proves the
        # sub-linear claim two orders of magnitude out, like the
        # gram-matrix probe already does for mapInArrow
        (
            "fact_fact_join_100x",
            lambda: join_agg(li1, od1),
            lambda: join_agg(li100, od100),
        ),
        ("minhash_signature", lambda: minhash(dc1), lambda: minhash(dc10)),
        (
            "minhash_signature_100x",
            lambda: minhash(dc1),
            lambda: minhash(dc100),
        ),
        ("gram_matrix_100x", lambda: gram(em1), lambda: gram(em100)),
        (
            "trigram_postings",
            lambda: trigram_postings(dc1),
            lambda: trigram_postings(dc10),
        ),
        ("srp_banding", lambda: srp_bands(em1), lambda: srp_bands(em10)),
        (
            "srp_candidate_join_100x",
            lambda: srp_cand_agg(em1),
            lambda: srp_cand_agg(em100r),
        ),
        ("geo_grid_join", lambda: geo_grid(cu1), lambda: geo_grid(cu10)),
        (
            "geo_cell_join_100x",
            lambda: geo_grid(cu1),
            lambda: geo_grid(cu100),
        ),
        (
            "proration_full_output_100x",
            lambda: proration(li1, od1),
            lambda: proration(li100, od100),
        ),
        (
            "interval_count_window_100x",
            lambda: interval_window(ev1),
            lambda: interval_window(ev100),
        ),
        (
            "survival_subjects_100x",
            lambda: km_subjects(ev1),
            lambda: km_subjects(ev100),
        ),
    ):
        if only and name not in only:
            continue
        t1, t10 = timed(mk1()), timed(mk10())
        results[name] = {
            "t_1x": t1,
            "t_10x": t10,
            "ratio": round(t10 / t1, 2) if t1 > 0 else None,
        }
    if "ranged_reduce" in results:
        # funnel (N=1) on the SAME 10x stream: the serialization cost
        # sort_partitions removes. NOTE the crossover: at 10x (600k
        # skinny rows) the funnel WINS — a single-task sort is trivial
        # while repartitionByRange pays a boundary-sampling pass — so
        # the ranged path is a scale feature, not a toy-bench one.
        t_funnel = timed(ranged_reduce(dc10, 1, 10))
        results["ranged_reduce"]["t_funnel_10x"] = t_funnel
        results["ranged_reduce"]["funnel_over_ranged"] = round(
            t_funnel / results["ranged_reduce"]["t_10x"], 2
        )
    if "ranged_reduce_100x" in results:
        t_funnel = timed(ranged_reduce(dc100, 1, 100))
        results["ranged_reduce_100x"]["t_funnel_100x"] = t_funnel
        results["ranged_reduce_100x"]["funnel_over_ranged"] = round(
            t_funnel / results["ranged_reduce_100x"]["t_10x"], 2
        )
    if "interval_count_window_100x" in results:
        # the replaced join form on the SAME 100x stream: the
        # constant-factor cost of pair fan-out the window removes
        t_join = timed(interval_join(ev100))
        results["interval_count_window_100x"]["t_join_100x"] = t_join
        results["interval_count_window_100x"]["join_over_window"] = round(
            t_join / results["interval_count_window_100x"]["t_10x"], 2
        )
    if "geo_cell_join_100x" in results:
        results["geo_cell_join_100x"].update(geo_out)
        results["geo_cell_join_100x"]["output_normalized_ratio"] = round(
            results["geo_cell_join_100x"]["ratio"] / geo_out["pair_ratio"], 4
        )
    if "winnowing_capped_join_100x" in results:
        results["winnowing_capped_join_100x"].update(win_out)
        results["winnowing_capped_join_100x"]["pair_ratio"] = round(
            win_out["pairs_100x"] / max(win_out["pairs_1x"], 1), 2
        )
    if "srp_candidate_join_100x" in results:
        results["srp_candidate_join_100x"].update(srp_out)
        results["srp_candidate_join_100x"]["output_normalized_ratio"] = (
            round(
                results["srp_candidate_join_100x"]["ratio"]
                / srp_out["cand_ratio"],
                4,
            )
        )

    print(json.dumps({"probe": "10x_scaling", "copies": COPIES, "results": results}))


if __name__ == "__main__":
    main()
