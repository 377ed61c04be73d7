"""Third-voice correctness tests: pandas/numpy twins of registry queries.

Every registry query already has two implementations — the Spark
DataFrame plan and the hand-written DuckDB oracle the sweeps compare
against. The tests here add a THIRD, engine-independent voice: each
recomputes a query's expected output directly from the sf0.001 parquet
using pandas/numpy, then compares against the Spark result
value-for-value. Coverage is aimed at queries whose only gate so far
is the builder's own sweep apparatus (never yet sampled by the
driver's CORRECTNESS window), so a systematic Spark↔DuckDB-twin
misunderstanding can't hide in the pair.

Float columns compare at rtol 1e-9 (the twins may legally accumulate
in a different order); everything else must match exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_ORACLE, SF_SMALL

_REG = None


@pytest.fixture(params=[SF_SMALL, SF_ORACLE], ids=["sf0.001", "sf0.01"])
def sf(request):
    return request.param


def _run(spark, name: str, sf: str) -> pd.DataFrame:
    global _REG
    if _REG is None:
        from filemapreduce_spark.queries import load_all

        _REG = load_all()
    return _REG[name].fn(spark, sf).toPandas()


def _tbl(name: str, sf: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf}/{name}.parquet")


def _compare(got: pd.DataFrame, want: pd.DataFrame, sort_by: list[str]):
    assert sorted(got.columns) == sorted(want.columns), (
        sorted(got.columns),
        sorted(want.columns),
    )
    got = got.sort_values(sort_by).reset_index(drop=True)
    want = want.sort_values(sort_by).reset_index(drop=True)
    assert len(got) == len(want), (len(got), len(want))
    for c in want.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            np.testing.assert_allclose(
                g.astype(float).to_numpy(),
                w.astype(float).to_numpy(),
                rtol=1e-9,
                atol=1e-12,
                err_msg=c,
            )
        else:
            assert g.astype(str).tolist() == w.astype(str).tolist(), c


def _pdisc(sorted_vals: np.ndarray, q: float):
    """percentile_disc: smallest value whose cumulative share >= q."""
    n = len(sorted_vals)
    idx = max(int(math.ceil(n * q)) - 1, 0)
    return sorted_vals[idx]


def _cents(s: pd.Series) -> pd.Series:
    return (s * 100).round().astype("int64")


# ---------------------------------------------------------------------
# stats family
# ---------------------------------------------------------------------
def test_robust_stats_mad_third_voice(spark, sf):
    e = _tbl("events", sf)
    rows = []
    for et, g in e.groupby("event_type"):
        med = g["value"].quantile(0.5, interpolation="linear")
        mad = (g["value"] - med).abs().quantile(0.5, interpolation="linear")
        rows.append(
            {
                "event_type": et,
                "median": round(med, 6),
                "mad": round(mad, 6),
                "n": len(g),
            }
        )
    want = pd.DataFrame(rows)
    _compare(_run(spark, "robust_stats_mad", sf), want, ["event_type"])


def test_spearman_qty_price_third_voice(spark, sf):
    """Midrank Spearman = Pearson of tie-averaged ranks — pandas
    rank(method='average') is exactly the midrank the query carries
    as 2·minrank+ties−1 (r9: the old arbitrary-tiebreak ranking was
    tie-order dependent and moved rho by 0.02 between two valid
    tiebreaks)."""
    li = _tbl("lineitem", sf).copy()
    li = li[li["l_quantity"].notna() & li["l_extendedprice"].notna()]
    li["cents"] = _cents(li["l_extendedprice"])
    rows = []
    for flag, g in li.groupby("l_returnflag"):
        r1 = g["l_quantity"].rank(method="average").to_numpy()
        r2 = g["cents"].rank(method="average").to_numpy()
        n = len(g)
        rho = float(np.corrcoef(r1, r2)[0, 1])
        rows.append({"l_returnflag": flag, "n": n, "spearman_rho": rho})
    want = pd.DataFrame(rows)
    _compare(_run(spark, "spearman_qty_price", sf), want, ["l_returnflag"])


def test_weighted_median_third_voice(spark, sf):
    li = _tbl("lineitem", sf).copy()
    li["price_cents"] = _cents(li["l_extendedprice"])
    li["w"] = li["l_quantity"].round().astype("int64")
    rows = []
    for flag, g in li.groupby("l_returnflag"):
        per_val = (
            g.groupby("price_cents")["w"].sum().sort_index()
        )
        cw = per_val.cumsum()
        tw = int(per_val.sum())
        med = int(cw.index[(2 * cw >= tw).to_numpy().nonzero()[0][0]])
        rows.append(
            {
                "flag": flag,
                "weighted_median_cents": med,
                "total_weight": tw,
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "weighted_median_price_by_flag", sf), want, ["flag"]
    )


def test_winsorized_stats_third_voice(spark, sf):
    o = _tbl("orders", sf).copy()
    o["c"] = _cents(o["o_totalprice"])
    rows = []
    for st, g in o.groupby("o_orderstatus"):
        vals = np.sort(g["c"].to_numpy())
        lo, hi = _pdisc(vals, 0.05), _pdisc(vals, 0.95)
        clipped = g["c"].clip(lo, hi)
        rows.append(
            {
                "o_orderstatus": st,
                "n": len(g),
                "n_clipped_low": int((g["c"] < lo).sum()),
                "n_clipped_high": int((g["c"] > hi).sum()),
                "winsorized_sum_cents": int(clipped.sum()),
                "winsorized_avg": float(clipped.sum())
                / (100.0 * len(g)),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "winsorized_stats_prices", sf), want, ["o_orderstatus"]
    )


# ---------------------------------------------------------------------
# time-series family
# ---------------------------------------------------------------------
def test_twap_daily_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["day"] = e["ts"].dt.floor("D")
    e["value_cents"] = _cents(e["value"])
    e["t_us"] = e["ts"].astype("datetime64[us]").astype("int64")
    rows = []
    for (day, et), g in e.groupby(["day", "event_type"]):
        g = g.sort_values(["t_us", "event_id"])
        t = g["t_us"].to_numpy()
        v = g["value_cents"].to_numpy()
        if len(g) < 2:
            continue
        dt = t[1:] - t[:-1]
        num = (v[:-1] * dt).sum()
        rows.append(
            {
                "day": day,
                "event_type": et,
                "weighted_cents_us": int(num),
                "span_us": int(dt.sum()),
                "twap_cents": float(num) / float(dt.sum()),
            }
        )
    want = pd.DataFrame(rows)
    got = _run(spark, "twap_daily_by_type", sf)
    # normalize the day column representation on both sides
    got["day"] = pd.to_datetime(got["day"]).dt.strftime("%Y-%m-%d")
    want["day"] = pd.to_datetime(want["day"]).dt.strftime("%Y-%m-%d")
    _compare(got, want, ["day", "event_type"])


def test_ohlc_monthly_third_voice(spark, sf):
    o = _tbl("orders", sf).copy()
    od = pd.to_datetime(o["o_orderdate"])
    o["month"] = od.dt.to_period("M").dt.start_time
    epoch_s = od.astype("int64") // 1_000_000_000
    o["ord"] = epoch_s * 100_000_000 + o["o_orderkey"]
    o["price_cents"] = _cents(o["o_totalprice"])
    rows = []
    for m, g in o.groupby("month"):
        g_sorted = g.sort_values("ord")
        rows.append(
            {
                "month": m.strftime("%Y-%m-%d"),
                "open_cents": int(g_sorted["price_cents"].iloc[0]),
                "high_cents": int(g["price_cents"].max()),
                "low_cents": int(g["price_cents"].min()),
                "close_cents": int(g_sorted["price_cents"].iloc[-1]),
                "n_orders": len(g),
                "volume_cents": int(g["price_cents"].sum()),
            }
        )
    want = pd.DataFrame(rows)
    _compare(_run(spark, "ohlc_monthly_order_prices", sf), want, ["month"])


# ---------------------------------------------------------------------
# analytics / sampling family
# ---------------------------------------------------------------------
def test_skyline_third_voice(spark, sf):
    p = _tbl("part", sf).copy()
    p["price_cents"] = _cents(p["p_retailprice"])
    counts = (
        p.groupby(["price_cents", "p_size"]).size().rename("n_parts")
    )
    pairs = counts.reset_index()
    pc = pairs["price_cents"].to_numpy()
    sz = pairs["p_size"].to_numpy()
    keep = []
    for i in range(len(pairs)):
        dominated = (
            (pc <= pc[i])
            & (sz >= sz[i])
            & ((pc < pc[i]) | (sz > sz[i]))
        ).any()
        if not dominated:
            keep.append(i)
    want = pairs.iloc[keep].rename(columns={"p_size": "size"})[
        ["price_cents", "size", "n_parts"]
    ]
    _compare(
        _run(spark, "skyline_parts_price_size", sf), want, ["price_cents"]
    )


def test_systematic_sample_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e = e.sort_values(["user_id", "ts", "event_id"])
    e["rn"] = e.groupby("user_id").cumcount()
    keep = e[e["rn"] % 20 == 0].copy()
    keep["ts"] = keep["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
    want = keep[["user_id", "event_id", "ts"]]
    _compare(
        _run(spark, "systematic_sample_user_events", sf),
        want,
        ["user_id", "event_id"],
    )


def test_quality_tiers_ntile_third_voice(spark, sf):
    d = _tbl("documents", sf).copy()
    frames = []
    for lang, g in d.groupby("lang"):
        g = g.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        n, k = len(g), 10
        base, extra = divmod(n, k)
        tiers = np.repeat(
            np.arange(1, k + 1),
            [base + 1 if i < extra else base for i in range(k)],
        )[:n]
        g["tier"] = tiers.astype("int64")
        frames.append(g[["doc_id", "lang", "tier"]])
    want = pd.concat(frames, ignore_index=True)
    _compare(_run(spark, "quality_tiers_ntile", sf), want, ["doc_id"])


def test_retention_cohorts_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    du = (
        e.assign(day=e["ts"].dt.normalize())[["user_id", "day"]]
        .drop_duplicates()
    )
    d0 = du.groupby("user_id")["day"].min().rename("d0")
    j = du.join(d0, on="user_id")
    j["week_offset"] = ((j["day"] - j["d0"]).dt.days // 7).astype(
        "int64"
    )
    j["cohort_day"] = j["d0"].dt.strftime("%Y-%m-%d")
    want = (
        j.groupby(["cohort_day", "week_offset"])["user_id"]
        .nunique()
        .rename("n_active")
        .reset_index()
    )
    _compare(
        _run(spark, "retention_cohorts_weekly", sf),
        want,
        ["cohort_day", "week_offset"],
    )


# ---------------------------------------------------------------------
# time-bucketing / scalar-parse / session families
# ---------------------------------------------------------------------
def test_time_bucket_weekly_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    ep = e["ts"].astype("datetime64[us]").astype("int64")
    origin, week = 345_600_000_000, 604_800_000_000
    start_us = ((ep - origin) // week) * week + origin
    e["week_start"] = pd.Series(
        pd.to_datetime(start_us, unit="us")
    ).dt.strftime("%Y-%m-%d").to_numpy()
    e["vc"] = _cents(e["value"])
    want = (
        e.groupby("week_start")
        .agg(
            n_events=("event_id", "size"),
            sum_value_cents=("vc", "sum"),
            users=("user_id", "nunique"),
        )
        .reset_index()
    )
    _compare(
        _run(spark, "time_bucket_weekly_monday", sf), want, ["week_start"]
    )


def test_timegrain_rollup_third_voice(spark, sf):
    e = _tbl("events", sf)
    p = e[e["event_type"] == "purchase"].copy()
    p["month"] = p["ts"].dt.to_period("M").dt.start_time.dt.strftime(
        "%Y-%m-%d"
    )
    p["day"] = p["ts"].dt.normalize().dt.strftime("%Y-%m-%d")
    p["vc"] = _cents(p["value"])
    daily = (
        p.groupby(["month", "day"])
        .agg(n_events=("vc", "size"), sum_value_cents=("vc", "sum"))
        .reset_index()
        .assign(grain="day")
    )
    monthly = (
        p.groupby("month")
        .agg(n_events=("vc", "size"), sum_value_cents=("vc", "sum"))
        .reset_index()
        .assign(grain="month", day=None)
    )
    want = pd.concat([daily, monthly], ignore_index=True)[
        ["grain", "month", "day", "n_events", "sum_value_cents"]
    ]
    _compare(
        _run(spark, "timegrain_rollup_events", sf),
        want,
        ["month", "grain", "day"],
    )


def test_url_kv_parse_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    # round() in both engines is HALF-UP for positives; numpy's is
    # banker's, so emulate half-up explicitly
    v_round = np.floor(e["value"].to_numpy() + 0.5).astype("int64")
    e["v"] = v_round
    e["path"] = (
        "/" + e["event_type"] + "/" + (e["event_id"] % 100).astype(str)
    )
    want = (
        e.groupby("event_type")
        .agg(
            n=("event_id", "size"),
            sum_user_param=("user_id", "sum"),
            sum_v_param=("v", "sum"),
            distinct_paths=("path", "nunique"),
        )
        .reset_index()
    )
    _compare(_run(spark, "url_kv_parse_events", sf), want, ["event_type"])


def test_session_pattern_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["ep"] = e["ts"].astype("datetime64[us]").astype("int64")
    e = e.sort_values(["user_id", "ts", "event_id"])
    gap = 1_800_000_000  # 30 min in us
    prev = e.groupby("user_id")["ep"].shift()
    e["new_s"] = ((prev.isna()) | (e["ep"] - prev > gap)).astype(int)
    e["sid"] = e.groupby("user_id")["new_s"].cumsum()
    e["ch"] = e["event_type"].str[0].str.upper()
    pat = (
        e.groupby(["user_id", "sid"])["ch"]
        .apply("".join)
        .rename("pattern")
        .reset_index()
    )
    agg = (
        pat.groupby("pattern")
        .agg(n_sessions=("user_id", "size"), n_users=("user_id", "nunique"))
        .reset_index()
        .sort_values(
            ["n_sessions", "pattern"], ascending=[False, True]
        )
        .head(20)
        .reset_index(drop=True)
    )
    _compare(
        _run(spark, "session_pattern_top20", sf),
        agg,
        ["n_sessions", "pattern"],
    )


# ---------------------------------------------------------------------
# scalar / error-path / format families
# ---------------------------------------------------------------------
def _props_k(props: pd.Series) -> pd.Series:
    import json

    def get(s):
        try:
            v = json.loads(s).get("k")
            return int(v) if v is not None else None
        except Exception:
            return None

    return props.apply(get).astype("Int64")


def test_try_arithmetic_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    c = _cents(e["value"]).to_numpy()
    denom = c - 500
    ratio = np.where(
        denom != 0, np.trunc((c * 100.0) / np.where(denom == 0, 1, denom)), np.nan
    )
    e["safe_ratio"] = ratio
    e["k"] = _props_k(e["props"])
    e["is_zero"] = (c == 500).astype(int)
    want = (
        e.groupby("event_type")
        .agg(
            n=("event_id", "size"),
            sum_safe_ratio=("safe_ratio", lambda s: int(s.sum())),
            n_div_zero=("is_zero", "sum"),
            sum_k=("k", "sum"),
        )
        .reset_index()
    )
    _compare(_run(spark, "try_arithmetic_safety", sf), want, ["event_type"])


def test_variant_props_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["k"] = _props_k(e["props"])
    want = (
        e.groupby("event_type")
        .agg(
            n=("event_id", "size"),
            sum_k=("k", "sum"),
            min_k=("k", "min"),
            max_k=("k", "max"),
        )
        .reset_index()
    )
    _compare(_run(spark, "variant_props_events", sf), want, ["event_type"])


def test_xml_parse_third_voice(spark, sf):
    o = _tbl("orders", sf).copy()
    o["c"] = _cents(o["o_totalprice"])
    want = (
        o.groupby("o_orderpriority")
        .agg(
            n=("o_orderkey", "size"),
            sum_cents=("c", "sum"),
            max_key=("o_orderkey", "max"),
        )
        .reset_index()
        .rename(columns={"o_orderpriority": "priority"})
    )
    _compare(_run(spark, "xml_parse_orders", sf), want, ["priority"])


def test_posexplode_third_voice(spark, sf):
    d = _tbl("documents", sf)
    rows = []
    for _, r in d.iterrows():
        ws = str(r["text"]).lower().split()
        for i, w in enumerate(ws[:3]):
            rows.append(
                {"doc_id": r["doc_id"], "pos": i, "word": w}
            )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "posexplode_leading_words", sf), want, ["doc_id", "pos"]
    )


# ---------------------------------------------------------------------
# SQL-entry / diagnostics / UDx families
# ---------------------------------------------------------------------
def test_sql_text_monthly_revenue_third_voice(spark, sf):
    o = _tbl("orders", sf).copy()
    d = pd.to_datetime(o["o_orderdate"])
    o = o[(d >= "1996-01-01") & (d < "1998-01-01")].copy()
    d = pd.to_datetime(o["o_orderdate"])
    o["y"] = d.dt.year.astype("int32")
    o["m"] = d.dt.month.astype("int32")
    o["c"] = _cents(o["o_totalprice"])
    want = (
        o.groupby(["y", "m"])
        .agg(n_orders=("c", "size"), gross=("c", "sum"))
        .reset_index()
    )
    want["gross"] = want["gross"] / 100.0
    _compare(_run(spark, "sql_text_monthly_revenue", sf), want, ["y", "m"])


def test_recursive_chains_third_voice(spark, sf):
    n = _tbl("nation", sf)
    # parent(child) = largest smaller nationkey in the same region
    parent = {}
    for _, r in n.iterrows():
        smaller = n[
            (n["n_regionkey"] == r["n_regionkey"])
            & (n["n_nationkey"] < r["n_nationkey"])
        ]["n_nationkey"]
        if len(smaller):
            parent[int(r["n_nationkey"])] = int(smaller.max())
    names = dict(zip(n["n_nationkey"].astype(int), n["n_name"]))
    rows = []
    for k in sorted(names):
        depth, root = 0, k
        while root in parent:
            root = parent[root]
            depth += 1
        rows.append(
            {
                "nationkey": k,
                "root": root,
                "depth": depth,
                "n_name": names[k],
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "recursive_cte_nation_chains", sf), want, ["nationkey"]
    )


def test_skew_diagnosis_third_voice(spark, sf):
    li = _tbl("lineitem", sf)
    n = li.groupby("l_orderkey").size()
    vals = np.sort(n.to_numpy())
    want = pd.DataFrame(
        [
            {
                "n_keys": len(n),
                "n_rows": int(n.sum()),
                "max_rows_per_key": int(n.max()),
                "p50": int(_pdisc(vals, 0.50)),
                "p90": int(_pdisc(vals, 0.90)),
                "p99": int(_pdisc(vals, 0.99)),
                "skew_ratio_milli": int(
                    (int(n.max()) * 1000 * len(n)) // int(n.sum())
                ),
            }
        ]
    )
    _compare(_run(spark, "skew_diagnosis_join_keys", sf), want, ["n_keys"])


def test_pandas_udaf_weighted_price_third_voice(spark, sf):
    li = _tbl("lineitem", sf).copy()
    li["c"] = _cents(li["l_extendedprice"])
    li["q"] = li["l_quantity"].astype("int64")
    rows = []
    for flag, g in li.groupby("l_returnflag"):
        num = int((g["c"] * g["q"]).sum())
        den = int(g["q"].sum())
        rows.append(
            {
                "l_returnflag": flag,
                "wavg_price_cents": float(num) / float(den),
                "total_qty": den,
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "pandas_udaf_weighted_price", sf), want, ["l_returnflag"]
    )


def test_pandas_udf_char_classes_third_voice(spark, sf):
    import re

    d = _tbl("documents", sf)
    want = pd.DataFrame(
        {
            "doc_id": d["doc_id"],
            "n_digits": d["text"]
            .apply(lambda t: len(re.findall(r"[0-9]", str(t))))
            .astype("int64"),
            "n_upper": d["text"]
            .apply(lambda t: len(re.findall(r"[A-Z]", str(t))))
            .astype("int64"),
            "n_chars": d["text"].str.len().astype("int64"),
        }
    )
    _compare(
        _run(spark, "pandas_udf_char_classes", sf), want, ["doc_id"]
    )


# ---------------------------------------------------------------------
# packing / UDTF / sampling / sink families
# ---------------------------------------------------------------------
def test_sequence_pack_cu_seqlens_third_voice(spark, sf):
    d = _tbl("documents", sf).copy()
    d["tok"] = d["text"].apply(lambda t: len(str(t).split()))
    rows = []
    for src, g in d.groupby("source"):
        g = g.sort_values("doc_id")
        cum = 0
        for _, r in g.iterrows():
            tok = int(r["tok"])
            if tok > 0:
                lo = cum // 256
                hi = (cum + tok - 1) // 256
                for seq_idx in range(lo, hi + 1):
                    rows.append(
                        {
                            "source": src,
                            "seq_idx": seq_idx,
                            "off": max(cum - seq_idx * 256, 0),
                        }
                    )
            cum += tok
    spans = pd.DataFrame(rows)
    want = (
        spans.groupby(["source", "seq_idx"])
        .agg(
            n_docs=("off", "size"),
            cu_seqlens=(
                "off",
                lambda s: ",".join(str(x) for x in sorted(s)),
            ),
        )
        .reset_index()
    )
    _compare(
        _run(spark, "sequence_pack_cu_seqlens", sf),
        want,
        ["source", "seq_idx"],
    )


def test_udtf_shared_shingles_third_voice(spark, sf):
    d = _tbl("documents", sf)
    from collections import Counter

    counts = Counter()
    for t_ in d["text"]:
        ws = str(t_).split(" ")
        seen = set()
        for i in range(len(ws) - 3):
            seen.add(" ".join(ws[i : i + 4]))
        counts.update(seen)
    want = pd.DataFrame(
        [
            {"shingle": s, "n_docs": n}
            for s, n in counts.items()
            if n >= 3
        ]
    )
    _compare(
        _run(spark, "udtf_shared_shingles", sf), want, ["n_docs", "shingle"]
    )


def test_weighted_sample_wor_third_voice(spark, sf):
    import hashlib

    d = _tbl("documents", sf).copy()

    def unif(doc_id):
        h = hashlib.md5(f"es:{doc_id}".encode()).hexdigest()[:13]
        return (int(h, 16) + 1) / 4503599627370496.0

    d["key"] = d.apply(
        lambda r: math.log(unif(r["doc_id"])) / r["n_chars"], axis=1
    )
    frames = []
    for lang, g in d.groupby("lang"):
        g = g.sort_values(
            ["key", "doc_id"], ascending=[False, True]
        ).head(10)
        g = g.reset_index(drop=True)
        g["rn"] = np.arange(1, len(g) + 1)
        frames.append(g[["lang", "rn", "doc_id", "n_chars"]])
    want = pd.concat(frames, ignore_index=True)
    _compare(
        _run(spark, "weighted_sample_without_replacement", sf),
        want,
        ["lang", "rn"],
    )


def test_sink_hilbert_roundtrip_third_voice(spark, sf):
    p = _tbl("part", sf)
    f = p[
        (p["p_size"].between(25, 40))
        & (p["p_retailprice"].between(940, 980))
    ].copy()
    f["c"] = _cents(f["p_retailprice"])
    want = (
        f.groupby("p_brand")
        .agg(
            n_parts=("p_size", "size"),
            size_sum=("p_size", "sum"),
            price_cents=("c", "sum"),
        )
        .reset_index()
    )
    _compare(_run(spark, "sink_hilbert_roundtrip", sf), want, ["p_brand"])


# ---------------------------------------------------------------------
# ratio-to-report / rolling distinct / TF-IDF families
# ---------------------------------------------------------------------
def test_revenue_share_third_voice(spark, sf):
    li = _tbl("lineitem", sf)[["l_suppkey", "l_extendedprice"]].copy()
    s = _tbl("supplier", sf)[["s_suppkey", "s_nationkey"]]
    n = _tbl("nation", sf)[["n_nationkey", "n_name"]]
    li["c"] = _cents(li["l_extendedprice"])
    j = li.merge(s, left_on="l_suppkey", right_on="s_suppkey").merge(
        n, left_on="s_nationkey", right_on="n_nationkey"
    )
    rev = (
        j.groupby("n_name")["c"]
        .sum()
        .rename("rev_cents")
        .reset_index()
        .rename(columns={"n_name": "nation"})
    )
    total = int(rev["rev_cents"].sum())
    rev["share"] = (rev["rev_cents"].astype(float) / total).round(9)
    _compare(_run(spark, "revenue_share_by_nation", sf), rev, ["nation"])


def test_rolling_7day_active_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    du = (
        e.assign(day=e["ts"].dt.normalize())[["day", "user_id"]]
        .drop_duplicates()
    )
    days = sorted(du["day"].unique())
    rows = []
    for d in days:
        lo = d - pd.Timedelta(days=7)
        active = du[(du["day"] > lo) & (du["day"] <= d)][
            "user_id"
        ].nunique()
        rows.append(
            {
                "day": pd.Timestamp(d).strftime("%Y-%m-%d"),
                "active_7d": active,
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "rolling_7day_active_users", sf), want, ["day"]
    )


def test_tfidf_top_term_third_voice(spark, sf):
    d = _tbl("documents", sf)
    from collections import Counter

    n_docs = len(d)
    tf = {}
    df_counter = Counter()
    for _, r in d.iterrows():
        ws = str(r["text"]).lower().split()
        c = Counter(ws)
        tf[r["doc_id"]] = c
        df_counter.update(c.keys())
    rows = []
    for doc_id, c in tf.items():
        best = None
        for word, f in c.items():
            score = round(f * math.log(n_docs / df_counter[word]), 6)
            key = (-score, word)
            if best is None or key < best[0]:
                best = (key, word, score)
        if best:
            rows.append(
                {
                    "doc_id": doc_id,
                    "word": best[1],
                    "tfidf": best[2],
                }
            )
    want = pd.DataFrame(rows)
    _compare(_run(spark, "tfidf_top_term_per_doc", sf), want, ["doc_id"])


# ---------------------------------------------------------------------
# PMI / rolling correlation / KL families
# ---------------------------------------------------------------------
def test_session_cooccurrence_pmi_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    s = (
        e.assign(day=e["ts"].dt.normalize())[
            ["user_id", "day", "event_type"]
        ]
        .drop_duplicates()
    )
    n_sessions = len(s[["user_id", "day"]].drop_duplicates())
    singles = s.groupby("event_type").size().to_dict()
    from collections import Counter

    pair_counts = Counter()
    for _, g in s.groupby(["user_id", "day"]):
        types = sorted(g["event_type"].unique())
        for i in range(len(types)):
            for j in range(i + 1, len(types)):
                pair_counts[(types[i], types[j])] += 1
    rows = []
    for (a, b), n_both in pair_counts.items():
        pmi = math.log(
            (float(n_both) * n_sessions)
            / (float(singles[a]) * singles[b])
        )
        rows.append(
            {
                "type_a": a,
                "type_b": b,
                "n_both": n_both,
                "n_a": singles[a],
                "n_b": singles[b],
                "pmi_micro": round(pmi * 1_000_000),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "session_cooccurrence_pmi", sf),
        want,
        ["type_a", "type_b"],
    )


def test_rolling_correlation_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["day"] = e["ts"].dt.normalize()
    e["c"] = _cents(e["value"])
    daily = (
        e.groupby("day")
        .apply(
            lambda g: pd.Series(
                {
                    "x": int(g.loc[g["event_type"] == "purchase", "c"].sum()),
                    "y": int(g.loc[g["event_type"] == "click", "c"].sum()),
                }
            ),
            include_groups=False,
        )
        .reset_index()
        .sort_values("day")
        .reset_index(drop=True)
    )
    rows = []
    X = daily["x"].to_numpy(dtype=object)
    Y = daily["y"].to_numpy(dtype=object)
    for i in range(len(daily)):
        lo = max(0, i - 13)
        xs, ys = X[lo : i + 1], Y[lo : i + 1]
        n = len(xs)
        sx, sy = float(sum(xs)), float(sum(ys))
        sxy = float(sum(int(a) * int(b) for a, b in zip(xs, ys)))
        sxx = float(sum(int(a) * int(a) for a in xs))
        syy = float(sum(int(b) * int(b) for b in ys))
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        corr = (
            round(
                (n * sxy - sx * sy)
                / (math.sqrt(vx) * math.sqrt(vy))
                * 1000
            )
            if n >= 2 and vx > 0 and vy > 0
            else None
        )
        rows.append(
            {
                "day": daily["day"].iloc[i].strftime("%Y-%m-%d"),
                "n": n,
                "corr_milli": corr,
            }
        )
    want = pd.DataFrame(rows)
    want["corr_milli"] = want["corr_milli"].astype("Int64")
    _compare(
        _run(spark, "rolling_correlation_series", sf), want, ["day"]
    )


def test_kl_divergence_third_voice(spark, sf):
    from collections import Counter

    V = 100
    d = _tbl("documents", sf)
    toks_by_source = {}
    global_counts = Counter()
    for _, r in d.iterrows():
        ws = str(r["text"]).lower().split()
        toks_by_source.setdefault(r["source"], []).extend(ws)
        global_counts.update(ws)
    # top-V vocabulary: count desc, word asc
    vocab = sorted(global_counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        :V
    ]
    vwords = [w for w, _ in vocab]
    n_all = sum(global_counts.values())
    n_inv = sum(c for _, c in vocab)
    rows = []
    for src, toks in toks_by_source.items():
        cs = Counter(toks)
        n_s = len(toks)
        kl = 0.0
        inv_s = 0
        for w in vwords:
            c_sw = cs.get(w, 0)
            inv_s += c_sw
            p = (c_sw + 1) / (n_s + V + 1)
            q = (global_counts[w] + 1) / (n_all + V + 1)
            kl += p * math.log(p / q)
        p_oov = (n_s - inv_s + 1) / (n_s + V + 1)
        q_oov = (n_all - n_inv + 1) / (n_all + V + 1)
        kl += p_oov * math.log(p_oov / q_oov)
        rows.append(
            {
                "source": src,
                "n_tokens": n_s,
                "kl_micro": round(kl * 1_000_000),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "kl_divergence_by_source", sf), want, ["source"]
    )


# ---------------------------------------------------------------------
# graph / normalization families
# ---------------------------------------------------------------------
def test_kcore_peeling_third_voice(spark, sf):
    K = 110
    li = _tbl("lineitem", sf)[["l_orderkey", "l_partkey"]].drop_duplicates()
    from collections import defaultdict

    edges = set()
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(g["l_partkey"].unique())
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                edges.add((parts[i], parts[j]))
    rows = []
    cur = edges
    for rnd in (1, 2, 3):
        deg = defaultdict(int)
        for a, b in cur:
            deg[a] += 1
            deg[b] += 1
        surv = {v for v, d_ in deg.items() if d_ >= K}
        cur = {(a, b) for a, b in cur if a in surv and b in surv}
        rows.append(
            {"round": rnd, "n_nodes": len(surv), "n_edges": len(cur)}
        )
    want = pd.DataFrame(rows)
    _compare(_run(spark, "kcore_peeling_rounds", sf), want, ["round"])


def test_pagerank_third_voice(spark, sf):
    li = _tbl("lineitem", sf)[["l_orderkey", "l_suppkey"]]
    o = _tbl("orders", sf)[["o_orderkey", "o_custkey"]]
    c = _tbl("customer", sf)[["c_custkey", "c_nationkey"]]
    s = _tbl("supplier", sf)[["s_suppkey", "s_nationkey"]]
    nn = _tbl("nation", sf)[["n_nationkey", "n_name"]]
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
    )
    e = (
        j[j["s_nationkey"] != j["c_nationkey"]][
            ["s_nationkey", "c_nationkey"]
        ]
        .drop_duplicates()
        .rename(columns={"s_nationkey": "src", "c_nationkey": "dst"})
    )
    nodes = sorted(set(e["src"]) | set(e["dst"]))
    n_nodes = len(nodes)
    deg = e.groupby("src").size().to_dict()
    r = {n: 1_000_000_000_000 // n_nodes for n in nodes}
    for _ in range(2):
        nxt = {n: 150_000_000_000 // n_nodes for n in nodes}
        for _, row in e.iterrows():
            src, dst = row["src"], row["dst"]
            nxt[dst] += (r[src] * 85) // (100 * deg[src])
        r = nxt
    names = dict(zip(nn["n_nationkey"], nn["n_name"]))
    want = pd.DataFrame(
        [
            {"nationkey": n, "nation": names[n], "rank_e12": r[n]}
            for n in nodes
        ]
    )
    _compare(_run(spark, "pagerank_trade_2iter", sf), want, ["nationkey"])


def test_quantile_normalize_third_voice(spark, sf):
    GRID = 1000
    d = _tbl("documents", sf).copy()
    d["score"] = d["n_chars"].astype("int64")
    all_scores = d["score"].to_numpy()
    qv = {
        m: round(
            float(np.quantile(all_scores, m / GRID, method="linear")), 6
        )
        for m in range(GRID + 1)
    }
    rows = []
    for src, g in d.groupby("source"):
        g = g.sort_values(["score", "doc_id"]).reset_index(drop=True)
        n_s = len(g)
        for i, (_, row) in enumerate(g.iterrows()):
            r = i + 1
            decile = (r - 1) * 10 // n_s
            milli = math.floor(GRID * (2 * r - 1) / (2 * n_s) + 0.5)
            rows.append(
                {
                    "source": src,
                    "decile": decile,
                    "score": int(row["score"]),
                    "norm": qv[milli],
                }
            )
    m = pd.DataFrame(rows)
    want = (
        m.groupby(["source", "decile"])
        .agg(
            n_docs=("score", "size"),
            sum_raw=("score", "sum"),
            avg_norm=("norm", lambda s: round(s.sum() / len(s), 6)),
        )
        .reset_index()
    )
    _compare(
        _run(spark, "quantile_normalize_scores", sf),
        want,
        ["source", "decile"],
    )


# ---------------------------------------------------------------------
# trend / rank-correlation / inequality / richness families
# ---------------------------------------------------------------------
def _round_half_away(x: float) -> int:
    """SQL round(): half away from zero (numpy's is banker's)."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _daily_cents(e: pd.DataFrame) -> pd.DataFrame:
    e = e.copy()
    e["day"] = e["ts"].dt.normalize()
    e["c"] = _cents(e["value"])
    return (
        e.groupby(["event_type", "day"])["c"]
        .sum()
        .rename("v")
        .reset_index()
    )


def test_mann_kendall_third_voice(spark, sf):
    daily = _daily_cents(_tbl("events", sf))
    rows = []
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day")
        v = g["v"].to_numpy()
        n = len(v)
        s_stat = int(
            sum(
                int(np.sign(v[j] - v[i]))
                for i in range(n)
                for j in range(i + 1, n)
            )
        )
        from collections import Counter

        ties = Counter(v.tolist())
        tie_term = sum(tn * (tn - 1) * (2 * tn + 5) for tn in ties.values())
        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        adj = s_stat - int(np.sign(s_stat))
        z = 1e6 * adj / math.sqrt(var18 / 18.0)
        rows.append(
            {
                "event_type": et,
                "n_days": n,
                "s_stat": s_stat,
                "var18": var18,
                "z_micro": _round_half_away(z),
            }
        )
    want = pd.DataFrame(rows)
    _compare(_run(spark, "mann_kendall_trend", sf), want, ["event_type"])


def test_kendall_tau_third_voice(spark, sf):
    daily = _daily_cents(_tbl("events", sf))
    rows = []
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day")
        v = g["v"].to_numpy()
        n = len(v)
        conc = disc = tie = 0
        for i in range(n):
            for j in range(i + 1, n):
                if v[j] > v[i]:
                    conc += 1
                elif v[j] < v[i]:
                    disc += 1
                else:
                    tie += 1
        n0 = conc + disc + tie
        tau = 1000.0 * (conc - disc) / math.sqrt(float(n0) * (n0 - tie))
        rows.append(
            {
                "event_type": et,
                "n_days": n,
                "n_conc": conc,
                "n_disc": disc,
                "n_tie": tie,
                "tau_milli": _round_half_away(tau),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "kendall_tau_daily_value", sf), want, ["event_type"]
    )


def test_theil_index_third_voice(spark, sf):
    o = _tbl("orders", sf)[["o_custkey", "o_totalprice"]]
    c = _tbl("customer", sf)[["c_custkey", "c_nationkey"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j.assign(x=_cents(j["o_totalprice"]))
    rows = []
    for nk, g in j.groupby("c_nationkey"):
        n = len(g)
        s = int(g["x"].sum())
        t_micros = [
            _round_half_away(
                1e6 * (x * float(n) / s) * math.log(x * float(n) / s)
            )
            for x in g["x"]
        ]
        rows.append(
            {
                "nationkey": nk,
                "n_orders": n,
                "mean_milli": _round_half_away(1000.0 * s / n),
                "theil_micro": _round_half_away(float(sum(t_micros)) / n),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "theil_index_by_nation", sf), want, ["nationkey"]
    )


def test_chao1_third_voice(spark, sf):
    from collections import Counter

    d = _tbl("documents", sf)
    per_source = {}
    for _, r in d.iterrows():
        ws = str(r["text"]).lower().split()
        tris = [
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        ]
        per_source.setdefault(r["source"], Counter()).update(tris)
    rows = []
    for src, counts in per_source.items():
        v = len(counts)
        f1 = sum(1 for c_ in counts.values() if c_ == 1)
        f2 = sum(1 for c_ in counts.values() if c_ == 2)
        chao1 = 1000.0 * (v + f1 * (f1 - 1) / (2.0 * (f2 + 1)))
        rows.append(
            {
                "source": src,
                "n_tokens": sum(counts.values()),
                "vocab": v,
                "f1": f1,
                "f2": f2,
                "chao1_milli": _round_half_away(chao1),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "chao1_vocab_richness", sf), want, ["source"]
    )


# ---------------------------------------------------------------------
# smoothing / power-law / uncertainty / drift families
# ---------------------------------------------------------------------
def test_good_turing_third_voice(spark, sf):
    from collections import Counter

    d = _tbl("documents", sf)
    counts = Counter()
    for _, r in d.iterrows():
        ws = str(r["text"]).lower().split()
        counts.update(
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        )
    fof = Counter(counts.values())
    rows = []
    for r_ in sorted(c for c in fof if c <= 10):
        n_r, n_next = fof[r_], fof.get(r_ + 1, 0)
        rows.append(
            {
                "r": r_,
                "n_r": n_r,
                "n_next": n_next,
                "r_star_micro": _round_half_away(
                    1e6 * (r_ + 1) * n_next / n_r
                ),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "good_turing_smoothed_counts", sf), want, ["r"]
    )


def test_zipf_fit_third_voice(spark, sf):
    from collections import Counter

    d = _tbl("documents", sf)
    counts = Counter()
    for _, r in d.iterrows():
        counts.update(str(r["text"]).lower().split())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    k = len(top)
    xs = [math.log(i + 1) for i in range(k)]
    ys = [math.log(f) for _, f in top]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    intercept = (sy - slope * sx) / k
    want = pd.DataFrame(
        [
            {
                "k": k,
                "zipf_slope": round(slope, 6),
                "intercept": round(intercept, 6),
            }
        ]
    )
    _compare(_run(spark, "zipf_exponent_fit", sf), want, ["k"])


def test_jackknife_third_voice(spark, sf):
    o = _tbl("orders", sf)[["o_custkey", "o_totalprice"]]
    c = _tbl("customer", sf)[["c_custkey", "c_nationkey"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j.assign(cents=_cents(j["o_totalprice"]))
    g = j.groupby("c_nationkey")["cents"].agg(["count", "sum"])
    n_all, s_all = int(g["count"].sum()), int(g["sum"].sum())
    ms = [
        _round_half_away(1000.0 * (s_all - int(s)) / (n_all - int(n)))
        for n, s in zip(g["count"], g["sum"])
        if n_all > n
    ]
    gg = len(ms)
    sm, sm2 = sum(ms), sum(m * m for m in ms)
    se = math.sqrt(
        (gg - 1.0) / gg * (float(sm2) - float(sm) * sm / gg)
    )
    want = pd.DataFrame(
        [
            {
                "n_groups": len(g),
                "n_all": n_all,
                "grand_mean_milli": _round_half_away(
                    1000.0 * s_all / n_all
                ),
                "jack_se_milli": _round_half_away(se),
            }
        ]
    )
    _compare(
        _run(spark, "jackknife_nation_mean_se", sf), want, ["n_all"]
    )


def test_psi_drift_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["c"] = _cents(e["value"])
    e["period"] = (e["ts"] >= pd.Timestamp("2024-01-16")).astype(int)
    rows = []
    for et, g in e.groupby("event_type"):
        base = np.sort(g.loc[g["period"] == 0, "c"].to_numpy())
        if len(base) == 0:
            continue
        edges = [_pdisc(base, i / 10) for i in range(1, 10)]
        def to_bin(c):
            return sum(1 for ed in edges if c > ed)
        n0 = np.zeros(10, dtype="int64")
        n1 = np.zeros(10, dtype="int64")
        for _, r in g.iterrows():
            b = to_bin(r["c"])
            if r["period"] == 0:
                n0[b] += 1
            else:
                n1[b] += 1
        t0, t1 = int(n0.sum()), int(n1.sum())
        psi = sum(
            ((n1[b] + 1) / (t1 + 10) - (n0[b] + 1) / (t0 + 10))
            * math.log(
                ((n1[b] + 1) / (t1 + 10)) / ((n0[b] + 1) / (t0 + 10))
            )
            for b in range(10)
        )
        rows.append(
            {
                "event_type": et,
                "n_base": t0,
                "n_cur": t1,
                "psi_micro": _round_half_away(1e6 * psi),
            }
        )
    want = pd.DataFrame(rows)
    _compare(_run(spark, "psi_value_drift", sf), want, ["event_type"])


# ---------------------------------------------------------------------
# hypothesis-test / effect-size families
# ---------------------------------------------------------------------
def test_welch_ttest_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["c"] = _cents(e["value"])
    stats = {}
    for et, g in e.groupby("event_type"):
        n = len(g)
        s1 = int(g["c"].sum())
        s2 = int((g["c"].astype(object) ** 2).sum())
        mean = s1 / n
        var = (s2 - s1 * (s1 / n)) / (n - 1)
        stats[et] = (n, mean, var)
    nb, mb, vb = stats["view"]
    rows = []
    for et, (n, m, v) in stats.items():
        if et == "view":
            continue
        se2 = v / n + vb / nb
        t_ = (m - mb) / math.sqrt(se2)
        df = (se2 * se2) / (
            (v / n) ** 2 / (n - 1) + (vb / nb) ** 2 / (nb - 1)
        )
        rows.append(
            {
                "event_type": et,
                "n_a": n,
                "n_view": nb,
                "mean_diff_milli": _round_half_away((m - mb) * 1000),
                "t_milli": _round_half_away(t_ * 1000),
                "df_milli": _round_half_away(df * 1000),
            }
        )
    want = pd.DataFrame(rows)
    _compare(_run(spark, "welch_ttest_vs_view", sf), want, ["event_type"])


def test_kruskal_wallis_third_voice(spark, sf):
    daily = _daily_cents(_tbl("events", sf))
    vals = daily["v"].to_numpy()
    order = np.sort(vals)
    from collections import Counter

    ties = Counter(vals.tolist())
    # 2*midrank = 2*minrank + ties - 1 (minrank = RANK() over value asc)
    minrank = {}
    r = 1
    for v in sorted(ties):
        minrank[v] = r
        r += ties[v]
    daily = daily.assign(
        r2=daily["v"].map(lambda v: 2 * minrank[v] + ties[v] - 1)
    )
    g = (
        daily.groupby("event_type")
        .agg(n_days=("r2", "size"), ranksum_x2=("r2", "sum"))
        .reset_index()
    )
    nn = int(g["n_days"].sum())
    h_raw = (12.0 / (nn * (nn + 1.0))) * sum(
        float(rs) * rs / (4.0 * nd)
        for rs, nd in zip(g["ranksum_x2"], g["n_days"])
    ) - 3.0 * (nn + 1.0)
    tcorr = sum(t_**3 - t_ for t_ in ties.values())
    corr = 1.0 - tcorr / (float(nn) ** 3 - nn)
    g["h_milli"] = _round_half_away(1000.0 * h_raw / corr)
    _compare(
        _run(spark, "kruskal_wallis_daily", sf), g, ["event_type"]
    )


def _arm_values(sf):
    e = _tbl("events", sf)
    p = e[e["event_type"] == "purchase"].copy()
    p["arm"] = p["user_id"] % 2
    p["x"] = _cents(p["value"])
    return p


def test_cliffs_delta_third_voice(spark, sf):
    p = _arm_values(sf)
    x1 = np.sort(p.loc[p["arm"] == 1, "x"].to_numpy())
    x0 = np.sort(p.loc[p["arm"] == 0, "x"].to_numpy())
    n1, n0 = len(x1), len(x0)
    # brute-force dominance counts (the identity-free ground truth)
    gt = sum(int((x0 < v).sum()) for v in x1)
    lt = sum(int((x0 > v).sum()) for v in x1)
    u1 = gt + 0.5 * (n1 * n0 - gt - lt)  # ties get half credit
    delta = (gt - lt) / (n1 * n0)
    want = pd.DataFrame(
        [
            {
                "n0": n0,
                "n1": n1,
                "u1_x2": int(round(2 * u1)),
                "n_pairs": n1 * n0,
                "delta_micro": _round_half_away(1e6 * delta),
            }
        ]
    )
    _compare(_run(spark, "cliffs_delta_arms", sf), want, ["n0"])


def test_cohens_d_third_voice(spark, sf):
    p = _arm_values(sf)
    g = {}
    for arm in (0, 1):
        x = p.loc[p["arm"] == arm, "x"].astype(object)
        g[arm] = (len(x), int(x.sum()), int((x**2).sum()))
    n0, a0, q0 = g[0]
    n1, a1, q1 = g[1]
    pooled = math.sqrt(
        ((q0 - a0 * (a0 / n0)) + (q1 - a1 * (a1 / n1)))
        / (n0 + n1 - 2)
    )
    d = (a1 / n1 - a0 / n0) / pooled
    want = pd.DataFrame(
        [
            {
                "n0": n0,
                "n1": n1,
                "mean0_milli": _round_half_away(1000.0 * a0 / n0),
                "mean1_milli": _round_half_away(1000.0 * a1 / n1),
                "d_micro": _round_half_away(1e6 * d),
            }
        ]
    )
    _compare(_run(spark, "cohens_d_arms", sf), want, ["n0"])


# ---------------------------------------------------------------------
# CvM / Theil-Sen / Holt / Nelson-Aalen families
# ---------------------------------------------------------------------
def test_cramer_von_mises_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["c"] = _cents(e["value"])
    base = np.sort(e.loc[e["event_type"] == "view", "c"].to_numpy())
    rows = []
    for et, g in e.groupby("event_type"):
        if et == "view":
            continue
        a = np.sort(g["c"].to_numpy())
        na, nb = len(a), len(base)
        grid = np.unique(np.concatenate([a, base]))
        cum_a = np.searchsorted(a, grid, side="right")
        cum_b = np.searchsorted(base, grid, side="right")
        ca = np.diff(np.concatenate([[0], cum_a]))
        cb = np.diff(np.concatenate([[0], cum_b]))
        s_num = sum(
            int(int(cum_a[i]) * nb - int(cum_b[i]) * na) ** 2
            * int(ca[i] + cb[i])
            for i in range(len(grid))
        )
        t_stat = (
            (float(na) * nb / ((na + nb) * (na + nb)))
            * (float(s_num) / (float(na) * na * nb * nb))
        )
        rows.append(
            {
                "pair": et,
                "n_a": na,
                "n_b": nb,
                "t_micro": _round_half_away(1e6 * t_stat),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "cramer_von_mises_vs_view", sf), want, ["pair"]
    )


def test_theil_sen_third_voice(spark, sf):
    daily = _daily_cents(_tbl("events", sf))
    rows = []
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        days = g["day"].to_numpy()
        v = g["v"].to_numpy()
        slopes = []
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                dd = (days[j] - days[i]) / np.timedelta64(1, "D")
                slopes.append(float(v[j] - v[i]) / dd)
        med = float(np.quantile(np.array(slopes), 0.5, method="linear"))
        rows.append(
            {
                "event_type": et,
                "n_pairs": len(slopes),
                "slope_cents_per_day": round(med, 6),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "theil_sen_slope_daily", sf), want, ["event_type"]
    )


def test_holt_linear_third_voice(spark, sf):
    daily = _daily_cents(_tbl("events", sf))
    rows = []
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day")
        v = [float(x) for x in g["v"]]
        l, b = v[0], 0.0
        for y in v[1:]:
            l_new = 0.5 * y + 0.5 * (l + b)
            b = 0.5 * (l_new - l) + 0.5 * b
            l = l_new
        rows.append(
            {
                "event_type": et,
                "n_days": len(v),
                "level_milli": _round_half_away(1000.0 * l),
                "trend_milli": _round_half_away(1000.0 * b),
                "forecast7_milli": _round_half_away(
                    1000.0 * (l + 7 * b)
                ),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "holt_linear_by_type", sf), want, ["event_type"]
    )


def test_nelson_aalen_third_voice(spark, sf):
    e = _tbl("events", sf)
    horizon = pd.Timestamp("2024-01-31")
    s = (
        e[e["event_type"] == "signup"]
        .groupby("user_id")["ts"]
        .min()
        .rename("s_ts")
    )
    ep = e[e["event_type"] == "purchase"].merge(
        s, on="user_id"
    )
    p = (
        ep[ep["ts"] >= ep["s_ts"]]
        .groupby("user_id")["ts"]
        .min()
        .rename("p_ts")
    )
    subj = s.to_frame().join(p, how="left")
    t_days, event = [], []
    for _, r in subj.iterrows():
        sd = r["s_ts"].normalize()
        if pd.notna(r["p_ts"]):
            t_days.append(int((r["p_ts"].normalize() - sd).days))
            event.append(1)
        else:
            t_days.append(int((horizon - sd).days))
            event.append(0)
    df_ = pd.DataFrame({"t": t_days, "e": event})
    grid = (
        df_.groupby("t")
        .agg(d=("e", "sum"), leaving=("e", "size"))
        .sort_index()
    )
    n_total = len(df_)
    rows, left_before, H, V = [], 0, 0.0, 0.0
    for t_, r in grid.iterrows():
        n_risk = n_total - left_before
        H += float(r["d"]) / n_risk
        V += float(r["d"]) / (float(n_risk) * n_risk)
        if r["d"] > 0:
            rows.append(
                {
                    "t_days": t_,
                    "n_risk": n_risk,
                    "d": int(r["d"]),
                    "cumhaz": round(H, 6),
                    "var_est": round(V, 6),
                }
            )
        left_before += int(r["leaving"])
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "nelson_aalen_cumhaz", sf), want, ["t_days"]
    )


# ---------------------------------------------------------------------
# trend-in-proportions / paired-eval / keyness / RMST families
# ---------------------------------------------------------------------
def test_cochran_armitage_third_voice(spark, sf):
    o = _tbl("orders", sf).copy()
    o["s"] = o["o_orderpriority"].str[0].astype("int64")
    o["f"] = (o["o_orderstatus"] == "F").astype(int)
    g = o.groupby("s").agg(n=("f", "size"), r=("f", "sum"))
    nn, rr = int(g["n"].sum()), int(g["r"].sum())
    sns = int((g["n"] * g.index).sum())
    sns2 = int((g["n"] * g.index * g.index).sum())
    srs = int((g["r"] * g.index).sum())
    num = float(srs) - float(rr) * float(sns) / nn
    p = float(rr) / nn
    var = p * (1.0 - p) * (float(sns2) - float(sns) * sns / nn)
    want = pd.DataFrame(
        [
            {
                "n_orders": nn,
                "n_events": rr,
                "z_micro": _round_half_away(1e6 * num / math.sqrt(var)),
            }
        ]
    )
    _compare(
        _run(spark, "cochran_armitage_trend", sf), want, ["n_orders"]
    )


_MARKERS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "los", "una"),
    "fr": ("le", "la", "les", "des", "une"),
    "de": ("der", "die", "das", "und", "ein"),
}


def _langid_predict(text: str) -> str:
    ws = str(text).lower().split()
    sc = {
        lang: sum(1 for w in ws if w in set(m))
        for lang, m in _MARKERS.items()
    }
    best = max(sc.values())
    if best == 0:
        return "und"
    for lang in ("de", "en", "es"):
        if sc[lang] == best:
            return lang
    return "fr"


def test_mcnemar_third_voice(spark, sf):
    d = _tbl("documents", sf)
    b = c = a_corr = b_corr = 0
    for _, r in d.iterrows():
        pa = _langid_predict(r["text"])
        pb = "en"
        actual = r["lang"]
        if pa == actual:
            a_corr += 1
        if pb == actual:
            b_corr += 1
        if pa == actual and pb != actual:
            b += 1
        if pa != actual and pb == actual:
            c += 1
    chi2 = (
        _round_half_away(1000.0 * (b - c) * (b - c) / (b + c))
        if b + c > 0
        else 0
    )
    want = pd.DataFrame(
        [
            {
                "n_docs": len(d),
                "a_correct": a_corr,
                "b_correct": b_corr,
                "a_only": b,
                "b_only": c,
                "chi2_milli": chi2,
            }
        ]
    )
    _compare(
        _run(spark, "mcnemar_langid_vs_baseline", sf), want, ["n_docs"]
    )


def test_keyness_third_voice(spark, sf):
    from collections import Counter

    d = _tbl("documents", sf)
    a_cnt, b_cnt = Counter(), Counter()
    for _, r in d.iterrows():
        ws = str(r["text"]).lower().split()
        (a_cnt if r["lang"] == "en" else b_cnt).update(ws)
    ta = sum(a_cnt.values())
    tb = sum(b_cnt.values())
    rows = []
    for w in set(a_cnt) | set(b_cnt):
        a, b = a_cnt.get(w, 0), b_cnt.get(w, 0)
        if a + b < 5:
            continue
        g2 = 0.0
        if a > 0:
            g2 += a * math.log(a / ((a + b) * float(ta) / (ta + tb)))
        if b > 0:
            g2 += b * math.log(b / ((a + b) * float(tb) / (ta + tb)))
        g2 *= 2.0
        sign = 1.0 if a * tb >= b * ta else -1.0
        g2 *= sign
        rows.append({"w": w, "a": a, "b": b, "g2": g2})
    rows.sort(key=lambda r: (-r["g2"], r["w"]))
    want = pd.DataFrame(
        [
            {
                "w": r["w"],
                "a": r["a"],
                "b": r["b"],
                "g2_micro": _round_half_away(1e6 * r["g2"]),
            }
            for r in rows[:25]
        ]
    )
    _compare(
        _run(spark, "keyness_loglik_terms", sf), want, ["w"]
    )


def test_rmst_third_voice(spark, sf):
    TAU = 90
    e = _tbl("events", sf)
    horizon = pd.Timestamp("2024-01-31")
    s = (
        e[e["event_type"] == "signup"]
        .groupby("user_id")["ts"]
        .min()
        .rename("s_ts")
    )
    ep = e[e["event_type"] == "purchase"].merge(s, on="user_id")
    p = (
        ep[ep["ts"] >= ep["s_ts"]]
        .groupby("user_id")["ts"]
        .min()
        .rename("p_ts")
    )
    subj = s.to_frame().join(p, how="left")
    recs = []
    for _, r in subj.iterrows():
        sd = r["s_ts"].normalize()
        if pd.notna(r["p_ts"]):
            recs.append((int((r["p_ts"].normalize() - sd).days), 1))
        else:
            recs.append((int((horizon - sd).days), 0))
    df_ = pd.DataFrame(recs, columns=["t", "e"])
    grid = (
        df_.groupby("t")
        .agg(d=("e", "sum"), leaving=("e", "size"))
        .sort_index()
    )
    n_total, left_before, log_s = len(df_), 0, 0.0
    km = []  # (t, s_micro) at event times only
    for t_, r in grid.iterrows():
        n_risk = n_total - left_before
        if r["d"] > 0:
            if r["d"] == n_risk:
                s_micro = 0
            else:
                log_s += math.log(1.0 - float(r["d"]) / n_risk)
                s_micro = _round_half_away(1e6 * math.exp(log_s))
            km.append((t_, s_micro))
        elif r["d"] < n_risk and r["d"] > 0:
            pass
        left_before += int(r["leaving"])
    first_t = min(min(t for t, _ in km), TAU) if km else TAU
    area = 0
    for i, (t_, s_micro) in enumerate(km):
        seg_start = min(t_, TAU)
        nxt = km[i + 1][0] if i + 1 < len(km) else TAU
        seg_end = min(nxt, TAU)
        if seg_end > seg_start:
            area += s_micro * (seg_end - seg_start)
    want = pd.DataFrame(
        [
            {
                "tau_days": TAU,
                "first_event_day": first_t,
                "rmst_micro_days": first_t * 1_000_000 + area,
            }
        ]
    )
    _compare(
        _run(spark, "rmst_signup_purchase", sf), want, ["tau_days"]
    )


def test_cohens_kappa_third_voice(spark, sf):
    from collections import Counter

    d = _tbl("documents", sf)
    cm = Counter()
    for _, r in d.iterrows():
        cm[(r["lang"], _langid_predict(r["text"]))] += 1
    nn = sum(cm.values())
    agree = sum(n for (a, p), n in cm.items() if a == p)
    classes = {a for a, _ in cm} | {p for _, p in cm}
    row_n = {
        k: sum(n for (a, _), n in cm.items() if a == k)
        for k in classes
    }
    col_n = {
        k: sum(n for (_, p), n in cm.items() if p == k)
        for k in classes
    }
    chance_num = sum(row_n[k] * col_n[k] for k in classes)
    po = float(agree) / nn
    pe = float(chance_num) / (float(nn) * nn)
    want = pd.DataFrame(
        [
            {
                "n_docs": nn,
                "agree": agree,
                "po_micro": _round_half_away(1e6 * po),
                "pe_micro": _round_half_away(1e6 * pe),
                "kappa_micro": _round_half_away(
                    1e6 * (po - pe) / (1.0 - pe)
                ),
            }
        ]
    )
    _compare(
        _run(spark, "cohens_kappa_langid", sf), want, ["n_docs"]
    )


# ---------------------------------------------------------------------
# experiment / means / diversity families
# ---------------------------------------------------------------------
def test_two_proportion_ztest_third_voice(spark, sf):
    e = _tbl("events", sf)
    u = (
        e.assign(conv=(e["event_type"] == "purchase").astype(int))
        .groupby("user_id")["conv"]
        .max()
        .reset_index()
    )
    u["arm"] = u["user_id"] % 2
    g = u.groupby("arm")["conv"].agg(["size", "sum"])
    n0, c0 = int(g.loc[0, "size"]), int(g.loc[0, "sum"])
    n1, c1 = int(g.loc[1, "size"]), int(g.loc[1, "sum"])
    if 0 < c0 + c1 < n0 + n1:
        p = (c0 + c1) / (n0 + n1)
        z = (c1 / n1 - c0 / n0) / math.sqrt(
            p * (1.0 - p) * (1.0 / n0 + 1.0 / n1)
        )
        z_micro = _round_half_away(1e6 * z)
    else:
        z_micro = 0
    want = pd.DataFrame(
        [
            {
                "n0": n0,
                "n1": n1,
                "conv0": c0,
                "conv1": c1,
                "p0_micro": _round_half_away(1e6 * c0 / n0),
                "p1_micro": _round_half_away(1e6 * c1 / n1),
                "z_micro": z_micro,
            }
        ]
    )
    _compare(_run(spark, "two_proportion_ztest", sf), want, ["n0"])


def test_paired_diff_ttest_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["c"] = _cents(e["value"])
    cut = pd.Timestamp("2024-01-16")
    per_user = e.groupby("user_id").apply(
        lambda g: int(g.loc[g["ts"] >= cut, "c"].sum())
        - int(g.loc[g["ts"] < cut, "c"].sum()),
        include_groups=False,
    )
    d = per_user.astype(object)
    n = len(d)
    sd_, sd2 = int(d.sum()), int((d**2).sum())
    mean = float(sd_) / n
    var = (float(sd2) - float(sd_) * sd_ / n) / (n - 1)
    t_ = 1000.0 * mean / math.sqrt(var / n)
    want = pd.DataFrame(
        [
            {
                "n_users": n,
                "sum_diff_cents": sd_,
                "mean_diff_milli": _round_half_away(1000.0 * mean),
                "t_milli": _round_half_away(t_),
            }
        ]
    )
    _compare(_run(spark, "paired_diff_ttest", sf), want, ["n_users"])


def test_generalized_means_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["c"] = _cents(e["value"])
    e = e[e["c"] > 0]
    rows = []
    for et, g in e.groupby("event_type"):
        n = len(g)
        sc = int(g["c"].sum())
        sln = sum(
            _round_half_away(1e6 * math.log(float(c_)))
            for c_ in g["c"]
        )
        sinv = sum(
            _round_half_away(1e12 / float(c_)) for c_ in g["c"]
        )
        rows.append(
            {
                "event_type": et,
                "n_pos": n,
                "arith_milli": _round_half_away(1000.0 * sc / n),
                "geo_milli": _round_half_away(
                    1000.0 * math.exp(float(sln) / 1e6 / n)
                ),
                "harm_milli": _round_half_away(
                    1000.0 * float(n) / (float(sinv) / 1e12)
                ),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "generalized_means_value", sf), want, ["event_type"]
    )


def test_simpson_diversity_third_voice(spark, sf):
    from collections import Counter

    d = _tbl("documents", sf)
    per_source = {}
    for _, r in d.iterrows():
        per_source.setdefault(r["source"], Counter()).update(
            str(r["text"]).lower().split()
        )
    rows = []
    for src, counts in per_source.items():
        n = sum(counts.values())
        if n <= 1:
            continue
        sum_cc = sum(c_ * (c_ - 1) for c_ in counts.values())
        simp = float(sum_cc) / (float(n) * (n - 1))
        rows.append(
            {
                "source": src,
                "n_tokens": n,
                "vocab": len(counts),
                "simpson_micro": _round_half_away(1e6 * simp),
                "diversity_micro": _round_half_away(
                    1e6 * (1.0 - simp)
                ),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "simpson_diversity_by_source", sf), want, ["source"]
    )


# ---------------------------------------------------------------------
# log-rank / JSD / readability / burstiness families
# ---------------------------------------------------------------------
def _survival_subjects(sf):
    e = _tbl("events", sf)
    horizon = pd.Timestamp("2024-01-31")
    s = (
        e[e["event_type"] == "signup"]
        .groupby("user_id")["ts"]
        .min()
        .rename("s_ts")
    )
    ep = e[e["event_type"] == "purchase"].merge(s, on="user_id")
    p = (
        ep[ep["ts"] >= ep["s_ts"]]
        .groupby("user_id")["ts"]
        .min()
        .rename("p_ts")
    )
    subj = s.to_frame().join(p, how="left").reset_index()
    rows = []
    for _, r in subj.iterrows():
        sd = r["s_ts"].normalize()
        if pd.notna(r["p_ts"]):
            t_ = int((r["p_ts"].normalize() - sd).days)
            ev = 1
        else:
            t_ = int((horizon - sd).days)
            ev = 0
        rows.append(
            {"user_id": r["user_id"], "t": t_, "e": ev,
             "grp": int(r["user_id"]) % 2}
        )
    return pd.DataFrame(rows)


def test_logrank_third_voice(spark, sf):
    subj = _survival_subjects(sf)
    grid = (
        subj.groupby("t")
        .apply(
            lambda g: pd.Series(
                {
                    "d1": int(g.loc[g["grp"] == 1, "e"].sum()),
                    "d0": int(g.loc[g["grp"] == 0, "e"].sum()),
                    "l1": int((g["grp"] == 1).sum()),
                    "l0": int((g["grp"] == 0).sum()),
                }
            ),
            include_groups=False,
        )
        .sort_index()
    )
    n1 = int((subj["grp"] == 1).sum())
    n0 = int((subj["grp"] == 0).sum())
    o1 = o0 = 0
    e1 = vv = 0.0
    r1, r0 = n1, n0
    for t_, r in grid.iterrows():
        d = int(r["d1"] + r["d0"])
        nt = r1 + r0
        if d > 0:
            o1 += int(r["d1"])
            o0 += int(r["d0"])
            e1 += float(d) * r1 / nt
            if nt > 1:
                vv += (
                    float(d)
                    * (float(r1) / nt)
                    * (float(r0) / nt)
                    * (nt - d)
                    / (nt - 1)
                )
        r1 -= int(r["l1"])
        r0 -= int(r["l0"])
    chi2 = (
        _round_half_away(1000.0 * (o1 - e1) ** 2 / vv) if vv > 0 else 0
    )
    want = pd.DataFrame(
        [
            {
                "grp": 0,
                "n_subjects": n0,
                "observed": o0,
                "expected_milli": _round_half_away(
                    1000.0 * (o1 + o0 - e1)
                ),
                "chi2_milli": chi2,
            },
            {
                "grp": 1,
                "n_subjects": n1,
                "observed": o1,
                "expected_milli": _round_half_away(1000.0 * e1),
                "chi2_milli": chi2,
            },
        ]
    )
    _compare(_run(spark, "logrank_test_arms", sf), want, ["grp"])


def test_jsd_pairwise_third_voice(spark, sf):
    from collections import Counter

    V = 100
    d = _tbl("documents", sf)
    by_src, global_counts = {}, Counter()
    for _, r in d.iterrows():
        ws = str(r["text"]).lower().split()
        by_src.setdefault(r["source"], Counter()).update(ws)
        global_counts.update(ws)
    vocab = [
        w
        for w, _ in sorted(
            global_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:V]
    ]

    def dist(counts):
        n_s = sum(counts.values())
        ps = [
            (counts.get(w, 0) + 1) / (n_s + V + 1) for w in vocab
        ]
        inv = sum(counts.get(w, 0) for w in vocab)
        ps.append((n_s - inv + 1) / (n_s + V + 1))
        return ps

    def jsd(pa, pb):
        return sum(
            0.5
            * (
                p * math.log(2.0 * p / (p + q))
                + q * math.log(2.0 * q / (p + q))
            )
            for p, q in zip(pa, pb)
        )

    srcs = sorted(by_src)
    dists = {s_: dist(by_src[s_]) for s_ in srcs}
    rows = [
        {
            "source_a": a,
            "source_b": b,
            "jsd_micro": _round_half_away(
                1e6 * jsd(dists[a], dists[b])
            ),
        }
        for i, a in enumerate(srcs)
        for b in srcs[i + 1 :]
    ]
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "jsd_pairwise_sources", sf),
        want,
        ["source_a", "source_b"],
    )


def test_flesch_third_voice(spark, sf):
    import re

    d = _tbl("documents", sf)
    rows = {}
    for _, r in d.iterrows():
        txt = str(r["text"])
        nw = len(txt.lower().split())
        ns = max(1, len(re.findall(r"[.!?]+", txt)))
        sy = len(re.findall(r"[aeiouy]+", txt.lower()))
        acc = rows.setdefault(
            r["source"], {"n_docs": 0, "words": 0, "sents": 0, "sylls": 0}
        )
        acc["n_docs"] += 1
        acc["words"] += nw
        acc["sents"] += ns
        acc["sylls"] += sy
    out = []
    for src, a in rows.items():
        fre = (
            206.835
            - 1.015 * (a["words"] / a["sents"])
            - 84.6 * (a["sylls"] / a["words"])
        )
        out.append(
            {
                "source": src,
                **a,
                "fre_milli": _round_half_away(1000.0 * fre),
            }
        )
    want = pd.DataFrame(out)
    _compare(
        _run(spark, "flesch_reading_ease_by_source", sf),
        want,
        ["source"],
    )


def test_burstiness_third_voice(spark, sf):
    from collections import Counter

    d = _tbl("documents", sf)
    n_docs = len(d)
    per_term_doc = {}
    for _, r in d.iterrows():
        for w, c_ in Counter(str(r["text"]).lower().split()).items():
            per_term_doc.setdefault(w, []).append(c_)
    stats = []
    for w, cs in per_term_doc.items():
        total = sum(cs)
        sum_c2 = sum(c_ * c_ for c_ in cs)
        vmr = (float(sum_c2) - float(total) * total / n_docs) / total
        stats.append((w, total, len(cs), vmr))
    stats.sort(key=lambda x: (-x[1], x[0]))
    want = pd.DataFrame(
        [
            {
                "term": w,
                "total_c": total,
                "df": df_,
                "vmr_milli": _round_half_away(1000.0 * vmr),
            }
            for w, total, df_, vmr in stats[:20]
        ]
    )
    _compare(
        _run(spark, "term_burstiness_top20", sf), want, ["term"]
    )


# ---------------------------------------------------------------------
# KN smoothing / model card / ESS / Neyman allocation families
# ---------------------------------------------------------------------
def test_kneser_ney_third_voice(spark, sf):
    from collections import Counter

    D = 0.75
    d = _tbl("documents", sf)
    c = Counter()
    for _, r in d.iterrows():
        ws = str(r["text"]).lower().split()
        c.update(zip(ws, ws[1:]))
    c_v, n1p_v, n1p_w = Counter(), Counter(), Counter()
    for (v, w), n in c.items():
        c_v[v] += n
        n1p_v[v] += 1
        n1p_w[w] += 1
    n_types = len(c)
    scored = [
        {
            "v": v,
            "w": w,
            "c_vw": n,
            "p_kn_micro": _round_half_away(
                1e6
                * (
                    max(n - D, 0.0) / c_v[v]
                    + D * n1p_v[v] / c_v[v] * n1p_w[w] / n_types
                )
            ),
        }
        for (v, w), n in c.items()
    ]
    scored.sort(key=lambda r: (-r["c_vw"], r["v"], r["w"]))
    want = pd.DataFrame(scored[:20])
    _compare(
        _run(spark, "kneser_ney_bigram_probs", sf), want, ["v", "w"]
    )


def test_langid_prf1_third_voice(spark, sf):
    from collections import Counter

    d = _tbl("documents", sf)
    cm = Counter()
    for _, r in d.iterrows():
        cm[(r["lang"], _langid_predict(r["text"]))] += 1
    classes = sorted({a for a, _ in cm} | {p for _, p in cm})
    rows = []
    for k in classes:
        tp = cm.get((k, k), 0)
        pred_n = sum(n for (_, p), n in cm.items() if p == k)
        act_n = sum(n for (a, _), n in cm.items() if a == k)
        rows.append(
            {
                "class": k,
                "tp": tp,
                "fp": pred_n - tp,
                "fn": act_n - tp,
                "precision_milli": _round_half_away(
                    1000.0 * tp / pred_n
                )
                if pred_n > 0
                else 0,
                "recall_milli": _round_half_away(1000.0 * tp / act_n)
                if act_n > 0
                else 0,
                "f1_milli": _round_half_away(
                    2000.0 * tp / (pred_n + act_n)
                )
                if pred_n + act_n > 0
                else 0,
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "langid_precision_recall_f1", sf), want, ["class"]
    )


def test_ess_third_voice(spark, sf):
    d = _tbl("documents", sf)
    rows = []
    for src, g in d.groupby("source"):
        w = [len(str(t_).lower().split()) for t_ in g["text"]]
        sw, sw2 = sum(w), sum(x * x for x in w)
        ess = float(sw) * sw / sw2
        rows.append(
            {
                "source": src,
                "n_docs": len(w),
                "ess_milli": _round_half_away(1000.0 * ess),
                "ess_ratio_milli": _round_half_away(
                    1000.0 * ess / len(w)
                ),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "ess_importance_weights", sf), want, ["source"]
    )


def test_neyman_allocation_third_voice(spark, sf):
    B = 1000
    e = _tbl("events", sf).copy()
    e["c"] = _cents(e["value"])
    strata = []
    for et, g in e.groupby("event_type"):
        n = len(g)
        s = int(g["c"].sum())
        ss = int((g["c"].astype(object) ** 2).sum())
        s_h = math.sqrt((float(ss) - float(s) * s / n) / (n - 1))
        strata.append({"event_type": et, "n_h": n, "s_h": s_h})
    tot = sum(r["n_h"] * r["s_h"] for r in strata)
    for r in strata:
        r["w_h"] = r["n_h"] * r["s_h"] / tot
        r["base"] = math.floor(B * r["w_h"])
        r["rem"] = B * r["w_h"] - r["base"]
    leftover = B - sum(r["base"] for r in strata)
    order = sorted(strata, key=lambda r: (-r["rem"], r["event_type"]))
    for i, r in enumerate(order):
        r["n_alloc"] = r["base"] + (1 if i < leftover else 0)
    want = pd.DataFrame(
        [
            {
                "event_type": r["event_type"],
                "n_h": r["n_h"],
                "sd_milli": _round_half_away(1000.0 * r["s_h"]),
                "share_micro": _round_half_away(1e6 * r["w_h"]),
                "n_alloc": r["n_alloc"],
            }
            for r in strata
        ]
    )
    _compare(
        _run(spark, "neyman_allocation_by_type", sf),
        want,
        ["event_type"],
    )


# ---------------------------------------------------------------------
# closed-form regression / graph-structure families
# ---------------------------------------------------------------------
def _copurchase_edges(sf, mod):
    li = _tbl("lineitem", sf)[["l_orderkey", "l_partkey"]]
    li = li[li["l_partkey"] % mod == 0].drop_duplicates()
    edges = set()
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"].unique())
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((int(ps[i]), int(ps[j])))
    return edges


def test_ridge_third_voice(spark, sf):
    LAM = 10000
    li = _tbl("lineitem", sf)
    f = li.groupby("l_orderkey").agg(
        x1=("l_partkey", "size"), x2=("l_quantity", "sum")
    )
    o = _tbl("orders", sf).set_index("o_orderkey")
    j = f.join(o, how="inner")
    x1 = j["x1"].astype(object)
    x2 = j["x2"].astype("int64").astype(object)
    y = _cents(j["o_totalprice"]).astype(object)
    n = len(j)
    s1, s2, sy_ = int(x1.sum()), int(x2.sum()), int(y.sum())
    s11 = int((x1 * x1).sum())
    s12 = int((x1 * x2).sum())
    s22 = int((x2 * x2).sum())
    s1y = int((x1 * y).sum())
    s2y = int((x2 * y).sum())
    a11, a12, a13 = float(n), float(s1), float(s2)
    a22, a23, a33 = float(s11 + LAM), float(s12), float(s22 + LAM)
    v1, v2, v3 = float(sy_), float(s1y), float(s2y)
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    b0 = (
        v1 * (a22 * a33 - a23 * a23)
        - a12 * (v2 * a33 - a23 * v3)
        + a13 * (v2 * a23 - a22 * v3)
    ) / det
    b1 = (
        a11 * (v2 * a33 - a23 * v3)
        - v1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * v3 - v2 * a13)
    ) / det
    b2 = (
        a11 * (a22 * v3 - v2 * a23)
        - a12 * (a12 * v3 - v2 * a13)
        + v1 * (a12 * a23 - a22 * a13)
    ) / det
    want = pd.DataFrame(
        [
            {
                "n_orders": n,
                "b0_micro": _round_half_away(1e6 * b0),
                "b1_micro": _round_half_away(1e6 * b1),
                "b2_micro": _round_half_away(1e6 * b2),
            }
        ]
    )
    _compare(
        _run(spark, "ridge_normal_equations", sf), want, ["n_orders"]
    )


def test_assortativity_third_voice(spark, sf):
    from collections import defaultdict

    edges = _copurchase_edges(sf, 4)
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    n = len(xs)
    sx, sy_ = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y_ * y_ for y_ in ys)
    sxy = sum(x * y_ for x, y_ in zip(xs, ys))
    r = (float(sxy) - float(sx) * sy_ / n) / (
        math.sqrt(float(sxx) - float(sx) * sx / n)
        * math.sqrt(float(syy) - float(sy_) * sy_ / n)
    )
    want = pd.DataFrame(
        [
            {
                "n_endpoints": n,
                "mean_deg_milli": _round_half_away(1000.0 * sx / n),
                "assortativity_milli": _round_half_away(1000.0 * r),
            }
        ]
    )
    _compare(
        _run(spark, "degree_assortativity_copurchase", sf),
        want,
        ["n_endpoints"],
    )


def test_lcc_third_voice(spark, sf):
    from collections import defaultdict

    edges = _copurchase_edges(sf, 4)
    deg = defaultdict(int)
    nbrs = defaultdict(set)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
        nbrs[u].add(v)
        nbrs[v].add(u)
    # canonical triangles a<b<c, credit all corners
    tri = defaultdict(int)
    for a, b in edges:
        common = nbrs[a] & nbrs[b]
        for c_ in common:
            if c_ > b:  # a<b<c canonical
                tri[a] += 1
                tri[b] += 1
                tri[c_] += 1
    rows = [
        {
            "node": n_,
            "degree": d_,
            "triangles": tri.get(n_, 0),
            "lcc_milli": _round_half_away(
                1000.0 * 2 * tri.get(n_, 0) / (d_ * (d_ - 1))
            ),
        }
        for n_, d_ in deg.items()
        if d_ >= 2
    ]
    rows.sort(key=lambda r: (-r["lcc_milli"], -r["degree"], r["node"]))
    want = pd.DataFrame(rows[:20])
    _compare(
        _run(spark, "local_clustering_coefficient", sf), want, ["node"]
    )


def test_link_prediction_third_voice(spark, sf):
    from collections import defaultdict

    edges = _copurchase_edges(sf, 6)
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    deg = {n_: len(s_) for n_, s_ in nbrs.items()}
    cand = defaultdict(int)
    for w, ns in nbrs.items():
        ns_sorted = sorted(ns)
        for i in range(len(ns_sorted)):
            for j in range(i + 1, len(ns_sorted)):
                cand[(ns_sorted[i], ns_sorted[j])] += 1
    rows = [
        {
            "a": a,
            "b": b,
            "cn": cn,
            "jaccard_milli": _round_half_away(
                1000.0 * cn / (deg[a] + deg[b] - cn)
            ),
        }
        for (a, b), cn in cand.items()
        if (a, b) not in edges
    ]
    rows.sort(
        key=lambda r: (-r["jaccard_milli"], -r["cn"], r["a"], r["b"])
    )
    want = pd.DataFrame(rows[:15])
    _compare(
        _run(spark, "common_neighbors_link_prediction", sf),
        want,
        ["a", "b"],
    )


# ---------------------------------------------------------------------
# causal / scorecard families
# ---------------------------------------------------------------------
def test_cuped_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["c"] = _cents(e["value"])
    cut = pd.Timestamp("2024-01-16")
    u = (
        e.groupby("user_id")
        .apply(
            lambda g: pd.Series(
                {
                    "x": int(g.loc[g["ts"] < cut, "c"].sum()),
                    "y": int(g.loc[g["ts"] >= cut, "c"].sum()),
                }
            ),
            include_groups=False,
        )
        .reset_index()
    )
    u["arm"] = u["user_id"] % 2
    n = len(u)
    sx, sy_ = int(u["x"].sum()), int(u["y"].sum())
    sxx = int((u["x"].astype(object) ** 2).sum())
    sxy = int((u["x"].astype(object) * u["y"].astype(object)).sum())
    theta = (float(sxy) - float(sx) * sy_ / n) / (
        float(sxx) - float(sx) * sx / n
    )
    mean_x = float(sx) / n
    rows = []
    for arm, g in u.groupby("arm"):
        na = len(g)
        sxa, sya = int(g["x"].sum()), int(g["y"].sum())
        sxxa = int((g["x"].astype(object) ** 2).sum())
        sxya = int(
            (g["x"].astype(object) * g["y"].astype(object)).sum()
        )
        syya = int((g["y"].astype(object) ** 2).sum())
        mxa, mya = float(sxa) / na, float(sya) / na
        vxa = float(sxxa) / na - mxa * mxa
        vya = float(syya) / na - mya * mya
        cva = float(sxya) / na - mxa * mya
        varred = 1.0 - (
            vya - 2.0 * theta * cva + theta * theta * vxa
        ) / vya
        rows.append(
            {
                "arm": arm,
                "n_users": na,
                "theta_micro": _round_half_away(1e6 * theta),
                "mean_post_milli": _round_half_away(1000.0 * mya),
                "mean_cuped_milli": _round_half_away(
                    1000.0 * (mya - theta * (mxa - mean_x))
                ),
                "varred_bp": _round_half_away(10000.0 * varred),
            }
        )
    want = pd.DataFrame(rows)
    _compare(_run(spark, "cuped_adjusted_lift", sf), want, ["arm"])


def test_did_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["c"] = _cents(e["value"])
    e["arm"] = e["user_id"] % 2
    cut = pd.Timestamp("2024-01-16")
    cells = {}
    for arm, g in e.groupby("arm"):
        pre = g[g["ts"] < cut]
        post = g[g["ts"] >= cut]
        cells[arm] = {
            "n_pre": len(pre),
            "n_post": len(post),
            "pre_mean": float(pre["c"].sum()) / len(pre),
            "post_mean": float(post["c"].sum()) / len(post),
        }
    deltas = {
        a: c_["post_mean"] - c_["pre_mean"] for a, c_ in cells.items()
    }
    did = deltas[1] - deltas[0]
    rows = [
        {
            "arm": a,
            "n_pre": c_["n_pre"],
            "n_post": c_["n_post"],
            "pre_mean_milli": _round_half_away(1000.0 * c_["pre_mean"]),
            "post_mean_milli": _round_half_away(
                1000.0 * c_["post_mean"]
            ),
            "delta_milli": _round_half_away(1000.0 * deltas[a]),
            "did_milli": _round_half_away(1000.0 * did),
        }
        for a, c_ in cells.items()
    ]
    want = pd.DataFrame(rows)
    _compare(_run(spark, "did_two_period_lift", sf), want, ["arm"])


def test_woe_iv_third_voice(spark, sf):
    o = _tbl("orders", sf).copy()
    o["c"] = _cents(o["o_totalprice"])
    o["y"] = (o["o_orderstatus"] == "F").astype(int)
    vals = np.sort(o["c"].to_numpy())
    edges = [_pdisc(vals, i / 10) for i in range(1, 10)]
    o["bin"] = o["c"].apply(
        lambda c_: sum(1 for e_ in edges if c_ > e_)
    )
    cnt = o.groupby("bin").agg(n=("y", "size"), n_pos=("y", "sum"))
    tp = int(cnt["n_pos"].sum())
    tn = int((cnt["n"] - cnt["n_pos"]).sum())
    rows = []
    for b, r in cnt.iterrows():
        ps = (r["n_pos"] + 0.5) / (tp + 0.5)
        ns = (r["n"] - r["n_pos"] + 0.5) / (tn + 0.5)
        woe = math.log(ps / ns)
        rows.append(
            {
                "bin": b,
                "n": int(r["n"]),
                "n_pos": int(r["n_pos"]),
                "woe_micro": _round_half_away(1e6 * woe),
                "iv_term_micro": _round_half_away(
                    1e6 * (ps - ns) * woe
                ),
            }
        )
    want = pd.DataFrame(rows)
    _compare(_run(spark, "woe_iv_price_deciles", sf), want, ["bin"])


def test_stratified_adjustment_third_voice(spark, sf):
    e = _tbl("events", sf)
    per_user = (
        e.groupby("user_id")
        .apply(
            lambda g: pd.Series(
                {
                    "n": len(g),
                    "x": int((g["event_type"] == "purchase").sum()),
                    "treated": int(
                        g["ts"].min()
                        < pd.Timestamp("2024-01-01 06:00:00")
                    ),
                }
            ),
            include_groups=False,
        )
        .reset_index()
    )
    ns = np.sort(per_user["n"].to_numpy())
    qs = [_pdisc(ns, q) for q in (0.25, 0.5, 0.75)]
    per_user["stratum"] = per_user["n"].apply(
        lambda n_: sum(1 for q in qs if n_ > q)
    )
    rows = []
    for s_, g in per_user.groupby("stratum"):
        t_ = g[g["treated"] == 1]
        c_ = g[g["treated"] == 0]
        if len(t_) == 0 or len(c_) == 0:
            continue
        rate_diff = float(t_["x"].sum()) / t_["n"].sum() - float(
            c_["x"].sum()
        ) / c_["n"].sum()
        rows.append(
            {
                "stratum": s_,
                "n_treated": len(t_),
                "n_control": len(c_),
                "x_treated": int(t_["x"].sum()),
                "x_control": int(c_["x"].sum()),
                "rate_diff_milli": _round_half_away(1000.0 * rate_diff),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "stratified_adjusted_difference", sf),
        want,
        ["stratum"],
    )


# ---------------------------------------------------------------------
# allocation / backtest / segmentation / sequence-audit families
# ---------------------------------------------------------------------
def test_proration_third_voice(spark, sf):
    li = _tbl("lineitem", sf)[
        ["l_orderkey", "l_linenumber", "l_quantity"]
    ].copy()
    o = _tbl("orders", sf)[["o_orderkey", "o_totalprice"]].copy()
    o["total_cents"] = _cents(o["o_totalprice"])
    totals = o.set_index("o_orderkey")["total_cents"].to_dict()
    li["qty"] = li["l_quantity"].round().astype("int64")
    rows = []
    for ok, g in li.groupby("l_orderkey"):
        if ok not in totals:
            continue
        g = g.sort_values(["l_linenumber", "l_quantity"]).reset_index(
            drop=True
        )
        tq = int(g["qty"].sum())
        tc = int(totals[ok])
        lines = []
        for i, (_, r) in enumerate(g.iterrows()):
            q = int(r["qty"])
            lines.append(
                {
                    "line_seq": i + 1,
                    "base": (tc * q) // tq,
                    "rem": (tc * q) % tq,
                }
            )
        short = tc - sum(ln["base"] for ln in lines)
        order = sorted(lines, key=lambda x: (-x["rem"], x["line_seq"]))
        bump = {ln["line_seq"] for ln in order[:short]}
        for ln in lines:
            rows.append(
                {
                    "l_orderkey": ok,
                    "line_seq": ln["line_seq"],
                    "alloc_cents": ln["base"]
                    + (1 if ln["line_seq"] in bump else 0),
                }
            )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "proration_largest_remainder", sf),
        want,
        ["l_orderkey", "line_seq"],
    )


def test_seasonal_naive_third_voice(spark, sf):
    daily = _daily_cents(_tbl("events", sf)).rename(
        columns={"v": "cents"}
    )
    split = pd.Timestamp("2024-01-24")
    daily["dow"] = daily["day"].dt.weekday + 1  # ISO dow
    train = daily[daily["day"] < split]
    model = (
        train.groupby(["event_type", "dow"])["cents"]
        .agg(["size", "sum"])
        .rename(columns={"size": "n", "sum": "s"})
    )
    rows = []
    test = daily[daily["day"] >= split]
    for _, r in test.iterrows():
        key = (r["event_type"], r["dow"])
        if key not in model.index:
            continue
        m = model.loc[key]
        pred = _round_half_away(1000.0 * m["s"] / m["n"])
        rows.append(
            {
                "event_type": r["event_type"],
                "day": r["day"].strftime("%Y-%m-%d"),
                "actual_cents": int(r["cents"]),
                "pred_milli": pred,
                "abs_err_milli": abs(int(r["cents"]) * 1000 - pred),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "seasonal_naive_backtest", sf),
        want,
        ["event_type", "day"],
    )


def test_rfm_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["c"] = _cents(e["value"])
    asof = pd.Timestamp("2024-01-31")
    rfm = (
        e.groupby("user_id")
        .apply(
            lambda g: pd.Series(
                {
                    "r_days": int(
                        (asof - g["ts"].max().normalize()).days
                    ),
                    "f_events": len(g),
                    "m_cents": int(g["c"].sum()),
                }
            ),
            include_groups=False,
        )
        .reset_index()
    )

    def score(col):
        vals = np.sort(rfm[col].to_numpy())
        ths = [_pdisc(vals, q) for q in (0.2, 0.4, 0.6, 0.8)]
        return rfm[col].apply(
            lambda v: 1 + sum(1 for t_ in ths if v > t_)
        )

    rfm["r_score"] = score("r_days")
    rfm["f_score"] = score("f_events")
    rfm["m_score"] = score("m_cents")
    want = (
        rfm.groupby(["r_score", "f_score", "m_score"])
        .agg(n_users=("m_cents", "size"), segment_cents=("m_cents", "sum"))
        .reset_index()
    )
    _compare(
        _run(spark, "rfm_quintile_segments", sf),
        want,
        ["r_score", "f_score", "m_score"],
    )


def test_orderkey_gap_third_voice(spark, sf):
    o = _tbl("orders", sf)
    keys = sorted(
        o.loc[o["o_orderstatus"] == "F", "o_orderkey"].unique()
    )
    rows = [
        {
            "gap_start": int(a) + 1,
            "gap_end": int(b) - 1,
            "n_missing": int(b) - int(a) - 1,
        }
        for a, b in zip(keys, keys[1:])
        if b - a > 1
    ]
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "orderkey_gap_audit", sf), want, ["gap_start"]
    )


# ---------------------------------------------------------------------
# contrastive terms / collocations / LM scoring / decomposition
# ---------------------------------------------------------------------
def test_fightin_words_third_voice(spark, sf):
    from collections import Counter

    ALPHA, MIN_, TOP = 500.0, 5, 10
    d = _tbl("documents", sf)
    ca, cb = Counter(), Counter()
    for _, r in d.iterrows():
        if r["source"] == "src0":
            ca.update(str(r["text"]).lower().split())
        elif r["source"] == "src1":
            cb.update(str(r["text"]).lower().split())
    na, nb = sum(ca.values()), sum(cb.values())
    rows = []
    for w in set(ca) | set(cb):
        ya, yb = ca.get(w, 0), cb.get(w, 0)
        if ya + yb < MIN_:
            continue
        aw = ALPHA * (ya + yb) / (na + nb)
        delta = math.log((ya + aw) / (na + ALPHA - ya - aw)) - math.log(
            (yb + aw) / (nb + ALPHA - yb - aw)
        )
        var = 1.0 / (ya + aw) + 1.0 / (yb + aw)
        z = delta / math.sqrt(var)
        rows.append({"w": w, "ya": ya, "yb": yb, "z": z})
    rows.sort(key=lambda r: (-r["z"], r["w"]))
    want = pd.DataFrame(
        [
            {
                "w": r["w"],
                "ya": r["ya"],
                "yb": r["yb"],
                "z_micro": _round_half_away(1e6 * r["z"]),
            }
            for r in rows[:TOP]
        ]
    )
    _compare(_run(spark, "fightin_words_terms", sf), want, ["w"])


def test_skipgram_pmi_third_voice(spark, sf):
    from collections import Counter

    W, MIN_, TOP = 2, 5, 50
    d = _tbl("documents", sf)
    uni, pairs = Counter(), Counter()
    n_tok = n_pairs = 0
    for _, r in d.iterrows():
        ws = str(r["text"]).lower().split()
        uni.update(ws)
        n_tok += len(ws)
        for i in range(len(ws)):
            for k in range(1, W + 1):
                if i + k < len(ws):
                    pairs[(ws[i], ws[i + k])] += 1
                    n_pairs += 1
    rows = []
    for (a, b), c_ab in pairs.items():
        if c_ab < MIN_:
            continue
        pmi = math.log(
            (float(c_ab) / n_pairs)
            / ((float(uni[a]) / n_tok) * (float(uni[b]) / n_tok))
        )
        rows.append(
            {
                "a": a,
                "b": b,
                "c_ab": c_ab,
                "pmi_micro": _round_half_away(1e6 * pmi),
            }
        )
    rows.sort(key=lambda r: (-r["pmi_micro"], r["a"], r["b"]))
    want = pd.DataFrame(rows[:TOP])
    _compare(
        _run(spark, "skipgram_pmi_pairs", sf), want, ["a", "b"]
    )


def test_stupid_backoff_third_voice(spark, sf):
    import hashlib
    from collections import Counter

    ALPHA, GATE = 0.4, 58982
    d = _tbl("documents", sf)
    c1, c2, c3 = Counter(), Counter(), Counter()
    n_train = 0
    test_docs = []
    for _, r in d.iterrows():
        txt = str(r["text"]).lower()
        ws = txt.split()
        is_train = int(hashlib.md5(txt.encode()).hexdigest()[:4], 16) < GATE
        if is_train:
            c1.update(ws)
            n_train += len(ws)
            c2.update(zip(ws, ws[1:]))
            c3.update(zip(ws, ws[1:], ws[2:]))
        else:
            if len(ws) >= 3:
                test_docs.append((r["doc_id"], r["source"], ws))
    rows = []
    for doc_id, src, ws in test_docs:
        lps = []
        for a, b, c_ in zip(ws, ws[1:], ws[2:]):
            if (a, b, c_) in c3:
                s = c3[(a, b, c_)] / c2[(a, b)]
            elif (b, c_) in c2:
                s = ALPHA * c2[(b, c_)] / c1[b]
            elif c_ in c1:
                s = ALPHA * ALPHA * c1[c_] / n_train
            else:
                s = ALPHA * ALPHA / n_train
            lps.append(math.log(s))
        rows.append(
            {
                "doc_id": doc_id,
                "source": src,
                "n_tri": len(lps),
                "avg_logscore_micro": _round_half_away(
                    1e6 * sum(lps) / len(lps)
                ),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "stupid_backoff_trigram_score", sf),
        want,
        ["doc_id"],
    )


def test_seasonal_decomposition_third_voice(spark, sf):
    daily = _daily_cents(_tbl("events", sf)).rename(
        columns={"v": "cents"}
    )
    frames = []
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        n = len(g)
        tsum = [
            int(g["cents"].iloc[i - 3 : i + 4].sum())
            if 3 <= i < n - 3
            else None
            for i in range(n)
        ]
        g["tsum"] = tsum
        g["detrended"] = [
            float(c_) - float(t_) / 7 if t_ is not None else None
            for c_, t_ in zip(g["cents"], g["tsum"])
        ]
        frames.append(g)
    detr = pd.concat(frames, ignore_index=True)
    detr["dow"] = detr["day"].dt.weekday + 1
    seas = (
        detr[detr["detrended"].notna()]
        .groupby(["event_type", "dow"])["detrended"]
        .mean()
        .round(6)
        .rename("seasonal")
    )
    rows = []
    for _, r in detr.iterrows():
        key = (r["event_type"], r["dow"])
        if key not in seas.index:
            continue
        s_milli = _round_half_away(1000.0 * seas.loc[key])
        t_milli = (
            _round_half_away(1000.0 * r["tsum"] / 7)
            if pd.notna(r["tsum"])
            else None
        )
        rows.append(
            {
                "event_type": r["event_type"],
                "day": r["day"].strftime("%Y-%m-%d"),
                "cents": int(r["cents"]),
                "trend_milli": t_milli,
                "seasonal_milli": s_milli,
                "resid_milli": int(r["cents"]) * 1000 - t_milli - s_milli
                if t_milli is not None
                else None,
            }
        )
    want = pd.DataFrame(rows)
    want["trend_milli"] = want["trend_milli"].astype("Int64")
    want["resid_milli"] = want["resid_milli"].astype("Int64")
    _compare(
        _run(spark, "seasonal_decomposition_daily", sf),
        want,
        ["event_type", "day"],
    )


# ---------------------------------------------------------------------
# retrieval-eval / feature-selection families
# ---------------------------------------------------------------------
_RETR_QUERIES = {
    1: ("spark", "join", "merge"),
    2: ("scan", "filter", "column"),
    3: ("stream", "window", "batch"),
}


def _retrieval_hits(sf):
    from collections import Counter

    d = _tbl("documents", sf)
    hits = {}  # qid -> {doc_id: (tf_sum, n_distinct_terms)}
    for _, r in d.iterrows():
        counts = Counter(str(r["text"]).lower().split())
        for qid, terms in _RETR_QUERIES.items():
            tf_sum = sum(counts.get(t_, 0) for t_ in terms)
            rel = sum(1 for t_ in terms if counts.get(t_, 0) > 0)
            if rel > 0:
                hits.setdefault(qid, {})[int(r["doc_id"])] = (
                    tf_sum,
                    rel,
                )
    return hits


def test_ndcg_third_voice(spark, sf):
    K = 10
    hits = _retrieval_hits(sf)
    rows = []
    for qid, docs in hits.items():
        items = [
            {"doc_id": did, "tf": tf, "rel": rel}
            for did, (tf, rel) in docs.items()
        ]
        by_score = sorted(items, key=lambda x: (-x["tf"], x["doc_id"]))
        by_rel = sorted(items, key=lambda x: (-x["rel"], x["doc_id"]))
        dcg = sum(
            (2.0 ** it["rel"] - 1) / math.log2(pos + 2)
            for pos, it in enumerate(by_score[:K])
        )
        idcg = sum(
            (2.0 ** it["rel"] - 1) / math.log2(pos + 2)
            for pos, it in enumerate(by_rel[:K])
        )
        rows.append(
            {
                "qid": qid,
                "dcg_micro": _round_half_away(1e6 * dcg),
                "idcg_micro": _round_half_away(1e6 * idcg),
                "ndcg_milli": _round_half_away(1000.0 * dcg / idcg),
            }
        )
    want = pd.DataFrame(rows)
    _compare(_run(spark, "ndcg_retrieval_audit", sf), want, ["qid"])


def test_map_third_voice(spark, sf):
    REL = 2
    hits = _retrieval_hits(sf)
    rows = []
    for qid, docs in hits.items():
        items = sorted(
            (
                {"doc_id": did, "tf": tf, "rel": 1 if nd >= REL else 0}
                for did, (tf, nd) in docs.items()
            ),
            key=lambda x: (-x["tf"], x["doc_id"]),
        )
        cum = 0
        ap_num = 0
        for pos, it in enumerate(items, start=1):
            cum += it["rel"]
            if it["rel"] == 1:
                ap_num += _round_half_away(1e6 * cum / pos)
        n_rel = sum(it["rel"] for it in items)
        if n_rel == 0:
            continue
        rows.append(
            {
                "qid": qid,
                "n_candidates": len(items),
                "n_rel": n_rel,
                "ap_micro": _round_half_away(float(ap_num) / n_rel),
            }
        )
    want = pd.DataFrame(rows)
    _compare(_run(spark, "map_retrieval_audit", sf), want, ["qid"])


def test_mutual_information_third_voice(spark, sf):
    o = _tbl("orders", sf).copy()
    o["y"] = (o["o_totalprice"] > 250000).astype(int)
    rows = []
    for feat in ("o_orderpriority", "o_orderstatus"):
        cells = o.groupby([feat, "y"]).size()
        n = int(cells.sum())
        cx = cells.groupby(level=0).sum()
        cy = cells.groupby(level=1).sum()
        mi = sum(
            (c_ / n)
            * math.log(n * c_ / (float(cx[x_]) * cy[y_]))
            for (x_, y_), c_ in cells.items()
        )
        rows.append(
            {
                "feature": feat,
                "n_cells": len(cells),
                "mi_nats": round(mi, 6),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "mutual_information_features", sf),
        want,
        ["feature"],
    )


# ---------------------------------------------------------------------
# RBO / Luhn / l-diversity / temperature-mixture families
# ---------------------------------------------------------------------
def test_rbo_third_voice(spark, sf):
    K = 15
    li = _tbl("lineitem", sf).copy()
    li["rev"] = _cents(li["l_extendedprice"])
    li["qty"] = li["l_quantity"].astype("int64")
    agg = li.groupby("l_partkey").agg(
        rev=("rev", "sum"), qty=("qty", "sum")
    )
    ra = [
        k
        for k, _ in sorted(
            agg["rev"].items(), key=lambda kv: (-kv[1], kv[0])
        )[:K]
    ]
    rb = [
        k
        for k, _ in sorted(
            agg["qty"].items(), key=lambda kv: (-kv[1], kv[0])
        )[:K]
    ]
    pos_a = {k: i + 1 for i, k in enumerate(ra)}
    pos_b = {k: i + 1 for i, k in enumerate(rb)}
    dmax = [
        max(pos_a[k], pos_b[k]) for k in set(ra) & set(rb)
    ]
    rows = []
    cum_term = 0
    for d in range(1, K + 1):
        overlap = sum(1 for x in dmax if x <= d)
        p9, p10 = 9 ** (d - 1), 10 ** (d - 1)
        a = 100000 * overlap * p9
        b = d * p10
        term = (2 * a + b) // (2 * b)  # round-half-up integer div
        cum_term += term
        rows.append(
            {
                "d": d,
                "overlap_d": overlap,
                "agreement_milli": _round_half_away(
                    1000.0 * overlap / d
                ),
                "rbo_partial_micro": cum_term,
            }
        )
    want = pd.DataFrame(rows)
    _compare(_run(spark, "rbo_rank_agreement", sf), want, ["d"])


def test_luhn_third_voice(spark, sf):
    o = _tbl("orders", sf)
    rows = {}
    for _, r in o.iterrows():
        pan = str(
            (int(r["o_orderkey"]) * 1000003 + int(r["o_custkey"]) * 97)
            % 10_000_000_000_000_000
        ).zfill(16)
        total = 0
        for i, ch in enumerate(reversed(pan)):
            d_ = int(ch)
            if i % 2 == 1:
                d_ *= 2
                if d_ > 9:
                    d_ -= 9
            total += d_
        ok = 1 if total % 10 == 0 else 0
        acc = rows.setdefault(
            r["o_orderpriority"], {"n_orders": 0, "n_valid": 0}
        )
        acc["n_orders"] += 1
        acc["n_valid"] += ok
    want = pd.DataFrame(
        [
            {
                "o_orderpriority": p,
                "n_orders": a["n_orders"],
                "n_valid": a["n_valid"],
                "valid_permille": _round_half_away(
                    1000.0 * a["n_valid"] / a["n_orders"]
                ),
            }
            for p, a in rows.items()
        ]
    )
    _compare(
        _run(spark, "luhn_checksum_screen", sf),
        want,
        ["o_orderpriority"],
    )


def test_l_diversity_third_voice(spark, sf):
    c = _tbl("customer", sf).copy()
    # Spark `div` truncates toward zero (DuckDB `//` on negatives
    # floors, but the banding here matches Spark's div semantics)
    c["bal_band"] = _cents(c["c_acctbal"]).apply(
        lambda x: int(x / 100000) if x < 0 else x // 100000
    )
    g = (
        c.groupby(["c_nationkey", "bal_band"])["c_mktsegment"]
        .agg(["size", "nunique"])
        .reset_index()
    )
    want = pd.DataFrame(
        {
            "nation": g["c_nationkey"].astype("int64"),
            "bal_band": g["bal_band"].astype("int64"),
            "class_size": g["size"],
            "l_distinct": g["nunique"],
            "violates_l3": g["nunique"] < 3,
        }
    )
    _compare(
        _run(spark, "l_diversity_audit", sf),
        want,
        ["nation", "bal_band"],
    )


def test_temperature_mixture_third_voice(spark, sf):
    d = _tbl("documents", sf)
    m = d.groupby("lang").size()
    total = int(m.sum())
    z = sum(math.sqrt(float(n)) for n in m)
    rows = []
    for lang, n in m.items():
        p = float(n) / total
        w = math.sqrt(float(n)) / z
        rows.append(
            {
                "lang": lang,
                "n_docs": int(n),
                "p_micro": _round_half_away(1e6 * p),
                "w_micro": _round_half_away(1e6 * w),
                "boost_milli": _round_half_away(1000.0 * w / p),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "temperature_mixture_weights", sf), want, ["lang"]
    )


# ---------------------------------------------------------------------
# cohort LTV / SLA / trailing quantile / disorder families
# ---------------------------------------------------------------------
def test_cohort_ltv_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["c"] = _cents(e["value"])
    e["day"] = e["ts"].dt.normalize()
    s = (
        e[e["event_type"] == "signup"]
        .groupby("user_id")["day"]
        .min()
        .rename("s_day")
    )
    cohorts = s.to_frame()
    cohorts["cohort"] = cohorts["s_day"] - pd.to_timedelta(
        cohorts["s_day"].dt.weekday, unit="D"
    )
    csize = cohorts.groupby("cohort").size()
    p = e[e["event_type"] == "purchase"].merge(
        cohorts, on="user_id"
    )
    p = p[p["day"] >= p["s_day"]].copy()
    p["age_day"] = (p["day"] - p["s_day"]).dt.days
    rev = (
        p.groupby(["cohort", "age_day"])["c"]
        .sum()
        .rename("rev")
        .reset_index()
        .sort_values(["cohort", "age_day"])
    )
    rows = []
    for coh, g in rev.groupby("cohort"):
        cum = 0
        n_users = int(csize[coh])
        for _, r in g.iterrows():
            cum += int(r["rev"])
            rows.append(
                {
                    "cohort": coh.strftime("%Y-%m-%d"),
                    "age_day": int(r["age_day"]),
                    "n_users": n_users,
                    "cum_rev_cents": cum,
                    "ltv_per_user_cents": cum // n_users,
                }
            )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "cohort_ltv_curve", sf), want, ["cohort", "age_day"]
    )


def test_order_to_ship_third_voice(spark, sf):
    li = _tbl("lineitem", sf)[["l_orderkey", "l_shipdate"]]
    o = _tbl("orders", sf)[
        ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    sd = pd.to_datetime(j["l_shipdate"])
    od = pd.to_datetime(j["o_orderdate"])
    j = j[sd >= od].copy()
    j["days"] = (
        pd.to_datetime(j["l_shipdate"]).dt.normalize()
        - pd.to_datetime(j["o_orderdate"]).dt.normalize()
    ).dt.days
    rows = []
    for p_, g in j.groupby("o_orderpriority"):
        vals = np.sort(g["days"].to_numpy())
        rows.append(
            {
                "o_orderpriority": p_,
                "n_lines": len(g),
                "p50_days": int(_pdisc(vals, 0.50)),
                "p90_days": int(_pdisc(vals, 0.90)),
                "max_days": int(vals[-1]),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "order_to_ship_latency", sf),
        want,
        ["o_orderpriority"],
    )


def test_trailing_quantile_third_voice(spark, sf):
    daily = _daily_cents(_tbl("events", sf)).rename(
        columns={"v": "cents"}
    )
    rows = []
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        vals = g["cents"].tolist()
        for i in range(len(g)):
            win = sorted(vals[max(0, i - 6) : i + 1])
            n = len(win)
            idx = math.ceil(0.9 * n)
            rows.append(
                {
                    "event_type": et,
                    "day": g["day"].iloc[i].strftime("%Y-%m-%d"),
                    "cents": int(vals[i]),
                    "p90_trailing": int(win[idx - 1]),
                }
            )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "trailing_quantile_7day", sf),
        want,
        ["event_type", "day"],
    )


def test_out_of_order_third_voice(spark, sf):
    e = _tbl("events", sf).copy()
    e["t_us"] = e["ts"].astype("datetime64[us]").astype("int64")
    rows = []
    for et, g in e.groupby("event_type"):
        g = g.sort_values("event_id")
        t = g["t_us"].to_numpy()
        prev = np.roll(t, 1)
        prev[0] = -1
        back = (t[1:] < t[:-1])
        n_back = int(back.sum())
        max_back = (
            int((t[:-1] - t[1:])[back].max()) if n_back else 0
        )
        rows.append(
            {
                "event_type": et,
                "n_events": len(g),
                "n_backward": n_back,
                "backward_milli": _round_half_away(
                    1000.0 * n_back / len(g)
                ),
                "max_backward_us": max_back,
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "out_of_order_audit", sf), want, ["event_type"]
    )


# ---------------------------------------------------------------------
# rank fusion / sharding / curriculum / coreset families
# ---------------------------------------------------------------------
def test_rrf_fusion_third_voice(spark, sf):
    d = _tbl("documents", sf).copy()
    d["n_words"] = d["text"].apply(lambda t_: len(str(t_).lower().split()))
    rows = []
    for lang, g in d.groupby("lang"):
        ra = {
            did: i + 1
            for i, did in enumerate(
                g.sort_values(
                    ["n_chars", "doc_id"], ascending=[False, True]
                )["doc_id"]
            )
        }
        rb = {
            did: i + 1
            for i, did in enumerate(
                g.sort_values(
                    ["n_words", "doc_id"], ascending=[False, True]
                )["doc_id"]
            )
        }
        fused = sorted(
            (
                (
                    1_000_000_000_000 // (60 + ra[did])
                    + 1_000_000_000_000 // (60 + rb[did]),
                    did,
                )
                for did in g["doc_id"]
            ),
            key=lambda x: (-x[0], x[1]),
        )
        for rk, (score, did) in enumerate(fused[:5], start=1):
            rows.append(
                {
                    "lang": lang,
                    "doc_id": did,
                    "rrf_score": score,
                    "rk": rk,
                }
            )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "rrf_rank_fusion_by_lang", sf), want, ["lang", "rk"]
    )


def test_shard_stripe_third_voice(spark, sf):
    NS = 8
    d = _tbl("documents", sf)
    shard_mass = {s_: {"n": 0, "chars": 0} for s_ in range(NS)}
    for _, g in d.groupby("lang"):
        g = g.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        for i, (_, r) in enumerate(g.iterrows()):
            s_ = i % NS
            shard_mass[s_]["n"] += 1
            shard_mass[s_]["chars"] += int(r["n_chars"])
    total = sum(a["chars"] for a in shard_mass.values())
    want = pd.DataFrame(
        [
            {
                "shard": s_,
                "n_docs": a["n"],
                "total_chars": a["chars"],
                "imbalance_milli": _round_half_away(
                    1000.0 * (NS * a["chars"] - total) / total
                ),
            }
            for s_, a in shard_mass.items()
            if a["n"] > 0
        ]
    )
    _compare(
        _run(spark, "shard_stripe_balance", sf), want, ["shard"]
    )


def test_curriculum_third_voice(spark, sf):
    TOP = 100
    d = _tbl("documents", sf)
    srcs = sorted(d["source"].unique())
    sidx = {s_: i + 1 for i, s_ in enumerate(srcs)}
    n_src = len(srcs)
    rows = []
    for src, g in d.groupby("source"):
        g = g.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        for r_, (_, row) in enumerate(g.iterrows(), start=1):
            pos = (r_ - 1) * n_src + sidx[src]
            if pos <= TOP:
                rows.append(
                    {
                        "position": pos,
                        "doc_id": row["doc_id"],
                        "source": src,
                        "n_chars": row["n_chars"],
                    }
                )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "curriculum_interleave_order", sf),
        want,
        ["position"],
    )


def test_kcenter_third_voice(spark, sf):
    K, START = 5, 0
    em = _tbl("embeddings", sf)
    vecs = {
        int(r["vec_id"]): np.array(r["embedding"], dtype="float64")
        for _, r in em.iterrows()
    }

    def sqd(a, b):
        # mirror the index-order fold + 6dp round
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return round(acc, 6)

    picks = [(1, START, 0.0)]
    selected = [START]
    for step in range(2, K + 1):
        best = None
        for vid, v in vecs.items():
            if vid in selected:
                continue
            mind = min(sqd(v, vecs[s_]) for s_ in selected)
            key = (-mind, vid)
            if best is None or key < best[0]:
                best = (key, vid, mind)
        picks.append((step, best[1], best[2]))
        selected.append(best[1])
    want = pd.DataFrame(
        [
            {"step": s_, "vec_id": vid, "radius": rad}
            for s_, vid, rad in picks
        ]
    )
    got = _run(spark, "kcenter_coreset_selection", sf)
    got = got[["step", "vec_id", "radius"]]
    _compare(got, want, ["step"])


# ---------------------------------------------------------------------
# connected components / MRL recall / spatial families
# ---------------------------------------------------------------------
def test_connected_components_third_voice(spark, sf):
    edges = _copurchase_edges(sf, 7)
    from collections import defaultdict

    adj = defaultdict(set)
    nodes = set()
    li = _tbl("lineitem", sf)
    nodes.update(
        int(p)
        for p in li.loc[
            li["l_partkey"] % 7 == 0, "l_partkey"
        ].unique()
    )
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    comp = {}
    for n_ in nodes:
        if n_ in comp:
            continue
        stack, members = [n_], []
        seen = {n_}
        while stack:
            x = stack.pop()
            members.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        root = min(members)
        for m in members:
            comp[m] = root
    want = pd.DataFrame(
        [{"node": n_, "comp": c_} for n_, c_ in comp.items()]
    )
    _compare(
        _run(spark, "connected_components_minlabel", sf),
        want,
        ["node"],
    )


def test_matryoshka_third_voice(spark, sf):
    NQ, DIM, K = 8, 16, 5
    em = _tbl("embeddings", sf)
    vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for _, r in em.iterrows()
    }

    def cos(a, b):
        dot = num_a = num_b = 0.0
        for x, y in zip(a, b):
            dot += x * y
            num_a += x * x
            num_b += y * y
        return round(dot / math.sqrt(num_a * num_b), 6)

    def topk(q, dims):
        qv = vecs[q][:dims]
        scored = sorted(
            (
                (-cos(qv, v[:dims]), nid)
                for nid, v in vecs.items()
                if nid != q
            ),
        )[:K]
        return {nid for _, nid in scored}

    rows = []
    for q in range(NQ):
        if q not in vecs:
            continue
        full = topk(q, 64)
        trunc = topk(q, DIM)
        hits = len(full & trunc)
        rows.append(
            {
                "query_id": q,
                "n_hits": hits,
                "recall_milli": (1000 * hits) // K,
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "matryoshka_truncation_recall", sf),
        want,
        ["query_id"],
    )


_ZONE_POLYGONS = {
    1: [(0, 0), (600_000, 0), (0, 600_000)],
    2: [(550_000, 550_000), (1_000_000, 550_000),
        (1_000_000, 1_000_000), (550_000, 1_000_000)],
    3: [(0, 620_000), (540_000, 620_000),
        (540_000, 980_000), (0, 980_000)],
}


def _ucoord(which, key):
    import hashlib

    return (
        int(hashlib.md5(f"{which}:{key}".encode()).hexdigest()[:8], 16)
        % 1_000_000
    )


def test_point_in_polygon_third_voice(spark, sf):
    c = _tbl("customer", sf)
    counts = {}
    n_all = 0
    for key in c["c_custkey"]:
        px, py = _ucoord("lat", key), _ucoord("lon", key)
        zone = 0
        for pid, verts in _ZONE_POLYGONS.items():
            n_cross = 0
            for i, (x1, y1) in enumerate(verts):
                x2, y2 = verts[(i + 1) % len(verts)]
                if (y1 > py) != (y2 > py):
                    dy = y2 - y1
                    lhs = (
                        x1 * dy + (x2 - x1) * (py - y1) - px * dy
                    ) * (1 if dy > 0 else -1)
                    if lhs > 0:
                        n_cross += 1
            if n_cross % 2 == 1:
                zone = pid
                break  # lowest pid wins
        counts[zone] = counts.get(zone, 0) + 1
        n_all += 1
    want = pd.DataFrame(
        [
            {
                "zone": z,
                "n_points": n_,
                "share_milli": _round_half_away(1000.0 * n_ / n_all),
            }
            for z, n_ in counts.items()
        ]
    )
    _compare(
        _run(spark, "point_in_polygon_assignment", sf), want, ["zone"]
    )


def test_quadkey_third_voice(spark, sf):
    BOX = 1_000_000
    c = _tbl("customer", sf)
    from collections import Counter

    lv = Counter()
    for key in c["c_custkey"]:
        px, py = _ucoord("lat", key), _ucoord("lon", key)
        xb = lambda k: (px * (2**k)) // BOX
        yb = lambda k: (py * (2**k)) // BOX
        d1 = str(2 * yb(1) + xb(1))
        d2 = str(2 * (yb(2) % 2) + (xb(2) % 2))
        d3 = str(2 * (yb(3) % 2) + (xb(3) % 2))
        lv[(1, d1)] += 1
        lv[(2, d1 + d2)] += 1
        lv[(3, d1 + d2 + d3)] += 1
    want = pd.DataFrame(
        [
            {"level": l_, "quadkey": qk, "n_points": n_}
            for (l_, qk), n_ in lv.items()
        ]
    )
    _compare(
        _run(spark, "quadkey_spatial_rollup", sf),
        want,
        ["level", "quadkey"],
    )


# ---------------------------------------------------------------------
# HRW audit / walk-forward folds / conformal / SNM families
# ---------------------------------------------------------------------
def test_rendezvous_third_voice(spark, sf):
    import hashlib

    def hrw(key, n_shards):
        best = None
        for s_ in range(n_shards):
            w = int(
                hashlib.md5(f"{key}:{s_}".encode()).hexdigest()[:8], 16
            )
            enc = w * 16 + s_
            if best is None or enc > best[0]:
                best = (enc, s_)
        # the query takes greatest(enc) % 16 == (w*16+s) % 16 == s
        return best[0] % 16
    c = _tbl("customer", sf)
    rows = {}
    for key in c["c_custkey"]:
        old = hrw(int(key), 8)
        new = hrw(int(key), 9)
        acc = rows.setdefault(
            old, {"n": 0, "moved": 0, "illegal": 0}
        )
        acc["n"] += 1
        if new == 8:
            acc["moved"] += 1
        elif new != old:
            acc["illegal"] += 1
    want = pd.DataFrame(
        [
            {
                "old_shard": o_,
                "n_keys": a["n"],
                "n_moved": a["moved"],
                "n_illegal": a["illegal"],
                "moved_milli": (1000 * a["moved"]) // a["n"],
            }
            for o_, a in rows.items()
        ]
    )
    _compare(
        _run(spark, "rendezvous_shard_move_audit", sf),
        want,
        ["old_shard"],
    )


def test_walkforward_third_voice(spark, sf):
    e = _tbl("events", sf)
    daily = (
        e.assign(day=e["ts"].dt.normalize())
        .groupby("day")
        .size()
        .rename("n")
        .reset_index()
    )
    folds = (
        ("2024-01-11", "2024-01-15"),
        ("2024-01-18", "2024-01-22"),
        ("2024-01-25", "2024-01-29"),
    )
    GAP = 2
    rows = []
    for k, (ts_, te) in enumerate(folds, start=1):
        start, end = pd.Timestamp(ts_), pd.Timestamp(te)
        recs = {}
        for _, r in daily.iterrows():
            d_ = r["day"]
            if start <= d_ <= end:
                role = "test"
            elif d_ < start - pd.Timedelta(days=GAP):
                role = "train"
            elif d_ < start:
                role = "purged"
            else:
                role = "unused"
            a = recs.setdefault(
                role,
                {"n_days": 0, "n_events": 0, "days": [], "gaps": []},
            )
            a["n_days"] += 1
            a["n_events"] += int(r["n"])
            a["days"].append(d_)
            if role == "train":
                a["gaps"].append(int((start - d_).days))
        for role, a in recs.items():
            rows.append(
                {
                    "fold": k,
                    "role": role,
                    "n_days": a["n_days"],
                    "n_events": a["n_events"],
                    "first_day": min(a["days"]).strftime("%Y-%m-%d"),
                    "last_day": max(a["days"]).strftime("%Y-%m-%d"),
                    "min_gap_check": min(a["gaps"])
                    if a["gaps"]
                    else None,
                }
            )
    want = pd.DataFrame(rows)
    want["min_gap_check"] = want["min_gap_check"].astype("Int64")
    _compare(
        _run(spark, "walkforward_purged_folds", sf),
        want,
        ["fold", "role"],
    )


def test_conformal_third_voice(spark, sf):
    ALPHA = 0.1
    e = _tbl("events", sf).copy()
    e["c"] = _cents(e["value"])
    e["day"] = e["ts"].dt.normalize()
    t_end = pd.Timestamp("2024-01-11")
    c_end = pd.Timestamp("2024-01-21")
    rows = []
    for et, g in e.groupby("event_type"):
        train = g[g["day"] < t_end]
        if len(train) == 0:
            continue
        mu = float(train["c"].sum()) / len(train)
        cal = g[(g["day"] >= t_end) & (g["day"] < c_end)]
        rs = sorted((abs(float(x) - mu) for x in cal["c"]))
        n_cal = len(rs)
        rk = math.ceil((1.0 - ALPHA) * (n_cal + 1))
        if rk > n_cal or n_cal == 0:
            continue
        q_hat = rs[rk - 1]
        test = g[g["day"] >= c_end]
        n_test = len(test)
        if n_test == 0:
            continue
        covered = int(
            sum(
                1
                for x in test["c"]
                if abs(float(x) - mu) <= q_hat
            )
        )
        rows.append(
            {
                "event_type": et,
                "n_cal": n_cal,
                "q_hat_cents": _round_half_away(q_hat),
                "n_test": n_test,
                "coverage_milli": (1000 * covered) // n_test,
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "conformal_interval_coverage", sf),
        want,
        ["event_type"],
    )


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def test_sorted_neighborhood_third_voice(spark, sf):
    HEAD, W, MAXD = 96, 3, 24
    d = _tbl("documents", sf).copy()
    d["head"] = d["text"].astype(str).str[:HEAD]
    d["pre"] = d["text"].astype(str).str.lower().str[:2]
    pairs = []
    for (_, _), g in d.groupby(["lang", "pre"]):
        g = g.sort_values(["head", "doc_id"]).reset_index(drop=True)
        for i in range(len(g)):
            for k in range(1, W + 1):
                if i + k >= len(g):
                    break
                ed = _levenshtein(
                    g["head"].iloc[i], g["head"].iloc[i + k]
                )
                if ed <= MAXD:
                    a_, b_ = (
                        int(g["doc_id"].iloc[i]),
                        int(g["doc_id"].iloc[i + k]),
                    )
                    pairs.append(
                        {
                            "doc_a": min(a_, b_),
                            "doc_b": max(a_, b_),
                            "lang": g["lang"].iloc[0],
                            "edit_dist": ed,
                        }
                    )
    want = pd.DataFrame(pairs)
    _compare(
        _run(spark, "sorted_neighborhood_pairs", sf),
        want,
        ["doc_a", "doc_b"],
    )


# ---------------------------------------------------------------------
# deterministic masking / AQP / DP families
# ---------------------------------------------------------------------
def test_mlm_masking_third_voice(spark, sf):
    import hashlib

    SEL, MASK, RAND = 9830, 52429, 58982
    d = _tbl("documents", sf)
    rows = []
    for _, r in d.iterrows():
        ws = str(r["text"]).lower().split()
        n_sel = n_mask = n_rand = n_keep = 0
        for i, tok in enumerate(ws, start=1):
            h = hashlib.md5(
                f"{r['doc_id']}:{i}:{tok}".encode()
            ).hexdigest()
            h1, h2 = int(h[:4], 16), int(h[4:8], 16)
            if h1 < SEL:
                n_sel += 1
                if h2 < MASK:
                    n_mask += 1
                elif h2 < RAND:
                    n_rand += 1
                else:
                    n_keep += 1
        rows.append(
            {
                "doc_id": r["doc_id"],
                "n_tokens": len(ws),
                "n_selected": n_sel,
                "n_mask": n_mask,
                "n_random": n_rand,
                "n_keep": n_keep,
            }
        )
    want = pd.DataFrame(rows)
    _compare(_run(spark, "mlm_masking_plan", sf), want, ["doc_id"])


def test_t5_span_third_voice(spark, sf):
    import hashlib

    BLOCK, OFF_MOD = 20, 16
    d = _tbl("documents", sf)
    rows = []
    for _, r in d.iterrows():
        n = len(str(r["text"]).lower().split())
        n_masked = 0
        spans = set()
        for i in range(1, n + 1):
            blk = (i - 1) // BLOCK
            h = hashlib.md5(
                f"{r['doc_id']}:{blk}".encode()
            ).hexdigest()
            start = blk * BLOCK + 1 + int(h[:4], 16) % OFF_MOD
            sp_len = 2 + int(h[4:8], 16) % 3
            if start <= i < start + sp_len:
                n_masked += 1
                spans.add(blk)
        rows.append(
            {
                "doc_id": r["doc_id"],
                "n_tokens": n,
                "n_spans": len(spans),
                "n_masked": n_masked,
                "pct_masked_milli": _round_half_away(
                    1000.0 * n_masked / n
                ),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "t5_span_corruption_plan", sf), want, ["doc_id"]
    )


def test_sampled_aggregate_third_voice(spark, sf):
    import hashlib

    MOD = 10
    li = _tbl("lineitem", sf).copy()
    li["cents"] = _cents(li["l_extendedprice"])
    li["bucket"] = [
        int(
            hashlib.md5(f"aqp:{ok}:{ln}".encode()).hexdigest()[:8], 16
        )
        % MOD
        for ok, ln in zip(li["l_orderkey"], li["l_linenumber"])
    ]
    rows = []
    for flag, g in li.groupby("l_returnflag"):
        exact = int(g["cents"].sum())
        samp = g[g["bucket"] == 0]
        est = MOD * int(samp["cents"].sum())
        rows.append(
            {
                "l_returnflag": flag,
                "exact_cents": exact,
                "est_cents": est,
                "n_sampled": len(samp),
                "rel_err_milli": _round_half_away(
                    1000.0 * abs(est - exact) / exact
                ),
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "sampled_aggregate_estimate", sf),
        want,
        ["l_returnflag"],
    )


def test_dp_noisy_counts_third_voice(spark, sf):
    import hashlib

    EPS = 1.0
    e = _tbl("events", sf)
    rows = []
    for et, g in e.groupby("event_type"):
        n = len(g)
        u = (
            int(hashlib.md5(f"dp:{et}".encode()).hexdigest()[:8], 16)
            / 4294967296.0
        )
        lap = (
            -(1.0 / EPS)
            * (1.0 if u >= 0.5 else -1.0)
            * math.log(1.0 - 2.0 * abs(u - 0.5))
        )
        rows.append(
            {
                "event_type": et,
                "n_true": n,
                "n_noisy_milli": _round_half_away(1000.0 * (n + lap)),
                "eps_spent_milli": 1000,
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "dp_noisy_counts_ledger", sf), want, ["event_type"]
    )


# ---------------------------------------------------------------------
# hashing-trick classifier / record linkage / exactly-once sink
# ---------------------------------------------------------------------
def test_feature_hashing_third_voice(spark, sf):
    import hashlib

    B, KNUTH = 1024, 2654435761
    d = _tbl("documents", sf)
    rows = []
    for _, r in d.iterrows():
        ws = str(r["text"]).lower().split()
        terms = []
        for w in ws:
            h = (
                int(
                    hashlib.md5(f"fh:{w}".encode()).hexdigest()[:8], 16
                )
                % B
            )
            sg = (
                1
                if hashlib.md5(f"sg:{w}".encode()).hexdigest()[0]
                in "01234567"
                else -1
            )
            terms.append(sg * (((h * KNUTH) % 1000 - 500) / 1000.0))
        margin = _round_half_away(1e6 * sum(terms) / len(terms))
        rows.append(
            {
                "doc_id": r["doc_id"],
                "source": r["source"],
                "n_tokens": len(ws),
                "margin_micro": margin,
                "pred": 1 if margin > 0 else 0,
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "feature_hashing_classifier_score", sf),
        want,
        ["doc_id"],
    )


def test_fellegi_sunter_third_voice(spark, sf):
    W = {
        "name": (4.553876891600541, -2.986476964580297),
        "bal": (3.8066624897703196, -2.2823823856765264),
        "seg": (1.791759469228055, -2.1400661634962708),
    }
    TH = 3.0
    c = _tbl("customer", sf).copy()
    c["bal"] = _cents(c["c_acctbal"])
    base = [
        {
            "key": int(r["c_custkey"]),
            "name": r["c_name"],
            "nat": int(r["c_nationkey"]),
            "bal": int(r["bal"]),
            "seg": r["c_mktsegment"],
        }
        for _, r in c.iterrows()
    ]
    dirty = []
    for r in base:
        k = r["key"]
        dirty.append(
            {
                "key": k,
                "name": r["name"][:-1] if k % 4 == 0 else r["name"],
                "nat": r["nat"],
                "bal": r["bal"] + (111 if k % 5 == 0 else 0),
                "seg": "PERTURBED" if k % 7 == 0 else r["seg"],
            }
        )
    from collections import defaultdict

    block = defaultdict(list)
    for r in dirty:
        block[(r["nat"], r["name"][9:14])].append(r)
    agg = {}
    for b in base:
        for d_ in block.get((b["nat"], b["name"][9:14]), []):
            score = (
                (W["name"][0] if b["name"] == d_["name"] else W["name"][1])
                + (W["bal"][0] if b["bal"] == d_["bal"] else W["bal"][1])
                + (W["seg"][0] if b["seg"] == d_["seg"] else W["seg"][1])
            )
            m = 1 if score > TH else 0
            truth = 1 if b["key"] == d_["key"] else 0
            a = agg.setdefault(
                b["seg"],
                {"n": 0, "decl": 0, "tp": 0, "fp": 0, "true": 0},
            )
            a["n"] += 1
            a["decl"] += m
            a["tp"] += m * truth
            a["fp"] += m * (1 - truth)
            a["true"] += truth
    want = pd.DataFrame(
        [
            {
                "segment": s_,
                "n_pairs": a["n"],
                "n_declared": a["decl"],
                "tp": a["tp"],
                "fp": a["fp"],
                "recall_milli": (1000 * a["tp"]) // a["true"],
                "precision_milli": (1000 * a["tp"]) // a["decl"],
            }
            for s_, a in agg.items()
        ]
    )
    _compare(
        _run(spark, "fellegi_sunter_entity_match", sf),
        want,
        ["segment"],
    )


def test_manifest_exactly_once_third_voice(spark, sf):
    # the exactly-once invariant: reading through the manifest must
    # equal a plain aggregate of the source table (each batch once)
    o = _tbl("orders", sf).copy()
    o["c"] = _cents(o["o_totalprice"])
    want = (
        o.groupby("o_orderpriority")
        .agg(n_orders=("c", "size"), sum_cents=("c", "sum"))
        .reset_index()
        .rename(columns={"o_orderpriority": "priority"})
    )
    _compare(
        _run(spark, "sink_manifest_exactly_once", sf),
        want,
        ["priority"],
    )


def test_power_iteration_third_voice(spark, sf):
    DIM, SCALE, TOP = 64, 1_000_000, 8
    em = _tbl("embeddings", sf)
    V = np.array(
        [
            [math.floor(float(x) * SCALE) for x in r["embedding"]]
            for _, r in em.iterrows()
        ],
        dtype=object,
    )
    # exact integer gram G = V^T V
    G = [[0] * DIM for _ in range(DIM)]
    for row in V:
        for i in range(DIM):
            vi = int(row[i])
            if vi == 0:
                continue
            for j in range(DIM):
                G[i][j] += vi * int(row[j])
    v1 = [sum(G[i]) for i in range(DIM)]
    m = max(abs(x) for x in v1)
    v1n = [math.floor(float(x) * 1_000_000.0 / float(m)) for x in v1]
    v2 = [
        sum(G[i][j] * v1n[j] for j in range(DIM)) for i in range(DIM)
    ]
    lam = float(sum(n_ * v_ for n_, v_ in zip(v1n, v2))) / float(
        sum(n_ * n_ for n_ in v1n)
    )
    m2 = max(abs(x) for x in v2)
    order = sorted(range(DIM), key=lambda i: (-abs(v2[i]), i))
    want = pd.DataFrame(
        [
            {
                "rank": rk,
                "dim": i,
                "loading_milli": math.floor(
                    1000.0 * float(v2[i]) / float(m2)
                ),
                "rayleigh_e6": _round_half_away(lam / 1_000_000.0),
            }
            for rk, i in enumerate(order[:TOP], start=1)
        ]
    )
    _compare(
        _run(spark, "embedding_power_iteration", sf), want, ["rank"]
    )


# ---------------------------------------------------------------------
# sketch set algebra: the one former third-voice exception
# ---------------------------------------------------------------------
def test_hll_intersection_overlap_third_voice(spark, sf):
    """`hll_intersection_overlap` outputs Spark HLL sketch internals
    only through its two accuracy-contract booleans — sketch state
    itself can't be replayed in pandas. The twin therefore recomputes
    everything that IS engine-independent: the exact per-pair
    intersection/union cardinalities by literal set algebra, plus the
    contract expectations themselves (union estimate within 2% of the
    exact union; inclusion-exclusion intersection within 5% OF THE
    UNION), which are scale-independent and must read True at every
    SF for the documented sketch precision."""
    e = _tbl("events", sf)
    u = e[e["event_type"].isin(["view", "click", "purchase"])][
        ["event_type", "user_id"]
    ].drop_duplicates()
    sets = {et: set(g["user_id"]) for et, g in u.groupby("event_type")}
    rows = []
    for ta, tb in (
        ("view", "purchase"),
        ("click", "purchase"),
        ("view", "click"),
    ):
        a, b = sets.get(ta, set()), sets.get(tb, set())
        rows.append(
            {
                "pair": f"{ta}^{tb}",
                "exact_inter": len(a & b),
                "exact_union": len(a | b),
                "union_est_within_2pct": True,
                "inter_within_5pct_of_union": True,
            }
        )
    want = pd.DataFrame(rows)
    _compare(
        _run(spark, "hll_intersection_overlap", sf), want, ["pair"]
    )
