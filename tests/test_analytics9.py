"""Planted-ground-truth tests for the analytics9 / survival-logrank /
llm7 operators.

- U-shaped attribution: a 4-touch purchase gives exactly 40/10/10/40
  (micro-cents conserved); 1-touch and 2-touch degenerate cases.
- Kruskal-Wallis: two cleanly separated 3-day groups give ranks 1..6
  and H = 27/7 exactly (no ties).
- Assortativity: a perfect star is perfectly disassortative (r = -1).
- Generalized means: cents {100,200,400} give AM/GM/HM =
  233.333 / 200 / 171.429 exactly.
- Log-rank: identical arms give O = E and chi2 = 0.
- Flesch: a hand-countable two-sentence doc gives FRE = 119.19.
- Fightin' words: planted counts reproduce the exact Monroe et al.
  log-odds z from a pure-Python mirror.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import tempfile

import pytest

from filemapreduce_spark.queries import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _write(spark, d, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, f"{name}.parquet"))
    return d


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp"
)
_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def test_position_based_exact_split(spark, registry):
    """One purchase (100 cents) with touches view,click,view,click in
    time order: first view 40M, last click 40M, middle click 10M,
    middle view 10M micro-cents — total conserves 100M. Plus a
    1-touch purchase (100%) and a 2-touch purchase (50/50)."""
    base = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # purchase A, user 1: 4 touches
        (1, base - dt.timedelta(hours=4), 1, "view", 0.0, "{}"),
        (2, base - dt.timedelta(hours=3), 1, "click", 0.0, "{}"),
        (3, base - dt.timedelta(hours=2), 1, "view", 0.0, "{}"),
        (4, base - dt.timedelta(hours=1), 1, "click", 0.0, "{}"),
        (5, base, 1, "purchase", 1.0, "{}"),
        # purchase B, user 2: single view touch
        (6, base - dt.timedelta(hours=1), 2, "view", 0.0, "{}"),
        (7, base, 2, "purchase", 1.0, "{}"),
        # purchase C, user 3: two click touches (odd cents → remainder)
        (8, base - dt.timedelta(hours=2), 3, "click", 0.0, "{}"),
        (9, base - dt.timedelta(hours=1), 3, "click", 0.0, "{}"),
        (10, base, 3, "purchase", 0.01, "{}"),
    ]
    d = tempfile.mkdtemp(prefix="fmr_a9_attr_")
    _write(spark, d, "events", rows, _EV_SCHEMA)
    out = {
        r["channel"]: r
        for r in registry["attribution_position_based"].fn(spark, d).collect()
    }
    # A: view gets 40M (first) + 10M (middle) = 50M; click 10M + 40M = 50M
    # B: view gets 100M
    # C: 1 cent → 1M micro: click gets 500k + (500k + remainder 0) = 1M
    assert out["view"]["credit_micro_cents"] == 50_000_000 + 100_000_000
    assert out["click"]["credit_micro_cents"] == 50_000_000 + 1_000_000
    total = sum(r["credit_micro_cents"] for r in out.values())
    assert total == (100 + 100 + 1) * 1_000_000  # conservation


def test_kruskal_wallis_exact(spark, registry):
    """Groups A (daily cents 100,200,300) and B (1000,2000,3000):
    ranks 1-6 with no ties, H = 12/42*(36/3+225/3) - 21 = 27/7."""
    rows = []
    eid = 0
    for day, v in enumerate([1.0, 2.0, 3.0], start=1):
        rows.append((eid, dt.datetime(2024, 1, day), 1, "A", v, "{}"))
        eid += 1
    for day, v in enumerate([10.0, 20.0, 30.0], start=1):
        rows.append((eid, dt.datetime(2024, 1, day), 1, "B", v, "{}"))
        eid += 1
    d = tempfile.mkdtemp(prefix="fmr_a9_kw_")
    _write(spark, d, "events", rows, _EV_SCHEMA)
    out = {r["event_type"]: r for r in registry["kruskal_wallis_daily"].fn(spark, d).collect()}
    assert out["A"]["ranksum_x2"] == 2 * (1 + 2 + 3)
    assert out["B"]["ranksum_x2"] == 2 * (4 + 5 + 6)
    want = round(1000 * (12.0 / (6 * 7) * (36 / 3 + 225 / 3) - 3 * 7))
    assert out["A"]["h_milli"] == want == 3857


def test_assortativity_star_is_minus_one(spark, registry):
    """Star center 4 with leaves 8,12,16: endpoint-degree pairs are
    (3,1)x3 and (1,3)x3 → Pearson r = -1 exactly."""
    ship = dt.datetime(1995, 6, 1)
    rows = []
    for ok, parts in [(1, [4, 8]), (2, [4, 12]), (3, [4, 16])]:
        for ln, pk in enumerate(parts, start=1):
            rows.append((ok, pk, 1, ln, 1.0, 10.0, 0.0, 0.0, "N", "O", ship))
    d = tempfile.mkdtemp(prefix="fmr_a9_ast_")
    _write(spark, d, "lineitem", rows, _LI_SCHEMA)
    out = registry["degree_assortativity_copurchase"].fn(spark, d).collect()[0]
    assert out["n_endpoints"] == 6
    assert out["assortativity_milli"] == -1000
    assert out["mean_deg_milli"] == 2000


def test_generalized_means_exact(spark, registry):
    """cents {100,200,400}: AM 233.333, GM exactly 200, HM 1200/7."""
    rows = [
        (0, dt.datetime(2024, 1, 2), 1, "t", 1.0, "{}"),
        (1, dt.datetime(2024, 1, 3), 1, "t", 2.0, "{}"),
        (2, dt.datetime(2024, 1, 4), 1, "t", 4.0, "{}"),
        # a zero-value event must be excluded from the positive set
        (3, dt.datetime(2024, 1, 5), 1, "t", 0.0, "{}"),
    ]
    d = tempfile.mkdtemp(prefix="fmr_a9_gm_")
    _write(spark, d, "events", rows, _EV_SCHEMA)
    out = registry["generalized_means_value"].fn(spark, d).collect()[0]
    assert out["n_pos"] == 3
    assert out["arith_milli"] == 233333
    assert out["geo_milli"] == 200000
    assert out["harm_milli"] == round(1000 * 1200 / 7)  # 171429


def test_logrank_identical_arms_chi2_zero(spark, registry):
    """Both arms convert on the same day → observed = expected in
    every day stratum → chi2 = 0."""
    s0 = dt.datetime(2024, 1, 1)
    p0 = dt.datetime(2024, 1, 3)
    rows = []
    eid = 0
    for uid in (0, 1, 2, 3):
        rows.append((eid, s0, uid, "signup", 0.0, "{}")); eid += 1
        rows.append((eid, p0, uid, "purchase", 1.0, "{}")); eid += 1
    d = tempfile.mkdtemp(prefix="fmr_a9_lr_")
    _write(spark, d, "events", rows, _EV_SCHEMA)
    out = {r["grp"]: r for r in registry["logrank_test_arms"].fn(spark, d).collect()}
    for g in (0, 1):
        assert out[g]["n_subjects"] == 2
        assert out[g]["observed"] == 2
        assert out[g]["expected_milli"] == 2000
        assert out[g]["chi2_milli"] == 0


def test_flesch_hand_counted(spark, registry):
    """'The cat sat. The dog ran!' → 6 words, 2 sentences, 6
    single-vowel-group syllables → FRE = 206.835 - 3.045 - 84.6."""
    d = tempfile.mkdtemp(prefix="fmr_a9_fre_")
    _write(
        spark, d, "documents",
        [(1, "The cat sat. The dog ran!", "en", "srcX", 25)],
        _DOC_SCHEMA,
    )
    out = registry["flesch_reading_ease_by_source"].fn(spark, d).collect()[0]
    assert (out["words"], out["sents"], out["sylls"]) == (6, 2, 6)
    assert out["fre_milli"] == round(1000 * (206.835 - 1.015 * 3 - 84.6))


def _fw_z(ya, yb, na, nb, alpha=500.0):
    aw = alpha * (ya + yb) / (na + nb)
    delta = math.log((ya + aw) / (na + alpha - ya - aw)) - math.log(
        (yb + aw) / (nb + alpha - yb - aw)
    )
    var = 1.0 / (ya + aw) + 1.0 / (yb + aw)
    return delta / math.sqrt(var)


def test_fightin_words_matches_python(spark, registry):
    """Planted vocabularies: 'aaa' appears 20x in src0 / 2x in src1,
    'bbb' the mirror, 'ccc' balanced. Top term must be 'aaa' with the
    exact Monroe et al. z from the pure-Python mirror."""
    docs = [
        (1, " ".join(["aaa"] * 20 + ["ccc"] * 10), "en", "src0", 1),
        (2, " ".join(["bbb"] * 2 + ["ccc"] * 10), "en", "src0", 1),
        (3, " ".join(["bbb"] * 20 + ["ccc"] * 10), "en", "src1", 1),
        (4, " ".join(["aaa"] * 2 + ["ccc"] * 10), "en", "src1", 1),
    ]
    d = tempfile.mkdtemp(prefix="fmr_a9_fw_")
    _write(spark, d, "documents", docs, _DOC_SCHEMA)
    out = registry["fightin_words_terms"].fn(spark, d).collect()
    na = nb = 20 + 2 + 20  # 42 tokens per side
    top = out[0]
    assert top["w"] == "aaa" and (top["ya"], top["yb"]) == (20, 2)
    assert top["z_micro"] == round(1e6 * _fw_z(20, 2, na, nb))
    ranked = [r["w"] for r in out]
    assert ranked.index("aaa") < ranked.index("ccc") < ranked.index("bbb")
