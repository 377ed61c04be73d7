"""Incremental re-reduce (operators.incremental): the monoid-state
merge must equal a full recompute for ANY split of the data, including
a persisted-state round trip (the reference's readme.md:43-44 TODO:
fold new data into 'the result of a previous reduction')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filemapreduce_spark.operators.incremental import (
    finalize_state,
    merge_states,
    partial_state,
)

SF = "/root/testdata/sf0.001"
KEYS = ["l_returnflag", "l_linestatus"]


def _li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def _full(spark):
    qty = F.col("l_quantity").cast("long")
    return finalize_state(
        partial_state(_li(spark), KEYS, qty), KEYS
    ).orderBy(*KEYS)


def _canon(df):
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize(
    "split", ["1995-06-01", "1996-01-01", "1997-07-01", "2099-01-01"]
)
def test_merge_equals_full_for_any_split(spark, split):
    """⊕ is associative/commutative: state(old) ⊕ state(new) == state(all),
    even when one side of the split is empty."""
    li = _li(spark)
    qty = F.col("l_quantity").cast("long")
    old = partial_state(li.filter(F.col("l_shipdate") < split), KEYS, qty)
    new = partial_state(li.filter(F.col("l_shipdate") >= split), KEYS, qty)
    merged = finalize_state(merge_states([old, new], KEYS), KEYS).orderBy(*KEYS)
    assert _canon(merged) == _canon(_full(spark))


def test_three_way_merge(spark):
    li = _li(spark)
    qty = F.col("l_quantity").cast("long")
    parts = [
        partial_state(li.filter(F.col("l_orderkey") % 3 == i), KEYS, qty)
        for i in range(3)
    ]
    merged = finalize_state(merge_states(parts, KEYS), KEYS).orderBy(*KEYS)
    assert _canon(merged) == _canon(_full(spark))


def test_persisted_state_roundtrip(spark, tmp_path):
    """The real incremental cycle: history state written to parquet,
    read back, merged with a fresh delta state — no history raw scan."""
    li = _li(spark)
    qty = F.col("l_quantity").cast("long")
    state_dir = str(tmp_path / "state")
    partial_state(
        li.filter(F.col("l_shipdate") < "1997-01-01"), KEYS, qty
    ).write.parquet(state_dir)

    history = spark.read.parquet(state_dir)  # state only — no raw rows
    delta = partial_state(
        li.filter(F.col("l_shipdate") >= "1997-01-01"), KEYS, qty
    )
    merged = finalize_state(merge_states([history, delta], KEYS), KEYS).orderBy(*KEYS)
    assert _canon(merged) == _canon(_full(spark))


def test_cents_roundtrip_property():
    """Property: cents() exactly represents any 2-decimal money value
    (the basis of every hash-gated money aggregate). Pure-Python twin
    of the column expression: round(x*100) must invert /100 for all
    representable cents in the data's range."""
    from hypothesis import given, strategies as st

    @given(st.integers(min_value=-10**12, max_value=10**12))
    def check(c):
        x = c / 100.0  # the parquet double for c cents
        assert round(x * 100) == c

    check()
