"""Incremental re-reduce: mergeable aggregation states.

The reference reserved this exact capability and never built it: the
``current`` parameter of ``Reduce(current, stream)`` exists so "the
result of a previous reduction" can be folded with new data
(/root/reference/interfaces.go:52-64; TODO at
/root/reference/readme.md:43-44 — "incremental updates ... not
currently supported"). This module is that feature, Spark-first.

An aggregate is maintained as a *state* DataFrame of commutative-
monoid accumulators per group key:

    n (count), sum (BIGINT, exact), sumsq (DECIMAL(38,0), exact), min, max

``partial_state`` computes the state for any slice of the data;
``merge_states`` combines any number of states (the monoid ⊕ — sums of
n/sum/sumsq, min of min, max of max) WITHOUT touching the raw rows
that produced them; ``finalize_state`` derives the user-facing
mean/variance with one deterministic double formula at the end.

Scale shape: a 100 TB corpus aggregates once and persists its state
(tiny: one row per group); each new ingest batch aggregates only its
own rows and merges — cost proportional to the delta, never the
history. This is exactly the contract of Spark partial aggregation
(map-side partials ⊕ final merge) lifted across job runs, and the same
algebra Structured Streaming uses for stateful aggregation, so the
operator is correct for any split of the data by construction
(associativity + commutativity — proven for arbitrary splits in
tests/test_incremental.py).

State-schema versions (r10 ADVICE — persisted states outlive the
code that wrote them):

- v1 (through round 9): ``sumsq_v`` was BIGINT — wraps at real row
  counts (found by the r10 extreme-numerics axis).
- v2 (round 10+): ``sumsq_v`` is DECIMAL(38,0).

``merge_states`` normalizes every input's ``sumsq_v`` to
DECIMAL(38,0) explicitly, so merging a v1 state frame written by an
older tree with fresh v2 states is a deliberate, lossless widening —
not an accident of union type coercion — and finalize/consumers
always see the v2 decimal column.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: state accumulator columns, in canonical order
STATE_COLS = ("n", "sum_v", "sumsq_v", "min_v", "max_v")


def partial_state(
    df: DataFrame, keys: Sequence[str], value: Column | str
) -> DataFrame:
    """Aggregate a slice of raw rows into per-key monoid state.

    ``value`` must be an exact integer column (cast money to cents /
    e4 first) so partial sums are associative bit-for-bit.
    """
    v = F.col(value).cast("long") if isinstance(value, str) else value
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("sum_v"),
        # sumsq widens BEFORE the multiply: v*v overflows int64 per
        # row for ~1e9-scale values and its SUM overflows at any real
        # row count — DECIMAL(38,0) keeps the state exact and
        # mergeable (r10 extreme axis; mirrors DuckDB's HUGEINT)
        F.sum(v.cast("decimal(38,0)") * v).alias("sumsq_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_states(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """⊕ over any number of state frames — no raw data touched.

    Each input must have ``keys`` + STATE_COLS. The merge is a union
    plus one grouped aggregation over state rows (one row per key per
    input — trivially small next to the raw data).
    """
    # normalize each input to the v2 state schema BEFORE the union:
    # a v1 (BIGINT-sumsq) frame read back from disk widens here
    # explicitly rather than via union type coercion (see module
    # docstring, state-schema versions)
    states = [
        s.withColumn("sumsq_v", F.col("sumsq_v").cast("decimal(38,0)"))
        for s in states
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    return unioned.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.sum("sumsq_v").alias("sumsq_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize_state(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Derive the user-facing aggregate from state: one deterministic
    double formula per derived measure (same expression the DuckDB
    oracle runs, so results hash-match)."""
    n = F.col("n")
    s = F.col("sum_v").cast("double")
    s2 = F.col("sumsq_v").cast("double")
    return state.select(
        *keys,
        "n",
        "sum_v",
        "min_v",
        "max_v",
        (s / n).alias("mean_v"),
        F.when(n > 1, (s2 - s * s / n) / (n - F.lit(1))).alias("var_v"),
    )
