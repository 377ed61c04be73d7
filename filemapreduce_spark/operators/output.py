"""Result-shaping helpers for query tails."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def tiny_sorted(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Total-order a PROVABLY SMALL result without a range exchange.

    ``orderBy`` on a final result plans Exchange(rangepartitioning):
    a sampling pass over the child (which re-executes it — expensive
    when the child holds a Python stage) plus a shuffle, all to sort
    what is often a few hundred rows. For results whose size is
    bounded by a value domain or config (event types × days, country
    codes, top-k per bounded group set) — never by data volume — a
    single-partition local sort is the plan a cost-based engine
    would pick: ``coalesce(1)`` merges the final partitions into one
    task (no shuffle) and ``sortWithinPartitions`` totals the order.
    Partition order is preserved downstream, so the result is
    globally sorted exactly like ``orderBy``.

    Use ONLY when the input's row count is bounded independent of
    data volume; a data-sized input through ``coalesce(1)``
    serializes the job (that's what ``orderBy`` is for).
    """
    return df.coalesce(1).sortWithinPartitions(*cols)
