"""Distributed as-of join (a temporal operator Spark lacks natively).

Semantics (``direction="backward"``, the default): for each left row,
attach the single latest right row with the same key and
``right.time <= left.time`` (inclusive), or nulls if none exists.
``direction="forward"`` mirrors it: the single EARLIEST right row with
``right.time >= left.time`` — the "next event after" temporal lookup
(pandas ``merge_asof(direction='forward')``).

Implementation — the UNION + WINDOW strategy, not a fan-out join:
tag both sides, union them, and for each key take a running
``last(right payload, ignorenulls)`` ordered by (time, side, tiebreak).
Cost is ONE shuffle by key + a sort within partitions — no (left ×
matching-rights) intermediate blow-up, no skew amplification on hot
keys, and it scales to arbitrarily many right rows per key. This is
the standard large-scale formulation (cf. pandas merge_asof semantics,
Flink temporal joins); at 100 TB the alternative join+filter+max plan
materializes every (order, earlier-event) pair first, which is
quadratic in the per-key history length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tiebreak: str | None = None,
    prefix: str = "asof_",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join; right payload columns arrive as ``prefix+name``.

    - ``on``: equality key column (same name both sides).
    - ``tiebreak``: right column breaking equal-timestamp ties
      (highest wins); defaults to the first payload column.
    - ``tolerance``: optional max staleness as an SQL interval string
      (e.g. ``"30 MINUTES"``); a match older than
      ``left_time - tolerance`` is nulled out (pandas
      ``merge_asof(tolerance=...)`` semantics). Applied AFTER the
      window, so it adds zero shuffles.

    NULL semantics (declared; r9 null-saturation sweep): a right row
    with a NULL key or NULL time NEVER matches (SQL equi-join never
    matches NULL=NULL, and ``right.time <= left.time`` is never true
    for NULL — without the filter Spark's NULLS-FIRST sort made a
    NULL-time right row the "latest before" everything); a left row
    with a NULL key or NULL time is KEPT with a NULL match (left-join
    semantics), enforced by masking the window result rather than by
    dropping the row.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    tiebreak = tiebreak or right_payload[0]
    payload_struct = F.struct(
        F.col(right_time).alias("_t"),
        F.col(tiebreak).alias("_tb"),
        *[F.col(c).alias(c) for c in right_payload],
    )

    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_time", F.col(left_time)
    ).withColumn("_payload", F.lit(None).cast("string"))
    # carry the right payload through the union as one struct column
    r_tagged = (
        right.where(
            F.col(on).isNotNull() & F.col(right_time).isNotNull()
        ).select(
            F.col(on),
            F.col(right_time).alias("_time"),
            # backward: right sorts BEFORE left at equal time (side 0<1)
            # so the running last() is inclusive; forward: right sorts
            # AFTER left (side 2>1) so the following-frame first() is
            # inclusive.
            F.lit(0 if direction == "backward" else 2).alias("_side"),
            payload_struct.alias("_rp"),
        )
    )
    l_cols = [F.col(c) for c in left.columns]
    l_u = l_tagged.select(
        F.col(on).alias("_key"),
        F.col("_time"),
        F.col("_side"),
        F.lit(None).cast(r_tagged.schema["_rp"].dataType).alias("_rp"),
        F.struct(*l_cols).alias("_lrow"),
    )
    r_u = r_tagged.select(
        F.col(on).alias("_key"),
        F.col("_time"),
        F.col("_side"),
        F.col("_rp"),
        F.lit(None).cast(l_u.schema["_lrow"].dataType).alias("_lrow"),
    )

    # among equal-time right rows the tiebreak orders them; the frame
    # direction decides latest-before (running last) vs earliest-after
    # — both one shuffle + one sort, no fan-out. BOTH directions use a
    # RUNNING [UNBOUNDED PRECEDING, CURRENT ROW] frame: forward is the
    # same running last() over the REVERSED sort, because Spark's
    # [CURRENT ROW, UNBOUNDED FOLLOWING] frame re-scans from the
    # current row to the partition end for every row — O(n²) in the
    # per-key history length, hours on a 128k-row partition (r10
    # extreme-date sweep found this in interp_linear_gapfill; same
    # frame shape here). first(x ignorenulls) over [cur, +∞) ascending
    # ≡ last(x ignorenulls) over (-∞, cur] descending, exactly.
    if direction == "backward":
        w = Window.partitionBy("_key").orderBy(
            F.col("_time").asc(),
            F.col("_side").asc(),
            F.col("_rp._tb").asc(),
        ).rowsBetween(Window.unboundedPreceding, 0)
    else:
        w = Window.partitionBy("_key").orderBy(
            F.col("_time").desc(),
            F.col("_side").desc(),
            F.col("_rp._tb").desc(),
        ).rowsBetween(Window.unboundedPreceding, 0)
    match = F.last("_rp", ignorenulls=True).over(w)
    # mask, don't drop: NULL-key/NULL-time LEFT rows survive with a
    # NULL match (left-join contract)
    joined = (
        l_u.unionByName(r_u)
        .withColumn(
            "_match",
            F.when(
                F.col("_key").isNotNull() & F.col("_time").isNotNull(),
                match,
            ),
        )
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        if direction == "backward":
            fresh = F.col("_match._t") >= F.col("_time") - F.expr(
                f"INTERVAL {tolerance}"
            )
        else:
            fresh = F.col("_match._t") <= F.col("_time") + F.expr(
                f"INTERVAL {tolerance}"
            )
        joined = joined.withColumn(
            "_match", F.when(fresh, F.col("_match"))
        )
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_payload
    ]
    return joined.select(*out_cols)
