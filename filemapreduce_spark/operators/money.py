"""Exact money arithmetic for cross-engine-deterministic aggregation.

The test data's money columns are exact 2-decimal values stored as
doubles. Summing doubles is order-dependent (Spark's partial
aggregation and DuckDB's scan order differ), so value-hash parity
requires order-INDEPENDENT arithmetic: convert to integer cents
(``round(x*100)`` — never a tie because the underlying values are
integer cents), aggregate as 64-bit integers (exact, associative,
commutative), and convert to double only at the very end (one
deterministic IEEE conversion).

Scale note: at 100 TB the e6-scaled sums can exceed 2^63 — there the
same pattern runs on DECIMAL(38,6) accumulators instead of BIGINT
(Spark and most engines agree on decimal sums); BIGINT is the fast
path and is exact through ~10^18.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """price → exact integer cents (BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def as_money(cents_sum: Column) -> Column:
    """integer-cents aggregate → DOUBLE currency value."""
    return (cents_sum / F.lit(100.0)).cast("double")


def disc_price_e4(price: Column | str, discount: Column | str) -> Column:
    """price*(1-discount) scaled by 10^4, exact BIGINT."""
    return cents(price) * (100 - cents(discount))


def charge_e6(
    price: Column | str, discount: Column | str, tax: Column | str
) -> Column:
    """price*(1-discount)*(1+tax) scaled by 10^6, exact BIGINT."""
    return cents(price) * (100 - cents(discount)) * (100 + cents(tax))


# SQL fragments for the DuckDB oracle twins (same arithmetic, same
# names, so generated plans stay visibly parallel).
SQL_CENTS = "CAST(round({col} * 100) AS BIGINT)"
SQL_DISC_PRICE_E4 = (
    "CAST(round({price} * 100) AS BIGINT)"
    " * (100 - CAST(round({disc} * 100) AS BIGINT))"
)
SQL_CHARGE_E6 = (
    "CAST(round({price} * 100) AS BIGINT)"
    " * (100 - CAST(round({disc} * 100) AS BIGINT))"
    " * (100 + CAST(round({tax} * 100) AS BIGINT))"
)
