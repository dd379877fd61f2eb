"""Cross-engine-exact decimal→double conversion helpers.

Why this exists: a decimal SUM is bit-identical in Spark and DuckDB (exact
integer arithmetic), but converting that decimal to DOUBLE is not — DuckDB
converts via int128 × 10^-s (can be 1 ULP off the correctly-rounded value
Spark's BigDecimal produces), and rescaling first doesn't help because
DuckDB rescales half-to-even while Spark rounds half-up.

The portable conversion: multiply the sum by 10^scale (exact — the value
is integral at that scale), cast to BIGINT (exact), then BIGINT→DOUBLE
(correctly rounded in both engines) and one IEEE divide by 10^scale. Both
engines perform the identical two floating-point operations on identical
inputs → identical bits.

Input factor casts (DOUBLE → DECIMAL(x,2)) are safe on 2-decimal fixture
data: an exact binary double can never sit exactly on a .xx5 boundary
(that requires a denominator of 200, not a power of two), so half-up vs
half-even cannot diverge there.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_to_double(col: Column, scale: int) -> Column:
    """Exact decimal→double: ``col`` must be integral at ``scale``
    (i.e. a sum of decimals whose type scale is ``scale``)."""
    mult = 10**scale
    return (col * F.lit(mult)).cast("bigint").cast("double") / F.lit(float(mult))


def dec_to_double_sql(expr: str, scale: int) -> str:
    """DuckDB oracle twin of :func:`dec_to_double`."""
    mult = 10**scale
    return f"(CAST(({expr}) * {mult} AS BIGINT) / {mult}.0)"
