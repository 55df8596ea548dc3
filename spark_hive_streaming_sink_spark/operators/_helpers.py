"""Shared builder helpers enforcing the cross-engine determinism rules
(registry.py docstring): exact decimal aggregation, exact averages,
string-formatted timestamps.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def dec(col: Column | str, prec: int = 18, scale: int = 4) -> Column:
    """Cast to decimal so downstream SUM is exact (order-independent)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def to_units(col: Column | str, scale: int) -> Column:
    """Fixed-point integer encoding: value × 10^scale, rounded, as
    BIGINT. Exact integer sums are order-independent like decimal sums
    but stay on the long-backed fast path (~4× faster than BigDecimal
    aggregation — measured on the sf0.1 fixtures)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**scale), 0).cast("bigint")


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM of a double column via exact integer units:
    bit-identical to DuckDB's
    ``CAST(SUM(CAST(ROUND(x*10^s,0) AS BIGINT)) AS DOUBLE) / 10^s``
    (the long sum is exact; the final double cast + divide are single
    IEEE operations in both engines). Long overflow starts around
    sf≥30 for money columns — at that scale switch scale down or use
    decimal; documented trade-off."""
    return F.sum(to_units(col, scale)).cast("double") / F.lit(float(10**scale))


def davg(col: Column | str, scale: int = 4) -> Column:
    """Exact-sum / count in double (bit-identical cross-engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(to_units(c, scale)).cast("double") / F.lit(float(10**scale)) / F.count(c)


def revenue_c(ep: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """Per-line revenue ep*(1-disc) rounded to exact cents (the shared
    money idiom: integer products, per-row cent rounding, long sums)."""
    ep_c = to_units(ep, 2)
    disc_bp = to_units(disc, 4)
    return F.round(ep_c * (F.lit(10000) - disc_bp) / 10000.0, 0).cast("bigint")


def sql_revenue_c(ep: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return (
        f"CAST(ROUND(CAST(ROUND({ep} * 100, 0) AS BIGINT)"
        f" * (10000 - CAST(ROUND({disc} * 10000, 0) AS BIGINT)) / 10000.0, 0) AS BIGINT)"
    )


def sql_sum_revenue(ep: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return (
        f"(CAST(CAST(SUM({sql_revenue_c(ep, disc)}) AS BIGINT) AS DOUBLE) / 100.0)"
    )


def ts_str(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Format a timestamp to string (oracle: strftime) — avoids tz /
    precision ambiguity in driver-side hashing."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)


# DuckDB fragment equivalents (keep in sync with the helpers above).
# DuckDB's SUM(BIGINT) returns HUGEINT, whose →DOUBLE conversion is not
# bit-identical to Java's long→double above 2^53; force it back through
# BIGINT (single correctly-rounded conversion) before the double cast.
def sql_dsum(expr: str, scale: int = 4) -> str:
    m = 10**scale
    return (
        f"(CAST(CAST(SUM(CAST(ROUND(({expr}) * {m}, 0) AS BIGINT)) AS BIGINT)"
        f" AS DOUBLE) / {m}.0)"
    )


def sql_davg(expr: str, scale: int = 4) -> str:
    m = 10**scale
    return (
        f"(CAST(CAST(SUM(CAST(ROUND(({expr}) * {m}, 0) AS BIGINT)) AS BIGINT)"
        f" AS DOUBLE) / {m}.0 / COUNT({expr}))"
    )
