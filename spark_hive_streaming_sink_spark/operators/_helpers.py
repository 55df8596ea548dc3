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


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM of a double column: exact decimal sum, then
    one double rounding at the end — bit-identical to DuckDB's
    ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``."""
    return F.sum(dec(col, 18, scale)).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Exact-sum / count in double (Spark's AVG(decimal) and DuckDB's
    differ in result scale; this form is bit-identical)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, 18, scale)).cast("double") / F.count(c)


def ts_str(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Format a timestamp to string (oracle: strftime) — avoids tz /
    precision ambiguity in driver-side hashing."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)


# DuckDB fragment equivalents (keep in sync with the helpers above).
def sql_dsum(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 4) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr}))"
