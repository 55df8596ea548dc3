"""Shared timestamp-format constants (Spark pattern / DuckDB strftime)."""

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
