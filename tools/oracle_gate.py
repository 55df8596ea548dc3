#!/usr/bin/env python
"""Standalone replica of the driver's correctness gate at an arbitrary
scale factor (default sf0.01 — the scale the driver actually judges at,
vs the sf0.001 fixtures pytest uses).

For every registered query with an oracle: run the PySpark builder and
the DuckDB SQL on the same parquet, compare row count, column-name set,
and order-insensitive normalized values. Prints one line per failure and
a final summary; exit code 1 if anything mismatched.

Usage: python tools/oracle_gate.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from spark_hive_streaming_sink_spark.canon import audit_types  # noqa: E402
from spark_hive_streaming_sink_spark.io import TABLES  # noqa: E402
from spark_hive_streaming_sink_spark.registry import QUERIES, queries  # noqa: E402
from spark_hive_streaming_sink_spark.session import get_spark  # noqa: E402

queries()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v.normalize()}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, list):
        return "l:[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "m:{" + ",".join(f"{k}={_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return f"s:{v}"


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        args = args[1:]
    names = args or sorted(n for n, s in QUERIES.items() if s.oracle is not None)

    spark = get_spark("oracle-gate", cpus=8, shuffle_partitions=8)
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    fails: list[str] = []
    for name in names:
        spec = QUERIES[name]
        if spec.oracle is None:
            continue
        t0 = time.time()
        try:
            sdf = spec.builder(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
            lazy = duck.sql(spec.oracle)
            violations = audit_types(lazy.columns, lazy.types, sdf.schema)
            rel = duck.execute(spec.oracle)
            duck_cols = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            print(f"FAIL {name}: exception {type(e).__name__}: {e}", flush=True)
            continue
        dt = time.time() - t0
        if violations:
            fails.append(name)
            print(f"FAIL {name}: type canon: {violations}", flush=True)
        elif sorted(spark_cols) != sorted(duck_cols):
            fails.append(name)
            print(
                f"FAIL {name}: columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}",
                flush=True,
            )
        elif len(spark_rows) != len(duck_rows):
            fails.append(name)
            print(
                f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}",
                flush=True,
            )
        else:
            ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
            if ns != nd:
                fails.append(name)
                diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diffs}", flush=True)
            else:
                print(f"ok   {name} ({len(spark_rows)} rows, {dt:.1f}s)", flush=True)
    print(f"\n{len(names) - len(fails)}/{len(names)} green at {sf_dir}; fails={fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
