"""Local replica of the driver's t2 correctness gate: for every
registered query with an oracle, run the PySpark builder and the DuckDB
SQL on the same fixture parquet and compare row count, column-name set,
and order-insensitive values (exact after each query's own in-query
normalization — the specs are designed to be bit-identical, see
registry.py docstring)."""

from __future__ import annotations

import datetime
import decimal
import math

import pytest

from spark_hive_streaming_sink_spark.canon import audit_types
from spark_hive_streaming_sink_spark.registry import QUERIES, queries

from .conftest import SF_DIR

queries()  # force registration


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


ORACLE_SPECS = sorted(name for name, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY_SPECS = sorted(name for name, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_match(spark, duck, name):
    spec = QUERIES[name]
    sdf = spec.builder(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    lazy = duck.sql(spec.oracle)
    violations = audit_types(lazy.columns, lazy.types, sdf.schema)
    assert not violations, (
        f"{name}: output-type canonicalization violations (the driver's "
        f"hash is type-sensitive even at equal values): {violations}"
    )

    rel = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    if ns != nd:
        diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_runs(spark, name):
    spec = QUERIES[name]
    sdf = spec.builder(spark, SF_DIR)
    assert len(sdf.columns) > 0
    assert sdf.count() >= 0
