"""Output-type canonicalization audit shared by ``tools/oracle_gate.py``
and ``tests/test_correctness.py``.

Four driver rounds proved the correctness hash is sensitive to the
OUTPUT TYPES of a query, not just its values: every hash-red query with
value-identical results carried a DuckDB ``HUGEINT`` (raw ``SUM()``),
``DECIMAL`` or ``DATE`` output column (see ``registry.py`` rules and
``_verified.py`` history). The local value comparison normalizes those
away (``i:{v}`` treats int128 == int64), so the only way to catch the
class locally is to audit the declared output types themselves.

:func:`audit_types` returns a list of human-readable violations for one
query: banned DuckDB output types and banned Spark output types. Empty
list == canonical.

Deliberately NOT checked: int width (DuckDB BIGINT vs Spark int).
~30 driver-GREEN queries ship int32 Spark columns against BIGINT
oracle columns (row_number(), len(), etc.) and have hash-matched for
rounds — the driver canonicalizes plain integer values identically at
any width. Only types whose VALUES change representation on export
(int128, decimal, temporal) diverge, and those are the banned set.
"""

from __future__ import annotations

# DuckDB output types that have hash-diverged (or would) under the
# driver's canonicalizer even at equal values. Prefix match on the
# upper-cased type string, so DECIMAL(18,2), TIMESTAMP WITH TIME ZONE,
# and TIME all hit.
BANNED_DUCK_PREFIXES: tuple[str, ...] = (
    "HUGEINT",
    "UHUGEINT",
    "DECIMAL",
    "DATE",
    "TIME",  # also TIMESTAMP / TIMESTAMP WITH TIME ZONE / TIMETZ
    "INTERVAL",
)

# Spark simpleString() prefixes banned in final output (same class).
BANNED_SPARK_PREFIXES: tuple[str, ...] = (
    "decimal",
    "date",
    "timestamp",
    "interval",
)

def audit_types(duck_cols, duck_types, spark_schema) -> list[str]:
    """Violations for one query's output surface.

    duck_cols/duck_types: ``rel.columns`` / ``rel.types`` of the lazily
    planned oracle relation; spark_schema: ``DataFrame.schema``.
    """
    bad: list[str] = []
    spark_types = {f.name: f.dataType.simpleString() for f in spark_schema.fields}

    for col, dtype in zip(duck_cols, duck_types):
        dt = str(dtype).upper()
        for pref in BANNED_DUCK_PREFIXES:
            if dt.startswith(pref):
                bad.append(f"oracle col {col!r} has banned DuckDB type {dt}")
                break

    for name, st in spark_types.items():
        for pref in BANNED_SPARK_PREFIXES:
            if st.startswith(pref):
                bad.append(f"spark col {name!r} has banned Spark type {st}")
                break

    return bad
