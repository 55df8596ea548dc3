"""Central query registry — the single source of truth behind
``__spark_entry__.py``'s ``queries()`` / ``oracle_sql()`` contract.

Every implemented operator from SURVEY.md §2C registers a
:class:`QuerySpec` here via the :func:`register` decorator: a named
PySpark builder ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) the equivalent DuckDB oracle SQL.

Cross-engine determinism rules (see SURVEY.md §7e) every spec follows:

- alias every computed column identically in Spark and SQL;
- aggregate doubles exactly: cast to DECIMAL before SUM so the result
  is order-independent, then cast back to DOUBLE — bit-identical in
  both engines;
- averages as exact-SUM / COUNT in double (DuckDB's AVG(decimal)
  rounds differently from Spark's);
- no raw temporals in output — neither TIMESTAMP nor DATE: format to
  yyyy-MM-dd[...] strings so driver hashing can't diverge on
  tz/precision/physical encoding (empirical: the one query shipping a
  DATE column hash-diverged every round despite identical values);
- no DECIMAL output columns — emit money as exact integer units or as
  the exact decimal STRING (same empirical basis);
- integer aggregates: CAST(SUM(..) AS BIGINT) in the oracle — DuckDB
  SUM() yields HUGEINT (int128), which hash-diverges from Spark's
  BIGINT even at equal values;
- arrays in output → join to a sorted string (engines stringify lists
  differently);
- any residual float op is a final scalar step on already-identical
  doubles, or explicitly rounded in BOTH engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL, or None → driver's rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent).

    ``functions.monitoring`` imports LAST, after ``sources``: rank-1
    (never-judged) emission preserves registration order, so queries
    that have waited longest for a driver verdict (the sources family)
    keep their slots in the driver's finite verdict budget ahead of
    newly added operators."""
    from . import operators  # noqa: F401
    from . import streaming  # noqa: F401
    from . import functions  # noqa: F401
    from . import sources  # noqa: F401
    from .functions import monitoring  # noqa: F401


# Hand-maintained (unlike ``_verified``, which is generated from the
# driver's CORRECTNESS_r*.json): queries whose OUTPUT VALUES a round
# deliberately changed (new digest scheme, added cap, bounded eval set)
# mapped to the round of the change.  A green verdict from an earlier
# round certifies the OLD outputs, so until the driver re-judges them
# these rank ahead of every routine re-certification.  Entries age out
# on their own: once LAST_GREEN_ROUND reaches ``changed_round`` the
# rank() test below stops firing, so stale entries are harmless.
SEMANTIC_RECHECK: dict[str, int] = {
    # r11 flipped the MinHash signature scheme (token-combine digests),
    # hub-capped RA link prediction, and bounded the decontam eval set;
    # these eight changed-output queries drew no r11 driver verdict.
    "dedup_minhash_calibration": 11,
    "dedup_containment_pairs": 11,
    "dedup_threshold_sweep": 11,
    "stream_dedup_minhash_incremental": 11,
    "corpus_dedup_rate_by_source": 11,
    "dedup_chunks_reconstruct": 11,
    "corpus_decontam_span_removal": 11,
    "graph_link_prediction_ra": 11,
    # r14 closed the no_oracle hole (VERDICT item 7): the three
    # sketch/wall-clock queries now emit deterministic error-envelope /
    # invariant verdicts with DuckDB oracles pinning them TRUE — their
    # outputs changed from raw estimates/counts to those verdicts, so
    # they must be re-judged against the new oracles.
    "agg_approx": 14,
    "agg_hll_mergeable_sketch": 14,
    "source_rate_stream": 14,
}


def _ordered_specs() -> list[QuerySpec]:
    """Registry order, re-ranked so the driver's finite verdict budget
    lands where it buys the most signal (see ``_verified``):

    1. ``PRIORITY_RECHECK`` (previously wrong, now fixed);
    2. ``SEMANTIC_RECHECK`` whose latest green predates the change
       (outputs deliberately flipped; old verdict certifies old code);
    3. never-judged queries (registration order preserved);
    4. rows-only-judged (verdict can't improve, but cheap to refresh);
    5. greens, STALEST verdict first — with all queries judged at
       least once, rolling re-certification matters more than first
       verdicts: queries last judged in r1/r2 have had shared helpers
       refactored under them and should be re-hashed before r6 greens.
    """
    from . import _verified as v

    recheck = {name: i for i, name in enumerate(v.PRIORITY_RECHECK)}

    def rank(spec: QuerySpec) -> tuple[int, int]:
        if spec.name in recheck:
            return (0, recheck[spec.name])
        changed = SEMANTIC_RECHECK.get(spec.name)
        last_green = v.LAST_GREEN_ROUND.get(spec.name, 0)
        if changed is not None and last_green < changed:
            return (1, changed)
        if spec.name in v.GREEN:
            return (4, last_green)
        if spec.name in v.ROWS_ONLY_JUDGED:
            return (3, 0)
        return (2, 0)

    return sorted(QUERIES.values(), key=rank)  # stable → registration order kept


def queries() -> dict[str, Builder]:
    _load_all()
    return {spec.name: spec.builder for spec in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        spec.name: spec.oracle
        for spec in _ordered_specs()
        if spec.oracle is not None
    }
