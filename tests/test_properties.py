"""Property-based tests (hypothesis) for the engine's core invariants:
ledger idempotence under arbitrary replay sequences, and connected
components against a reference union-find on random graphs."""

from __future__ import annotations

import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_hive_streaming_sink_spark.streaming.sink import BatchCommitLedger


@given(st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=40))
@settings(max_examples=50, deadline=None)
def test_ledger_applies_each_batch_exactly_once(batch_sequence):
    """Whatever order/duplication of batch ids the stream replays, each
    id is applied exactly once (the sink's exactly-once contract)."""
    with tempfile.TemporaryDirectory() as d:
        ledger = BatchCommitLedger(os.path.join(d, "ledger"))
        applied = []
        for bid in batch_sequence:
            if ledger.committed(bid):
                continue
            applied.append(bid)
            ledger.record(bid)
        assert sorted(applied) == sorted(set(batch_sequence))
        assert all(ledger.committed(b) for b in batch_sequence)


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label per node, matching connected_components' contract
    out = {}
    for v in range(n_nodes):
        root = find(v)
        out.setdefault(root, []).append(v)
    return {v: min(members) for root, members in out.items() for v in members}


# module-level spark fixture comes from conftest; hypothesis needs the
# function-scoped fixture suppression
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from spark_hive_streaming_sink_spark.functions.clustering import connected_components

    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"] for r in connected_components(edf, max_iter=30).collect()
    }
    nodes = {v for e in edges for v in e}
    want_all = _uf_components(15, edges)
    want = {v: want_all[v] for v in nodes}
    assert got == want
