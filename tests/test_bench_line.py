"""Regression test for the bench stdout line (r13 postmortem).

In rounds 12-13 the budget-trimmed stdout record kept the full
per-query ``loads`` dict (~4 KB for 128 keys), which alone exceeded the
1800-byte budget, so the slowest-first refill loop inserted zero
queries: ``"queries": {}, "queries_omitted": 128``.  The driver's
per-query round-over-round comparison was silently empty for two
rounds.  These tests pin the fixed behaviour: the trimmed line parses,
drops ``loads``, keeps ``load_1m_max``, and carries a substantial
slowest-first prefix of the per-query timings.
"""

import importlib.util
import json
import os
import sys

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


@pytest.fixture(scope="module")
def bench_mod():
    spec = importlib.util.spec_from_file_location("_bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def _record(n_queries: int = 128) -> dict:
    timings = {f"query_name_number_{i:03d}": round(1.0 + i * 0.05, 2) for i in range(n_queries)}
    loads = {k: round(3.0 + i * 0.1, 2) for i, k in enumerate(timings)}
    return {
        "metric": "headline_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "cpus": 32,
        "mode": "isolate",
        "load_1m_max": max(loads.values()),
        "loads": loads,
    }


def test_short_record_passes_through(bench_mod):
    rec = _record(n_queries=5)
    line = bench_mod._stdout_line(rec, budget=1800)
    assert json.loads(line) == rec


def test_trimmed_line_fits_budget_and_parses(bench_mod):
    line = bench_mod._stdout_line(_record(), budget=1800)
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_total_wall"
    assert parsed["full_record"] == "tools/bench_latest.json"


def test_trimmed_line_keeps_many_queries_slowest_first(bench_mod):
    rec = _record()
    parsed = json.loads(bench_mod._stdout_line(rec, budget=1800))
    # the r12/r13 failure mode was exactly len(queries) == 0
    assert len(parsed["queries"]) >= 30
    assert parsed["queries_omitted"] == len(rec["queries"]) - len(parsed["queries"])
    kept = set(parsed["queries"])
    slowest = sorted(rec["queries"], key=lambda n: -rec["queries"][n])[: len(kept)]
    assert kept == set(slowest)


def test_trimmed_line_drops_loads_keeps_max(bench_mod):
    parsed = json.loads(bench_mod._stdout_line(_record(), budget=1800))
    assert "loads" not in parsed
    assert parsed["load_1m_max"] == pytest.approx(3.0 + 127 * 0.1)


def test_failed_query_none_does_not_break_refill(bench_mod):
    rec = _record()
    rec["queries"]["query_name_number_000"] = None  # NaN child -> null
    parsed = json.loads(bench_mod._stdout_line(rec, budget=1800))
    assert len(parsed["queries"]) >= 30
