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


def test_connected_components_raises_when_unconverged(spark):
    """A chain whose diameter exceeds max_iter must FAIL LOUDLY, not
    return partial (wrong) labels that would corrupt a dedup keep-list:
    min-label propagation moves the min one hop per iteration, so a
    7-edge path cannot converge in 2 iterations."""
    import pytest

    from spark_hive_streaming_sink_spark.functions.clustering import (
        connected_components,
    )

    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edf, max_iter=2)


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 10k-node path graph (diameter ~10k) must CONVERGE within the
    default round budget: pointer jumping (label-map self-composition
    after _SHORTCUT_AFTER plain rounds) makes convergence O(log n) in
    rounds regardless of diameter — the r12 form, which propagated one
    hop per round, could only raise on this graph. Oracle: every node's
    component is 0 (single path component), i.e. exactly what
    union-find computes."""
    import pyspark.sql.functions as F

    from spark_hive_streaming_sink_spark.functions.clustering import (
        connected_components,
    )

    n = 10_000
    edf = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    got = connected_components(edf)
    assert got.filter(F.col("component") != 0).count() == 0
    assert got.count() == n


def _cusum_reference(vals):
    """Pure-Python CUSUM peak for one user over integer values with a
    power-of-two count: mean and deviations are binary-exact, so
    micro-unit quantization is exact integer arithmetic."""
    n = len(vals)
    mu = sum(vals) / n  # exact: n is a power of two, vals are ints
    devs = [round((v - mu) * 1_000_000) for v in vals]
    s, peak, peak_pos = 0, -1, -1
    for i, d in enumerate(devs):
        s += d
        if abs(s) > peak:  # first occurrence wins (ts order tie-break)
            peak, peak_pos = abs(s), i
    return peak / 1_000_000.0, (peak_pos + 1) / n


def _drawdown_reference(vals):
    cum, peak, best = 0, 0, -1
    first = True
    out = None
    for v in vals:
        cum += v * 1_000_000
        peak = cum if first else max(peak, cum)
        first = False
        dd = peak - cum
        if dd > best:  # first occurrence wins
            best = dd
            out = (dd / 1_000_000.0, cum / 1_000_000.0, peak / 1_000_000.0)
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.integers(-50, 50), min_size=4, max_size=4)
    | st.lists(st.integers(-50, 50), min_size=8, max_size=8)
)
def test_cusum_and_drawdown_match_python_reference(spark, tmp_path_factory, vals):
    import datetime

    tmp = tmp_path_factory.mktemp("cusum")
    rows = [
        (i, 1, datetime.datetime(2024, 1, 1, 0, 0, i), float(v))
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    got = QUERIES["events_cusum_changepoint"].builder(spark, str(tmp)).collect()
    assert len(got) == 1
    want_peak, want_frac = _cusum_reference(vals)
    assert got[0]["max_abs_cusum"] == want_peak
    assert abs(got[0]["changepoint_frac"] - round(want_frac, 6)) < 1e-9

    dd = QUERIES["window_max_drawdown"].builder(spark, str(tmp)).collect()
    assert len(dd) == 1
    want_dd, want_cum, want_pk = _drawdown_reference(vals)
    assert dd[0]["max_drawdown"] == want_dd
    assert dd[0]["cum_at_trough"] == want_cum
    assert dd[0]["peak_before_trough"] == want_pk


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.lists(st.integers(-5, 5), min_size=64, max_size=64),
        min_size=5,
        max_size=8,
    )
)
def test_pq_codes_match_argmin_reference(spark, tmp_path_factory, vecs):
    """Integer embeddings make every subspace distance exact, so the
    distributed PQ assignment must equal a sequential argmin with the
    same (distance, codebook-id) tie-break."""
    tmp = tmp_path_factory.mktemp("pq")
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    from spark_hive_streaming_sink_spark.functions.similarity import (
        PQ_K,
        PQ_M,
        PQ_SUB,
    )
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    got = {
        r["vec_id"]: (r["code0"], r["code1"], r["code2"], r["code3"])
        for r in QUERIES["embed_pq_codes"].builder(spark, str(tmp)).collect()
    }

    def ref_codes(v):
        codes = []
        for m in range(PQ_M):
            vs = v[m * PQ_SUB : (m + 1) * PQ_SUB]
            best = min(
                range(PQ_K),
                key=lambda cid: (
                    sum(
                        (a - b) ** 2
                        for a, b in zip(vs, vecs[cid][m * PQ_SUB : (m + 1) * PQ_SUB])
                    ),
                    cid,
                ),
            )
            codes.append(best)
        return tuple(codes)

    for i, v in enumerate(vecs):
        assert got[i] == ref_codes(v), f"vec {i}"


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.lists(
            st.sampled_from(["spark", "vector", "stream", "the", "a", "data"]),
            min_size=2,
            max_size=12,
        ),
        min_size=3,
        max_size=6,
    )
)
def test_bm25_matches_python_reference(spark, tmp_path_factory, docs):
    import math

    tmp = tmp_path_factory.mktemp("bm25")
    rows = [
        (i, " ".join(toks), "en", "src0", len(" ".join(toks)))
        for i, toks in enumerate(docs)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    from spark_hive_streaming_sink_spark.functions.text import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
    )
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    got = {
        r["doc_id"]: r["bm25"]
        for r in QUERIES["text_bm25_score"].builder(spark, str(tmp)).collect()
    }

    n_docs = len(docs)
    avgdl = sum(len(d) for d in docs) / n_docs
    df = {
        t: sum(1 for d in docs if t in d) for t in BM25_QUERY
    }
    for i, d in enumerate(docs):
        score = 0
        matched = False
        for t in BM25_QUERY:
            tf = d.count(t)
            if tf == 0:
                continue
            matched = True
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s = idf * tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(d) / avgdl)
            )
            score += round(s * 1_000_000)
        if matched:
            assert abs(got[i] - score / 1_000_000.0) < 2e-5, i
        else:
            assert i not in got


def _gini_reference(vals):
    """Rank-formulation Gini over non-negative ints (exact)."""
    s = sorted(vals)
    n, tot = len(s), sum(s)
    rs = sum((i + 1) * v for i, v in enumerate(s))
    return 2.0 * rs / (n * tot) - (n + 1.0) / n


def _ks_reference(a, b):
    pts = sorted(set(a) | set(b))
    n1, n2 = len(a), len(b)
    best = -1
    for p in pts:
        f1 = sum(1 for x in a if x <= p)
        f2 = sum(1 for x in b if x <= p)
        best = max(best, abs(f1 * n2 - f2 * n1))
    return best / (n1 * n2)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.integers(1, 40), min_size=3, max_size=12),
    st.lists(st.integers(1, 40), min_size=3, max_size=12),
)
def test_gini_and_ks_match_python_reference(spark, tmp_path_factory, a, b):
    import datetime

    tmp = tmp_path_factory.mktemp("giniks")
    rows = [
        (i, 1, datetime.datetime(2024, 1, 1, 0, 0, 0), float(v), "click", "{}")
        for i, v in enumerate(a)
    ] + [
        (1000 + i, 1, datetime.datetime(2024, 1, 1, 0, 0, 0), float(v),
         "purchase", "{}")
        for i, v in enumerate(b)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, value double, "
        "event_type string, props string",
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    gini = {
        r["event_type"]: r["gini"]
        for r in QUERIES["agg_gini_coefficient"].builder(spark, str(tmp)).collect()
    }
    assert abs(gini["click"] - round(_gini_reference(a), 6)) < 2e-6
    assert abs(gini["purchase"] - round(_gini_reference(b), 6)) < 2e-6

    ks = QUERIES["agg_ks_two_sample"].builder(spark, str(tmp)).collect()
    assert len(ks) == 1
    assert abs(ks[0]["ks_stat"] - round(_ks_reference(a, b), 6)) < 2e-6
    assert ks[0]["n1"] == len(a) and ks[0]["n2"] == len(b)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.sampled_from(["a", "b", "c"]),
        min_size=3,
        max_size=15,
    )
)
def test_markov_matches_python_reference(spark, tmp_path_factory, seq):
    """Transition counts from one user's ordered sequence must equal
    the sequential pair count; ppm rows within rounding of exact."""
    import datetime

    tmp = tmp_path_factory.mktemp("markov")
    rows = [
        (i, 1, datetime.datetime(2024, 1, 1, 0, 0, i), 1.0, t, "{}")
        for i, t in enumerate(seq)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, value double, "
        "event_type string, props string",
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    got = {
        (r["prev_type"], r["next_type"]): (r["n_trans"], r["n_from"], r["prob_ppm"])
        for r in QUERIES["events_markov_transitions"].builder(spark, str(tmp)).collect()
    }
    want = {}
    for x, y in zip(seq, seq[1:]):
        want[(x, y)] = want.get((x, y), 0) + 1
    from_tot = {}
    for (x, _y), c in want.items():
        from_tot[x] = from_tot.get(x, 0) + c
    assert set(got) == set(want)
    for k, c in want.items():
        n_trans, n_from, ppm = got[k]
        assert n_trans == c and n_from == from_tot[k[0]]
        assert abs(ppm - c * 1_000_000 / from_tot[k[0]]) <= 0.5 + 1e-9


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.lists(
            st.sampled_from(["w1", "w2", "w3", "w4", "w5"]),
            min_size=3,
            max_size=10,
        ),
        min_size=2,
        max_size=5,
    )
)
def test_zipf_slope_matches_float_ols(spark, tmp_path_factory, docs):
    import math

    # need at least 2 distinct frequencies/ranks for a defined slope
    toks = [t for d in docs for t in d]
    if len(set(toks)) < 2:
        return
    tmp = tmp_path_factory.mktemp("zipf")
    rows = [
        (i, " ".join(d), "en", "src0", len(" ".join(d))) for i, d in enumerate(docs)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    got = QUERIES["text_zipf_rank_frequency"].builder(spark, str(tmp)).collect()
    slope = got[0]["zipf_slope"]

    freq = {}
    for t in toks:
        freq[t] = freq.get(t, 0) + 1
    ordered = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(i + 1) for i in range(len(ordered))]
    ys = [math.log(c) for _w, c in ordered]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    denom = n * sxx - sx * sx
    if denom == 0:  # single rank -> slope undefined; op emits no rows?
        return
    want = (n * sxy - sx * sy) / denom
    assert abs(slope - want) < 1e-4
    # ranks/frequencies themselves are exact
    for r in got:
        assert freq[r["w"]] == r["n_w"]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.integers(1, 99999),  # value = k/100 > 0, exact in binary*100
        min_size=4,
        max_size=20,
    )
)
def test_benford_digit_extraction_matches_reference(spark, tmp_path_factory, cents):
    """First-significant-digit counts must equal a sequential count
    over the same k/100 values (exact: value*1e4 is the integer k*100)."""
    import datetime

    tmp = tmp_path_factory.mktemp("benford")
    rows = [
        (i, 1, datetime.datetime(2024, 1, 1), k / 100.0, "click", "{}")
        for i, k in enumerate(cents)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, value double, "
        "event_type string, props string",
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    got = {
        r["digit"]: r["n_obs"]
        for r in QUERIES["events_benford_digit_audit"].builder(spark, str(tmp)).collect()
    }
    want = {}
    for k in cents:
        d = int(str(k * 100)[0])
        want[d] = want.get(d, 0) + 1
    assert got == want


def test_verified_ledger_matches_driver_record():
    """VERDICT r9 item 9 / r11 item 1: `_verified.py` is GENERATED from
    the union of CORRECTNESS_r*.json. A hand-edited ledger hard-fails.
    The one benign staleness — the round driver drops the NEWEST
    CORRECTNESS_r{N}.json *after* the round's final commit, so HEAD can
    never contain a ledger that includes it — only warns: the committed
    ledger must exactly equal the generator's output with that newest
    round excluded (i.e., it was honestly generated from everything
    that existed at commit time)."""
    import importlib.util
    import os
    import warnings

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_verified", os.path.join(repo, "tools", "gen_verified.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    committed = open(mod.TARGET).read()
    if committed == mod.generate():
        return
    newest = max(mod._load_rounds())
    if committed == mod.generate(exclude_round=newest):
        warnings.warn(
            f"_verified.py predates CORRECTNESS_r{newest:02d}.json "
            "(dropped by the driver after the last commit) — run "
            "`python tools/gen_verified.py --write` at round start",
            stacklevel=1,
        )
        return
    raise AssertionError(
        "_verified.py diverges from CORRECTNESS_r*.json beyond the "
        "benign newest-round lag — it was hand-edited or a fold was "
        "skipped; run `python tools/gen_verified.py --write`"
    )


def test_survival_km_invariants(spark):
    """KM semantics on the fixture: survival is non-increasing in day,
    bounded by [0, 1e6] (it legitimately reaches 0 when the whole
    at-risk set events at the final step, and integer-ppm rounding can
    floor it); the at-risk count strictly shrinks down the curve;
    events never exceed the at-risk set."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    rows = sorted(
        QUERIES["events_survival_km"].builder(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r["day"],
    )
    assert rows, "fixture must produce a curve"
    prev_s, prev_n = 1_000_000 + 1, None
    for r in rows:
        assert 0 <= r["survival_ppm"] <= 1_000_000
        assert r["survival_ppm"] <= prev_s
        assert 1 <= r["n_events"] <= r["n_at_risk"]
        if prev_n is not None:
            assert r["n_at_risk"] < prev_n
        prev_s, prev_n = r["survival_ppm"], r["n_at_risk"]


def test_attribution_credit_invariants(spark):
    """Attribution semantics on the fixture: per-channel linear credit
    never exceeds conversions * 1e6 (floor shares), last/first-touch
    wins sum to the touched-conversion count on each side, and the
    '(direct)' row carries no credit."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    rows = {
        r["touch_type"]: r
        for r in QUERIES["events_attribution_credit"]
        .builder(spark, "/root/testdata/sf0.001")
        .collect()
    }
    touched = [r for t, r in rows.items() if t != "(direct)"]
    assert touched, "fixture has click/view touches"
    for r in touched:
        assert 0 < r["credit_ppm_total"] <= r["conversions"] * 1_000_000
        assert r["n_touches"] >= r["conversions"]
    # every touched conversion has exactly one last and one first touch
    n_last = sum(r["n_last_touch"] for r in touched)
    n_first = sum(r["n_first_touch"] for r in touched)
    assert n_last == n_first
    if "(direct)" in rows:
        d = rows["(direct)"]
        assert d["credit_ppm_total"] == 0 and d["n_touches"] == 0
