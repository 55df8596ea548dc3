"""NULL-pattern fuzzing for the most NULL-sensitive operators.

The adversarial fixture gate (``make gate-adv``) pins ONE deterministic
NULL seeding; this test generalizes it: hypothesis generates small
events tables with RANDOM NULL patterns (including NULL-heavy columns,
duplicate timestamps for tie-break stress, and single-row users), runs
the registered Spark builder AND its DuckDB oracle on the same parquet,
and requires order-insensitive equality — exactly the round driver's
comparison. Any Spark-vs-DuckDB NULL-ordering / NULL-propagation
divergence the fixed seeding happens to miss becomes a shrinkable
counterexample here.

Queries chosen: the families the round-7 campaign had to fix (ordered
windows over nullable ts, as-of joins, OHLC buckets, stats folds) —
the ones where engine NULL defaults genuinely differ.
"""

from __future__ import annotations

import datetime
import math
import os
import shutil
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_hive_streaming_sink_spark.registry import QUERIES, queries

queries()

# deep-fuzz knob: the default 5 examples per query keeps the suite fast;
# pre-round hardening runs use SHSS_FUZZ_EXAMPLES=25+ on chosen subsets
_N_EXAMPLES = int(os.environ.get("SHSS_FUZZ_EXAMPLES", "5"))

FUZZED = [
    "events_interval_union_coverage",
    "events_nelson_aalen_hazard",
    "window_ignore_nulls_ffill",
    "window_ignore_nulls_bfill",
    "events_ohlc_resample",
    "window_hampel_filter",
    "window_gaps_islands_sessionize",
    "window_cumulative_distinct",
    "join_asof",
    "join_asof_forward",
    "events_autocorr_lag1",
    "events_windowed_rate_limit",
    "events_cusum_changepoint",
    "events_markov_transitions",
    "window_session_dynamic_gap",
    "agg_countmin_sketch",
    "dim_scd2_from_events",
    "events_rfm_segmentation",
    "events_interarrival_burstiness",
    "events_cohort_ltv",
    "events_seasonal_decompose",
    "window_holt_linear_fold",
    "window_ewma_fold",
    "window_time_weighted_avg",
    "events_funnel_time_to_convert",
    "window_rolling_ols_slope",
    "events_poisson_dispersion",
    "agg_proportion_ztest",
    "events_retention_triangle",
    "events_session_paths_topk",
    "events_key_skew_audit",
    "events_survival_km",
    "events_attribution_credit",
    "events_forecast_backtest",
    "events_diff_in_diff",
    "events_cuped_adjustment",
    "events_sprt_decision",
]

_T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
_TS_CHOICES = [None] + [_T0 + datetime.timedelta(minutes=7 * k) for k in range(12)]
_TYPES = [None, "click", "purchase", "error", "signup", "view"]
# two-decimal values (like the fixtures); includes 0/negatives/NULL
_VALS = [None, 0.0, -3.25, 0.5, 7.66, 36.04, 150.72, 1e-5]


@st.composite
def events_table(draw):
    n = draw(st.integers(min_value=5, max_value=40))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,  # event_id: unique, the universal tie-break
                draw(st.sampled_from(_TS_CHOICES)),
                draw(st.one_of(st.none(), st.integers(1, 3))),
                draw(st.sampled_from(_TYPES)),
                draw(st.sampled_from(_VALS)),
                None,  # props unused by the fuzzed queries
            )
        )
    return rows


def _write_events(rows, out_dir):
    cols = list(zip(*rows))
    t = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(out_dir, "events.parquet"))


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"t:{v.isoformat()}"
    return f"s:{v}"


def _run_both(spark, name, sf_dir, table):
    spec = QUERIES[name]
    sdf = spec.builder(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{table}.parquet')"
        )
        rel = con.execute(spec.oracle)
        dcols = [d[0] for d in rel.description]
        drows = rel.fetchall()
    finally:
        con.close()
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sn = sorted(tuple(_norm(r[i]) for i in so) for r in srows)
    dn = sorted(tuple(_norm(r[i]) for i in do) for r in drows)
    return sorted(scols), sn, sorted(dcols), dn


@pytest.mark.parametrize("name", FUZZED)
@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_table())
def test_null_fuzz_matches_oracle(spark, name, rows):
    d = tempfile.mkdtemp(prefix="shss_fuzz_")
    try:
        _write_events(rows, d)
        scols, sn, dcols, dn = _run_both(spark, name, d, table="events")
        assert scols == dcols
        assert sn == dn, (
            f"{name} diverged on fuzzed NULL pattern; first diffs: "
            f"{[p for p in zip(sn, dn) if p[0] != p[1]][:3]} "
            f"(spark={len(sn)} rows, duck={len(dn)} rows)"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------------------
# documents-table family: NULL / empty / 1-2-token texts are the inputs
# that crashed or diverged the shingle, fingerprint, and UDF paths in
# the round-7 campaign (Spark's sequence() descending, '' vs NULL,
# None-intolerant Python UDFs)
# --------------------------------------------------------------------------

DOC_FUZZED = [
    "dedup_exact",
    "text_fingerprint",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "corpus_temperature_mix",
    "text_bpe_merge_pairs",
    "text_keyword_rake",
    "corpus_source_kl_divergence",
    "text_cdc_chunk_boundaries",
    "corpus_heaps_law_fit",
    "corpus_dedup_rate_by_source",
    "multimodal_shot_boundaries",
    "multimodal_image_dhash",
    "text_bpe_train_rounds",
    "udtf_tokenize",
    "text_ngram_repetition",
    "corpus_dsir_importance",
    "text_readability_scores",
    "corpus_hashed_classifier_score",
    "dedup_containment_pairs",
    "corpus_priority_sample",
    "agg_bloom_filter_probe",
    "text_char_entropy",
    "text_pii_signal_counts",
    "dedup_simhash_hamming_pairs",
    "dedup_threshold_sweep",
    "corpus_tokenizer_fertility",
    "corpus_context_window_fit",
    "layout_epoch_shuffle",
    "multimodal_audio_fingerprint",
    "corpus_decontam_span_removal",
    "text_langid_confusion",
    "multimodal_keyframe_select",
    "corpus_token_weighted_length_percentiles",
    "corpus_curriculum_deciles",
    "text_perplexity_filter_audit",
    "corpus_ngram_duplication_rate",
    "text_kneser_ney_bigram",
    "corpus_quality_calibration_ece",
    "corpus_token_tail_mass",
    "corpus_boilerplate_heavy_hitters",
    "corpus_source_unigram_kl",
]

_WORDS = ["spark", "hive", "the", "a", "fast", "slow", "table", "merge"]
_TEXTS = st.one_of(
    st.none(),
    st.just(""),
    st.just(" "),
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8).map(" ".join),
)
_LANGS = [None, "en", "de", "zh"]
_SOURCES = [None, "src0", "src1", "src2"]


@st.composite
def documents_table(draw):
    n = draw(st.integers(min_value=4, max_value=30))
    rows = []
    for i in range(n):
        text = draw(_TEXTS)
        rows.append(
            (
                i,
                text,
                draw(st.sampled_from(_LANGS)),
                draw(st.sampled_from(_SOURCES)),
                None if text is None else len(text),
            )
        )
    return rows


def _write_documents(rows, out_dir):
    cols = list(zip(*rows))
    t = pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1], pa.string()),
            "lang": pa.array(cols[2], pa.string()),
            "source": pa.array(cols[3], pa.string()),
            "n_chars": pa.array(cols[4], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(out_dir, "documents.parquet"))


@pytest.mark.parametrize("name", DOC_FUZZED)
@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=documents_table())
def test_doc_null_fuzz_matches_oracle(spark, name, rows):
    d = tempfile.mkdtemp(prefix="shss_fuzz_")
    try:
        _write_documents(rows, d)
        scols, sn, dcols, dn = _run_both(spark, name, d, table="documents")
        assert scols == dcols
        assert sn == dn, (
            f"{name} diverged on fuzzed NULL/degenerate-text pattern; "
            f"first diffs: {[p for p in zip(sn, dn) if p[0] != p[1]][:3]} "
            f"(spark={len(sn)} rows, duck={len(dn)} rows)"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------------------
# embeddings-table family: NULL vectors, zero vectors (zero norm),
# zero-length and ragged arrays, and NULL ELEMENTS inside vectors are the
# degenerate inputs the static adversarial fixtures (uniform-dim, whole-
# vector NULLs only) cannot produce. Spark's zip_with pads the shorter
# array with NULL while the oracles index over one side's len() — any
# asymmetry there, or a 0/0 = NaN-vs-NULL division split, shows up here
# as a shrinkable counterexample.
# --------------------------------------------------------------------------

EMB_FUZZED = [
    "sim_label_knn_disagreement",
    "sim_reciprocal_nearest_neighbors",
    "sim_ivf_multiprobe_topk",
    "embed_binary_quantization_audit",
    "sim_cosine_topk",
    "sim_cosine_topk_numpy",
    "embed_norm_stats",
    "dedup_embedding_cosine",
    "sim_ann_lsh",
    "embed_avg_pool",
    # Arrow gram paths: the BLAS rework must hold the same NULL/ragged
    # verdicts as the fold formulation the oracles express
    "sim_knn_graph_lsh",
    "dedup_semantic_cluster",
    # iterative ops sharing the same distance/assignment macros
    "cluster_kmeans_embeddings",
    "graph_pagerank_knn",
    "graph_label_propagation",
    "sim_mmr_diverse_topk",
    "sim_ann_join_ivf",
    # IVF family: centroid-assignment d2 must NULL out (not truncate)
    # on ragged vectors and survive zero-length ones in both engines
    "sim_ivf_topk",
    "sim_ivf_pq_topk",
    "embed_pq_codes",
    "graph_triangle_count",
    "cluster_silhouette_audit",
    "sim_range_search_cosine",
    "embed_outlier_zscore",
    "graph_kcore",
    "sim_hamming_binary_topk",
    "sim_hard_negative_mining",
    "embed_winsorize_audit",
    "sim_rank_fusion_rrf",
    "embed_matryoshka_overlap_audit",
    "embed_isotropy_audit",
    "sim_query_expansion_prf",
    "graph_link_prediction_ra",
    "sim_ivf_nprobe_recall_curve",
]

# element values: exact-in-float32 two-decimal-ish values plus 0 and
# negatives, and a rare NULL element (all-NULL vectors emerge when every
# draw is None)
_ELEMS = st.one_of(
    st.just(None),
    st.sampled_from([0.0, 1.0, -0.5, 0.25, 2.5, -3.75, 0.125]),
)
_VECS = st.one_of(
    st.none(),  # NULL vector
    st.just([]),  # zero-length vector
    st.just([0.0, 0.0, 0.0, 0.0]),  # zero norm -> 0/0 division
    st.lists(_ELEMS, min_size=2, max_size=4),  # ragged dims 2..4
    st.lists(st.sampled_from([1.0, -0.5, 0.25, 2.5]), min_size=4, max_size=4),
)
_LABELS = [None, 0, 1, 2]


@st.composite
def embeddings_table(draw):
    n = draw(st.integers(min_value=4, max_value=25))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,  # vec_id: unique; ids < 5 double as the query set
                draw(_VECS),
                draw(st.sampled_from(_LABELS)),
            )
        )
    return rows


def _write_embeddings(rows, out_dir):
    cols = list(zip(*rows))
    t = pa.table(
        {
            "vec_id": pa.array(cols[0], pa.int64()),
            "embedding": pa.array(cols[1], pa.list_(pa.float32())),
            "label": pa.array(cols[2], pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(out_dir, "embeddings.parquet"))


@pytest.mark.parametrize("name", EMB_FUZZED)
@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=embeddings_table())
def test_emb_null_fuzz_matches_oracle(spark, name, rows):
    d = tempfile.mkdtemp(prefix="shss_fuzz_")
    try:
        _write_embeddings(rows, d)
        scols, sn, dcols, dn = _run_both(spark, name, d, table="embeddings")
        assert scols == dcols
        assert sn == dn, (
            f"{name} diverged on fuzzed NULL/ragged-embedding pattern; "
            f"first diffs: {[p for p in zip(sn, dn) if p[0] != p[1]][:3]} "
            f"(spark={len(sn)} rows, duck={len(dn)} rows)"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------------------
# lineitem-basket family: the r8 market-basket op is the one newly-
# certified operator whose input table (lineitem) had no fuzzer. NULL
# order/part keys, empty baskets after the NULL filter, duplicate
# (order, part) lines (the DISTINCT path), and baskets of size 1 (no
# pairs) are the degenerate shapes the static fixture cannot vary.
# --------------------------------------------------------------------------

BASKET_FUZZED = ["market_basket_lift"]


@st.composite
def lineitem_table(draw):
    n = draw(st.integers(min_value=4, max_value=40))
    rows = []
    for _ in range(n):
        rows.append(
            (
                draw(st.one_of(st.none(), st.integers(1, 6))),  # l_orderkey
                draw(st.one_of(st.none(), st.integers(1, 5))),  # l_partkey
            )
        )
    return rows


def _write_lineitem(rows, out_dir):
    cols = list(zip(*rows))
    t = pa.table(
        {
            "l_orderkey": pa.array(cols[0], pa.int64()),
            "l_partkey": pa.array(cols[1], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(out_dir, "lineitem.parquet"))


@pytest.mark.parametrize("name", BASKET_FUZZED)
@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=lineitem_table())
def test_basket_null_fuzz_matches_oracle(spark, name, rows):
    d = tempfile.mkdtemp(prefix="shss_fuzz_")
    try:
        _write_lineitem(rows, d)
        scols, sn, dcols, dn = _run_both(spark, name, d, table="lineitem")
        assert scols == dcols
        assert sn == dn, (
            f"{name} diverged on fuzzed NULL-key basket pattern; "
            f"first diffs: {[p for p in zip(sn, dn) if p[0] != p[1]][:3]} "
            f"(spark={len(sn)} rows, duck={len(dn)} rows)"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_asof_simultaneous_click_counts_as_prior(spark):
    """Pinned fuzzer counterexample: a click at EXACTLY the purchase's
    timestamp (higher event_id) is a prior click under ASOF's inclusive
    predicate — the (ts, event_id) window order used to sort it after
    the purchase and silently drop the match."""
    import datetime as dt

    t = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (0, t, 1, "purchase", 1.0, None),
        (1, t, 1, "click", 2.0, None),
    ]
    d = tempfile.mkdtemp(prefix="shss_fuzz_")
    try:
        _write_events(rows, d)
        scols, sn, dcols, dn = _run_both(spark, "join_asof", d, table="events")
        assert len(sn) == 1 and sn == dn
    finally:
        shutil.rmtree(d, ignore_errors=True)
