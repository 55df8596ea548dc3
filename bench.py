#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Queries execute to a noop sink (full plan execution, no driver-side
result transfer) after a session warm-up; per-query wall-clock plus the
total are reported.

Modes
-----
default (--isolate): each query runs in its own subprocess (fresh JVM,
  own warm-up, 2 timed runs, min). Slower (~full JVM spin-up per
  query) but removes every cross-query effect — rounds 4-5 proved the
  shared-JVM numbers swing 0.44x-3.6x per query on identical code
  (C2 compiler queue, GC phase, page cache), which repeatedly burned
  adjudication time on phantom regressions. Isolation is the default
  since round 6 so the recorded per-round numbers are comparable.

--roundrobin: the old shared-JVM mode — one session, a full warm-up
  pass at sf0.001, then two decorrelated timed passes over the suite
  with per-query min (tie-break third run where passes disagree
  >1.5x). ~5x faster wall-clock; use for quick local iteration, never
  for cross-round comparisons.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_volume_customer",
    "join_inner_broadcast",
    "join_theta_range",
    "join_asof",
    "join_skew_salted",
    "agg_basic",
    "agg_cube",
    "window_topk_per_group",
    "explode_wordcount",
    "text_stats_quality",
    "text_tfidf_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_pipeline_end_to_end",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "embed_quantize_int8",
    "window_gaps_islands_sessionize",
    "dataset_snapshot_diff",
    "contamination_ngram_overlap",
    "dedup_substring_windows",
    "pack_sequences_chunk",
    "cluster_kmeans_embeddings",
    "multimodal_audio_features",
    "text_unigram_surprisal",
    "pca_power_iteration",
    "sim_maxsim_multivector",
    "window_session_dynamic_gap",
    "corpus_cross_source_overlap",
    "text_bigram_conditional_topk",
    "join_runtime_bloom_pruned",
    "agg_histogram_equidepth",
    "text_bigram_surprisal",
    "dedup_chunks_reconstruct",
    "multimodal_image_ahash",
    "sim_knn_graph_lsh",
    "dedup_semantic_cluster",
    "events_cusum_changepoint",
    "sim_ivf_pq_topk",
    "text_bm25_score",
    "graph_pagerank_knn",
    "dedup_minhash_calibration",
    # round-7 additions (per BASELINE.md: new keys only, existing keys
    # frozen — totals across rounds compare on the common subset)
    "text_bpe_merge_pairs",
    "corpus_temperature_mix",
    # round-8 additions (same protocol)
    "text_bpe_train_rounds",
    "text_ngram_repetition",
    "corpus_dsir_importance",
    "graph_label_propagation",
    "sim_mmr_diverse_topk",
    "text_readability_scores",
    "corpus_hashed_classifier_score",
    "agg_countmin_sketch",
    "dedup_containment_pairs",
    "sim_ann_join_ivf",
    "graph_kcore",
    "sim_hamming_binary_topk",
    "agg_bloom_filter_probe",
    "sim_hard_negative_mining",
    "dim_scd2_from_events",
    "market_basket_lift",
    "window_holt_linear_fold",
    "events_seasonal_decompose",
    "text_keyword_rake",
    "text_cdc_chunk_boundaries",
    "sim_ivf_multiprobe_topk",
    "corpus_heaps_law_fit",
    "window_rolling_ols_slope",
    "agg_proportion_ztest",
    "stream_windowed_topk",
    "embed_binary_quantization_audit",
    "corpus_dedup_rate_by_source",
    "multimodal_shot_boundaries",
    # round-9: align with tools/stress.py's round-8 list (ADVICE r8) —
    # these two were stress-only; stream_windowed_topk stays bench-only
    # because the stress harness replays replicated parquet without the
    # streaming checkpoint/temp-view scaffolding the op needs.
    "events_rfm_segmentation",
    "events_poisson_dispersion",
    # round-9 additions (new keys only per BASELINE.md protocol)
    "text_char_entropy",
    "text_pii_signal_counts",
    "embed_winsorize_audit",
    "events_retention_triangle",
    "sim_rank_fusion_rrf",
    "dedup_simhash_hamming_pairs",
    "events_session_paths_topk",
    # round-10 additions
    "embed_matryoshka_overlap_audit",
    "events_key_skew_audit",
    "dedup_threshold_sweep",
    "events_survival_km",
    "events_attribution_credit",
    "embed_isotropy_audit",
    "sim_query_expansion_prf",
    "corpus_tokenizer_fertility",
    "corpus_context_window_fit",
    "layout_epoch_shuffle",
    "graph_link_prediction_ra",
    "multimodal_audio_fingerprint",
    "corpus_decontam_span_removal",
    "text_langid_confusion",
    "events_forecast_backtest",
    "multimodal_keyframe_select",
    "events_diff_in_diff",
    "sim_ivf_nprobe_recall_curve",
    "corpus_token_weighted_length_percentiles",
    "corpus_curriculum_deciles",
    "text_perplexity_filter_audit",
    "agg_hll_intersection_error_bound",
    "window_ignore_nulls_bfill",
    "join_asof_forward",
    "events_cuped_adjustment",
    "events_sprt_decision",
    "multimodal_image_dhash",
    # round-11 additions (new keys only per BASELINE.md protocol)
    "events_nelson_aalen_hazard",
    "corpus_ngram_duplication_rate",
    "text_kneser_ney_bigram",
    "corpus_quality_calibration_ece",
    "sim_reciprocal_nearest_neighbors",
    # round-12 additions (new keys only per BASELINE.md protocol)
    "corpus_token_tail_mass",
    "corpus_boilerplate_heavy_hitters",
    "sim_label_knn_disagreement",
    "events_interval_union_coverage",
    "stream_chained_windowed_aggregates",
    "corpus_source_unigram_kl",
    "sink_txnlog_schema_evolution",
]

WARM_DIR = "/root/testdata/sf0.001"


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _run_shared(sf_dir: str, cpus: str, names: list[str]) -> dict[str, float]:
    """Round-robin mode: warm-up pass, then two decorrelated timed
    passes over the whole suite; per-query min, tie-break third run."""
    from spark_hive_streaming_sink_spark.registry import queries
    from spark_hive_streaming_sink_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)
    qs = queries()

    for name in names:
        try:
            _noop(qs[name](spark, WARM_DIR))
        except Exception:
            pass

    runs: dict[str, list[float]] = {name: [] for name in names}
    for _pass in range(2):
        for name in names:
            t0 = time.time()
            _noop(qs[name](spark, sf_dir))
            runs[name].append(time.time() - t0)
    for name in names:
        r = runs[name]
        if max(r) > 1.5 * min(r) or min(r) > 3.0:
            t0 = time.time()
            _noop(qs[name](spark, sf_dir))
            r.append(time.time() - t0)

    timings = {name: round(min(r), 3) for name, r in runs.items()}
    spark.stop()
    return timings


def _run_one_isolated(name: str, sf_dir: str, cpus: str) -> None:
    """Child-process body for --isolate: fresh JVM, warm-up, min of 2
    (third run when the two disagree >1.5× — a C2/GC/page-cache
    outlier), plus the 1-minute load average sampled before the timed
    runs. Run-to-run hygiene (r10 lesson: the r10 double-run's run2
    carried up-to-11.8× same-code outliers because other jobs shared
    the 32 CPUs): a recorded load_1m well above the JVM's own
    footprint means the number is contaminated — rerun, don't
    adjudicate."""
    from spark_hive_streaming_sink_spark.registry import queries
    from spark_hive_streaming_sink_spark.session import get_spark

    spark = get_spark(f"bench-{name}", cpus=cpus)
    qs = queries()
    try:
        _noop(qs[name](spark, WARM_DIR))
    except Exception:
        pass
    load_1m = round(os.getloadavg()[0], 1)
    runs = []
    for _ in range(2):
        t0 = time.time()
        _noop(qs[name](spark, sf_dir))
        runs.append(time.time() - t0)
    if max(runs) > 1.5 * min(runs):
        t0 = time.time()
        _noop(qs[name](spark, sf_dir))
        runs.append(time.time() - t0)
    print(
        json.dumps(
            {"query": name, "sec": round(min(runs), 3), "load_1m": load_1m}
        )
    )
    spark.stop()


def _run_isolated(
    sf_dir: str, cpus: str, names: list[str]
) -> tuple[dict[str, float], dict[str, float]]:
    timings: dict[str, float] = {}
    loads: dict[str, float] = {}
    for name in names:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True,
            text=True,
            env=os.environ,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            rec = json.loads(line)
            timings[name] = rec["sec"]
            loads[name] = rec.get("load_1m", float("nan"))
        except Exception:
            print(
                f"isolate child failed for {name}: {proc.stderr[-2000:]}",
                file=sys.stderr,
            )
            timings[name] = float("nan")
    return timings, loads


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    argv = sys.argv[1:]

    if argv[:1] == ["--one"]:
        if len(argv) < 2:
            sys.exit("usage: bench.py --one <query-name>")
        from spark_hive_streaming_sink_spark.registry import queries

        if argv[1] not in queries():
            sys.exit(
                f"unknown query {argv[1]!r}; see registry.queries() "
                "for the registered names"
            )
        _run_one_isolated(argv[1], sf_dir, cpus)
        return

    isolate = "--roundrobin" not in argv
    names = [a for a in argv if not a.startswith("--")] or HEADLINE
    from spark_hive_streaming_sink_spark.registry import queries

    unknown = [n for n in names if n not in queries()]
    if unknown:
        sys.exit(f"unknown queries: {unknown}; see registry.queries()")
    loads: dict[str, float] = {}
    if isolate:
        timings, loads = _run_isolated(sf_dir, cpus, names)
        mode = "isolate"
    else:
        timings = _run_shared(sf_dir, cpus, names)
        mode = "roundrobin"

    total = round(sum(t for t in timings.values() if t == t), 3)
    # NaN (failed child) -> null so strict JSON parsers accept the line
    clean = {k: (round(v, 2) if v == v else None) for k, v in timings.items()}
    record = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": clean,
        "sf": sf,
        "cpus": int(cpus),
        "mode": mode,
    }
    real_loads = [v for v in loads.values() if v == v]
    if real_loads:
        # contamination telltale (r10: concurrent system load produced
        # up-to-11.8× same-code outliers): each child samples
        # os.getloadavg() before its timed runs; a max far above one
        # JVM's footprint means external load shared the CPUs
        record["load_1m_max"] = max(real_loads)
        record["loads"] = {k: v for k, v in loads.items() if v == v}
    # Full per-query record on disk (the per-round ledger the judge
    # reads); the stdout line must stay SMALL — the round-8 driver kept
    # only the last ~2 KB of stdout and the 75-query line got truncated
    # mid-JSON (BENCH_r08.json "parsed": null).
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "bench_latest.json"
    )
    try:
        with open(full_path, "w") as f:
            json.dump(record, f, indent=1)
    except OSError:
        full_path = None
    print(_stdout_line(record, budget=None), flush=True)


def _stdout_line(record: dict, budget: int | None = None) -> str:
    """The ONE JSON line for the driver, trimmed to a byte budget.

    When the full record is too long, keep per-query timings
    slowest-first until the byte budget (the slow tail carries the perf
    signal) and point at the on-disk record for the rest — the line
    always parses whole no matter how many queries the suite grows to.
    """
    if budget is None:
        budget = int(os.environ.get("SPARK_GRAFT_BENCH_LINE_BUDGET", "1800"))
    line = json.dumps(record, separators=(",", ":"))
    if len(line) <= budget:
        return line
    clean = record["queries"]
    small = dict(record)
    # r13 postmortem: keeping the full per-query "loads" dict here
    # (~4 KB for 128 keys) blew the budget by itself, so the refill
    # loop below inserted zero queries and the driver lost two rounds
    # of per-query comparison. Keep only load_1m_max on the line; the
    # full loads live in tools/bench_latest.json.
    small.pop("loads", None)
    small["queries"] = {}
    small["queries_omitted"] = 0
    small["full_record"] = "tools/bench_latest.json"
    by_cost = sorted(clean, key=lambda n: -(clean[n] or 0.0))
    for name in by_cost:
        trial = dict(small)
        trial["queries"] = {**small["queries"], name: clean[name]}
        if len(json.dumps(trial, separators=(",", ":"))) > budget:
            small["queries_omitted"] = len(clean) - len(small["queries"])
            break
        small["queries"] = trial["queries"]
    return json.dumps(small, separators=(",", ":"))


if __name__ == "__main__":
    main()
