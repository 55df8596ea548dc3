#!/usr/bin/env python
"""Scale-stress harness: replicate the sf0.1 fixtures REPL× with
key-offset copies (join keys stay consistent, key cardinality grows
with data — the realistic scale-up, unlike naive row duplication which
just deepens skew), then run the headline queries and report timings.

This is the "would the plan survive 10× data" check from the 100 TB
design loop: per-query wall-clock should grow ~linearly (scan-bound) or
~n·log n (shuffle-bound) — a superlinear jump flags a plan that broke
(lost broadcast, skewed shuffle, driver collect).

Usage: python tools/stress.py [REPL] [CPUS]   (defaults 10, 32)
Writes replicated parquet under /tmp/shss_stress_sfX/ (reused if
present), prints one JSON line per run like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Cell-count knobs for the quadratic-within-cell operators (SemDeDup,
# LSH kNN graph): their fixture defaults (SEM_K=16, 2^4 buckets) are
# only valid near fixture scale — the documented K ~ sqrt(N) rule says
# cell count must grow with the corpus, or within-cell pair counts grow
# quadratically (x30 with fixture K measured as a multi-hour stage).
# Scale them with REPL *before* the registry import bakes the constants.
_REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 10
# K ~ sqrt(N), the rule the docstrings state: assignment cost is
# O(N * K) and within-cell pairing is O(N^2 / K), so K = c * sqrt(N)
# balances them. Linear scaling (16 * REPL, the pre-r7 setting) made
# the argmin quadratic in REPL — measured 15.7x wall for 3.3x data on
# dedup_semantic_cluster at x100.
os.environ.setdefault("SHSS_SEM_K", str(int(16 * _REPL ** 0.5)))
os.environ.setdefault("SHSS_N_PLANES", str(4 + _REPL.bit_length()))
# duplicate-cluster pair cap: REPL-replicated corpora put all REPL
# copies of a doc in one band bucket, making candidate pairs O(REPL^2)
# per base doc. Production caps bucket REPRESENTATIVES (a full clique
# adds nothing over a star for the downstream component merge); 16
# keeps stress pair counts linear while leaving fixture-scale
# semantics untouched (fixture buckets are far below any cap).
os.environ.setdefault("SHSS_BAND_CAP", "16")
# calibration audit: K=16 sampled mode is the engine-wide default
# since round 10 (bench, gates and stress all measure the same
# configuration); the setdefault stays as documentation and as a guard
# against an inherited K=1 env
os.environ.setdefault("SHSS_CALIB_SAMPLE_K", "16")

import pyspark.sql.functions as F  # noqa: E402

from spark_hive_streaming_sink_spark.io import load_table  # noqa: E402
from spark_hive_streaming_sink_spark.registry import queries  # noqa: E402
from spark_hive_streaming_sink_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

# keys that must be offset per replica so cardinalities scale; dimension
# tables region/nation/supplier/part stay fixed (they grow slowly in
# TPC-H too) — fact foreign keys into them are left unchanged.
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation", "supplier", "part"]

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q18_large_volume_customer",
    "join_skew_salted",
    "agg_cube",
    "window_topk_per_group",
    "explode_wordcount",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_stats_quality",
    "text_langid",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "embed_avg_pool",
    "embed_quantize_int8",
    "text_tfidf_topk",
    "window_gaps_islands_sessionize",
    "q2_min_cost_supplier",
    "q17_small_quantity",
    "dataset_snapshot_diff",
    "contamination_ngram_overlap",
    "dedup_substring_windows",
    "pack_sequences_chunk",
    "cluster_kmeans_embeddings",
    "pca_power_iteration",
    "text_unigram_surprisal",
    "events_ohlc_resample",
    "join_interval_overlap",
    "multimodal_audio_features",
    # round-5 additions (first stress-covered in round 6)
    "window_hampel_filter",
    "events_windowed_rate_limit",
    "window_time_weighted_avg",
    "text_bigram_conditional_topk",
    "corpus_cross_source_overlap",
    "corpus_ngram_novelty",
    "embed_centroid_drift",
    # round-6 additions
    "join_runtime_bloom_pruned",
    "agg_histogram_equidepth",
    "text_bigram_surprisal",
    "dedup_chunks_reconstruct",
    "corpus_stratified_hash_sample",
    "multimodal_image_ahash",
    # round-6 second batch
    "sim_knn_graph_lsh",
    "dedup_semantic_cluster",
    "text_token_pmi_topk",
    "text_zipf_rank_frequency",
    "events_cusum_changepoint",
    "events_markov_transitions",
    "window_max_drawdown",
    "embed_text_consistency_corr",
    "sim_ivf_pq_topk",
    "text_bm25_score",
    "graph_pagerank_knn",
    "dedup_minhash_calibration",
    "agg_subsample_ci",
    "events_autocorr_lag1",
    # round-7/8 additions: the iterative loops (BPE trainer, label
    # propagation, MMR) and the new pair-listing op (containment) are
    # exactly the shapes whose x100 behavior needs measuring
    "text_bpe_merge_pairs",
    "corpus_temperature_mix",
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
    "graph_triangle_count",
    # round-8 final batch: the k-core peel is the new iterative loop,
    # the Hamming/hard-negative scans and the Bloom/SCD2 aggregates
    # should stay ~linear — a superlinear jump flags a broken plan
    "graph_kcore",
    "sim_hamming_binary_topk",
    "agg_bloom_filter_probe",
    "sim_hard_negative_mining",
    "dim_scd2_from_events",
    # round-8 second-session batch: the global-window curves (Heaps,
    # RFM ntiles) and the order-basket self-join are the shapes to
    # watch — per-key windows and cell-local joins should stay linear
    "market_basket_lift",
    "window_holt_linear_fold",
    "events_seasonal_decompose",
    "text_keyword_rake",
    "text_cdc_chunk_boundaries",
    "sim_ivf_multiprobe_topk",
    "corpus_heaps_law_fit",
    "window_rolling_ols_slope",
    "events_rfm_segmentation",
    "events_poisson_dispersion",
    "agg_proportion_ztest",
    "embed_binary_quantization_audit",
    "corpus_dedup_rate_by_source",
    "multimodal_shot_boundaries",
    # round-9 additions: char explode (linear scan), regex census
    # (map-only), and the dim-keyed percentile + clip-count pass —
    # all should scale linearly; a jump flags a broken plan
    "text_char_entropy",
    "text_pii_signal_counts",
    "embed_winsorize_audit",
    # user-keyed cohort rollup + two-channel fusion: both should ride
    # their bounded keys linearly
    "events_retention_triangle",
    "sim_rank_fusion_rrf",
    # pigeonhole-banded simhash pairing: 15-bit bands keep bucket
    # occupancy linear; star cap bounds replicated corpora
    "dedup_simhash_hamming_pairs",
    # session path mining: one user_id shuffle + TakeOrdered
    "events_session_paths_topk",
    # round-10: bounded-broadcast dual-cosine rank audit — one corpus
    # scan, 5-key query_id shuffle; should ride the scan linearly
    "embed_matryoshka_overlap_audit",
    # round-10: distributed-rank Gini + TakeOrdered heavy hitters —
    # should ride the per-key count aggregate linearly
    "events_key_skew_audit",
    # round-10: band-bucket pair volume curve — signature-floor-bound
    # like its calibration sibling
    "dedup_threshold_sweep",
    # round-10: KM curve (user_id agg + O(days) fold) must ride the
    # subject aggregate linearly
    "events_survival_km",
    # round-10: the attribution marker-row rewrite exists BECAUSE the
    # naive pair join is REPL^2 on replicated users — this entry is the
    # proof it stays linear
    "events_attribution_credit",
    # round-10: sum-vector isotropy (posexplode + (label,dim) agg) and
    # the dual bounded-broadcast PRF rounds — both must ride the corpus
    # scan linearly
    "embed_isotropy_audit",
    "sim_query_expansion_prf",
    # round-10: map-only corpus audits (regex counts + tiny spines) —
    # pure scan shapes that must stay flat-linear
    "corpus_tokenizer_fertility",
    "corpus_context_window_fit",
    "layout_epoch_shuffle",
    # round-10: distance-2 expansion over the kNN edge list — O(N*k^2)
    # candidates by construction; a superlinear jump means the kNN
    # bound broke
    "graph_link_prediction_ra",
    # round-10: Arrow decode kernel + lag window + fingerprint-keyed
    # count join — linear like the VAD/ahash siblings
    "multimodal_audio_fingerprint",
    # round-10: gram-digest probe + position explodes on one doc_id
    # partitioning — O(tokens); a jump means the digest join broke
    "corpus_decontam_span_removal",
    "text_langid_confusion",
    # round-10: single-window lag backtest and the shot->keyframe
    # composition — both ride existing per-key partitionings
    "events_forecast_backtest",
    "multimodal_keyframe_select",
    # round-10: semi-join treated set + 4-cell aggregate — scan-bound
    "events_diff_in_diff",
    # round-10: bounded probe fan-out x cell-local scan — cost scales
    # with sum(nprobe points), corpus never re-shuffles
    "sim_ivf_nprobe_recall_curve",
    # round-10: histogram-level cumulative mass (window over doc-LENGTH
    # cardinality, not docs) and the distributed-rank curriculum split
    "corpus_token_weighted_length_percentiles",
    "corpus_curriculum_deciles",
    # round-10: bigram-model join + 1-row corpus broadcast — the
    # surprisal op's shapes plus a source rollup
    "text_perplexity_filter_audit",
    # round-10: three sketch scalars over one scan — pure scan shape
    "agg_hll_intersection_error_bound",
    # round-10: the reversed-cumulative-frame backfill — MUST stay
    # O(n) per partition (the naive following-frame form is O(n^2))
    "window_ignore_nulls_bfill",
    "join_asof_forward",
    # round-10: user-keyed moments + 1-row broadcasts — scan-bound
    "events_cuped_adjustment",
    # round-10: two cumulative user windows, integer walk — linear
    "events_sprt_decision",
    # round-10: Arrow decode + 16-row bucket broadcast — the aHash shape
    "multimodal_image_dhash",
    # round-11 additions
    "events_nelson_aalen_hazard",
    "corpus_ngram_duplication_rate",
    "text_kneser_ney_bigram",
    "corpus_quality_calibration_ece",
    "sim_reciprocal_nearest_neighbors",
    # round-12 additions: the MG-sketch heavy hitters (python
    # bounded-memory pass + broadcast rescore), the type-table-window
    # tail mass, the checkpointed-kNN label vote, and the island
    # windows — all should ride their one corpus pass linearly
    "corpus_token_tail_mass",
    "corpus_boilerplate_heavy_hitters",
    "sim_label_knn_disagreement",
    "events_interval_union_coverage",
    "corpus_source_unigram_kl",
]

KEY_STRIDE = 1_000_000_000  # far above any fixture key


def materialize(spark, repl: int, out_dir: str) -> None:
    for name in COPY_ONLY:
        df = load_table(spark, SRC, name)
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    for name, keys in OFFSET_KEYS.items():
        df = load_table(spark, SRC, name)
        copies = []
        for i in range(repl):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * KEY_STRIDE).cast("bigint"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def _run_one(spark, qs, name: str, out_dir: str) -> float:
    # min of 2 runs, as in bench.py: first execution at a new scale pays
    # JIT/codegen compilation (observed 19.8 s cold vs 1.6 s warm for the
    # same minhash plan) — the minimum is the plan's actual cost
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        qs[name](spark, out_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    repl = _REPL
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    out_dir = f"/tmp/shss_stress_x{repl}"
    argv = [a for a in sys.argv[3:] if not a.startswith("--")]
    isolate = "--isolate" in sys.argv

    if "--one" in sys.argv:
        # child body for --isolate: fresh JVM, sf0.1 warm-up, one
        # query, one JSON line. The warm-up runs the ORIGINAL sf0.1
        # fixture (not sf0.001): the big generated-code queries need
        # enough loop iterations to trigger C2 compilation before the
        # timed runs, or the record carries a JIT lottery — measured
        # 18 s / 56 s / 111 s on three identical isolate runs of
        # dedup_semantic_cluster with an sf0.001 warm-up.
        name = argv[0]
        spark = get_spark(f"stress-{name}", cpus=cpus)
        qs = queries()
        try:
            qs[name](spark, SRC).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        print(json.dumps({"query": name, "sec": _run_one(spark, qs, name, out_dir)}))
        spark.stop()
        return

    spark = get_spark("stress", cpus=cpus)
    if not os.path.exists(f"{out_dir}/lineitem.parquet"):
        t0 = time.time()
        materialize(spark, repl, out_dir)
        print(f"materialized x{repl} in {time.time() - t0:.1f}s", file=sys.stderr)
    qs = queries()
    # optional query subset: python tools/stress.py REPL CPUS name...
    names = argv or HEADLINE
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    timings: dict[str, float] = {}
    if isolate:
        # ISOLATE MODE (the round-9 default for recorded runs): one
        # subprocess per query. Shared-JVM stress runs contaminate
        # later queries — accumulated localCheckpoint blocks, GC debt
        # and code-cache pressure measured q9_product_profit at 82 s
        # in a shared session vs ~12 s isolated on identical code.
        # Cross-round comparisons are only valid between isolate runs.
        import subprocess

        spark.stop()  # free the 32 threads for the children
        for name in names:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(repl), str(cpus),
                 name, "--one"],
                capture_output=True, text=True, env=os.environ,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            try:
                timings[name] = json.loads(line)["sec"]
            except Exception:
                print(f"isolate child failed for {name}: {proc.stderr[-2000:]}",
                      file=sys.stderr)
                timings[name] = float("nan")
            print(json.dumps({"query": name, "sec": timings[name]}), file=sys.stderr)
    else:
        for name in names:
            timings[name] = _run_one(spark, qs, name, out_dir)
    print(
        json.dumps(
            {
                "metric": "stress_total_wall",
                "value": round(sum(t for t in timings.values() if t == t), 3),
                "unit": "sec",
                "queries": timings,
                "repl": repl,
                "cpus": int(cpus),
                "mode": "isolate" if isolate else "shared",
            }
        )
    )
    if not isolate:
        spark.stop()


if __name__ == "__main__":
    main()
