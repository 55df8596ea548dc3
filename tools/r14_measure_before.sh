#!/bin/bash
# r14 "measure first" block (guide §1): canonical sf0.1 double run on an
# idle box (VERDICT item 2), then x100 single-query isolates for every
# query this round plans to touch. Run with NOTHING else on the box.
set -u
cd /root/repo
echo "start load: $(cat /proc/loadavg)"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32

python bench.py > tools/bench_r14_run1.json 2> tools/bench_r14_run1.err
cp tools/bench_latest.json tools/bench_r14_run1_full.json
echo "run1 done: $(cat /proc/loadavg)"
python bench.py > tools/bench_r14_run2.json 2> tools/bench_r14_run2.err
cp tools/bench_latest.json tools/bench_r14_run2_full.json
echo "run2 done: $(cat /proc/loadavg)"

# x100 isolates, 2 passes each (min-of-2 inside the child already; the
# outer repeat catches the JVM/page-cache cold tail the r13 ledger saw)
KEYS="dedup_lsh_components dedup_connected_components graph_triangle_count contamination_ngram_overlap text_kneser_ney_bigram corpus_ngram_duplication_rate corpus_quality_calibration_ece dedup_threshold_sweep sim_knn_graph_lsh sim_label_knn_disagreement graph_kcore graph_link_prediction_ra sim_reciprocal_nearest_neighbors graph_label_propagation graph_pagerank_knn dedup_containment_pairs sim_query_expansion_prf sim_ivf_nprobe_recall_curve"
for pass in 1 2; do
  python tools/stress.py 100 32 $KEYS --isolate \
    > tools/stress_x100_r14_before_p$pass.json 2> tools/stress_x100_r14_before_p$pass.err
  echo "x100 pass $pass done: $(cat /proc/loadavg)"
done
echo ALL DONE
