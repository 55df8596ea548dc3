#!/usr/bin/env python
"""Synthetic skewed-LSH-cell stress for _knn_cell_topk (r14, VERDICT
item 3): ONE bucket holds all N vectors — the near-duplicate-flood
shape a dedup corpus produces. Pre-r14 this densified an (N, N)
float64 gram in a single Arrow task: at the default N=100k that is
80 GB for the gram alone (plus the argsort key copy), impossible on
this 128 GiB box with a JVM resident — the run below succeeding at
all IS the A/B against the unblocked code. The r14 blocked gram
bounds the per-task gram at SHSS_KNN_GRAM_MB (default 256 MB).

Usage: python tools/stress_hot_cell.py [N] [DIM]   (defaults 100000, 16)
Prints one JSON line {"n":..., "dim":..., "edges":..., "sec":...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def main() -> None:
    from pyspark.sql import functions as F

    from spark_hive_streaming_sink_spark.functions.similarity import (
        K_NN_GRAPH,
        _knn_cell_topk,
    )
    from spark_hive_streaming_sink_spark.session import get_spark

    spark = get_spark(
        "hot-cell-stress", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    # deterministic pseudo-random embeddings straight from the id (no
    # driver-side data build): every row lands in the SAME bucket
    dims = [
        (F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(1000)) / 500.0 - 1.0)
        for j in range(DIM)
    ]
    v = (
        spark.range(N)
        .select(
            F.col("id").alias("vec_id"),
            F.array(*dims).alias("embedding"),
        )
        .select(
            "vec_id",
            "embedding",
            F.sqrt(
                F.aggregate(
                    F.transform("embedding", lambda x: x * x),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ).alias("nrm"),
            F.lit("HOT").alias("bucket"),
        )
    )
    spark.sparkContext.setJobDescription(f"hot-cell kNN n={N} dim={DIM}")
    t0 = time.time()
    out = _knn_cell_topk(v, K_NN_GRAPH)
    # count() cannot prune through applyInPandas — the kernel runs in
    # full; one action keeps the one giant cell task from running twice
    n_edges = out.count()
    sec = round(time.time() - t0, 1)
    print(
        json.dumps(
            {
                "n": N,
                "dim": DIM,
                "edges": n_edges,
                "sec": sec,
                "gram_mb_budget": os.environ.get("SHSS_KNN_GRAM_MB", "256"),
                "unblocked_gram_gb": round(N * N * 8 / 2**30, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
