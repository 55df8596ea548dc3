#!/usr/bin/env python
"""End-to-end training-data curation over the fixture corpus.

The LLM-data-pipeline extension composed the way a production run
chains it (each stage is a registered, oracle-checked operator — this
script only sequences them):

    1. data card            — what are we starting from?
    2. exact dedup          — drop byte-identical copies
    3. near-dup delete list — MinHash → LSH bands → connected
                              components → keep component minimum
    4. quality gate         — stopword/length/repetition screen
    5. perplexity filter    — bigram-LM surprisal gate (CCNet-style)
    6. span decontamination — mask eval-set 5-grams, keep the doc
    7. split audit          — hash-routed train/val/test shares
    8. BM25 probe           — retrieval sanity on the survivors

Run: ``python examples/curation_pipeline_example.py [sf_dir]``
(defaults to the sf0.001 fixtures).

At 100 TB the same sequence runs unchanged: every stage is
bucket-local / broadcast / single-shuffle by construction (see each
operator's docstring for its plan shape), and intermediate keep-lists
are id-only relations (anti-join inputs), never copies of the corpus.
"""

from __future__ import annotations

import sys

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from spark_hive_streaming_sink_spark.functions.clustering import (  # noqa: E402
    dedup_lsh_components,
)
from spark_hive_streaming_sink_spark.functions.corpus import (  # noqa: E402
    corpus_data_card,
    corpus_decontam_span_removal,
    corpus_train_split_audit,
)
from spark_hive_streaming_sink_spark.functions.dedup import dedup_exact  # noqa: E402
from spark_hive_streaming_sink_spark.functions.text import (  # noqa: E402
    text_bm25_score,
    text_perplexity_filter_audit,
    text_quality_filter_pipeline,
)
from spark_hive_streaming_sink_spark.io import load_table  # noqa: E402
from spark_hive_streaming_sink_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    print("== 1. data card ==")
    corpus_data_card(spark, sf_dir).show(truncate=False)

    print("== 2. exact dedup ==")
    exact = dedup_exact(spark, sf_dir)
    keep_exact = exact.select(F.col("keeper_doc_id").alias("doc_id"))
    n1 = keep_exact.count()
    print(f"   {n0} docs -> {n1} after exact dedup")

    print("== 3. near-dup delete list (LSH -> components) ==")
    comp = dedup_lsh_components(spark, sf_dir)
    delete = comp.filter("is_duplicate").select(F.col("node").alias("doc_id"))
    survivors = keep_exact.join(delete, "doc_id", "left_anti")
    n2 = survivors.count()
    print(f"   {n1} -> {n2} after near-dup delete list")

    print("== 4. quality gate ==")
    quality = text_quality_filter_pipeline(spark, sf_dir)
    kept = survivors.join(
        quality.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )
    n3 = kept.count()
    print(f"   {n2} -> {n3} after quality gate")

    print("== 5. perplexity filter (audit view) ==")
    text_perplexity_filter_audit(spark, sf_dir).orderBy("source").show(
        truncate=False
    )

    print("== 6. span decontamination ==")
    decon = corpus_decontam_span_removal(spark, sf_dir)
    decon.agg(
        F.count("*").alias("train_docs"),
        F.sum(F.col("contaminated").cast("int")).alias("docs_touched"),
        F.sum("tokens_removed").alias("tokens_masked"),
        F.sum("clean_tokens").alias("tokens_kept"),
    ).show(truncate=False)

    print("== 7. split audit ==")
    corpus_train_split_audit(spark, sf_dir).orderBy("source", "split").show(
        9, truncate=False
    )

    print("== 8. BM25 probe over survivors ==")
    bm25 = text_bm25_score(spark, sf_dir).join(kept, "doc_id", "left_semi")
    bm25.orderBy(F.col("bm25").desc(), "doc_id").show(5, truncate=False)

    print(f"pipeline: {n0} -> {n1} -> {n2} -> {n3} documents")
    spark.stop()


if __name__ == "__main__":
    main()
