"""Similarity search over embedding columns (SURVEY.md §2C extension):
brute-force cosine top-k (baseline), LSH-bucketed ANN (scale path),
and embedding arithmetic (norms, average pooling).

Dot products are sequential double folds over exact float→double casts
in BOTH engines (bit-identical); ranking uses rounded cosines with a
unique tie-break so the top-k SET is deterministic.

100 TB posture: the brute-force path broadcasts the (small) query set
against the corpus — one scan, no shuffle; the ANN path prunes with
random-hyperplane sign buckets so candidate pairs are bucket-local.
The NumPy/Arrow variant (sim_cosine_topk_numpy) is the wide-query-set
path: matrix-at-a-time BLAS inside mapInPandas instead of per-pair
expression evaluation.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table, materialize_parquet
from ..registry import register

N_QUERIES = 5  # vec_id < 5 are the query vectors

# Two-level top-k fan-out for the PRF retrieval rounds (guide §2.5):
# level 1 ranks within (query_id, pmod(xxhash64(cand_id), CELLS))
# cells, spreading the scored corpus over CELLS*N_QUERIES reduce
# partitions instead of hot-keying it into N_QUERIES; level 2 ranks
# the <= CELLS*10 per-query survivors. 0 disables (single window —
# the pre-r13 shape, for A/B runs). Production: size CELLS so one
# cell's rows fit a task comfortably (~corpus/CELLS per query).
PRF_SALT_CELLS = int(os.environ.get("SHSS_PRF_SALT_CELLS", "64"))
TOP_K = 5
DIM = 64
# Bucket-count knob: cells must scale with corpus size (K ~ sqrt(N)),
# so the stress harness raises it via env; the default is the fixture
# configuration every oracle/gate run uses. Both the Spark plan and the
# generated oracle SQL derive from the same value, so any setting stays
# self-consistent.
N_PLANES = int(os.environ.get("SHSS_N_PLANES", "4"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double (matches DuckDB's
    list_reduce order; init 0.0 + x == x in IEEE)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


# Mirrors Spark's zip_with-then-fold exactly, including the degenerate
# shapes the NULL fuzzer feeds: the series runs over the LONGER of the
# two lists (zip_with pads the shorter side with NULL, so any length
# mismatch poisons the fold to NULL — len(a)-only indexing would return
# a finite dot when a is the shorter side), both-empty folds to the
# 0.0 init (list_reduce ERRORS on an empty list, hence the CASE), and
# a NULL list short-circuits to NULL (greatest(len(a), len(b)) is NULL,
# no CASE arm matches, and the ELSE reduce of a NULL series is NULL).
_SQL_DOT = (
    "CASE WHEN {a} IS NULL OR {b} IS NULL THEN NULL "
    "WHEN greatest(len({a}), len({b})) = 0 THEN 0.0 "
    "ELSE list_reduce(list_transform(generate_series(1, greatest(len({a}), len({b}))), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y) END"
)


def _sql_dot(a: str, b: str) -> str:
    return _SQL_DOT.format(a=a, b=b)


# Squared-L2 with the same degenerate-shape guards as _SQL_DOT (and as
# clustering._SQL_D2): NULL list -> NULL, both-empty -> 0.0 (list_reduce
# ERRORS on an empty list), series over the LONGER list so a length
# mismatch poisons the fold to NULL exactly like Spark's zip_with NULL
# padding. Every IVF-style centroid assignment oracle must use this —
# the raw fold crashes on zero-length vectors and silently computes a
# truncated finite d2 for ragged ones.
_SQL_D2E = (
    "CASE WHEN {v} IS NULL OR {c} IS NULL THEN NULL "
    "WHEN greatest(len({v}), len({c})) = 0 THEN 0.0 "
    "ELSE list_reduce(list_transform(generate_series(1, greatest(len({v}), len({c}))), "
    "i -> ({v}[i]::DOUBLE - {c}[i]::DOUBLE) * ({v}[i]::DOUBLE - {c}[i]::DOUBLE)), "
    "(x, y) -> x + y) END"
)


def _sql_d2(v: str, c: str) -> str:
    return _SQL_D2E.format(v=v, c=c)


def _cents_row(cents_df: DataFrame, cid: str, cvec: str) -> DataFrame:
    """ALL centroids packed into ONE row as an array of (cid, cv)
    structs — the broadcast side of the map-side assignment below.
    The subtree is an Aggregate, so the broadcast stays provably
    bounded (the no-static-broadcast invariant test's rule); sorting
    by cid keeps the packed order deterministic across runs."""
    return cents_df.agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(cid).alias("cid"), F.col(cvec).alias("cv"))
            )
        ).alias("_cents")
    )


def _ranked_cells(
    df: DataFrame,
    cents_df: DataFrame,
    cid: str,
    cvec: str,
    vec: Column,
    cast_vec: bool = True,
    keep_raw: bool = False,
) -> DataFrame:
    """Map-side nearest-centroid RANKING (guide §2.4: remove shuffles
    outright): every prior form of IVF/k-means assignment in this
    engine cross-joined the corpus against K broadcast centroids and
    ran ``row_number() OVER (PARTITION BY vec_id ORDER BY round(d2,6)
    ASC NULLS LAST, cid)`` — a K× replication of the corpus (carrying
    the full embedding array) through a window Exchange. Since vec_id
    is unique in every fixture family (driver, adversarial, fuzzer —
    the same documented assumption dedup_minhash_calibration's
    doc_id-keyed joins rely on), the per-vec_id window over K rows is
    exactly a per-ROW sort over K array elements, which needs no
    exchange at all.

    Adds column ``_rc``: the centroid structs sorted by the window's
    precise key — ``(nn, d, cid)`` where ``nn = (round(d2,6) IS NULL)``
    reproduces ASC NULLS LAST (equal NULL keys fall through to the cid
    tie-break; NaN sorts after finite doubles on both paths — probed
    empirically, same total order as the window), matching the oracle's
    ``ORDER BY round(d2, 6), cid`` under DuckDB's NULLS LAST default.
    ``_rc[i]`` is the window's rn = i+1 row. ``keep_raw`` adds the
    UNROUNDED d2 (``draw``) for consumers that read raw distances of
    specific ranks (silhouette). Rows exist only when the centroid set
    is non-empty — identical to the old crossJoin against an empty
    centroid relation producing no rows."""

    def d2_of(c: Column) -> Column:
        def diff(x: Column, y: Column) -> Column:
            xd = x.cast("double") if cast_vec else x
            return (xd - y) * (xd - y)

        return F.aggregate(
            F.zip_with(vec, c, diff), F.lit(0.0), lambda acc, t: acc + t
        )

    raw = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            d2_of(c.getField("cv")).alias("draw"), c.getField("cid").alias("cid")
        ),
    )

    def key(s: Column) -> Column:
        dr = F.round(s.getField("draw"), 6)
        fields = [
            dr.isNull().cast("int").alias("nn"),
            dr.alias("d"),
            s.getField("cid").alias("cid"),
        ]
        if keep_raw:
            fields.append(s.getField("draw").alias("draw"))
        return F.struct(*fields)

    return (
        df.crossJoin(F.broadcast(_cents_row(cents_df, cid, cvec)))
        .filter(F.size("_cents") > 0)
        .withColumn("_rc", F.array_sort(F.transform(raw, key)))
        .drop("_cents")
    )


def _np_round_half_up(x, decimals: int):
    """Match Spark's round() (BigDecimal HALF_UP) and DuckDB's round()
    (half away from zero) instead of NumPy's round-half-even — they
    differ at exactly-representable decimal-half boundaries (e.g.
    2^-7 = 0.0078125 rounds to 0.007813 in both engines but 0.007812
    under banker's rounding). NaN/inf pass through unchanged."""
    import numpy as np

    p = 10.0**decimals
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
               FROM embeddings),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 round({_sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm), 6) AS cosine
          FROM v q JOIN v c ON c.vec_id != q.vec_id
          WHERE q.vec_id < {N_QUERIES})
    SELECT query_id, cand_id, cosine, rnk FROM (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rnk
      FROM p)
    WHERE rnk <= {TOP_K}
    """,
    tags=("llm", "similarity"),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vectors against
    every candidate, fold the dot product JVM-side (higher-order fns,
    no Python), rank per query. The baseline every ANN variant is
    measured against."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    q = v.filter(F.col("vec_id") < N_QUERIES).limit(N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = F.broadcast(q).join(v, F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        F.round(
            F.try_divide(_dot(F.col("q_emb"), F.col("embedding")), F.col("q_nrm") * F.col("nrm")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "cand_id")
    return pairs.select(
        "query_id", "cand_id", "cosine", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= TOP_K)


@register(
    "sim_cosine_topk_numpy",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
               -- NULL embeddings can't be scored (np.stack would also
               -- reject them): excluded as query AND candidate, both engines
               FROM embeddings WHERE embedding IS NOT NULL),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 round({_sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm), 4) AS cosine
          FROM v q JOIN v c ON c.vec_id != q.vec_id
          WHERE q.vec_id < {N_QUERIES})
    SELECT query_id, cand_id, cosine, rnk FROM (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rnk
      FROM p)
    WHERE rnk <= {TOP_K}
    """,
    tags=("llm", "similarity", "pandas_udf"),
)
def sim_cosine_topk_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized cosine top-k — the scale path for wide query
    sets: queries are collected to a (Q×D) NumPy matrix broadcast in
    the closure; each Arrow batch of candidates does one (B×D)·(D×Q)
    BLAS matmul inside mapInPandas. Rounded to 4 decimals (NumPy's
    pairwise summation vs the oracle's sequential fold differ at ~1e-15)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()  # mirrors the oracle's v CTE guard
    )
    qrows = sorted(
        emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )

    def _pad(vecs, width):
        # zero-pad to a common width: zero terms add nothing to a dot or
        # a norm, so equal-length pairs are unaffected; LENGTH-MISMATCHED
        # pairs are masked to NULL afterwards (the fold semantics: zip_with
        # pads with NULL and poisons the whole sum). NULL elements arrive
        # as NaN and poison the dot to NaN, which Arrow's NaN-is-null
        # convention returns as SQL NULL — same verdict as the JVM fold.
        m = np.zeros((len(vecs), width), dtype=np.float64)
        lens = np.empty(len(vecs), dtype=np.int64)
        for i, v in enumerate(vecs):
            a = np.asarray(
                [x if x is not None else np.nan for x in v], dtype=np.float64
            )
            lens[i] = len(a)
            m[i, : len(a)] = a
        return m, lens

    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_vecs = [r["embedding"] for r in qrows]
    q_width = max((len(v) for v in q_vecs), default=0)

    def score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf) or not len(q_ids):
                continue
            c_vecs = pdf["embedding"].to_numpy()
            width = max(q_width, max((len(v) for v in c_vecs), default=0), 1)
            c_mat, c_len = _pad(c_vecs, width)
            q_mat, q_len = _pad(q_vecs, width)
            c_nrm = np.sqrt((c_mat * c_mat).sum(axis=1))
            q_nrm = np.sqrt((q_mat * q_mat).sum(axis=1))
            denom = np.outer(c_nrm, q_nrm)  # (B × Q)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (c_mat @ q_mat.T) / denom
            # NULL verdicts, matching the JVM fold + try_divide exactly:
            # ragged pair (NULL-padded zip poisons the fold) and zero
            # denominator (x/0 is NULL in both engines) -> NaN -> Arrow
            # nulls them out
            cos[c_len[:, None] != q_len[None, :]] = np.nan
            cos[denom == 0] = np.nan
            b = len(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids[None, :], b, axis=0).ravel(),
                    "cand_id": np.repeat(pdf["vec_id"].to_numpy(), len(q_ids)),
                    "cosine": _np_round_half_up(cos.ravel(), 4),
                }
            )

    pairs = emb.select("vec_id", "embedding").mapInPandas(
        score, "query_id long, cand_id long, cosine double"
    ).filter(F.col("cand_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "cand_id")
    return pairs.select(
        "query_id", "cand_id", "cosine", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= TOP_K)


def _plane(h: int, dim: int = 256) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 (shared constant
    between the Spark plan and the generated oracle SQL). Generated at
    256 coords — beyond any fixture dimension — and truncated to the
    data's dimension at use (slice / generate_series(1, len(emb))), so
    the bucketing never bakes in an embedding width."""
    return [
        int(hashlib.md5(f"p{h}_{i}".encode()).hexdigest()[0], 16) - 7.5
        for i in range(dim)
    ]


_PLANES = [_plane(h) for h in range(N_PLANES)]


def _sql_plane_dot(emb: str, plane: list[float]) -> str:
    # empty-vector guard: a 0-length slice gives a 0-length dot input;
    # Spark's fold over an empty embedding returns the 0.0 init (bucket
    # '0000'). >256 dims: Spark's F.get past the literal's end yields
    # NULL and poisons the fold — mirrored by the explicit NULL arm
    # (a slice would cap at 256 and raise a length-mismatch error).
    #
    # r10 rewrite: the previous fold kept the 256-element literal
    # INSIDE the lambda (`(lits::DOUBLE[])[i]`), which DuckDB
    # re-constructs per element — 5.0 s for 500 rows at sf0.01,
    # multiplied by every CTE reference. One slice per row +
    # list_dot_product is 0.027 s for the same input (185×) and
    # value-identical on every fixture incl. adv-d48/d96 (the per-term
    # products are exact half-integer × f32 doubles, so summation
    # order cannot flip a sign at the > 0 test).
    # NULL elements: Spark's fold turns any NULL component into a NULL
    # dot (NULL product poisons the sum); list_dot_product ERRORS on
    # NULL elements instead, so they get their own NULL arm (fuzzer
    # counterexample: embedding [NULL, NULL]).
    lits = "[" + ", ".join(str(c) for c in plane) + "]"
    return (
        f"CASE WHEN len({emb}) = 0 THEN 0.0 "
        f"WHEN len({emb}) > 256 THEN CAST(NULL AS DOUBLE) "
        f"WHEN len(list_filter({emb}, x -> x IS NULL)) > 0 "
        f"THEN CAST(NULL AS DOUBLE) "
        f"ELSE list_dot_product(CAST({emb} AS DOUBLE[]), "
        f"({lits}::DOUBLE[])[:len({emb})]) END"
    )


def _spark_bucket(emb: Column) -> Column:
    chars = []
    for plane in _PLANES:
        # index the plane at the DATA's dimension via a two-arg transform
        # over the embedding: zip_with against the full 256-wide plane
        # would pad the shorter side with NULL (every 48-dim vector lands
        # in bucket '0000'), and slicing the plane per row allocates a
        # fresh array per plane per row (measured 2.2x on sim_ann_lsh at
        # the ×10 stress scale). F.get on the constant-folded literal is
        # a plain O(1) access — and returns NULL (not an ANSI error) past
        # 256 dims, matching the oracle's lits[i] lookup.
        lit_arr = F.array(*[F.lit(c) for c in plane])
        d = F.aggregate(
            F.transform(emb, lambda x, i: x.cast("double") * F.get(lit_arr, i)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        chars.append(F.when(d > 0, "1").otherwise("0"))
    return F.concat(*chars)


def _sql_bucket(emb: str) -> str:
    parts = [
        f"(CASE WHEN {_sql_plane_dot(emb, p)} > 0 THEN '1' ELSE '0' END)"
        for p in _PLANES
    ]
    return " || ".join(parts)


@register(
    "sim_ann_lsh",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm,
                      {_sql_bucket('embedding')} AS bucket
               -- NULL embeddings can't be bucketed or scored: excluded
               -- identically in both engines
               FROM embeddings WHERE embedding IS NOT NULL),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.bucket,
                 round({_sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm), 6) AS cosine
          FROM v q JOIN v c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
          WHERE q.vec_id < {N_QUERIES})
    SELECT query_id, cand_id, bucket, cosine, rnk FROM (
      SELECT query_id, cand_id, bucket, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rnk
      FROM p)
    WHERE rnk <= 3
    """,
    tags=("llm", "similarity", "ann"),
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH: 4 sign bits bucket the
    corpus into ≤16 cells; candidates are only scored within the
    query's bucket (≈16× pruning here; bands/probes tune recall at
    scale). Exact cosine re-ranking inside the bucket."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).limit(N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket"),
    )
    pairs = F.broadcast(q).join(
        v.withColumnRenamed("bucket", "c_bucket"),
        (F.col("bucket") == F.col("c_bucket")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        "bucket",
        F.round(
            F.try_divide(_dot(F.col("q_emb"), F.col("embedding")), F.col("q_nrm") * F.col("nrm")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "cand_id")
    return pairs.select(
        "query_id", "cand_id", "bucket", "cosine", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= 3)


@register(
    "embed_norm_stats",
    oracle=f"""
    WITH n AS (SELECT vec_id, label,
                      round(sqrt({_sql_dot('embedding', 'embedding')}), 6) AS l2
               FROM embeddings)
    SELECT label, COUNT(*) AS n_vecs,
           CAST(SUM(CAST(l2 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_norm,
           MIN(l2) AS min_norm, MAX(l2) AS max_norm
    FROM n GROUP BY label
    """,
    tags=("llm", "similarity", "embedding"),
)
def embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms per vector (higher-order fold) + per-label stats; the
    group average goes through rounded-decimal sums so it is
    merge-order independent."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.select(
        "vec_id", "label", F.round(_norm(F.col("embedding")), 6).alias("l2")
    )
    return n.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        (F.sum(F.col("l2").cast("decimal(18,6)")).cast("double") / F.count("*")).alias(
            "avg_norm"
        ),
        F.min("l2").alias("min_norm"),
        F.max("l2").alias("max_norm"),
    )


@register(
    "embed_avg_pool",
    oracle="""
    -- dim-agnostic: i ranges over each row's OWN length (a fixed series
    -- capped the pool at 64 dims and dropped the tail of wider vectors)
    SELECT label, i AS dim,
           CAST(SUM(CAST(round(embedding[i]::DOUBLE, 6) AS DECIMAL(12,6))) AS DOUBLE)
             / COUNT(*) AS pooled,
           COUNT(*) AS n
    FROM (SELECT label, embedding,
                 unnest(generate_series(1, len(embedding))) AS i
          FROM embeddings)
    GROUP BY label, i
    """,
    tags=("llm", "similarity", "embedding"),
)
def embed_avg_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average pooling per label and dimension (centroids): posexplode →
    exact decimal sums of rounded components → order-independent means.
    This is the centroid step of IVF index construction."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(
            (
                F.sum(F.round(F.col("val").cast("double"), 6).cast("decimal(12,6)")).cast(
                    "double"
                )
                / F.count("*")
            ).alias("pooled"),
            F.count("*").alias("n"),
        )
    )


_SQL_CENTROIDS = """
    dims AS (SELECT label, i AS dim,
               CAST(SUM(CAST(round(embedding[i]::DOUBLE, 6) AS DECIMAL(12,6))) AS DOUBLE)
                 / COUNT(*) AS cv
             -- i from each row's own len(): no hardcoded dimension.
             -- NULL label is NOT a cell: a NULL cell id can never
             -- equi-join, and the cl tiebreak orders NULLs
             -- differently across engines (Spark ASC NULLS FIRST,
             -- DuckDB NULLS LAST) — fuzzer-found divergence.
             FROM (SELECT label, embedding,
                          unnest(generate_series(1, len(embedding))) AS i
                   FROM embeddings
                   WHERE label IS NOT NULL)
             GROUP BY label, i),
    cents AS (SELECT label, list(cv ORDER BY dim) AS cvec FROM dims GROUP BY label)
"""


@register(
    "sim_ivf_topk",
    oracle=f"""
    WITH {_SQL_CENTROIDS},
    pairs AS (SELECT e.vec_id, e.embedding, c.label AS cl,
                     {_sql_d2('e.embedding', 'c.cvec')} AS d2
              FROM embeddings e CROSS JOIN cents c),
    assign AS (SELECT vec_id, embedding, cl AS cell,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY round(d2, 6), cl) AS rn
               FROM pairs),
    v AS (SELECT vec_id, embedding, cell,
                 sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
          FROM assign WHERE rn = 1),
    scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.cell,
                      round({_sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm), 6) AS cosine
               FROM v q JOIN v c ON q.cell = c.cell AND c.vec_id != q.vec_id
               WHERE q.vec_id < {N_QUERIES})
    SELECT query_id, cand_id, cell, cosine, rnk FROM (
      SELECT query_id, cand_id, cell, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rnk
      FROM scored)
    WHERE rnk <= 3
    """,
    tags=("llm", "similarity", "ann", "ivf"),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: build centroids (per-label average pooling =
    k-means-like cells with deterministic seeds), assign every vector
    to its nearest centroid, then search only the query's cell.

    The 100 TB shape: centroid build is one pass + tiny shuffle;
    assignment is a broadcast of K centroids against the corpus
    (map-side argmin, no shuffle); search cost drops by ~K×. Exact
    cosine re-rank inside the cell."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    # centroids: exact decimal means per (label, dim) → dense array.
    # NULL label is not a cell (can't equi-join; cl-tiebreak NULL
    # ordering differs across engines) — excluded in both engines.
    cents = (
        emb.filter(F.col("label").isNotNull())
        .select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(
            (
                F.sum(F.round(F.col("val").cast("double"), 6).cast("decimal(12,6)")).cast(
                    "double"
                )
                / F.count("*")
            ).alias("cv")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))), lambda s: s["cv"]
            ).alias("cvec")
        )
    )
    # assignment: nearest centroid by squared L2 — map-side ranking
    # over the one-row broadcast centroid array (r13: replaces the
    # K×-corpus crossJoin + per-vec_id row_number window, which
    # shuffled every embedding K times through a window Exchange;
    # identical (round(d2,6) NULLS LAST, cid) order — see _ranked_cells)
    assign = _ranked_cells(
        emb, cents, "label", "cvec", F.col("embedding")
    ).select(
        "vec_id", "embedding", F.get("_rc", 0).getField("cid").alias("cell")
    )
    v = assign.select(
        "vec_id", "embedding", "cell", _norm(F.col("embedding")).alias("nrm")
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).limit(N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("cell"),
    )
    scored = F.broadcast(q).join(
        v.withColumnRenamed("cell", "c_cell"),
        (F.col("cell") == F.col("c_cell")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        "cell",
        F.round(
            F.try_divide(_dot(F.col("q_emb"), F.col("embedding")), F.col("q_nrm") * F.col("nrm")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "cand_id")
    return scored.select(
        "query_id", "cand_id", "cell", "cosine", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= 3)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm,
                      {_sql_bucket('embedding')} AS bucket
               -- NULL embeddings can't be bucketed or scored: excluded
               -- identically in both engines
               FROM embeddings WHERE embedding IS NOT NULL)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
           round({_sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) AS cosine
    FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round({_sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) >= 0.3
    """,
    tags=("llm", "dedup", "similarity"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection: LSH sign buckets
    prune candidate pairs, exact cosine ≥ 0.3 confirms — the
    semantic-dedup analogue of MinHash→Jaccard (candidates bucket-local,
    never all-pairs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
    )
    a = v.alias("a")
    b = v.alias("b")
    cosine = F.round(
        F.try_divide(
            _dot(F.col("a.embedding"), F.col("b.embedding")),
            F.col("a.nrm") * F.col("b.nrm"),
        ),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.bucket").alias("bucket"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.3)
    )


@register(
    "embed_quantize_int8",
    oracle="""
    WITH s AS (
      SELECT vec_id, label, embedding,
             list_max(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      FROM embeddings),
    q AS (
      SELECT vec_id, label, scale,
             list_transform(embedding,
                            x -> CAST(ROUND(CAST(x AS DOUBLE) / scale, 0) AS BIGINT))
               AS codes
      FROM s WHERE scale > 0)
    SELECT vec_id, label,
           round(scale, 9) AS qscale,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           CAST(list_min(codes) AS BIGINT) AS code_min,
           CAST(list_max(codes) AS BIGINT) AS code_max,
           len(codes) AS dim
    FROM q
    """,
    tags=("llm", "embedding", "quantize"),
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of embedding vectors (absmax / 127
    scaling — the storage layout vector stores and training pipelines
    ship): per-vector scale from the absolute max, codes as rounded
    ratios, summarized by exact integer stats (sum/min/max/dim) so the
    driver hash stays integer-exact; the scale itself is rounded to 9
    decimals in both engines. All higher-order built-ins — 4 bytes →
    1 byte per dimension at 100 TB means 4× less scan I/O for ANN
    prefilters."""
    e = load_table(spark, sf_dir, "embeddings")
    absmax = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    s = e.select(
        "vec_id", "label", "embedding", (absmax / 127.0).alias("scale")
    ).filter(F.col("scale") > 0)
    codes = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") / F.col("scale"), 0).cast("bigint"),
    )
    q = s.select("vec_id", "label", "scale", codes.alias("codes"))
    return q.select(
        "vec_id",
        "label",
        F.round("scale", 9).alias("qscale"),
        F.aggregate(
            "codes", F.lit(0).cast("bigint"), lambda a, b: a + b
        ).alias("code_sum"),
        F.array_min("codes").alias("code_min"),
        F.array_max("codes").alias("code_max"),
        F.size("codes").cast("bigint").alias("dim"),
    )


N_MAXSIM_Q = 40  # query-token vectors (label 0, first 40 by vec_id)


@register(
    "sim_maxsim_multivector",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
               FROM embeddings),
    q AS (SELECT * FROM v WHERE label = 0 ORDER BY vec_id LIMIT {N_MAXSIM_Q}),
    d AS (SELECT * FROM v WHERE label != 0),
    pair AS (
      SELECT q.vec_id AS q_id, d.label AS doc,
             round({_sql_dot('q.embedding', 'd.embedding')} / (q.nrm * d.nrm), 6)
               AS cosine
      FROM q CROSS JOIN d),
    best AS (
      SELECT q_id, doc, MAX(cosine) AS best_cos
      FROM pair GROUP BY q_id, doc)
    SELECT doc,
           COUNT(*) AS n_terms,
           CAST(SUM(CAST(best_cos AS DECIMAL(12,6))) AS DOUBLE) AS maxsim
    FROM best GROUP BY doc
    """,
    tags=("llm", "similarity", "retrieval"),
)
def sim_maxsim_multivector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaxSim late-interaction scoring (ColBERT-style retrieval): the
    query is a BAG of vectors (label 0's first 40, standing in for
    query-token embeddings), each candidate document is the bag of its
    label's vectors, and score(doc) = Σ_q max_v cos(q, v) — every query
    token matches its best document token, then the matches sum.
    Per-pair cosines are rounded before max; the final sum rides exact
    decimals, so the two-level reduction is order-independent.

    Scale: the query bag is a LIMIT-bounded broadcast (a real system
    broadcasts the query's ~32 token vectors); candidates stream
    through one (q_id, doc)-keyed aggregate — cost is |Q|·|corpus|
    map-side flops, the same envelope as single-vector search ×|Q|,
    and the standard pre-filter (ANN on pooled vectors, then MaxSim
    re-rank on the shortlist — cf. sim_ann_lsh) drops |corpus| to the
    shortlist size."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", "label", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    q = (
        v.filter(F.col("label") == 0)
        .orderBy("vec_id")
        .limit(N_MAXSIM_Q)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
    )
    d = v.filter(F.col("label") != 0)
    pair = d.crossJoin(F.broadcast(q)).select(
        "q_id",
        F.col("label").alias("doc"),
        F.round(
            F.try_divide(_dot(F.col("q_emb"), F.col("embedding")), F.col("q_nrm") * F.col("nrm")),
            6,
        ).alias("cosine"),
    )
    best = pair.groupBy("q_id", "doc").agg(F.max("cosine").alias("best_cos"))
    return best.groupBy("doc").agg(
        F.count("*").alias("n_terms"),
        F.sum(F.col("best_cos").cast("decimal(12,6)")).cast("double").alias("maxsim"),
    )


TRUNC_DIM = 16  # matryoshka prefix length


@register(
    "embed_matryoshka_truncate",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, label, embedding, embedding[1:{TRUNC_DIM}] AS trunc
      FROM embeddings)
    SELECT vec_id, label,
           {TRUNC_DIM} AS trunc_dim,
           round(sqrt({_sql_dot('embedding', 'embedding')}), 6) AS full_norm,
           round(sqrt({_sql_dot('trunc', 'trunc')}), 6) AS trunc_norm,
           round(sqrt({_sql_dot('trunc', 'trunc')})
                 / sqrt({_sql_dot('embedding', 'embedding')}), 6) AS energy_ratio
    FROM s
    WHERE sqrt({_sql_dot('embedding', 'embedding')}) > 0
    """,
    tags=("llm", "embedding", "matryoshka"),
)
def embed_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) truncation audit: slice each embedding to its
    first TRUNC_DIM dimensions and report full norm, truncated norm,
    and the retained-energy ratio — the check run before serving
    truncated vectors from an MRL-trained model (how much of the norm
    survives the cut decides the serve-time dimension).

    Map-side only — no shuffle, no UDF: slice + the same sequential
    double folds both engines evaluate identically (sqrt and divide on
    bit-identical doubles; rounded to 6 dp like every similarity op).
    At 100 TB this runs as a pure scan-projection at parquet speed."""
    emb = load_table(spark, sf_dir, "embeddings")
    trunc = F.slice(F.col("embedding"), 1, TRUNC_DIM)
    full_nrm = _norm(F.col("embedding"))
    trunc_nrm = _norm(trunc)
    return (
        emb.filter(full_nrm > 0)
        .select(
            "vec_id",
            "label",
            F.lit(TRUNC_DIM).alias("trunc_dim"),
            F.round(full_nrm, 6).alias("full_norm"),
            F.round(trunc_nrm, 6).alias("trunc_norm"),
            F.round(trunc_nrm / full_nrm, 6).alias("energy_ratio"),
        )
    )


K_NN_GRAPH = 3  # neighbors kept per node


def _cell_gram_topk(pdf, k: int, gram_budget: int):
    """Shared per-cell gram + top-k machinery of the kNN kernels
    (extracted verbatim from _knn_cell_topk in r14 so the edge kernels
    below reuse the identical — oracle-pinned — computation).

    Requires len(pdf) >= 2. Returns (pdf_sorted, ids, order, cosk, kk):
    pdf sorted by vec_id, the int64 id vector, the (n, kk) top-k
    neighbor POSITION matrix (cosine DESC, vec_id ASC tie-break, NaN
    cosines last, self excluded) and the matching rounded-cosine
    matrix (NaN where the pair's cosine is SQL NULL)."""
    import numpy as np

    n = len(pdf)
    pdf = pdf.sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    vecs = pdf["embedding"].to_numpy()
    lens = np.fromiter((len(a) for a in vecs), dtype=np.int64, count=n)
    width = max(int(lens.max()), 1)
    V = np.zeros((n, width), dtype=np.float64)
    for i, a in enumerate(vecs):
        # np.asarray maps None components to NaN in a float array
        V[i, : lens[i]] = np.asarray(a, dtype=np.float64)
    nrm = pdf["nrm"].to_numpy().astype(np.float64)
    kk = min(k, n - 1)
    # gram in row blocks (r14): bound per-task memory at
    # SHSS_KNN_GRAM_MB for the skewed-cell case; one full-cell
    # block (the identical single dgemm) whenever it fits
    blk = (
        n if n * n * 8 <= gram_budget else max(1, gram_budget // (8 * n))
    )
    order = np.empty((n, kk), dtype=np.int64)
    cosk = np.empty((n, kk), dtype=np.float64)
    for s0 in range(0, n, blk):
        s1 = min(s0 + blk, n)
        denom = np.outer(nrm[s0:s1], nrm)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = (V[s0:s1] @ V.T) / denom
        # ragged pair -> NULL; zero norm -> NULL (try_divide)
        cos[lens[s0:s1, None] != lens[None, :]] = np.nan
        cos[denom == 0] = np.nan
        cos = _np_round_half_up(cos, 6)
        # sentinels: real cosines are >= -1, so NaN (NULL, ranks
        # last) maps below them and self below NaN — the old loop
        # excluded self and appended NULLs last; ids ascending +
        # stable sort gives the neighbor_id tie-break for free
        key = np.where(np.isnan(cos), -2.0, cos)
        key[np.arange(s1 - s0), np.arange(s0, s1)] = -3.0  # self
        o = np.argsort(-key, axis=1, kind="stable")[:, :kk]
        order[s0:s1] = o
        cosk[s0:s1] = np.take_along_axis(cos, o, axis=1)
    return pdf, ids, order, cosk, kk


def _knn_cell_topk(
    v: DataFrame, k: int, extra: tuple = (), deg: bool = False
) -> DataFrame:
    """Per-cell k-NN: one Arrow/BLAS gram matrix per LSH bucket
    (applyInPandas over the bucket key) with the top-k selection done
    INSIDE the group — replaces the bucket self-join + per-pair
    zip_with fold + corpus-wide row_number window. Catalyst's
    higher-order functions are not codegen'd, so the fold dominated
    at scale (sim_knn_graph_lsh measured 24.5 s at the x100 stress
    point in round 7); the gram path also never shuffles the full
    pair list — only N*k result rows leave the cells.

    Verdict parity with the fold+window formulation (oracle unchanged):
    the float64 matmul differs from the sequential fold only by
    summation order (~1e-13 relative, six orders inside the
    round(cos, 6) quantum); rounding is half-up to match both engines;
    a zero norm or NULL component poisons the pair's cosine to NaN,
    which Arrow returns as SQL NULL — the same NULL verdict try_divide
    and the NULL-padded zip give — and NULL cosines rank last with the
    neighbor-id tie-break, like both engines' DESC NULLS LAST.
    Length-mismatched (ragged) pairs are masked to NULL, mirroring
    zip_with's NULL padding. NaN-valued embedding COMPONENTS are out
    of scope for this Arrow path (NaN would rank first JVM-side but
    becomes NULL through Arrow); no fixture or fuzzer produces NaN.

    Top-k selection (r13): ONE stable argsort of the full (n, n) key
    matrix per cell instead of a Python loop of n per-row lexsorts
    (identical order, C-batched). Rows arrive sorted by vec_id, so a
    STABLE sort on descending key alone reproduces the (cosine DESC,
    neighbor_id ASC) tie-break; sentinel keys put NaN cosines below
    every real cosine (>= -1) and self below NaN, exactly the old
    exclude-self + DESC NULLS LAST order. Every row keeps
    min(k, n-1) neighbors — the same count the loop produced.

    Hot-cell memory bound (r14, guide §2.5): the gram matrix is
    computed in ROW BLOCKS of at most SHSS_KNN_GRAM_MB (default 256)
    megabytes each — a skewed LSH cell (a near-duplicate flood hashing
    to one bucket, exactly what a dedup corpus produces) previously
    densified an (n, n) float64 gram in a single Arrow task: O(n^2)
    bytes, 80 GB at n=100k. Each block is (rows_per_block, n); per-row
    top-k needs only that row's full cosine row, so blocking changes
    NOTHING about the selection — when the whole gram fits the budget
    the block is the whole cell and the computation is the identical
    single dgemm as before (fixture cells always fit: the oracle path
    is bit-for-bit untouched). The remaining per-task footprint is the
    O(n*dim) padded matrix + the Arrow group itself, inherent to
    applyInPandas (the group always materializes); the quadratic term
    is gone.

    ``extra`` names additional input columns (e.g. ``label``) to carry
    through CELL-LOCALLY for both endpoints: the output then also has
    ``node_<c>`` / ``neighbor_<c>`` per extra column ``<c>``, plus
    ``n_nbrs`` (the node's kept-edge count == its kNN out-degree).
    Equivalent to joining the edge list back against the input on
    node_id / neighbor_id (vec_id is unique — the engine-wide fixture
    assumption) — but with zero joins and zero extra shuffles: both
    endpoints of every edge live in the same cell by construction
    (guide §2.4).

    Input: (vec_id, embedding, nrm, bucket [, *extra]). Output:
    (node_id, neighbor_id, bucket, cosine, rnk [, n_nbrs,
    node_*/neighbor_* extras]) with rnk <= k."""
    import numpy as np
    import pandas as pd

    # captured driver-side so executors need no env propagation
    gram_budget = int(os.environ.get("SHSS_KNN_GRAM_MB", "256")) << 20
    in_fields = dict(zip(v.columns, v.schema))
    with_deg = deg or bool(extra)
    extra_schema = (", n_nbrs long" if with_deg else "") + "".join(
        f", node_{c} {in_fields[c].dataType.simpleString()}"
        f", neighbor_{c} {in_fields[c].dataType.simpleString()}"
        for c in extra
    )

    def cell_topk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2:
            out = {
                "node_id": np.array([], dtype=np.int64),
                "neighbor_id": np.array([], dtype=np.int64),
                "bucket": np.array([], dtype=object),
                "cosine": np.array([], dtype=np.float64),
                "rnk": np.array([], dtype=np.int64),
            }
            if with_deg:
                out["n_nbrs"] = np.array([], dtype=np.int64)
            for c in extra:
                out[f"node_{c}"] = np.array([], dtype=object)
                out[f"neighbor_{c}"] = np.array([], dtype=object)
            return pd.DataFrame(out)
        pdf, ids, order, cosk, kk = _cell_gram_topk(pdf, k, gram_budget)
        out = {
            "node_id": np.repeat(ids, kk),
            "neighbor_id": ids[order].ravel(),
            "bucket": pdf["bucket"].iloc[0],
            "cosine": cosk.ravel(),
            "rnk": np.tile(np.arange(1, kk + 1, dtype=np.int64), n),
        }
        if with_deg:
            out["n_nbrs"] = np.full(n * kk, kk, dtype=np.int64)
        for c in extra:
            # NULLs arrive as NaN in a float64 series (Arrow ->
            # pandas); route through object-dtype None so the
            # declared integer output type round-trips them as SQL
            # NULL instead of tripping an integer-NA cast
            s = pdf[c].reset_index(drop=True)
            vals = s.astype(object).where(s.notna(), None).to_numpy(
                dtype=object
            )
            out[f"node_{c}"] = np.repeat(vals, kk)
            out[f"neighbor_{c}"] = vals[order].ravel()
        return pd.DataFrame(out)

    return v.groupBy("bucket").applyInPandas(
        cell_topk,
        "node_id long, neighbor_id long, bucket string, cosine double,"
        " rnk long" + extra_schema,
    )


def _knn_cell_edges(v: DataFrame, k: int, mutual: bool = False) -> DataFrame:
    """Cell-local UNDIRECTED kNN edge list (r14, guide §2.4): the same
    per-cell gram + top-k as _knn_cell_topk, but the undirected
    dedup — and, with ``mutual=True``, the reciprocity test — run
    INSIDE the cell instead of as a corpus-wide shuffle afterwards.

    Every vector hashes to exactly ONE bucket, so an unordered pair
    can only ever co-occur in the single cell both endpoints share:
    the cell-local np.unique over canonical (min, max) id pairs IS the
    corpus-wide ``select(least, greatest).distinct()`` (triangle
    count's former full-edge Exchange), and the cell-local
    both-directions membership test IS the reversed-key self-join
    (kcore's mutual filter, reciprocal-kNN's only join). Only the
    deduped pairs leave the cell.

    mutual=False → (a, b) with a < b: each unordered kNN edge exactly
    once. mutual=True → (src, dst, rank_fwd, rank_rev, cosine) with
    src < dst: pairs where BOTH endpoints rank each other in their
    top-k, with both ranks and the forward pair cosine (NaN → SQL
    NULL, same as _knn_cell_topk's cosine column).

    Memory: O(n·k) on top of the shared blocked gram — no quadratic
    term (the reciprocity lookup is sort + searchsorted over the n·k
    edge keys, not an (n, n) adjacency)."""
    import numpy as np
    import pandas as pd

    gram_budget = int(os.environ.get("SHSS_KNN_GRAM_MB", "256")) << 20

    def cell_edges(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2:
            if mutual:
                return pd.DataFrame(
                    {
                        "src": np.array([], dtype=np.int64),
                        "dst": np.array([], dtype=np.int64),
                        "rank_fwd": np.array([], dtype=np.int64),
                        "rank_rev": np.array([], dtype=np.int64),
                        "cosine": np.array([], dtype=np.float64),
                    }
                )
            return pd.DataFrame(
                {
                    "a": np.array([], dtype=np.int64),
                    "b": np.array([], dtype=np.int64),
                }
            )
        pdf, ids, order, cosk, kk = _cell_gram_topk(pdf, k, gram_budget)
        src_i = np.repeat(np.arange(n, dtype=np.int64), kk)
        dst_i = order.ravel()
        if not mutual:
            lo = np.minimum(src_i, dst_i)
            hi = np.maximum(src_i, dst_i)
            uk = np.unique(lo * n + hi)  # n*n fits int64 for any real n
            return pd.DataFrame({"a": ids[uk // n], "b": ids[uk % n]})
        # reciprocity: an edge key (u, v) is mutual iff (v, u) is also
        # an edge key. Keys are unique (per-row top-k indices are
        # distinct), so sorted-key searchsorted is an exact lookup and
        # also yields the reverse edge's row — its rank_rev.
        key = src_i * n + dst_i
        rkey = dst_i * n + src_i
        sorter = np.argsort(key)
        skey = key[sorter]
        pos = np.searchsorted(skey, rkey)
        pos_c = np.minimum(pos, len(skey) - 1)
        found = skey[pos_c] == rkey
        keep = found & (src_i < dst_i)  # canonical: each pair once
        rnk = np.tile(np.arange(1, kk + 1, dtype=np.int64), n)
        rev_row = sorter[pos_c[keep]]
        return pd.DataFrame(
            {
                "src": ids[src_i[keep]],
                "dst": ids[dst_i[keep]],
                "rank_fwd": rnk[keep],
                "rank_rev": rnk[rev_row],
                "cosine": cosk.ravel()[keep],
            }
        )

    schema = (
        "src long, dst long, rank_fwd long, rank_rev long, cosine double"
        if mutual
        else "a long, b long"
    )
    return v.groupBy("bucket").applyInPandas(cell_edges, schema)


def _knn_cell_label_votes(v: DataFrame, k: int) -> DataFrame:
    """Cell-local per-node neighbor-label vote summary (r14, guide
    §2.4): the same per-cell gram + top-k as _knn_cell_topk, with the
    WHOLE vote pipeline — neighbor-label counts, the (votes DESC,
    label ASC) majority pick and the disagreement count — folded
    inside the cell. A node's k nearest neighbors all live in its own
    LSH cell, so the corpus-wide groupBy(node, label) Exchange, the
    per-node row_number window and the node-keyed joins these votes
    used to feed (sim_label_knn_disagreement, graph_label_propagation)
    are cell-local facts.

    Output: one row PER INPUT NODE — including nodes in singleton
    cells, which have zero neighbors and NULL majority (callers that
    only want edge-bearing nodes filter ``n_nbrs > 0``):
      (node_id, own_label, n_nbrs, n_labeled_nbrs, n_disagree,
       majority_label, majority_votes)
    n_nbrs is the kept-edge count (min(k, n-1)); votes count only
    non-NULL neighbor labels; n_disagree counts labeled neighbors
    whose label differs from own (NULL own → every labeled neighbor
    disagrees); majority is the most-voted neighbor label, ties to the
    SMALLEST label, NULL (with NULL votes) when no neighbor is
    labeled. Label values round-trip exactly like _knn_cell_topk's
    ``extra`` passthrough (object dtype, None for SQL NULL).
    Memory: O(n·k) past the blocked gram (the vote table is an
    np.unique over the n·k edge keys, never an (n, n) or
    (n, |labels|) densification)."""
    import numpy as np
    import pandas as pd

    gram_budget = int(os.environ.get("SHSS_KNN_GRAM_MB", "256")) << 20
    lbl_t = dict(zip(v.columns, v.schema))["label"].dataType.simpleString()

    def cell_votes(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2:
            s = pdf["label"]
            own = s.astype(object).where(s.notna(), None).to_numpy(dtype=object)
            z = np.zeros(n, dtype=np.int64)
            return pd.DataFrame(
                {
                    "node_id": pdf["vec_id"].to_numpy(),
                    "own_label": own,
                    "n_nbrs": z,
                    "n_labeled_nbrs": z,
                    "n_disagree": z,
                    "majority_label": np.full(n, None, dtype=object),
                    "majority_votes": np.full(n, None, dtype=object),
                }
            )
        pdf, ids, order, _cosk, kk = _cell_gram_topk(pdf, k, gram_budget)
        s = pdf["label"].reset_index(drop=True)
        own_vals = s.astype(object).where(s.notna(), None).to_numpy(dtype=object)
        codes, uniques = pd.factorize(s, sort=True)  # -1 == NULL label
        uniq_vals = pd.Series(uniques).astype(object).to_numpy(dtype=object)
        U = max(len(uniques), 1)
        rows = np.repeat(np.arange(n, dtype=np.int64), kk)
        c = codes[order.ravel()]
        valid = c >= 0
        n_lab = np.bincount(rows[valid], minlength=n)
        n_dis = np.bincount(rows[valid & (c != codes[rows])], minlength=n)
        maj = np.full(n, None, dtype=object)
        mv = np.full(n, None, dtype=object)
        if valid.any():
            uk, cnt = np.unique(rows[valid] * U + c[valid], return_counts=True)
            r_, l_ = uk // U, uk % U
            # winner per node: votes DESC, label ASC (factorize sorted
            # the uniques, so code order IS label order)
            o2 = np.lexsort((l_, -cnt, r_))
            rr = r_[o2]
            first = np.ones(rr.size, dtype=bool)
            first[1:] = rr[1:] != rr[:-1]
            maj[rr[first]] = uniq_vals[l_[o2][first]]
            mv[rr[first]] = cnt[o2][first].astype(np.int64)
        return pd.DataFrame(
            {
                "node_id": ids,
                "own_label": own_vals,
                "n_nbrs": np.full(n, kk, dtype=np.int64),
                "n_labeled_nbrs": n_lab.astype(np.int64),
                "n_disagree": n_dis.astype(np.int64),
                "majority_label": maj,
                "majority_votes": mv,
            }
        )

    return v.groupBy("bucket").applyInPandas(
        cell_votes,
        f"node_id long, own_label {lbl_t}, n_nbrs long, n_labeled_nbrs long,"
        f" n_disagree long, majority_label {lbl_t}, majority_votes long",
    )


@register(
    "sim_knn_graph_lsh",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm,
                      {_sql_bucket('embedding')} AS bucket
               -- NULL embeddings can't be bucketed or scored: excluded
               -- identically in both engines
               FROM embeddings WHERE embedding IS NOT NULL),
    p AS (SELECT a.vec_id AS node_id, b.vec_id AS neighbor_id, a.bucket,
                 round({_sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) AS cosine
          FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id != b.vec_id)
    SELECT node_id, neighbor_id, bucket, cosine, rnk FROM (
      SELECT node_id, neighbor_id, bucket, cosine,
             row_number() OVER (PARTITION BY node_id
                                ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM p)
    WHERE rnk <= {K_NN_GRAPH}
    """,
    tags=("llm", "similarity", "ann", "graph"),
)
def sim_knn_graph_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph construction over the whole corpus — the input to
    graph-based semantic curation (SemDeDup-style cluster pruning,
    diversity sampling, label propagation). Unlike sim_ann_lsh (a few
    query vectors vs the corpus), here EVERY vector is a query node:
    the corpus is bucketed by random-hyperplane sign bits and each
    node keeps its top-K_NN_GRAPH cosine neighbors *within its
    bucket* — a self-join on the bucket key, never corpus x corpus.

    Scale shape: one shuffle on the bucket key co-locates each cell
    (cell size is tuned by N_PLANES: at 100 TB you add planes until
    cells hold ~10^3 vectors, and union several plane-sets as OR-bands
    to recover recall); pair scoring + top-k run INSIDE the cell as one
    BLAS gram per bucket (_knn_cell_topk), so only the N*k kept edges
    ever leave a cell — no corpus-wide pair shuffle, no per-pair fold."""
    emb = load_table(spark, sf_dir, "embeddings")
    # NOT checkpointed: per-vector projection (one norm + N_PLANES
    # plane dots) is negligible next to per-PAIR scoring, and the
    # materialization costs more than the recompute (measured 2.5s ->
    # 3.8s with a checkpoint here — the opposite trade from the
    # SemDeDup assignment, whose argmin window is expensive per row)
    v = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
    )
    return _knn_cell_topk(v, K_NN_GRAPH).select(
        "node_id", "neighbor_id", "bucket", "cosine", "rnk"
    )


PQ_M = 4  # subspaces
PQ_SUB = DIM // PQ_M  # dims per subspace
PQ_K = 4  # codebook entries per subspace (vec_id < PQ_K seed rows)

@register(
    "embed_pq_codes",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
    sub AS (
      SELECT vec_id, m,
             v[1 + m * {PQ_SUB} : (m + 1) * {PQ_SUB}] AS vs
      FROM e CROSS JOIN unnest(generate_series(0, {PQ_M - 1})) AS t(m)),
    cents AS (
      SELECT vec_id AS cid, m, vs AS cs
      FROM sub WHERE vec_id < {PQ_K}),
    scored AS (
      SELECT s.vec_id, s.m, c.cid,
             {_sql_d2('s.vs', 'c.cs')} AS d2
      FROM sub s JOIN cents c ON c.m = s.m),
    best AS (
      SELECT vec_id, m, cid, round(d2, 6) AS d2r,
             row_number() OVER (PARTITION BY vec_id, m
                                ORDER BY round(d2, 6), cid) AS rn
      FROM scored)
    SELECT vec_id,
           CAST(MAX(CASE WHEN m = 0 THEN cid END) AS INT) AS code0,
           CAST(MAX(CASE WHEN m = 1 THEN cid END) AS INT) AS code1,
           CAST(MAX(CASE WHEN m = 2 THEN cid END) AS INT) AS code2,
           CAST(MAX(CASE WHEN m = 3 THEN cid END) AS INT) AS code3,
           round(CAST(SUM(CAST(round(d2r, 6) AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS distortion
    FROM best WHERE rn = 1
    GROUP BY vec_id
    """,
    tags=("llm", "embedding", "ann", "quantization"),
)
def embed_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (the PQ of IVF-PQ): each embedding splits
    into PQ_M subspaces, each subspace is assigned to its nearest of
    PQ_K codebook entries (seed rows vec_id < PQ_K, squared-L2 argmin
    with the k-means tie-break), and the vector compresses to PQ_M
    small codes + a reconstruction distortion. This is the memory-side
    half of billion-scale ANN: 64 floats -> 4 codes (64x compression
    here; 256-entry codebooks at scale).

    Determinism: subspace distances are sequential double folds
    rounded to 6 dp before the argmin; the distortion sum accumulates
    the rounded values as exact decimals.

    Scale: the codebook is PQ_M*PQ_K rows — broadcast; assignment is
    map-side argmin after a subvector explode (fan-out PQ_M, not
    corpus^2); one vec_id-keyed aggregate folds codes back to a row.
    Training better codebooks is cluster_kmeans_embeddings run per
    subspace — same plan, bigger K."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    sub = e.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                lambda m: F.struct(
                    m.alias("m"),
                    F.slice("v", m * PQ_SUB + 1, PQ_SUB).alias("vs"),
                ),
            )
        ).alias("s"),
    ).select("vec_id", "s.m", "s.vs")
    # .limit() is a no-op on the PQ_M*PQ_K codebook rows but makes the
    # broadcast subtree provably size-bounded (GlobalLimit)
    cents = (
        sub.filter(F.col("vec_id") < PQ_K)
        .limit(PQ_M * PQ_K)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("m").alias("cm"),
            F.col("vs").alias("cs"),
        )
    )
    # best code per (row, subspace) ranked MAP-SIDE over the packed
    # per-m codebook (r13: was an N×PQ_M×PQ_K relation through a
    # (vec_id, m) row_number window — same (d NULLS LAST, cid) order)
    cbm = cents.groupBy(F.col("cm")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cid").alias("cid"), F.col("cs").alias("cv")))
        ).alias("_cb")
    )
    code_raw = F.transform(
        F.col("_cb"),
        lambda c: F.struct(
            F.round(
                F.aggregate(
                    F.zip_with("vs", c.getField("cv"), lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ).alias("d"),
            c.getField("cid").alias("cid"),
        ),
    )
    code_rc = F.array_sort(
        F.transform(
            code_raw,
            lambda s: F.struct(
                s.getField("d").isNull().cast("int").alias("nn"),
                s.getField("d").alias("d"),
                s.getField("cid").alias("cid"),
            ),
        )
    )
    # two projections on purpose (the _add_minhash discipline): the
    # non-cheap ranking lands in ONE intermediate column; cid/d extract
    # from it in a second projection CollapseProject keeps separate
    best = (
        sub.join(F.broadcast(cbm), F.col("m") == F.col("cm"))
        .select("vec_id", "m", F.get(code_rc, 0).alias("_b"))
        .select(
            "vec_id",
            "m",
            F.col("_b").getField("cid").alias("cid"),
            F.col("_b").getField("d").alias("d2r"),
        )
    )
    return best.groupBy("vec_id").agg(
        F.max(F.when(F.col("m") == 0, F.col("cid"))).cast("int").alias("code0"),
        F.max(F.when(F.col("m") == 1, F.col("cid"))).cast("int").alias("code1"),
        F.max(F.when(F.col("m") == 2, F.col("cid"))).cast("int").alias("code2"),
        F.max(F.when(F.col("m") == 3, F.col("cid"))).cast("int").alias("code3"),
        F.round(
            F.sum(F.round("d2r", 6).cast("decimal(18,6)")).cast("double"), 6
        ).alias("distortion"),
    )


RECALL_K = 3  # matches sim_ann_lsh's depth


@register(
    "sim_ann_recall_audit",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm,
                      {_sql_bucket('embedding')} AS bucket
               -- NULL embeddings can't be bucketed or scored: excluded
               -- identically in both engines
               FROM embeddings WHERE embedding IS NOT NULL),
    q AS (SELECT * FROM v WHERE vec_id < {N_QUERIES}),
    truth AS (
      SELECT query_id, cand_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round({_sql_dot('q.embedding', 'c.embedding')}
                               / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rnk
        FROM q JOIN v c ON c.vec_id != q.vec_id)
      WHERE rnk <= {RECALL_K}),
    approx AS (
      SELECT query_id, cand_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round({_sql_dot('q.embedding', 'c.embedding')}
                               / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rnk
        FROM q JOIN v c ON c.bucket = q.bucket AND c.vec_id != q.vec_id)
      WHERE rnk <= {RECALL_K})
    SELECT t.query_id,
           CAST({RECALL_K} AS INT) AS k,
           CAST(COUNT(a.cand_id) AS BIGINT) AS n_hits,
           CAST(round(COUNT(a.cand_id) * 1000000.0 / {RECALL_K}, 0) AS BIGINT)
             AS recall_ppm
    FROM truth t
    LEFT JOIN approx a ON a.query_id = t.query_id AND a.cand_id = t.cand_id
    GROUP BY t.query_id
    """,
    tags=("llm", "similarity", "ann", "audit"),
)
def sim_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit for the LSH ANN index: per query, how many of
    the TRUE top-k neighbors (brute-force, the sim_cosine_topk path)
    the bucket-pruned search (the sim_ann_lsh path) actually returns —
    THE metric an ANN deployment tracks before trading exactness for
    speed, here hash-checked end to end because both rankings use the
    same rounded-cosine + id tie-break.

    Scale: the brute-force truth side is affordable because it runs
    over the (small) query sample only — exactly how production recall
    monitoring works: sample queries, exact-rank them, compare the
    index's answers. Both sides broadcast the query set; the audit
    join is (queries x k)-sized."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).limit(N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    cos = F.round(
        F.try_divide(_dot(F.col("q_emb"), F.col("embedding")), F.col("q_nrm") * F.col("nrm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "vec_id")

    def topk(pairs):
        return (
            pairs.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= RECALL_K)
            .select("query_id", F.col("vec_id").alias("cand_id"))
        )

    truth = topk(
        F.broadcast(q).join(v, F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cos"))
    )
    approx = topk(
        F.broadcast(q).join(
            v,
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        ).select("query_id", "vec_id", cos.alias("cos"))
    )
    t = truth.select(
        F.col("query_id").alias("t_q"), F.col("cand_id").alias("t_c")
    )
    a = approx.select(
        F.col("query_id").alias("a_q"), F.col("cand_id").alias("a_c")
    )
    return (
        t.join(a, (F.col("t_q") == F.col("a_q")) & (F.col("t_c") == F.col("a_c")), "left")
        .groupBy(F.col("t_q").alias("query_id"))
        .agg(
            F.lit(RECALL_K).cast("int").alias("k"),
            F.count("a_c").cast("bigint").alias("n_hits"),
            F.round(F.count("a_c") * 1000000.0 / RECALL_K, 0)
            .cast("bigint")
            .alias("recall_ppm"),
        )
    )


IVFPQ_CELLS = 4  # coarse quantizer cells (seed rows vec_id < IVFPQ_CELLS)



@register(
    "sim_ivf_pq_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
    cc AS (SELECT vec_id AS ccid, v AS cv FROM e WHERE vec_id < {IVFPQ_CELLS}),
    acell AS (
      SELECT vec_id, v, ccid AS cell,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY round(d2, 6), ccid) AS rn
      FROM (SELECT e.vec_id, e.v, cc.ccid,
                   {_sql_d2('e.v', 'cc.cv')} AS d2
            FROM e CROSS JOIN cc)),
    m0 AS (SELECT vec_id, v, cell FROM acell WHERE rn = 1),
    sub AS (
      SELECT vec_id, cell, m, v[1 + m * {PQ_SUB} : (m + 1) * {PQ_SUB}] AS vs
      FROM m0 CROSS JOIN unnest(generate_series(0, {PQ_M - 1})) AS t(m)),
    cb AS (SELECT vec_id AS cid, m, vs AS cs FROM sub WHERE vec_id < {PQ_K}),
    codes AS (
      SELECT vec_id, cell, m, cid AS code FROM (
        SELECT s.vec_id, s.cell, s.m, c.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                                  ORDER BY round({_sql_d2('s.vs', 'c.cs')}, 6), c.cid) AS rn
        FROM sub s JOIN cb c ON c.m = s.m)
      WHERE rn = 1),
    qcell AS (SELECT vec_id AS query_id, cell AS q_cell FROM m0
              WHERE vec_id < {N_QUERIES}),
    dtable AS (
      SELECT s.vec_id AS query_id, s.m, c.cid,
             CAST(round({_sql_d2('s.vs', 'c.cs')}, 6)
                  AS DECIMAL(18,6)) AS qd2
      FROM sub s JOIN cb c ON c.m = s.m
      WHERE s.vec_id < {N_QUERIES}),
    adc AS (
      SELECT q.query_id, k.vec_id AS cand_id, k.cell,
             round(CAST(SUM(d.qd2) AS DOUBLE), 6) AS adc_d2
      FROM qcell q
      JOIN codes k ON k.cell = q.q_cell AND k.vec_id != q.query_id
      JOIN dtable d ON d.query_id = q.query_id AND d.m = k.m AND d.cid = k.code
      GROUP BY q.query_id, k.vec_id, k.cell)
    SELECT query_id, cand_id, cell, adc_d2, rnk FROM (
      SELECT query_id, cand_id, cell, adc_d2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_d2, cand_id) AS rnk
      FROM adc)
    WHERE rnk <= {RECALL_K}
    """,
    tags=("llm", "similarity", "ann", "ivf", "quantization"),
)
def sim_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search end to end — the architecture behind every
    billion-vector ANN deployment (FAISS IndexIVFPQ): a coarse
    quantizer routes each vector to a cell, vectors store only their
    PQ codes, and a query (a) probes its cell and (b) scores
    candidates with Asymmetric Distance Computation — a per-query
    lookup table of (subspace x codebook-entry) distances, so scoring
    a candidate is PQ_M table lookups + adds, never a full-dimension
    dot product. Raw-vector PQ (not residual) for oracle clarity; the
    plan shape is identical.

    Determinism: per-subspace distances round to 6 dp and accumulate
    as exact decimals; ranking ties break on cand_id.

    Scale: the searchable index is (cell, PQ_M codes) per vector —
    here 4 bytes/vector vs 256 for the raw floats, the 64x memory cut
    that makes RAM-resident billion-vector search possible. The LUT
    (queries x PQ_M x PQ_K distances) broadcasts; candidate scoring is
    a broadcast join + tiny aggregate, shuffled on (query, cand) —
    cell-local, never corpus-wide."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cc = (
        e.filter(F.col("vec_id") < IVFPQ_CELLS)
        .limit(IVFPQ_CELLS)
        .select(F.col("vec_id").alias("ccid"), F.col("v").alias("cv"))
    )
    # map-side cell assignment (r13: was a K×-corpus crossJoin + window
    # + eager localCheckpoint storing every raw vector; the ranking is
    # now a per-row projection — see _ranked_cells — cheap enough that
    # each consumer recomputes it from the columnar scan instead of
    # reading a block-manager copy of the corpus)
    m0 = _ranked_cells(e, cc, "ccid", "cv", F.col("v"), cast_vec=False).select(
        "vec_id", "v", F.get("_rc", 0).getField("cid").alias("cell")
    )
    sub = m0.select(
        "vec_id",
        "cell",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                lambda m: F.struct(
                    m.alias("m"), F.slice("v", m * PQ_SUB + 1, PQ_SUB).alias("vs")
                ),
            )
        ).alias("s"),
    ).select("vec_id", "cell", "s.m", "s.vs")
    cb = (
        sub.filter(F.col("vec_id") < PQ_K)
        .limit(PQ_M * PQ_K)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("m").alias("cm"),
            F.col("vs").alias("cs"),
        )
    )
    d2_sub = F.round(
        F.aggregate(
            F.zip_with("vs", "cs", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
        6,
    )
    # code assignment: per-subspace codebooks packed one row per m and
    # broadcast-hash-joined on m, best code ranked map-side per row
    # (r13: was an N×PQ_M×PQ_K relation through a (vec_id, m) window)
    cbm = cb.groupBy(F.col("cm")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cid").alias("cid"), F.col("cs").alias("cv")))
        ).alias("_cb")
    )
    code_raw = F.transform(
        F.col("_cb"),
        lambda c: F.struct(
            F.round(
                F.aggregate(
                    F.zip_with("vs", c.getField("cv"), lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ).alias("d"),
            c.getField("cid").alias("cid"),
        ),
    )
    code_rc = F.array_sort(
        F.transform(
            code_raw,
            lambda s: F.struct(
                s.getField("d").isNull().cast("int").alias("nn"),
                s.getField("d").alias("d"),
                s.getField("cid").alias("cid"),
            ),
        )
    )
    codes = (
        sub.join(F.broadcast(cbm), F.col("m") == F.col("cm"))
        .select("vec_id", "cell", "m", F.get(code_rc, 0).getField("cid").alias("code"))
    )
    qcell = (
        m0.filter(F.col("vec_id") < N_QUERIES)
        .limit(N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("cell").alias("q_cell"))
    )
    dtable = (
        sub.filter(F.col("vec_id") < N_QUERIES)
        .limit(N_QUERIES * PQ_M)
        .join(F.broadcast(cb), F.col("m") == F.col("cm"))
        .select(
            F.col("vec_id").alias("d_query"),
            F.col("m").alias("d_m"),
            F.col("cid").alias("d_cid"),
            d2_sub.cast("decimal(18,6)").alias("qd2"),
        )
    )
    adc = (
        codes.join(
            F.broadcast(qcell),
            (F.col("cell") == F.col("q_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .join(
            F.broadcast(dtable),
            (F.col("d_query") == F.col("query_id"))
            & (F.col("d_m") == F.col("m"))
            & (F.col("d_cid") == F.col("code")),
        )
        .groupBy("query_id", F.col("vec_id").alias("cand_id"), "cell")
        .agg(F.round(F.sum("qd2").cast("double"), 6).alias("adc_d2"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.col("adc_d2").asc_nulls_last(), "cand_id")
    return (
        adc.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= RECALL_K)
        .select("query_id", "cand_id", "cell", "adc_d2", "rnk")
    )


# --------------------------------------------------------------------------
# MMR diversity re-ranking (diversity-aware retrieval / coreset pick)
# --------------------------------------------------------------------------

MMR_POOL = 8  # relevance candidates per query entering the re-rank
MMR_SELECT = 3  # diverse picks per query (unrolled rounds)
MMR_LAMBDA = 0.7  # relevance weight; 1-lambda penalizes redundancy
# integer-exact MMR combine: lambda as a tenth-numerator, so the score
# is the exact bigint 7*cos_micro - 3*pen_micro (float 0.7*c - 0.3*p
# lands on .5 rounding boundaries that the two engines split on)
_MMR_NUM = round(MMR_LAMBDA * 10)


def _mmr_oracle() -> str:
    sel_rounds = []
    prev_sels = ["s1"]
    for r in range(2, MMR_SELECT + 1):
        sel_union = " UNION ALL ".join(
            f"SELECT query_id, cand_id FROM {s}" for s in prev_sels
        )
        sel_rounds.append(f"""
    sel{r} AS ({sel_union}),
    pen{r} AS (SELECT ps.query_id, ps.a_id AS cand_id, MAX(ps.sim) AS pen
               FROM ps JOIN sel{r} s ON s.query_id = ps.query_id
                                    AND s.cand_id = ps.b_id
               GROUP BY ps.query_id, ps.a_id),
    r{r} AS (SELECT pool.query_id, pool.cand_id, pool.cosine,
                    {_MMR_NUM} * CAST(round(pool.cosine * 1000000, 0) AS BIGINT)
                    - {10 - _MMR_NUM} * CAST(round(pen{r}.pen * 1000000, 0) AS BIGINT)
                      AS mmr_u
             FROM pool
             JOIN pen{r} ON pen{r}.query_id = pool.query_id
                        AND pen{r}.cand_id = pool.cand_id
             WHERE NOT EXISTS (SELECT 1 FROM sel{r} s
                               WHERE s.query_id = pool.query_id
                                 AND s.cand_id = pool.cand_id)),
    s{r} AS (SELECT query_id, cand_id, cosine,
                    CAST(mmr_u AS DOUBLE) / 10000000.0 AS mmr_score
             FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                                ORDER BY mmr_u DESC, cand_id) AS rn
                   FROM r{r})
             WHERE rn = 1)""")
        prev_sels.append(f"s{r}")
    finals = " UNION ALL ".join(
        f"SELECT query_id, cand_id, {i + 1} AS sel_round, cosine, mmr_score FROM s{i + 1}"
        for i in range(MMR_SELECT)
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
               -- NULL embeddings can't be scored: excluded both engines
               FROM embeddings WHERE embedding IS NOT NULL),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.embedding,
                 round({_sql_dot('q.embedding', 'c.embedding')}
                       / (q.nrm * c.nrm), 6) AS cosine
          FROM v q JOIN v c ON c.vec_id != q.vec_id
          WHERE q.vec_id < {N_QUERIES}),
    pool AS (SELECT query_id, cand_id, embedding, cosine FROM (
               SELECT *, row_number() OVER (PARTITION BY query_id
                                            ORDER BY cosine DESC, cand_id) AS rnk
               FROM p)
             WHERE rnk <= {MMR_POOL}),
    ps AS (SELECT a.query_id, a.cand_id AS a_id, b.cand_id AS b_id,
                  round({_sql_dot('a.embedding', 'b.embedding')}
                        / (sqrt({_sql_dot('a.embedding', 'a.embedding')})
                           * sqrt({_sql_dot('b.embedding', 'b.embedding')})), 6)
                    AS sim
           FROM pool a JOIN pool b ON a.query_id = b.query_id
                                  AND a.cand_id != b.cand_id),
    s1 AS (SELECT query_id, cand_id, cosine, cosine AS mmr_score FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
                                          ORDER BY cosine DESC, cand_id) AS rn
             FROM pool)
           WHERE rn = 1),{','.join(sel_rounds)}
    {finals}
    """


@register(
    "sim_mmr_diverse_topk",
    oracle=_mmr_oracle(),
    tags=("llm", "similarity", "curation"),
)
def sim_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): per query, greedily pick MMR_SELECT results that trade off
    relevance against redundancy — round 1 takes the top cosine
    candidate, each later round takes argmax of
    lambda*cos(q,c) - (1-lambda)*max_{s in selected} sim(c,s) over the
    MMR_POOL relevance pool. The curation use: diversity-aware
    retrieval for eval-set building and per-cluster coreset picks,
    where plain top-k returns near-duplicates.

    Determinism: all cosines round to 6 dp, then to integer
    MICRO-units; the MMR combine is the exact bigint
    7*cos_u - 3*pen_u (a float 0.7*c - 0.3*p lands on .5 rounding
    boundaries the engines split on — caught at sf0.01), ranking
    compares integers, and the reported score is one IEEE divide of
    the exact numerator. Ties break on cand_id. A NULL cosine/sim
    (zero-norm member) propagates NULL and ranks last, identically
    cross-engine.

    Scale shape: the pool stage is brute-force relevance top-k
    (WindowGroupLimit per query — swap in the ANN bucket path at
    scale); everything after operates on POOL-BOUNDED relations:
    pair sims are pool x pool per query (<= MMR_POOL^2 rows each),
    each greedy round is a bounded join + per-query top-1. Work after
    the pool is O(n_queries * MMR_POOL^2) regardless of corpus size —
    the unrolled rounds add depth, not volume."""
    emb = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql import Window

    v = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).limit(N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    p = F.broadcast(q).join(v, F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        "embedding",
        F.round(
            F.try_divide(_dot(F.col("q_emb"), F.col("embedding")),
                         F.col("q_nrm") * F.col("nrm")),
            6,
        ).alias("cosine"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "cand_id")
    pool = (
        p.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= MMR_POOL)
        .select("query_id", "cand_id", "embedding", "cosine")
        # pool-bounded (<= N_QUERIES * MMR_POOL rows) and consumed by
        # the pair-sim self-join plus every greedy round
        .localCheckpoint(eager=True)
    )
    b = pool.select(
        F.col("query_id").alias("b_q"),
        F.col("cand_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
    )
    ps = pool.join(
        b,
        (F.col("query_id") == F.col("b_q")) & (F.col("cand_id") != F.col("b_id")),
    ).select(
        "query_id",
        F.col("cand_id").alias("a_id"),
        "b_id",
        F.round(
            F.try_divide(
                _dot(F.col("embedding"), F.col("b_emb")),
                _norm(F.col("embedding")) * _norm(F.col("b_emb")),
            ),
            6,
        ).alias("sim"),
    ).localCheckpoint(eager=True)
    s1 = (
        pool.withColumn("rn", F.row_number().over(wq.orderBy(F.col("cosine").desc(), "cand_id")))
        .filter(F.col("rn") == 1)
        .select("query_id", "cand_id", "cosine", F.col("cosine").alias("mmr_score"))
    )
    selected = [s1]
    for r in range(2, MMR_SELECT + 1):
        sel = selected[0].select("query_id", "cand_id")
        for s in selected[1:]:
            sel = sel.unionByName(s.select("query_id", "cand_id"))
        pen = (
            ps.join(
                sel.select(
                    F.col("query_id").alias("s_q"), F.col("cand_id").alias("s_id")
                ),
                (F.col("query_id") == F.col("s_q")) & (F.col("b_id") == F.col("s_id")),
            )
            .groupBy("query_id", "a_id")
            .agg(F.max("sim").alias("pen"))
        )
        cand = (
            pool.join(
                pen,
                (pool.query_id == pen.query_id) & (pool.cand_id == pen.a_id),
            )
            .select(pool.query_id, pool.cand_id, pool.cosine, pen.pen)
            .join(sel, ["query_id", "cand_id"], "left_anti")
            .withColumn(
                "mmr_u",
                _MMR_NUM * F.round(F.col("cosine") * 1000000, 0).cast("bigint")
                - (10 - _MMR_NUM)
                * F.round(F.col("pen") * 1000000, 0).cast("bigint"),
            )
        )
        wm = Window.partitionBy("query_id").orderBy(F.col("mmr_u").desc(), "cand_id")
        sr = (
            cand.withColumn("rn", F.row_number().over(wm))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                "cand_id",
                "cosine",
                (F.col("mmr_u").cast("double") / 10000000.0).alias("mmr_score"),
            )
        )
        selected.append(sr)
    out = None
    for i, s in enumerate(selected):
        part = s.select(
            "query_id",
            "cand_id",
            F.lit(i + 1).cast("int").alias("sel_round"),
            "cosine",
            "mmr_score",
        )
        out = part if out is None else out.unionByName(part)
    return out


@register(
    "sim_ann_join_ivf",
    oracle=f"""
    WITH {_SQL_CENTROIDS},
    nn AS (SELECT vec_id, embedding FROM embeddings
           WHERE embedding IS NOT NULL),
    pairs AS (SELECT e.vec_id, e.embedding, c.label AS cl,
                     {_sql_d2('e.embedding', 'c.cvec')} AS d2
              FROM nn e CROSS JOIN cents c),
    assign AS (SELECT vec_id, embedding, cl AS cell,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY round(d2, 6), cl) AS rn
               FROM pairs),
    v AS (SELECT vec_id, embedding, cell,
                 {_sql_bucket('embedding')} AS bucket,
                 sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
          FROM assign WHERE rn = 1),
    l AS (SELECT * FROM v WHERE vec_id % 2 = 0),
    r AS (SELECT * FROM v WHERE vec_id % 2 = 1),
    scored AS (SELECT l.vec_id AS left_id, r.vec_id AS right_id, l.cell,
                      round({_sql_dot('l.embedding', 'r.embedding')}
                            / (l.nrm * r.nrm), 6) AS cosine
               FROM l JOIN r ON l.cell = r.cell AND l.bucket = r.bucket)
    SELECT left_id, right_id, cell, cosine, rnk FROM (
      SELECT left_id, right_id, cell, cosine,
             row_number() OVER (PARTITION BY left_id
                                ORDER BY cosine DESC, right_id) AS rnk
      FROM scored)
    WHERE rnk <= 3
    """,
    tags=("llm", "similarity", "ann", "ivf", "join"),
)
def sim_ann_join_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided ANN JOIN — nearest neighbors between two LARGE vector
    sets (here: even vec_ids as the left corpus, odd as the right),
    where neither side fits in a broadcast. This is the missing shape
    between sim_cosine_topk (tiny query set, broadcast) and
    sim_ivf_topk (self-search): linking two corpora — user queries to
    documents, new crawl to existing index — at 100 TB on BOTH sides.

    Plan: K centroids broadcast once; each side assigns map-side to
    its nearest cell (argmin over K, no shuffle) AND to a
    sign-random-projection sub-bucket (SHSS_N_PLANES hyperplanes, the
    same env-scaled planes as sim_ann_lsh); then ONE co-partitioned
    shuffle of each side on the composite (cell, bucket) key and a
    key-local join — pair work is sum over sub-cells of |L_c| x |R_c|,
    never |L| x |R|. Top-3 per left row by exact in-sub-cell cosine.
    The label-count K is FIXED, so the sub-bucket is what scales:
    tools/stress.py raises SHSS_N_PLANES with REPL (each plane halves
    expected sub-cell size) — without it the x30 stress measured this
    join quadratic (44.9 s at x10 → 224.5 s at x30); candidates drop
    only where a true neighbor straddles a plane, the standard
    LSH recall trade.

    Determinism: same centroid/assignment arithmetic as sim_ivf_topk
    (exact decimal centroid means, d2 rounded to 6 before the argmin
    order, label tiebreak); cosine rounded to 6 in both engines; ties
    broken by right_id. NULL embeddings are excluded identically on
    both sides before assignment (they can neither assign nor score).
    """
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    # NULL label is not a cell — same exclusion as _SQL_CENTROIDS
    cents = (
        emb.filter(F.col("label").isNotNull())
        .select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(
            (
                F.sum(
                    F.round(F.col("val").cast("double"), 6).cast("decimal(12,6)")
                ).cast("double")
                / F.count("*")
            ).alias("cv")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                lambda s: s["cv"],
            ).alias("cvec")
        )
    )
    # map-side cell assignment (r13: was a K×-corpus crossJoin + window
    # — this finally IS the "argmin over K, no shuffle" the docstring
    # promises; see _ranked_cells for the order-equivalence argument).
    # The K-row centroid table is checkpointed (BOUNDED relation — the
    # legit block-manager case): the left/right vec_id-parity filters
    # push below any assignment-level barrier into the scans anyway
    # (verified in the formatted plan), so the two join sides rank
    # DISJOINT halves of the corpus — ONE ranking pass in total,
    # map-side — but would otherwise each recompute the full centroid
    # aggregation (a corpus-wide posexplode + two exchanges). ×100
    # A/B of assignment-barrier forms, all measured on the idle box:
    # localCheckpoint 35.8 s (block-manager variance class on the
    # embedding-array relation), materialize_parquet 15.9 s (file
    # round-trip of the corpus), no barrier at all 11.9 s (centroids
    # computed twice), (cell,bucket)-repartition 9.3 s. The shipped
    # form keeps the assignment un-barriered and de-duplicates only
    # the bounded centroids (stress_x100_r13b.json).
    cents = cents.localCheckpoint(eager=True)
    v = _ranked_cells(
        emb, cents, "label", "cvec", F.col("embedding")
    ).select(
        "vec_id",
        "embedding",
        F.get("_rc", 0).getField("cid").alias("cell"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
        _norm(F.col("embedding")).alias("nrm"),
    )
    left = v.select(
        F.col("vec_id").alias("left_id"),
        F.col("embedding").alias("l_emb"),
        F.col("nrm").alias("l_nrm"),
        "cell",
        "bucket",
    ).filter(F.col("left_id") % 2 == 0)
    right = v.select(
        F.col("vec_id").alias("right_id"),
        F.col("embedding").alias("r_emb"),
        F.col("nrm").alias("r_nrm"),
        F.col("cell").alias("r_cell"),
        F.col("bucket").alias("r_bucket"),
    ).filter(F.col("right_id") % 2 == 1)
    # deliberately NO broadcast hint: both sides are corpus-sized; the
    # join must ride the cell key (test_plans pins the absence of a
    # static broadcast on either side)
    scored = left.join(
        right,
        (F.col("cell") == F.col("r_cell"))
        & (F.col("bucket") == F.col("r_bucket")),
    ).select(
        "left_id",
        "right_id",
        "cell",
        F.round(
            F.try_divide(
                _dot(F.col("l_emb"), F.col("r_emb")),
                F.col("l_nrm") * F.col("r_nrm"),
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("left_id").orderBy(F.col("cosine").desc(), "right_id")
    return scored.select(
        "left_id", "right_id", "cell", "cosine", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= 3)


# --------------------------------------------------------------------------
# range search: every pair above a cosine threshold (cell-local)
# --------------------------------------------------------------------------

RANGE_TAU = 0.35  # cosine threshold for "in range"


@register(
    "sim_range_search_cosine",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm,
                      {_sql_bucket('embedding')} AS bucket
               FROM embeddings WHERE embedding IS NOT NULL)
    SELECT a.vec_id AS node_id, b.vec_id AS neighbor_id, a.bucket,
           round({_sql_dot('a.embedding', 'b.embedding')}
                 / (a.nrm * b.nrm), 6) AS cosine
    FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round({_sql_dot('a.embedding', 'b.embedding')}
                / (a.nrm * b.nrm), 6) >= {RANGE_TAU}
    """,
    tags=("llm", "similarity", "ann"),
)
def sim_range_search_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine range search — ALL pairs above a similarity threshold,
    not a fixed top-k: the primitive behind duplicate detection at a
    tuned threshold, \"find everything within radius r\" retrieval, and
    candidate generation for near-dup verification where a k cutoff
    would silently drop members of large duplicate groups.

    Scale shape: identical to the kNN graph — one shuffle co-locates
    each random-hyperplane cell, then ONE float64 gram per cell
    (applyInPandas) with the threshold mask applied inside the cell,
    so only qualifying pairs ever leave; each unordered pair is
    emitted once (node_id < neighbor_id, the upper triangle). Output
    volume is data-dependent (unlike top-k): at 100 TB you tune
    RANGE_TAU and N_PLANES together — more planes shrink cells, and
    the threshold bounds what survives. NaN cosines (zero norm,
    ragged pair) can never qualify: NaN fails the >= mask exactly as
    the oracle's NULL fails SQL >=.

    Verdict parity with the DuckDB fold mirrors _knn_cell_topk's
    argument: the matmul differs from the sequential fold only by
    summation order, six orders inside the round(cos, 6) quantum; the
    threshold compares the ROUNDED value in both engines so a
    boundary-straddling raw cosine cannot split them."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
    )

    def cell_range(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        empty = pd.DataFrame(
            {
                "node_id": np.array([], dtype=np.int64),
                "neighbor_id": np.array([], dtype=np.int64),
                "bucket": np.array([], dtype=object),
                "cosine": np.array([], dtype=np.float64),
            }
        )
        if n < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        vecs = pdf["embedding"].to_numpy()
        lens = np.fromiter((len(a) for a in vecs), dtype=np.int64, count=n)
        width = max(int(lens.max()), 1)
        V = np.zeros((n, width), dtype=np.float64)
        for i, a in enumerate(vecs):
            V[i, : lens[i]] = np.asarray(a, dtype=np.float64)
        nrm = pdf["nrm"].to_numpy().astype(np.float64)
        denom = np.outer(nrm, nrm)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = (V @ V.T) / denom
        cos[lens[:, None] != lens[None, :]] = np.nan
        cos[denom == 0] = np.nan
        cos = _np_round_half_up(cos, 6)
        with np.errstate(invalid="ignore"):
            mask = np.triu(cos >= RANGE_TAU, k=1)  # NaN fails; a < b once
        r, c = np.nonzero(mask)
        if len(r) == 0:
            return empty
        return pd.DataFrame(
            {
                "node_id": ids[r],
                "neighbor_id": ids[c],
                "bucket": pdf["bucket"].iloc[0],
                "cosine": cos[r, c],
            }
        )

    return v.groupBy("bucket").applyInPandas(
        cell_range, "node_id long, neighbor_id long, bucket string, cosine double"
    )


# --------------------------------------------------------------------------
# embedding-space outlier audit: distance-to-mean z-scores
# --------------------------------------------------------------------------


@register(
    "embed_outlier_zscore",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings WHERE embedding IS NOT NULL),
    md AS (
      SELECT i AS dim,
             CAST(SUM(CAST(round(v[i], 6) AS DECIMAL(12,6))) AS DOUBLE)
               / COUNT(*) AS md
      FROM (SELECT v, unnest(generate_series(1, len(v))) AS i FROM e)
      GROUP BY i),
    mv AS (SELECT list(md ORDER BY dim) AS m FROM md),
    dd AS (
      SELECT vec_id,
             round(sqrt({_SQL_D2E.format(v='e.v', c='mv.m')}), 6) AS d_r
      FROM e CROSS JOIN mv),
    st AS (
      SELECT CAST(SUM(CAST(round(d_r, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(d_r) AS m1,
             CAST(SUM(CAST(round(d_r * d_r, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(d_r) AS m2
      FROM dd),
    z AS (
      SELECT vec_id, d_r, m1,
             CASE WHEN m2 - m1 * m1 > 0 THEN sqrt(m2 - m1 * m1) END AS sd
      FROM dd CROSS JOIN st)
    SELECT vec_id,
           CAST(round(1000000.0 * d_r, 0) AS BIGINT) AS d_micro,
           CAST(round(1000000.0 * (d_r - m1) / sd, 0) AS BIGINT) AS z_micro,
           CASE WHEN d_r IS NULL OR sd IS NULL THEN NULL
                ELSE abs((d_r - m1) / sd) > 2.0 END AS is_outlier
    FROM z
    """,
    tags=("llm", "embedding", "audit"),
)
def embed_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier audit — each vector's Euclidean distance
    to the corpus mean embedding, z-scored against the corpus
    distance distribution, flagged at |z| > 2: the cheap first-pass
    screen curation stacks run for corrupt embeddings (wrong modality,
    truncated inputs, encoder failures) before anything expensive
    touches them.

    Scale shape: three scans' worth of map-side work and two scalar
    broadcasts — (1) one K·D-cardinality per-dim aggregate for the
    mean vector (decimal-exact sums, same discipline as the Lloyd
    means), (2) one broadcast of that D-vector against the corpus for
    per-row distances, (3) one 1-row moment aggregate (decimal-exact)
    broadcast back for the z-scores. Nothing ever shuffles at corpus
    width; at 100 TB every stage is scan-bound.

    Determinism: distances are rounded once (round(sqrt(d2), 6)) so
    both engines feed the moment sums identical doubles; moments use
    decimal-exact sums (order-independent); downstream z arithmetic is
    IEEE-only on identical doubles. Ragged vectors (length != mean
    dim) poison d2 to NULL via zip_with padding — they stay in the
    output with NULL distance/z/flag but are excluded from the
    moments; zero variance yields NULL z for every row rather than a
    division blowup."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    md = (
        e.select(F.posexplode("v").alias("pos", "val"))
        .groupBy((F.col("pos") + 1).alias("dim"))
        .agg(
            (
                F.sum(F.round("val", 6).cast("decimal(12,6)")).cast("double")
                / F.count("*")
            ).alias("md")
        )
    )
    mv = md.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "md"))), lambda s: s.md
        ).alias("m")
    )
    d2 = F.aggregate(
        F.zip_with("v", "m", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    dd = e.crossJoin(F.broadcast(mv)).select(
        "vec_id", F.round(F.sqrt(d2), 6).alias("d_r")
    )
    st = dd.agg(
        (
            F.sum(F.round("d_r", 6).cast("decimal(18,6)")).cast("double")
            / F.count("d_r")
        ).alias("m1"),
        (
            F.sum(F.round(F.col("d_r") * F.col("d_r"), 6).cast("decimal(18,6)")).cast(
                "double"
            )
            / F.count("d_r")
        ).alias("m2"),
    )
    var = F.col("m2") - F.col("m1") * F.col("m1")
    z = dd.crossJoin(F.broadcast(st)).select(
        "vec_id", "d_r", "m1", F.when(var > 0, F.sqrt(var)).alias("sd")
    )
    zs = (F.col("d_r") - F.col("m1")) / F.col("sd")
    return z.select(
        "vec_id",
        F.round(F.lit(1000000.0) * F.col("d_r"), 0).cast("bigint").alias("d_micro"),
        F.round(F.lit(1000000.0) * zs, 0).cast("bigint").alias("z_micro"),
        F.when(F.col("d_r").isNull() | F.col("sd").isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.abs(zs) > 2.0)
        .alias("is_outlier"),
    )


# --------------------------------------------------------------------------
# Binary-quantization ANN: packed sign bits + Hamming coarse search
# --------------------------------------------------------------------------

HAM_RERANK = 20  # Hamming coarse candidates per query entering exact rerank


def _pack_sign_bits(col: Column) -> Column:
    """Sign-quantize an embedding into ceil(d/32) packed BIGINT words:
    bit b of word w is 1 iff element (w*32+b+1) > 0. NULL and
    past-the-end elements quantize to 0 — the coarse code is always
    defined (exactness is the float rerank's job, not the code's).
    The per-word fold is acc*2+bit over bits 31..0: integer-exact and
    shift-free, so the oracle can mirror it verbatim."""
    nwords = F.ceil(F.size(col) / F.lit(32.0)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), nwords - F.lit(1)),
        lambda w: F.aggregate(
            F.sequence(F.lit(31), F.lit(0), F.lit(-1)),
            F.lit(0).cast("bigint"),
            lambda acc, b: acc * 2
            + F.when(F.try_element_at(col, (w * 32 + b + 1).cast("int")) > 0, 1)
            .otherwise(0),
        ),
    )


def _hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two packed codes: XOR + popcount per
    word, summed. zip_with NULL-pads a word-count mismatch (ragged
    source dimensions), poisoning the sum to NULL — incomparable codes
    rank last and are dropped by the rerank's NULL-cosine filter."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


# Oracle mirror of _pack_sign_bits: same nwords, same bit order, same
# acc*2+bit fold (list_reduce has no init — prepend the 0 accumulator)
_SQL_PACK = (
    "list_transform(generate_series(0, CAST(ceil(len({e}) / 32.0) AS INT) - 1), "
    "w -> list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(generate_series(31, 0, -1), "
    "b -> CASE WHEN {e}[w * 32 + b + 1] > 0 THEN 1 ELSE 0 END)), "
    "(acc, x) -> acc * 2 + x))"
)

# Oracle mirror of _hamming: series over the LONGER code so a
# word-count mismatch poisons the fold to NULL exactly like zip_with
_SQL_HAM = (
    "CAST(list_reduce(list_transform("
    "generate_series(1, greatest(len({a}), len({b}))), "
    "i -> CAST(bit_count(xor({a}[i], {b}[i])) AS BIGINT)), (x, y) -> x + y) "
    "AS BIGINT)"
)


@register(
    "sim_hamming_binary_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm,
                      {_SQL_PACK.format(e='embedding')} AS words
               FROM embeddings
               WHERE embedding IS NOT NULL AND len(embedding) > 0),
    h AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 {_SQL_HAM.format(a='q.words', b='c.words')} AS hamming,
                 round({_sql_dot('q.embedding', 'c.embedding')}
                       / (q.nrm * c.nrm), 6) AS cosine
          FROM v q JOIN v c ON c.vec_id != q.vec_id
          WHERE q.vec_id < {N_QUERIES}),
    r AS (SELECT query_id, cand_id, hamming, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY hamming ASC NULLS LAST, cand_id)
                   AS h_rnk
          FROM h)
    SELECT query_id, cand_id, hamming, cosine, rnk FROM (
      SELECT query_id, cand_id, hamming, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC NULLS LAST, cand_id) AS rnk
      FROM r WHERE h_rnk <= {HAM_RERANK})
    WHERE rnk <= {TOP_K} AND cosine IS NOT NULL
    """,
    tags=("llm", "similarity"),
)
def sim_hamming_binary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN — the third coarse-search family next
    to hyperplane LSH (sim_ann_lsh) and IVF (sim_ivf_topk): sign-bits
    packed into BIGINT words (32x smaller than float32), coarse
    ranking by Hamming distance (XOR + POPCNT, integer-exact), top
    HAM_RERANK candidates per query reranked in exact float cosine.
    This is the standard two-stage binary-code pipeline production
    vector stores run when the full float index doesn't fit in RAM.

    Scale shape: the quantized query set broadcasts (Q x nwords
    BIGINTs); the corpus is scanned ONCE and each candidate costs
    ~nwords XOR+popcounts instead of d float multiplies, so the coarse
    pass is bandwidth-bound; the per-query top-R window gets a
    map-side WindowGroupLimit, so only partitions x Q x R rows (and
    only THEY carry the float vectors onward) reach the single
    query_id shuffle; the exact rerank touches Q x R rows. No
    pair-table materialization, no corpus self-join shuffle.

    Determinism: Hamming is integer; rerank cosine is the shared
    round-6 fold; both ranks tie-break on cand_id; NULL orderings are
    pinned explicitly on both engines (incomparable ragged pairs rank
    last coarse, then drop at the NULL-cosine filter)."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.filter(F.size("embedding") > 0).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _pack_sign_bits(F.col("embedding")).alias("words"),
    )
    q = (
        v.filter(F.col("vec_id") < N_QUERIES)
        .limit(N_QUERIES)  # GlobalLimit: provably bounded broadcast subtree
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.col("words").alias("q_words"),
        )
    )
    pairs = (
        F.broadcast(q)
        .join(v, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            _hamming(F.col("q_words"), F.col("words")).alias("hamming"),
            "q_emb",
            "q_nrm",
            "embedding",
            "nrm",
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc_nulls_last(), "cand_id"
    )
    cand = pairs.withColumn("h_rnk", F.row_number().over(w1)).filter(
        F.col("h_rnk") <= HAM_RERANK
    )
    rer = cand.select(
        "query_id",
        "cand_id",
        "hamming",
        F.round(
            F.try_divide(
                _dot(F.col("q_emb"), F.col("embedding")),
                F.col("q_nrm") * F.col("nrm"),
            ),
            6,
        ).alias("cosine"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc_nulls_last(), "cand_id"
    )
    return rer.withColumn("rnk", F.row_number().over(w2)).filter(
        (F.col("rnk") <= TOP_K) & F.col("cosine").isNotNull()
    )


# --------------------------------------------------------------------------
# Hard-negative mining for contrastive training data
# --------------------------------------------------------------------------


@register(
    "sim_hard_negative_mining",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding, label,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
               FROM embeddings
               WHERE embedding IS NOT NULL AND label IS NOT NULL),
    p AS (SELECT q.vec_id AS query_id, q.label AS q_label,
                 c.vec_id AS cand_id, c.label AS neg_label,
                 round({_sql_dot('q.embedding', 'c.embedding')}
                       / (q.nrm * c.nrm), 6) AS cosine
          FROM v q JOIN v c
            ON c.vec_id != q.vec_id AND c.label != q.label
          WHERE q.vec_id < {N_QUERIES})
    SELECT query_id, q_label, cand_id, neg_label, cosine, rnk FROM (
      SELECT query_id, q_label, cand_id, neg_label, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC NULLS LAST, cand_id) AS rnk
      FROM p)
    WHERE rnk <= {TOP_K} AND cosine IS NOT NULL
    """,
    tags=("llm", "similarity"),
)
def sim_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — the batch-construction step for
    contrastive / triplet / InfoNCE training data: for each labeled
    query vector, the TOP_K candidates that are MOST similar while
    carrying a DIFFERENT label. These near-boundary negatives are what
    make embedding training converge (random negatives are too easy);
    at 100 TB this is the op a retrieval-training pipeline runs over
    the whole corpus per epoch.

    Scale shape: identical to sim_cosine_topk — the bounded query set
    broadcasts (GlobalLimit), the corpus is scanned once, the
    label-disjoint constraint rides the broadcast join condition so
    same-label candidates never reach the dot product, and the
    per-query top-k compiles to a map-side WindowGroupLimit before the
    single query_id shuffle. Unlabeled or NULL vectors are excluded on
    both engines (a hard negative needs a label to be negative)."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.filter(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    ).select(
        "vec_id", "embedding", "label", _norm(F.col("embedding")).alias("nrm")
    )
    q = (
        v.filter(F.col("vec_id") < N_QUERIES)
        .limit(N_QUERIES)  # GlobalLimit: provably bounded broadcast subtree
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.col("label").alias("q_label"),
        )
    )
    pairs = (
        F.broadcast(q)
        .join(
            v,
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("q_label")),
        )
        .select(
            "query_id",
            "q_label",
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("neg_label"),
            F.round(
                F.try_divide(
                    _dot(F.col("q_emb"), F.col("embedding")),
                    F.col("q_nrm") * F.col("nrm"),
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc_nulls_last(), "cand_id"
    )
    return pairs.withColumn("rnk", F.row_number().over(w)).filter(
        (F.col("rnk") <= TOP_K) & F.col("cosine").isNotNull()
    )


@register(
    "sim_ivf_multiprobe_topk",
    oracle=f"""
    WITH {_SQL_CENTROIDS},
    pairs AS (SELECT e.vec_id, e.embedding, c.label AS cl,
                     {_sql_d2('e.embedding', 'c.cvec')} AS d2
              FROM embeddings e CROSS JOIN cents c),
    ranked AS (SELECT vec_id, embedding, cl,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY round(d2, 6), cl) AS rn
               FROM pairs),
    v AS (SELECT vec_id, embedding, cl AS cell,
                 sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
          FROM ranked WHERE rn = 1),
    qprobe AS (SELECT vec_id AS query_id, embedding AS q_emb,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS q_nrm,
                      cl AS probe_cell, rn AS probe
               FROM ranked WHERE rn <= 2 AND vec_id < {N_QUERIES}),
    scored AS (SELECT q.query_id, c.vec_id AS cand_id, q.probe_cell AS cell,
                      q.probe,
                      round({_sql_dot('q.q_emb', 'c.embedding')}
                            / (q.q_nrm * c.nrm), 6) AS cosine
               FROM qprobe q JOIN v c ON q.probe_cell = c.cell
                                     AND c.vec_id != q.query_id)
    SELECT query_id, cand_id, cell, probe, cosine, rnk FROM (
      SELECT query_id, cand_id, cell, probe, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id) AS rnk
      FROM scored)
    WHERE rnk <= 3
    """,
    tags=("llm", "similarity", "ann", "ivf"),
)
def sim_ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN: the index assigns each vector to ONE cell
    (same single-cell inverted file as sim_ivf_topk), but each query
    probes its TWO nearest centroids — the standard recall repair for
    quantization-boundary misses that costs 2× probe work instead of
    rebuilding with more cells. The probe column records which probe
    (1 = home cell, 2 = spill cell) produced each hit.

    The 100 TB shape: identical index to sim_ivf_topk (broadcast-K
    map-side argmin assignment, no shuffle); query fan-out is
    bounded-2 rows per query joined cell-locally, so probe cost scales
    linearly in probes while the corpus side never re-shuffles. Exact
    cosine re-rank inside the probed cells only."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cents = (
        emb.filter(F.col("label").isNotNull())
        .select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(
            (
                F.sum(
                    F.round(F.col("val").cast("double"), 6).cast("decimal(12,6)")
                ).cast("double")
                / F.count("*")
            ).alias("cv")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                lambda s: s["cv"],
            ).alias("cvec")
        )
    )
    # map-side cell ranking (r13: was a K×-corpus crossJoin + window);
    # the full per-row ranking also serves the 2-probe fan-out below —
    # rn <= 2 is just the first two elements of the sorted array
    rc = _ranked_cells(emb, cents, "label", "cvec", F.col("embedding"))
    v = rc.select(
        "vec_id",
        "embedding",
        F.get("_rc", 0).getField("cid").alias("cell"),
        _norm(F.col("embedding")).alias("nrm"),
    )
    qprobe = (
        rc.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_nrm"),
            F.posexplode(F.slice("_rc", 1, 2)).alias("pos", "pc"),
        )
        .select(
            "query_id",
            "q_emb",
            "q_nrm",
            F.col("pc").getField("cid").alias("probe_cell"),
            (F.col("pos") + 1).alias("probe"),
        )
    )
    scored = F.broadcast(qprobe).join(
        v,
        (F.col("probe_cell") == F.col("cell"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        F.col("probe_cell").alias("out_cell"),
        "probe",
        F.round(
            F.try_divide(
                _dot(F.col("q_emb"), F.col("embedding")),
                F.col("q_nrm") * F.col("nrm"),
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "cand_id")
    return (
        scored.select(
            "query_id",
            "cand_id",
            F.col("out_cell").alias("cell"),
            "probe",
            "cosine",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "embed_binary_quantization_audit",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
               -- NULL embeddings can't be signed or scored: excluded
               -- identically in both engines
               FROM embeddings WHERE embedding IS NOT NULL),
    p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 a.embedding AS ea, b.embedding AS eb,
                 a.nrm AS na, b.nrm AS nb
          FROM v a JOIN v b ON b.vec_id = a.vec_id + 1
          -- ragged pairs have no aligned sign pattern, 0-dim vectors
          -- no sign pattern at all: same-dim non-empty only
          WHERE len(a.embedding) = len(b.embedding)
            AND len(a.embedding) >= 1)
    SELECT vec_a, vec_b,
           CAST(len(ea) AS BIGINT) AS n_dims,
           CAST(len(list_filter(generate_series(1, len(ea)),
                i -> (ea[i]::DOUBLE > 0) != (eb[i]::DOUBLE > 0)))
                AS BIGINT) AS hamming,
           round(1.0e0 - 2.0e0 * len(list_filter(generate_series(1, len(ea)),
                i -> (ea[i]::DOUBLE > 0) != (eb[i]::DOUBLE > 0)))
                / len(ea), 6) AS sign_sim,
           round({_sql_dot('ea', 'eb')} / nullif(na * nb, 0.0e0), 6) AS cosine
    FROM p
    """,
    tags=("llm", "similarity", "quantization", "audit"),
)
def embed_binary_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit quantization audit: for consecutive vector pairs, the
    sign-pattern Hamming distance and its linear proxy
    sign_sim = 1 − 2·h/d next to the exact cosine — the measurement
    that tells you how much retrieval quality a 32× binary compression
    costs BEFORE you rebuild the index with it (for random vectors
    E[sign_sim] ≈ 2·asin(cos)/π; a corpus deviating far from that curve
    quantizes badly).

    Exactness: the sign mismatch count is an integer fold over
    identically-indexed dims (strict > 0 in both engines, so a 0.0
    coordinate signs negative in both); sign_sim/cosine are single
    rounded doubles. Scale: consecutive-id pairing is an equi-join on
    vec_id+1 — one shuffle, rows = corpus, never all-pairs; the audit
    needs pair VARIETY, not completeness (the edit-distance op's
    precedent)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    v = emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    a = v.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    p = a.join(b, F.col("vec_b") == F.col("vec_a") + 1).filter(
        (F.size("ea") == F.size("eb")) & (F.size("ea") >= 1)
    )
    mismatch = F.size(
        F.filter(
            F.zip_with(
                F.col("ea"),
                F.col("eb"),
                lambda x, y: (x.cast("double") > 0) != (y.cast("double") > 0),
            ),
            lambda m: m,
        )
    ).cast("bigint")
    return p.select(
        "vec_a",
        "vec_b",
        F.size("ea").cast("bigint").alias("n_dims"),
        mismatch.alias("hamming"),
        F.round(
            F.lit(1.0) - F.lit(2.0) * mismatch / F.size("ea"), 6
        ).alias("sign_sim"),
        F.round(
            F.try_divide(
                _dot(F.col("ea"), F.col("eb")),
                F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
            ),
            6,
        ).alias("cosine"),
    )


# --------------------------------------------------------------------------
# per-dimension winsorization audit: tail clipping an embedding store
# runs before quantization (outlier dims wreck int8 scale factors)
# --------------------------------------------------------------------------


@register(
    "embed_winsorize_audit",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings WHERE embedding IS NOT NULL),
    x AS (
      SELECT vec_id, i AS dim, v[i] AS val
      FROM (SELECT vec_id, v, unnest(generate_series(1, len(v))) AS i FROM e)
      WHERE v[i] IS NOT NULL),
    q AS (
      SELECT dim, COUNT(*) AS n_vals,
             round(quantile_cont(val, 0.05), 6) AS lo,
             round(quantile_cont(val, 0.95), 6) AS hi
      FROM x GROUP BY dim)
    SELECT x.dim, q.lo, q.hi,
           CAST(q.n_vals AS BIGINT) AS n_vals,
           CAST(SUM((val < lo)::INT) AS BIGINT) AS n_below,
           CAST(SUM((val > hi)::INT) AS BIGINT) AS n_above,
           CAST((SUM((val < lo)::INT) + SUM((val > hi)::INT)) * 1000000
                // q.n_vals AS BIGINT) AS clipped_ppm
    FROM x JOIN q USING (dim)
    GROUP BY x.dim, q.lo, q.hi, q.n_vals
    """,
    tags=("llm", "embedding", "audit"),
)
def embed_winsorize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension winsorization audit: the p05/p95 clip bounds of
    every embedding dimension plus how many values each bound would
    clip — the pre-quantization pass an embedding store runs because a
    single heavy-tailed dimension wrecks int8 scale factors (see
    embed_quantize_int8). Output is one row per dimension.

    Exactness: both engines compute the same linearly-interpolated
    percentile (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, the
    agg_percentile-proven pairing), rounded to 6 before the clip
    comparisons so the counts compare floats that are bit-identical by
    construction; NULL elements and NULL/ragged vectors drop out of
    both engines identically (a dimension exists exactly where a
    vector has a non-NULL element at it).

    Scale: posexplode is linear in corpus floats; the percentile
    groupBy keys on dim (bounded by model dimensionality, ≤ a few
    thousand) — acceptable state per group because percentile state is
    the group's values ONCE, the same memory the sort-based exact
    percentile needs anywhere; the bounds table (one row per dim) is
    explicitly broadcast back, so the clip-count pass is a map-side
    join + re-aggregation on dim. Two shuffles total, both on the
    bounded dim key."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val32")
    ).select(
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.col("val32").cast("double").alias("val"),
    ).filter(
        F.col("val").isNotNull()
    )
    q = x.groupBy("dim").agg(
        F.count("*").alias("n_vals"),
        F.round(F.expr("percentile(val, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(val, 0.95)"), 6).alias("hi"),
    )
    j = x.join(F.broadcast(q), "dim")
    below = F.sum((F.col("val") < F.col("lo")).cast("int")).cast("bigint")
    above = F.sum((F.col("val") > F.col("hi")).cast("int")).cast("bigint")
    return j.groupBy("dim", "lo", "hi", "n_vals").agg(
        below.alias("n_below"),
        above.alias("n_above"),
        F.expr(
            "CAST((SUM(CAST(val < lo AS INT)) + SUM(CAST(val > hi AS INT)))"
            " * 1000000 div n_vals AS BIGINT)"
        ).alias("clipped_ppm"),
    ).select(
        "dim", "lo", "hi", F.col("n_vals").cast("bigint").alias("n_vals"),
        "n_below", "n_above", "clipped_ppm",
    )


# --------------------------------------------------------------------------
# reciprocal-rank fusion of two retrieval channels (hybrid search)
# --------------------------------------------------------------------------

RRF_K = 60  # the standard RRF damping constant (Cormack et al., 2009)


@register(
    "sim_rank_fusion_rrf",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm,
                      {_sql_bucket('embedding')} AS bucket
               FROM embeddings WHERE embedding IS NOT NULL),
    ea AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                  round({_sql_dot('q.embedding', 'c.embedding')}
                        / (q.nrm * c.nrm), 6) AS cosine
           FROM v q JOIN v c ON c.vec_id != q.vec_id
           WHERE q.vec_id < {N_QUERIES}),
    a AS (SELECT query_id, cand_id, rnk AS rank_exact FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rnk
            FROM ea) WHERE rnk <= {TOP_K}),
    eb AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                  round({_sql_dot('q.embedding', 'c.embedding')}
                        / (q.nrm * c.nrm), 6) AS cosine
           FROM v q JOIN v c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
           WHERE q.vec_id < {N_QUERIES}),
    b AS (SELECT query_id, cand_id, rnk AS rank_lsh FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rnk
            FROM eb) WHERE rnk <= {TOP_K})
    SELECT COALESCE(a.query_id, b.query_id) AS query_id,
           COALESCE(a.cand_id, b.cand_id) AS cand_id,
           a.rank_exact, b.rank_lsh,
           CAST(round((COALESCE(1.0 / ({RRF_K} + a.rank_exact), 0)
                     + COALESCE(1.0 / ({RRF_K} + b.rank_lsh), 0)) * 1000000,
                      0) AS BIGINT) AS rrf_ppm
    FROM a FULL OUTER JOIN b
      ON a.query_id = b.query_id AND a.cand_id = b.cand_id
    """,
    tags=("llm", "similarity", "retrieval"),
)
def sim_rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (RRF, Cormack et al. 2009) of two
    retrieval channels per query vector: the exact-cosine top-k and
    the LSH-bucketed ANN top-k, fused as sum(1/(60+rank)) — the
    standard hybrid-search merge (vector + lexical, or two ANN
    indexes) an embedding-retrieval stack runs. Channels disagree
    exactly where LSH recall fails, so the fused table doubles as a
    recall diagnostic: a candidate with rank_exact set and rank_lsh
    NULL is a miss of the ANN channel.

    Exactness: ranks are integers with total-order tiebreaks, the RRF
    score is a two-term double sum of integer reciprocals rounded to
    integer ppm. Scale: channel A broadcasts the {N_QUERIES}-row query
    set against the corpus (the exact baseline — at 100 TB swap the
    IVF channel in, same fusion shape); channel B is bucket-local;
    the fusion is a (query_id, cand_id)-keyed full outer join of two
    top-k tables, each ≤ queries × k rows — trivially small."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    v = emb.select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
    )
    # filter + limit: the GlobalLimit marks the broadcast side provably
    # bounded for the static-broadcast plan rule (vec_ids are unique,
    # so the limit is a no-op on values — same as sim_cosine_topk)
    q = v.filter(F.col("vec_id") < N_QUERIES).limit(N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    cos = F.round(
        F.try_divide(
            _dot(F.col("q_emb"), F.col("embedding")),
            F.col("q_nrm") * F.col("nrm"),
        ),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "cand_id")
    a = (
        F.broadcast(q)
        .join(v, F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"), cos.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", F.col("rnk").alias("rank_exact"))
    )
    b = (
        F.broadcast(q)
        .join(
            v,
            (F.col("q_bucket") == F.col("bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", F.col("vec_id").alias("cand_id"), cos.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", F.col("rnk").alias("rank_lsh"))
    )
    fused = a.alias("a").join(
        b.alias("b"),
        (F.col("a.query_id") == F.col("b.query_id"))
        & (F.col("a.cand_id") == F.col("b.cand_id")),
        "full_outer",
    )
    rrf = (
        F.coalesce(1.0 / (F.lit(RRF_K) + F.col("a.rank_exact")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("b.rank_lsh")), F.lit(0.0))
    ) * 1000000.0
    return fused.select(
        F.coalesce(F.col("a.query_id"), F.col("b.query_id")).alias("query_id"),
        F.coalesce(F.col("a.cand_id"), F.col("b.cand_id")).alias("cand_id"),
        F.col("a.rank_exact").alias("rank_exact"),
        F.col("b.rank_lsh").alias("rank_lsh"),
        F.round(rrf, 0).cast("bigint").alias("rrf_ppm"),
    )


# --- Matryoshka truncation audit --------------------------------------------

MATRYOSHKA_K = 5  # rank depth audited at the truncated dimension


@register(
    "embed_matryoshka_overlap_audit",
    oracle=f"""
    WITH v AS MATERIALIZED (
      SELECT vec_id, embedding,
             embedding[1:greatest(len(embedding)//2, 1)] AS half,
             sqrt({_sql_dot('embedding', 'embedding')}) AS nrm_f
      -- NULL embeddings can't be scored: excluded as query AND
      -- candidate, both engines
      FROM embeddings WHERE embedding IS NOT NULL),
    v2 AS MATERIALIZED (
      SELECT vec_id, embedding, half, nrm_f,
             sqrt({_sql_dot('half', 'half')}) AS nrm_h
      FROM v),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             round({_sql_dot('q.embedding', 'c.embedding')}
                   / (q.nrm_f * c.nrm_f), 6) AS cf,
             round({_sql_dot('q.half', 'c.half')}
                   / (q.nrm_h * c.nrm_h), 6) AS ch
      FROM v2 q JOIN v2 c ON c.vec_id != q.vec_id
      WHERE q.vec_id < {N_QUERIES}),
    r AS (
      SELECT query_id, cand_id, cf, ch,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cf DESC, cand_id) AS rf,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY ch DESC, cand_id) AS rh
      FROM p)
    SELECT query_id,
           CAST(COUNT(*) FILTER (WHERE rf <= {MATRYOSHKA_K}
                                   AND rh <= {MATRYOSHKA_K}) AS BIGINT)
             AS overlap_at_k,
           CAST(COUNT(*) FILTER (WHERE rf <= {MATRYOSHKA_K}) AS BIGINT)
             AS n_top,
           CAST(SUM(CASE WHEN rf <= {MATRYOSHKA_K} THEN
                 abs(CAST(round(cf * 1000000.0, 0) AS BIGINT)
                   - CAST(round(ch * 1000000.0, 0) AS BIGINT)) END) AS BIGINT)
             AS sum_abs_delta_ppm,
           CAST(COUNT(*) FILTER (WHERE rf <= {MATRYOSHKA_K}
                                   AND cf IS NOT NULL
                                   AND ch IS NOT NULL) AS BIGINT)
             AS n_scored,
           MAX(CASE WHEN rf = 1 THEN cand_id END) AS top1_full,
           MAX(CASE WHEN rh = 1 THEN cand_id END) AS top1_half
    FROM r GROUP BY query_id
    """,
    tags=("llm", "embedding", "similarity", "audit"),
)
def embed_matryoshka_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: before cutting embedding storage and
    ANN cost 2× by keeping only the first d/2 dimensions (the MRL
    training promise — Kusupati et al. 2022), measure what the
    truncation does to retrieval on YOUR corpus. For each query vector,
    rank every candidate by full-dimension cosine AND by first-half
    cosine, then report per query: the top-k overlap between the two
    rankings, the summed |cosine delta| (integer ppm) over the
    full-dim top-k, and both top-1 ids — the exact numbers that decide
    whether the truncated index is safe to ship.

    Exactness: cosines are round-6 sequential folds (identical in both
    engines); deltas are differences of round-0 integer ppm; overlap,
    counts and top-1 picks ride the (cosine DESC NULLS LAST, cand_id)
    total order both engines share. Zero-norm or ragged or
    NULL-element pairs get NULL cosines (they rank last and are
    excluded from n_scored — a half-vector CAN be all-zero while the
    full vector is not, which is exactly the degenerate shape the
    audit should surface, not crash on).

    Scale: the bounded query set (vec_id < {N_QUERIES}) broadcasts;
    ONE corpus scan computes both cosines per pair (the half-dot costs
    half the full dot, not a second pass over the data); the two rank
    windows share one query_id shuffle. Same shape as the accepted
    sim_cosine_topk baseline — at production query counts you shard
    the query set and fan out the same plan, or move to the
    mapInPandas BLAS path of sim_cosine_topk_numpy."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    half = F.expr(
        "slice(embedding, 1, greatest(cast(size(embedding) / 2 as int), 1))"
    )
    v = emb.select(
        "vec_id",
        "embedding",
        half.alias("half"),
        _norm(F.col("embedding")).alias("nrm_f"),
        _norm(half).alias("nrm_h"),
    )
    # the limit makes the broadcast side PROVABLY bounded (GlobalLimit
    # subtree — the static-broadcast audit's contract; same idiom as
    # sim_cosine_topk)
    q = v.filter(F.col("vec_id") < N_QUERIES).limit(N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("half").alias("q_half"),
        F.col("nrm_f").alias("q_nrm_f"),
        F.col("nrm_h").alias("q_nrm_h"),
    )
    pairs = F.broadcast(q).join(v, F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        F.round(
            F.try_divide(
                _dot(F.col("q_emb"), F.col("embedding")),
                F.col("q_nrm_f") * F.col("nrm_f"),
            ),
            6,
        ).alias("cf"),
        F.round(
            F.try_divide(
                _dot(F.col("q_half"), F.col("half")),
                F.col("q_nrm_h") * F.col("nrm_h"),
            ),
            6,
        ).alias("ch"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("cf").desc(), "cand_id")
    wh = Window.partitionBy("query_id").orderBy(F.col("ch").desc(), "cand_id")
    r = pairs.select(
        "query_id",
        "cand_id",
        "cf",
        "ch",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wh).alias("rh"),
    )
    in_top_f = F.col("rf") <= MATRYOSHKA_K
    delta = F.abs(
        F.round(F.col("cf") * 1000000.0, 0).cast("bigint")
        - F.round(F.col("ch") * 1000000.0, 0).cast("bigint")
    )
    return r.groupBy("query_id").agg(
        F.count(F.when(in_top_f & (F.col("rh") <= MATRYOSHKA_K), 1))
        .cast("bigint")
        .alias("overlap_at_k"),
        F.count(F.when(in_top_f, 1)).cast("bigint").alias("n_top"),
        F.sum(F.when(in_top_f, delta)).cast("bigint").alias("sum_abs_delta_ppm"),
        F.count(
            F.when(in_top_f & F.col("cf").isNotNull() & F.col("ch").isNotNull(), 1)
        )
        .cast("bigint")
        .alias("n_scored"),
        F.max(F.when(F.col("rf") == 1, F.col("cand_id"))).alias("top1_full"),
        F.max(F.when(F.col("rh") == 1, F.col("cand_id"))).alias("top1_half"),
    )


@register(
    "embed_isotropy_audit",
    oracle=f"""
    -- per-label isotropy: mean pairwise cosine via the sum-vector
    -- identity (never an O(N^2) pair join) + the dominant-dimension
    -- variance share. All sums ride 6dp-rounded decimals (exact,
    -- order-independent); the cross-dim reductions are dim-ordered
    -- list folds so the double addition sequence matches Spark.
    WITH v AS (
      SELECT label, embedding,
             sqrt({_sql_dot('embedding', 'embedding')}) AS l2
      FROM embeddings WHERE label IS NOT NULL),
    u AS (
      SELECT label, list_transform(embedding,
               x -> round(x::DOUBLE / l2, 6)) AS uvec
      FROM v WHERE l2 IS NOT NULL AND l2 > 0),
    nv AS (SELECT label, COUNT(*) AS n_vecs FROM u GROUP BY label
           HAVING COUNT(*) >= 2),
    d AS (
      SELECT label, i AS dim, uvec[i] AS uv
      FROM (SELECT label, uvec,
                   unnest(generate_series(1, len(uvec))) AS i
            FROM u)),
    dims AS (
      SELECT label, dim,
             CAST(SUM(CAST(uv AS DECIMAL(12,6))) AS DOUBLE) AS s,
             CAST(SUM(round(CAST(uv AS DECIMAL(12,6))
                            * CAST(uv AS DECIMAL(12,6)), 6)) AS DOUBLE)
               AS s2,
             COUNT(*) AS cnt
      FROM d GROUP BY label, dim),
    dv AS (
      SELECT label, dim, s, s2, cnt,
             CAST(cnt AS DOUBLE) * s2 - s * s AS var_num,
             row_number() OVER (
               PARTITION BY label
               ORDER BY CAST(cnt AS DOUBLE) * s2 - s * s DESC, dim)
               AS rn
      FROM dims),
    folds AS (
      SELECT label,
             list_reduce(list(s * s ORDER BY dim), (a, b) -> a + b) AS ssq,
             list_reduce(list(s2 ORDER BY dim), (a, b) -> a + b) AS q,
             list_reduce(list(var_num ORDER BY dim), (a, b) -> a + b)
               AS vsum
      FROM dv GROUP BY label),
    best AS (SELECT label, dim AS top_var_dim, var_num FROM dv WHERE rn = 1)
    SELECT nv.label, CAST(nv.n_vecs AS BIGINT) AS n_vecs,
           round((f.ssq - f.q)
                 / (CAST(nv.n_vecs AS DOUBLE) * (nv.n_vecs - 1)), 6)
             AS mean_pairwise_cosine,
           CAST(b.top_var_dim AS BIGINT) AS top_var_dim,
           CASE WHEN f.vsum <= 0 THEN 0
                ELSE CAST(floor(1000000 * greatest(b.var_num, 0) / f.vsum)
                          AS BIGINT) END AS var_share_ppm
    FROM nv JOIN folds f USING (label) JOIN best b USING (label)
    """,
    tags=("llm", "similarity", "embedding", "audit"),
)
def embed_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-isotropy audit per label: the mean pairwise cosine of
    the unit-normalized vectors — computed exactly via the sum-vector
    identity  sum_ij cos(u_i,u_j) = ||sum_i u_i||^2  so the O(N^2)
    pair relation is never materialized — plus the dominant dimension
    by variance and its share of total variance (rogue-dimension
    detection: anisotropic embedding spaces concentrate variance in a
    few dims, which breaks cosine retrieval).

    Exactness: unit components round to 6dp and sum as exact decimals
    (order-independent); their squares are exact decimal products
    rounded back to 6dp before summing (keeping every unscaled sum
    under 2^53 so the decimal->double cast is ulp-safe); the cross-dim
    reductions fold dim-ordered lists so the double addition sequence
    is identical in both engines; the variance argmax ties break on
    the smaller dim.

    Scale: one posexplode shuffle on (label, dim) with map-side
    combine — O(N*d) rows, exactly like centroid construction; the
    per-label fold tables are O(labels * dims). Zero-norm / NULL-
    element vectors are excluded by the l2 guard in both engines."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()
    )
    v = emb.select(
        "label", "embedding", _norm(F.col("embedding")).alias("l2")
    ).filter(F.col("l2").isNotNull() & (F.col("l2") > 0))
    # try_divide: collapsed projections may evaluate the transform on
    # rows the l2 > 0 filter later drops — ANSI division must not blow
    # up on them (the rows themselves never reach the output)
    u = v.select(
        "label",
        F.transform(
            "embedding",
            lambda x: F.round(F.try_divide(x.cast("double"), F.col("l2")), 6),
        ).alias("uvec"),
    )
    nv = (
        u.groupBy("label")
        .agg(F.count("*").alias("n_vecs"))
        .filter(F.col("n_vecs") >= 2)
    )
    d = u.select("label", F.posexplode("uvec").alias("pos", "uv")).select(
        "label", (F.col("pos") + 1).alias("dim"), "uv"
    )
    uv_dec = F.col("uv").cast("decimal(12,6)")
    dims = d.groupBy("label", "dim").agg(
        F.sum(uv_dec).cast("double").alias("s"),
        F.sum(F.round(uv_dec * uv_dec, 6)).cast("double").alias("s2"),
        F.count("*").alias("cnt"),
    )
    var_num = F.col("cnt").cast("double") * F.col("s2") - F.col("s") * F.col("s")
    w = Window.partitionBy("label").orderBy(var_num.desc(), "dim")
    dv = dims.select(
        "label", "dim", "s", "s2", var_num.alias("var_num"),
        F.row_number().over(w).alias("rn"),
    )
    arr = F.array_sort(F.collect_list(F.struct("dim", "s", "s2", "var_num")))
    folds = dv.groupBy("label").agg(
        F.aggregate(
            arr, F.lit(0.0), lambda a, x: a + x.getField("s") * x.getField("s")
        ).alias("ssq"),
        F.aggregate(arr, F.lit(0.0), lambda a, x: a + x.getField("s2")).alias(
            "q"
        ),
        F.aggregate(
            arr, F.lit(0.0), lambda a, x: a + x.getField("var_num")
        ).alias("vsum"),
    )
    best = dv.filter(F.col("rn") == 1).select(
        "label", F.col("dim").alias("top_var_dim"), "var_num"
    )
    return (
        nv.join(folds, "label")
        .join(best, "label")
        .select(
            "label",
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            F.round(
                (F.col("ssq") - F.col("q"))
                / (
                    F.col("n_vecs").cast("double")
                    * (F.col("n_vecs") - F.lit(1))
                ),
                6,
            ).alias("mean_pairwise_cosine"),
            F.col("top_var_dim").cast("bigint").alias("top_var_dim"),
            F.when(F.col("vsum") <= 0, F.lit(0).cast("bigint"))
            .otherwise(
                F.floor(
                    F.lit(1_000_000.0)
                    * F.greatest(F.col("var_num"), F.lit(0.0))
                    / F.col("vsum")
                ).cast("bigint")
            )
            .alias("var_share_ppm"),
        )
    )


@register(
    "sim_query_expansion_prf",
    oracle=f"""
    -- pseudo-relevance feedback: retrieve top-10 by cosine, average
    -- the unit vectors of the results into an expanded query, retrieve
    -- again, and report the result-set drift (overlap / Jaccard).
    WITH v AS (
      SELECT vec_id, embedding,
             sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
      FROM embeddings WHERE vec_id IS NOT NULL),
    val AS (SELECT * FROM v WHERE nrm IS NOT NULL AND nrm > 0),
    un AS (
      SELECT vec_id, uc, sqrt({_sql_dot('uc', 'uc')}) AS ucn
      FROM (SELECT vec_id,
                   list_transform(embedding,
                                  x -> round(x::DOUBLE / nrm, 6)) AS uc
            FROM val)),
    q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn
          FROM val WHERE vec_id < {N_QUERIES}),
    r1 AS (
      SELECT query_id, cand_id FROM (
        SELECT q.query_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round({_sql_dot('q.qe', 'c.embedding')}
                                / (q.qn * c.nrm), 6) DESC,
                          c.vec_id) AS rnk
        FROM q JOIN val c ON c.vec_id != q.query_id
        WHERE round({_sql_dot('q.qe', 'c.embedding')} / (q.qn * c.nrm), 6)
              IS NOT NULL)
      WHERE rnk <= 10),
    md AS (
      SELECT query_id, i AS dim, uc[i] AS x
      FROM (SELECT r1.query_id, un.uc,
                   unnest(generate_series(1, len(un.uc))) AS i
            FROM r1 JOIN un ON un.vec_id = r1.cand_id)),
    ed AS (
      SELECT query_id, dim,
             CAST(SUM(CAST(x AS DECIMAL(12,6))) AS DOUBLE) / COUNT(*) AS ev
      FROM md GROUP BY query_id, dim),
    en AS (
      SELECT query_id, evec, enorm
      FROM (SELECT query_id, evec,
                   sqrt({_sql_dot('evec', 'evec')}) AS enorm
            FROM (SELECT query_id, list(ev ORDER BY dim) AS evec
                  FROM ed GROUP BY query_id))
      WHERE enorm > 0),
    r2 AS (
      SELECT query_id, cand_id FROM (
        SELECT en.query_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY en.query_id
                 ORDER BY round({_sql_dot('en.evec', 'c.uc')}
                                / (en.enorm * c.ucn), 6) DESC,
                          c.vec_id) AS rnk
        FROM en JOIN un c ON c.vec_id != en.query_id
        WHERE round({_sql_dot('en.evec', 'c.uc')} / (en.enorm * c.ucn), 6)
              IS NOT NULL)
      WHERE rnk <= 10),
    ov AS (SELECT r1.query_id, COUNT(*) AS n_overlap
           FROM r1 JOIN r2 USING (query_id, cand_id) GROUP BY r1.query_id),
    c1 AS (SELECT query_id, COUNT(*) AS n1 FROM r1 GROUP BY query_id),
    c2 AS (SELECT query_id, COUNT(*) AS n2 FROM r2 GROUP BY query_id)
    SELECT c1.query_id, CAST(c1.n1 AS BIGINT) AS n_round1,
           CAST(c2.n2 AS BIGINT) AS n_round2,
           CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(floor(1000000.0 * COALESCE(ov.n_overlap, 0)
                      / (c1.n1 + c2.n2 - COALESCE(ov.n_overlap, 0)))
                AS BIGINT) AS jaccard_ppm
    FROM c1 JOIN c2 USING (query_id) LEFT JOIN ov USING (query_id)
    """,
    tags=("llm", "similarity", "retrieval"),
)
def sim_query_expansion_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback retrieval audit (Rocchio with
    alpha=0): each query retrieves its cosine top-10, the unit vectors
    of those results average into an expanded query (exact
    rounded-decimal per-dim means), the expanded query retrieves
    again, and the report shows how far the result set moved —
    round-1/round-2 sizes, overlap, and Jaccard ppm. High drift means
    feedback would change what the user sees; zero drift means the
    neighborhood is stable.

    Exactness: both retrieval rounds use the shared sequential-fold
    dot product and 6dp-rounded cosines with (cosine DESC, cand_id)
    tie-breaks; expansion components are exact decimal sums divided by
    exact counts; NULL cosines (ragged/NULL vectors) are filtered in
    both engines.

    Scale (r13): both rounds broadcast a bounded query side
    (GlobalLimit N_QUERIES after the vec_id pushdown / the per-query
    aggregation) against one corpus scan each — candidate rows never
    shuffle on a corpus-sized key. Each round's top-10 is TWO-LEVEL
    (guide §2.5): a deterministic 64-way salt (pmod(xxhash64(cand_id)))
    first ranks within (query_id, salt) cells — spreading the scored
    rows over 64*N_QUERIES partitions instead of hot-keying them into
    N_QUERIES=5 — then the true window ranks the <= 64*10 per-query
    survivors. Provably identical: any global top-10 row has < 10 rows
    above it globally, hence < 10 above it in its own salt cell, so it
    survives the cell prune and the outer window sees every row that
    outranks it. The bounded r1/r2 lists BROADCAST into the expansion
    and overlap joins (r13 — localCheckpoint erases size stats, so the
    planner was sort-merge-joining the corpus-sized unit-vector table
    against 50 rows). The expansion aggregate is O(10 * dims) rows per
    query."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull()
    )
    v = emb.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    ).filter(F.col("nrm").isNotNull() & (F.col("nrm") > 0))
    un = v.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(F.try_divide(x.cast("double"), F.col("nrm")), 6),
        ).alias("uc"),
        "nrm",
    ).select("vec_id", "uc", _norm(F.col("uc")).alias("ucn"))
    q = (
        v.filter(F.col("vec_id") < N_QUERIES)
        .limit(N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qn"),
        )
    )
    cos1 = F.round(
        F.try_divide(
            _dot(F.col("qe"), F.col("embedding")), F.col("qn") * F.col("nrm")
        ),
        6,
    )
    def _topk10(scored: DataFrame, cos_col: str) -> DataFrame:
        """Per-query top-10 by (cosine DESC, cand_id): two-level when
        PRF_SALT_CELLS > 0 (any global top-10 row has < 10 rows above
        it globally, hence < 10 above it in its own deterministic salt
        cell, so it survives level 1 and level 2 sees every row that
        outranks it — identical output), single window otherwise."""
        out = scored.filter(F.col(cos_col).isNotNull())
        w = Window.partitionBy("query_id").orderBy(
            F.col(cos_col).desc(), "cand_id"
        )
        if PRF_SALT_CELLS:
            wa = Window.partitionBy("query_id", "salt").orderBy(
                F.col(cos_col).desc(), "cand_id"
            )
            out = (
                out.withColumn(
                    "salt",
                    F.pmod(F.xxhash64("cand_id"), F.lit(PRF_SALT_CELLS)),
                )
                .withColumn("crn", F.row_number().over(wa))
                .filter(F.col("crn") <= 10)
                .select("query_id", "cand_id", cos_col)
            )
        return (
            out.select(
                "query_id", "cand_id", F.row_number().over(w).alias("rnk")
            )
            .filter(F.col("rnk") <= 10)
            .select("query_id", "cand_id")
        )

    r1 = _topk10(
        F.broadcast(q)
        .join(v, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("cand_id"), cos1.alias("cos1")
        ),
        "cos1",
        # bounded (N_QUERIES × 10): three consumers (expansion terms,
        # the overlap join, the round-1 count) each re-ran the full
        # corpus-scan round without this barrier (guide §5)
    ).localCheckpoint(eager=True)
    md = (
        un.join(F.broadcast(r1), r1.cand_id == un.vec_id)
        .select("query_id", F.posexplode("uc").alias("pos", "x"))
        .select("query_id", (F.col("pos") + 1).alias("dim"), "x")
    )
    ed = md.groupBy("query_id", "dim").agg(
        (
            F.sum(F.col("x").cast("decimal(12,6)")).cast("double")
            / F.count("*")
        ).alias("ev")
    )
    e = ed.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "ev"))),
            lambda s: s.getField("ev"),
        ).alias("evec")
    )
    # expanded queries that cancel to the zero vector have no cosine
    # direction — excluded in BOTH engines (enorm > 0)
    en = (
        e.select("query_id", "evec", _norm(F.col("evec")).alias("enorm"))
        .filter(F.col("enorm") > 0)
        .limit(N_QUERIES)
    )
    cos2 = F.round(
        F.try_divide(
            _dot(F.col("evec"), F.col("uc")), F.col("enorm") * F.col("ucn")
        ),
        6,
    )
    r2 = _topk10(
        F.broadcast(en)
        .join(un, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("cand_id"), cos2.alias("cos2")
        ),
        "cos2",
        # bounded: two consumers (overlap join, round-2 count)
    ).localCheckpoint(eager=True)
    ov = r1.join(F.broadcast(r2), ["query_id", "cand_id"]).groupBy(
        "query_id"
    ).agg(F.count("*").alias("n_overlap"))
    c1 = r1.groupBy("query_id").agg(F.count("*").alias("n1"))
    c2 = r2.groupBy("query_id").agg(F.count("*").alias("n2"))
    return (
        c1.join(c2, "query_id")
        .join(ov, "query_id", "left")
        .select(
            "query_id",
            F.col("n1").cast("bigint").alias("n_round1"),
            F.col("n2").cast("bigint").alias("n_round2"),
            F.coalesce(F.col("n_overlap"), F.lit(0))
            .cast("bigint")
            .alias("n_overlap"),
            F.floor(
                F.lit(1_000_000.0)
                * F.coalesce(F.col("n_overlap"), F.lit(0))
                / (
                    F.col("n1") + F.col("n2")
                    - F.coalesce(F.col("n_overlap"), F.lit(0))
                )
            )
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )


NPROBE_POINTS = (1, 2, 4)


@register(
    "sim_ivf_nprobe_recall_curve",
    oracle=f"""
    -- index-tuning curve: recall@k AND scan cost per nprobe setting,
    -- against the brute-force truth — the table that picks an IVF
    -- deployment's nprobe before anything ships.
    WITH {_SQL_CENTROIDS},
    pairs AS (SELECT e.vec_id, e.embedding, c.label AS cl,
                     {_sql_d2('e.embedding', 'c.cvec')} AS d2
              FROM embeddings e CROSS JOIN cents c),
    ranked AS (SELECT vec_id, embedding, cl,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY round(d2, 6), cl) AS rn
               FROM pairs),
    v AS (SELECT vec_id, embedding, cl AS cell,
                 sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
          FROM ranked WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb,
                 sqrt({_sql_dot('embedding', 'embedding')}) AS q_nrm
          FROM v WHERE vec_id < {N_QUERIES}),
    truth AS (
      SELECT query_id, cand_id FROM (
        SELECT q.query_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round({_sql_dot('q.q_emb', 'c.embedding')}
                                / (q.q_nrm * c.nrm), 6) DESC, c.vec_id)
                 AS rnk
        FROM q JOIN v c ON c.vec_id != q.query_id)
      WHERE rnk <= {RECALL_K}),
    qprobe AS (
      SELECT r.vec_id AS query_id, p.np, r.cl AS probe_cell
      FROM ranked r
      CROSS JOIN (SELECT unnest([{', '.join(str(p) for p in NPROBE_POINTS)}])
                  AS np) p
      WHERE r.vec_id < {N_QUERIES} AND r.rn <= p.np),
    scored AS (
      SELECT qp.query_id, qp.np, c.vec_id AS cand_id,
             round({_sql_dot('q.q_emb', 'c.embedding')}
                   / (q.q_nrm * c.nrm), 6) AS cosine
      FROM qprobe qp
      JOIN q ON q.query_id = qp.query_id
      JOIN v c ON c.cell = qp.probe_cell AND c.vec_id != qp.query_id),
    approx AS (
      SELECT query_id, np, cand_id FROM (
        SELECT query_id, np, cand_id,
               row_number() OVER (PARTITION BY query_id, np
                                  ORDER BY cosine DESC, cand_id) AS rnk
        FROM scored)
      WHERE rnk <= {RECALL_K}),
    cost AS (SELECT query_id, np, CAST(COUNT(*) AS BIGINT) AS n_scanned
             FROM scored GROUP BY query_id, np)
    SELECT a.query_id, CAST(a.np AS INT) AS nprobe, co.n_scanned,
           CAST(COUNT(t.cand_id) AS BIGINT) AS n_hits,
           CAST(round(COUNT(t.cand_id) * 1000000.0 / {RECALL_K}, 0)
                AS BIGINT) AS recall_ppm
    FROM approx a
    LEFT JOIN truth t ON t.query_id = a.query_id AND t.cand_id = a.cand_id
    JOIN cost co ON co.query_id = a.query_id AND co.np = a.np
    GROUP BY a.query_id, a.np, co.n_scanned
    """,
    tags=("llm", "similarity", "ann", "ivf", "audit"),
)
def sim_ivf_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF nprobe tuning curve: for each query and each nprobe in
    (1, 2, 4), recall@k against the brute-force truth AND the number
    of candidates actually scanned — the cost/quality trade-off table
    an ANN deployment reads to pick its operating point (recall climbs
    with probes, scan cost climbs with it; the knee is the setting).
    Extends sim_ann_recall_audit (one fixed index) and
    sim_ivf_multiprobe_topk (fixed nprobe=2) into the full curve.

    Scale: the index assignment is the same broadcast-centroid
    map-side argmin as every IVF op; the probe fan-out is bounded
    (queries x sum(nprobe points) rows) and joins cell-locally, so the
    corpus never re-shuffles; the truth side is affordable because it
    ranks only the bounded query sample — exactly how production
    recall monitoring works."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cents = (
        emb.filter(F.col("label").isNotNull())
        .select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(
            (
                F.sum(
                    F.round(F.col("val").cast("double"), 6).cast(
                        "decimal(12,6)"
                    )
                ).cast("double")
                / F.count("*")
            ).alias("cv")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                lambda s: s["cv"],
            ).alias("cvec")
        )
    )
    # map-side cell ranking (r13: was a K×-corpus crossJoin + window
    # whose subtree re-executed for FOUR consumers — v/truth, q, the
    # probe fan-out, and scored; the ranking is now a per-row
    # projection, see _ranked_cells). The assignment is materialized
    # ONCE: its two full-corpus consumers (the truth join and the
    # probe-scored join) would each re-run the O(K·D) ranking AND the
    # centroid aggregation without a barrier (the old window form
    # shared its exchange via ReuseExchange; map-side has no exchange
    # to reuse — unbarriered this measured 12.2 s at ×100 vs 8.7 for
    # the r12 window form; stress_x100_r13b.json has the shipped
    # number). The barrier is an EXPLICIT repartition: ReuseExchange
    # shares the one exchange across the two consumers — the r12
    # mechanism minus the window sort. (A/B on the ann-join twin of
    # this relation: localCheckpoint 35.8 s — block-manager variance
    # class on embedding arrays — materialize_parquet 15.9 s, reused
    # exchange fastest; this query's own parquet run read 9.7 s.) The
    # bounded probe fan-out still reads `rc` directly (vec_id <
    # N_QUERIES prunes its scan).
    rc = _ranked_cells(emb, cents, "label", "cvec", F.col("embedding"))
    v = rc.select(
        "vec_id",
        "embedding",
        F.get("_rc", 0).getField("cid").alias("cell"),
        _norm(F.col("embedding")).alias("nrm"),
    ).repartition("vec_id")
    q = (
        # read the PRUNED ranked scan, not v: the eager checkpoint of
        # these 5 bounded rows runs as its own job at build time, and
        # reading v here would compute the full corpus exchange once
        # extra before the main job reuses it (r13b)
        rc.filter(F.col("vec_id") < N_QUERIES)
        .limit(N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_nrm"),
        )
        # 5 bounded rows feeding the truth join AND the probe join:
        # one corpus scan instead of two (guide §5 — cache bounded
        # reused relations)
        .localCheckpoint(eager=True)
    )
    cos = F.round(
        F.try_divide(
            _dot(F.col("q_emb"), F.col("embedding")),
            F.col("q_nrm") * F.col("nrm"),
        ),
        6,
    )
    w_truth = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "cand_id"
    )
    truth = (
        F.broadcast(q)
        .join(v, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("cand_id"), cos.alias("cosine")
        )
        .withColumn("rnk", F.row_number().over(w_truth))
        .filter(F.col("rnk") <= RECALL_K)
        .select("query_id", "cand_id")
    )
    qprobe = (
        rc.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.flatten(
                    F.transform(
                        F.array(*[F.lit(p) for p in NPROBE_POINTS]),
                        lambda np_: F.transform(
                            F.slice("_rc", F.lit(1), np_),
                            lambda c: F.struct(
                                np_.alias("np"),
                                c.getField("cid").alias("probe_cell"),
                            ),
                        ),
                    )
                )
            ).alias("p"),
        )
        .select("query_id", F.col("p.np").alias("np"), F.col("p.probe_cell").alias("probe_cell"))
        .limit(N_QUERIES * sum(NPROBE_POINTS))  # provably bounded broadcast
    )
    scored = (
        F.broadcast(qprobe.join(q, "query_id"))
        .join(
            v,
            (F.col("cell") == F.col("probe_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "np",
            F.col("vec_id").alias("cand_id"),
            cos.alias("cosine"),
        )
    )
    w_np = Window.partitionBy("query_id", "np").orderBy(
        F.col("cosine").desc(), "cand_id"
    )
    # ONE pass over the scored candidates serves BOTH the top-k list
    # and the scan-cost count (r13: approx and cost each re-executed
    # the whole scored subtree — the window and the groupBy share one
    # (query_id, np) exchange, and the bounded per-(query, np) result
    # is checkpointed for its two consumers)
    per = (
        scored.withColumn("rnk", F.row_number().over(w_np))
        .groupBy("query_id", "np")
        .agg(
            F.count("*").cast("bigint").alias("n_scanned"),
            # collect_list skips NULLs: exactly the rnk <= K ids
            F.collect_list(
                F.when(F.col("rnk") <= RECALL_K, F.col("cand_id"))
            ).alias("topk"),
        )
        .localCheckpoint(eager=True)  # bounded: queries × nprobe points
    )
    approx = per.select(
        "query_id", "np", F.explode("topk").alias("cand_id")
    )
    cost = per.select("query_id", "np", "n_scanned")
    t = truth.select(
        F.col("query_id").alias("t_q"), F.col("cand_id").alias("t_c")
    )
    return (
        approx.join(
            t,
            (F.col("query_id") == F.col("t_q"))
            & (F.col("cand_id") == F.col("t_c")),
            "left",
        )
        .groupBy("query_id", "np")
        .agg(F.count("t_c").cast("bigint").alias("n_hits"))
        .join(cost, ["query_id", "np"])
        .select(
            "query_id",
            F.col("np").cast("int").alias("nprobe"),
            "n_scanned",
            "n_hits",
            F.round(F.col("n_hits") * 1000000.0 / RECALL_K, 0)
            .cast("bigint")
            .alias("recall_ppm"),
        )
    )
