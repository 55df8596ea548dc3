"""Multimodal columns (SURVEY.md §2C extension): image/audio/video as
opaque ``binary`` columns with typed metadata structs, processed by
Arrow-batched ``mapInPandas`` kernels.

The decode step itself is STUBBED (no image/audio libraries in this
container — ``decode_image`` raises ``NotImplementedError`` unless
given the deterministic fake decoder), but all the Spark-side plumbing
is real and tested: schema contracts, binary payloads, batch
iteration, partition-parallel kernels, metadata struct propagation.
Swap ``_fake_decode`` for a Pillow/ffmpeg call and nothing else
changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register

# schema contract for the featurize kernel's output
FEATURE_SCHEMA = (
    "doc_id long, kind string, n_bytes long, width int, height int, feature array<double>"
)
N_FEATURES = 8


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           'text' AS kind,
           lang AS meta_lang,
           n_chars AS meta_chars
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata in one row: cast the text
    payload to binary (stand-in for image/audio bytes), carry a
    metadata struct, expose byte length and content hash. Nested
    struct/binary columns are native columnar types — no serialization
    tax at rest or in shuffle."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("text").alias("kind"),
            F.col("lang").alias("lang"),
            F.col("n_chars").alias("chars"),
        ).alias("meta"),
    )
    return with_payload.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.col("meta.kind").alias("kind"),
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.chars").alias("meta_chars"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real decoder slot. In production: Pillow/turbojpeg decode to
    HxWxC array. This container has no image libraries, so calling it
    is an explicit error; the pipeline uses _fake_decode."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; use _fake_decode for the deterministic test path"
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: derives (width, height, features)
    purely from the payload bytes via md5 — stable across runs and
    partitionings, exercising the exact same plumbing as a real
    decoder."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    feats = [round(b / 255.0, 6) for b in h[2 : 2 + N_FEATURES]]
    return width, height, feats


def featurize_binary(df: DataFrame, kind: str = "image") -> DataFrame:
    """Arrow-batched featurize kernel over (doc_id, payload) rows —
    the multimodal map pattern: mapInPandas, one Python worker per
    input partition, pandas in / pandas out, schema-checked."""
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                w, h, feats = _fake_decode(data)
                rows.append((doc_id, kind, len(data), w, h, feats))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "kind", "n_bytes", "width", "height", "feature"],
            )

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


@register(
    "multimodal_features",
    oracle=None,  # fake-decoder output is not SQL-expressible → rows-only
    tags=("llm", "multimodal", "pandas_udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline on fixture data: binary payload →
    mapInPandas featurize (deterministic fake decoder) → typed feature
    rows. Verified for determinism + schema in tests/test_llm_ops.py."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    feats = featurize_binary(payloads)
    return feats.select(
        "doc_id",
        "kind",
        "n_bytes",
        "width",
        "height",
        F.concat_ws(",", F.transform("feature", lambda x: x.cast("string"))).alias(
            "feature_csv"
        ),
    )


RESIZE_SCHEMA = "doc_id long, width int, height int, target_w int, target_h int, scale double"
FRAME_SCHEMA = "doc_id long, frame_no int, frame_md5 string"


def resize_binary(df: DataFrame, target: tuple[int, int] = (32, 32)) -> DataFrame:
    """Resize kernel plumbing: decode (fake) → compute scale → emit
    resized geometry. Swap _fake_decode + the arithmetic for a real
    image op; the mapInPandas shape is identical."""
    import pandas as pd

    tw, th = target

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _ = _fake_decode(bytes(payload))
                scale = round(min(tw / w, th / h), 6)
                rows.append((doc_id, w, h, tw, th, scale))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "target_w", "target_h", "scale"]
            )

    return df.mapInPandas(kernel, RESIZE_SCHEMA)


def frame_sample_binary(df: DataFrame, every_n: int = 4, max_frames: int = 3) -> DataFrame:
    """Frame-sampling kernel plumbing for video-like payloads: derive a
    deterministic per-payload frame count, emit every ``every_n``-th
    frame id + a content hash (one input row → N output rows, the
    UDTF-ish mapInPandas shape)."""
    import hashlib as _hl

    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = 8 + _hl.md5(data).digest()[3] % 24
                sampled = list(range(0, n_frames, every_n))[:max_frames]
                for fno in sampled:
                    frame_md5 = _hl.md5(data + fno.to_bytes(4, "big")).hexdigest()
                    rows.append((doc_id, fno, frame_md5))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_md5"])

    return df.mapInPandas(kernel, FRAME_SCHEMA)


@register(
    "multimodal_resize",
    oracle=None,  # fake-decoder geometry → rows-only
    tags=("llm", "multimodal", "pandas_udf"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline over binary payloads (deterministic fake decode)."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return resize_binary(payloads)


@register(
    "multimodal_frame_sample",
    oracle=None,  # fake frame derivation → rows-only
    tags=("llm", "multimodal", "pandas_udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline over video-like binary payloads."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return frame_sample_binary(payloads)


def featurize_binary_arrow(df: DataFrame, kind: str = "image") -> DataFrame:
    """The same featurize kernel as :func:`featurize_binary` but via
    ``mapInArrow`` — RecordBatch in / RecordBatch out, no pandas
    conversion at all. For binary-heavy multimodal batches this skips
    the Arrow→pandas→Arrow round trip (object-dtype boxing of every
    payload), the right default when the kernel only reads raw bytes.
    Output is row-identical to the pandas kernel (asserted in
    tests/test_llm_ops.py)."""
    import pyarrow as pa

    def kernel(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out = {"doc_id": [], "kind": [], "n_bytes": [], "width": [], "height": [], "feature": []}
            for doc_id, payload in zip(doc_ids, payloads):
                data = bytes(payload)
                w, h, feats = _fake_decode(data)
                out["doc_id"].append(doc_id)
                out["kind"].append(kind)
                out["n_bytes"].append(len(data))
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feats)
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema(
                    [
                        ("doc_id", pa.int64()),
                        ("kind", pa.string()),
                        ("n_bytes", pa.int64()),
                        ("width", pa.int32()),
                        ("height", pa.int32()),
                        ("feature", pa.list_(pa.float64())),
                    ]
                ),
            )

    return df.mapInArrow(kernel, FEATURE_SCHEMA)


@register(
    "multimodal_features_arrow",
    oracle=None,  # fake-decoder output is not SQL-expressible → rows-only;
    # row-identity with the mapInPandas variant asserted in tests
    tags=("llm", "multimodal", "arrow"),
)
def multimodal_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow variant of multimodal_features: identical output,
    zero pandas boxing of the binary payloads."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    feats = featurize_binary_arrow(payloads)
    return feats.select(
        "doc_id",
        "kind",
        "n_bytes",
        "width",
        "height",
        F.concat_ws(",", F.transform("feature", lambda x: x.cast("string"))).alias(
            "feature_csv"
        ),
    )
