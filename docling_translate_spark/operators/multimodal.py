"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference handles images as PNG bytes saved per document
(reference ``src/utils.py:25-77``) and re-embedded as base64 data URIs
(``src/utils.py:95-124``). A transcript-scale pipeline carries media as
``binary`` columns with typed metadata instead; decode / feature-extract /
resize / frame-sample run as Arrow-batched UDFs over ``mapInPandas``.

The image/audio codec libraries are not in this container, so the decode
kernels are STUBBED: ``decode_image`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder produces
byte-derived features. The Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested; swapping the fake
for Pillow/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("conv_id", StringType(), True),
        StructField("turn_idx", IntegerType(), True),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("hex_sha256", StringType(), False),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to a 2-D uint8 grayscale array.

    Real path: Pillow, behind an optional import — production-real
    wherever the dependency exists (the reference's image handling is
    PNG bytes via PIL, ``src/utils.py:25-77``). Where Pillow is absent
    (this container), the real path raises and ``fake=True`` selects
    the deterministic crc-seeded test decoder, which keeps the Spark
    plumbing (schema, batch shape, pooling math) fully exercised."""
    if not fake:
        try:
            from PIL import Image  # optional dependency
        except ImportError as e:
            raise NotImplementedError(
                "image decoding requires Pillow/libjpeg (not in this "
                "container); use fake=True for the deterministic test "
                "decoder"
            ) from e
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)
    # deterministic fake: bytes → 8x8 "pixels" via crc32 seeding
    seed = zlib.crc32(payload or b"")
    rng = np.random.RandomState(seed % (2**31))
    return rng.randint(0, 256, size=(8, 8), dtype=np.uint8)


def synth_media_df(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (binary payload from crc-seeded
    bytes) for exercising the plumbing."""
    kinds = ("image", "audio", "video")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in [f.name for f in MEDIA_SCHEMA.fields]}
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = hashlib.sha256(f"media-{i}".encode()).digest() * (i % 4 + 1)
                rows["media_id"].append(i)
                rows["conv_id"].append(f"conv-{i % 10:06d}")
                rows["turn_idx"].append(i % 7)
                rows["kind"].append(kind)
                rows["mime"].append(
                    {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
                )
                rows["payload"].append(payload)
                rows["width"].append(64 if kind != "audio" else None)
                rows["height"].append(48 if kind != "audio" else None)
                rows["duration_ms"].append(None if kind == "image" else 1000 + i)
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, numPartitions=max(n // 32, 4)).mapInPandas(
        gen, MEDIA_SCHEMA
    )


def extract_media_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real pipeline shape: one mapInPandas pass, numpy per batch, fixed
    feature width. The decode step is the stubbed kernel above.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in [f.name for f in FEATURE_SCHEMA.fields]}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                data = bytes(payload or b"")
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["n_bytes"].append(len(data))
                # content fingerprint over the canonical UPPERCASE-HEX text
                # of the payload (not the raw bytes): SQL engines whose
                # sha256 is VARCHAR-only (DuckDB) can reproduce it as
                # sha256(upper(hex(payload))), which makes the whole
                # binary-plumbing path oracle-checkable end to end
                out["hex_sha256"].append(
                    hashlib.sha256(data.hex().upper().encode()).hexdigest()
                )
                if kind == "image":
                    px = decode_image(data, fake=fake_decode).astype(np.float64)
                    feats = [px.mean(), px.std(), float(px.min()), float(px.max())]
                else:
                    # byte-level stats stand in for audio/video features
                    arr = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
                    feats = (
                        [arr.mean(), arr.std(), float(arr.min()), float(arr.max())]
                        if len(arr)
                        else [0.0, 0.0, 0.0, 0.0]
                    )
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(gen, FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, out_w: int = 4, out_h: int = 4, fake_decode: bool = True
) -> DataFrame:
    """Image resize kernel: decode → mean-pool to (out_h, out_w) →
    re-emit flattened pixels. Arrow-batched mapInPandas; the decode is
    the stubbed kernel (real codecs absent in this container), the
    pooling math and the Spark plumbing are real.

    At corpus scale this is the thumbnail/feature-preproc stage: one
    narrow pass, output rows are fixed-width float arrays ready for an
    embedding model's input pipeline."""

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("pixels", ArrayType(DoubleType()), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "pixels": []}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                px = decode_image(bytes(payload or b""), fake=fake_decode).astype(
                    np.float64
                )
                h, w = px.shape
                # mean-pool to the target grid (block average; block
                # edges by integer rounding — deterministic)
                ys = np.linspace(0, h, out_h + 1).astype(int)
                xs = np.linspace(0, w, out_w + 1).astype(int)
                pooled = np.array(
                    [
                        [
                            px[ys[r] : max(ys[r + 1], ys[r] + 1),
                               xs[c] : max(xs[c + 1], xs[c] + 1)].mean()
                            for c in range(out_w)
                        ]
                        for r in range(out_h)
                    ]
                )
                out["media_id"].append(int(mid))
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["pixels"].append(pooled.reshape(-1).tolist())
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(gen, out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame (pure column
    expressions — the decode itself is the stubbed kernel)."""
    frames = F.sequence(
        F.lit(0),
        F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(frames).alias("frame_no"),
        )
        .withColumn("sample_ms", F.col("frame_no") * every_ms)
    )
