"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow-batched ``mapInPandas`` operators,
partition strategy) is real and tested; the actual codec work (PIL/ffmpeg)
is NOT available in this container, so the decode kernel is a clearly
marked deterministic fake behind ``set_decoder`` — swap in a real decoder
(e.g. ``PIL.Image.open``) in production without touching the plan shape.

Scale notes: media rows are wide (MBs), so operators here avoid shuffling
payload bytes — feature extraction is a narrow ``mapInPandas`` pass whose
output drops the blob; resize/frame-sample emit new blobs but stay
partition-local.  ``spark.sql.files.maxPartitionBytes`` (not row count)
governs task sizing for blob tables.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),  # metadata as known at ingest
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real codec: derives a fixed-length
    pseudo-feature from the bytes.  Replace via ``set_decoder``."""
    arr = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8).astype(np.float32)
    return arr.reshape(8, 32).mean(axis=1) / 255.0


_DECODER: Callable[[bytes, str], np.ndarray] = _fake_decode


def set_decoder(fn: Callable[[bytes, str], np.ndarray]) -> None:
    """Install a real decode kernel (PIL/librosa/ffmpeg). The container has
    none, so the default stays the deterministic fake."""
    global _DECODER
    _DECODER = fn


def real_decode(payload: bytes, kind: str) -> np.ndarray:  # pragma: no cover
    """The production decode path — unavailable in this container."""
    raise NotImplementedError("image/audio codecs are not installed in this environment")


def generate_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes. Exercises the
    binary-column plumbing end to end."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)).cast("int") + 1,
        ).alias("kind"),
        F.unhex(F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 512))
        .alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width").cast("int"),
        F.lit(64).alias("height").cast("int"),
        (F.pmod(F.xxhash64("id"), F.lit(60_000)).cast("int")).alias("duration_ms"),
    )
    return df


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so each task streams batches (bounded memory even with
    MB-scale blobs) and the output schema DROPS the payload — the expensive
    column never reaches the next shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _DECODER(p, k).astype(np.float32).tolist() if p is not None else None
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (payload decode stubbed — frame bytes are a deterministic
    hash of (media_id, frame_ts)).  Shows the explode-shaped plan a real
    sampler would have; stays partition-local."""
    frames = df.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)))
        ).alias("frame_no"),
    )
    return frames.withColumn(
        "frame_payload", F.sha2(F.concat_ws(":", "media_id", "frame_no"), 256).cast("binary")
    )
