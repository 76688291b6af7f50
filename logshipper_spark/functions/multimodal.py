"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow-batched ``mapInPandas`` operators,
partition strategy) is real and tested.  Codec coverage (r5):
UNCOMPRESSED formats — WAV PCM (stdlib ``wave``), PPM/PGM (``P6``/``P5``
binary), BMP (24/32-bit BI_RGB) — are decoded by built-in pure-Python/
numpy parsers in ``real_decode``; compressed formats (JPEG/MP3/H.264)
still need an external codec library, absent in this container, and go
through the ``set_decoder`` seam (e.g. ``PIL.Image.open``) without
touching the plan shape.  Unknown formats fall back to a deterministic
byte-derived pseudo-feature so the plumbing stays total.

Scale notes: media rows are wide (MBs), so operators here avoid shuffling
payload bytes — feature extraction is a narrow ``mapInPandas`` pass whose
output drops the blob; resize/frame-sample emit new blobs but stay
partition-local.  ``spark.sql.files.maxPartitionBytes`` (not row count)
governs task sizing for blob tables.
"""

from __future__ import annotations

import io
import math
import struct
import wave
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


def _decode_wav(b: bytes) -> np.ndarray:
    """PCM WAV → mono float32 waveform in [-1, 1] (stdlib ``wave``)."""
    with wave.open(io.BytesIO(b)) as w:
        sw, ch = w.getsampwidth(), w.getnchannels()
        raw = w.readframes(w.getnframes())
    if sw == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 2:
        arr = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        arr = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} not supported")
    if ch > 1:
        arr = arr[: (arr.size // ch) * ch].reshape(-1, ch).mean(axis=1)
    return arr


def _decode_pnm(b: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → float32 pixels in [0, 1]
    (H×W×3 / H×W).  Header is whitespace-tokenized with ``#`` comments."""
    idx = 0

    def token() -> bytes:
        nonlocal idx
        while idx < len(b):
            c = b[idx : idx + 1]
            if c == b"#":
                while idx < len(b) and b[idx : idx + 1] != b"\n":
                    idx += 1
            elif c.isspace():
                idx += 1
            else:
                break
        start = idx
        while idx < len(b) and not b[idx : idx + 1].isspace():
            idx += 1
        return b[start:idx]

    magic = token()
    w, h, maxval = int(token()), int(token()), int(token())
    idx += 1  # exactly ONE whitespace byte separates maxval from the raster
    ch = 3 if magic == b"P6" else 1
    dtype = np.dtype(np.uint8) if maxval < 256 else np.dtype(">u2")
    arr = (
        np.frombuffer(b, dtype, count=w * h * ch, offset=idx).astype(np.float32)
        / float(maxval)
    )
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


def _decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) 24/32-bit BMP → H×W×3 float32 RGB in [0, 1].
    Rows are 4-byte padded and stored bottom-up unless height < 0."""
    if len(b) < 54:
        raise NotImplementedError("truncated BMP header")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header variant not supported")
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP compression={comp} bpp={bpp} not supported")
    flip = h > 0
    h = abs(h)
    nch = bpp // 8
    row_size = (w * nch + 3) & ~3
    rows = np.frombuffer(b, np.uint8, count=row_size * h, offset=data_off).reshape(
        h, row_size
    )
    px = rows[:, : w * nch].reshape(h, w, nch)[..., :3][..., ::-1]  # BGR(A) → RGB
    if flip:
        px = px[::-1]
    return px.astype(np.float32) / 255.0


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Built-in production decode for UNCOMPRESSED formats — pure
    Python/numpy, no codec library needed: PCM WAV, binary PPM/PGM,
    BI_RGB BMP, dispatched on magic bytes (``kind`` is advisory only;
    the bytes are the truth).  Compressed formats (JPEG/PNG/MP3/video)
    raise NotImplementedError — install a codec via ``set_decoder``."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    if payload[:2] in (b"P6", b"P5"):
        return _decode_pnm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "no built-in decoder for this format (built-ins: PCM WAV, PPM/PGM, "
        "uncompressed BMP); install a codec via set_decoder"
    )


def _summarize(arr: np.ndarray) -> np.ndarray:
    """Decoded samples/pixels → fixed 8-dim block-mean feature (same shape
    as the fallback pseudo-feature, so FEATURE_SCHEMA is format-agnostic)."""
    flat = np.asarray(arr, dtype=np.float32).ravel()
    if flat.size == 0:
        return np.zeros(8, np.float32)
    pad = (-flat.size) % 8
    if pad:
        flat = np.pad(flat, (0, pad))
    return flat.reshape(8, -1).mean(axis=1)


def builtin_decode(payload: bytes, kind: str) -> np.ndarray:
    """Default decode kernel: real decode for the built-in uncompressed
    formats, deterministic byte-derived pseudo-feature for anything else
    (keeps the plumbing total over opaque/unknown payloads).  A payload
    whose magic matches a built-in format but fails to parse raises —
    corrupt media should be loud, not silently faked."""
    try:
        decoded = real_decode(payload, kind)
    except NotImplementedError:
        return _fake_decode(payload, kind)
    return _summarize(decoded)


_DECODER: Callable[[bytes, str], np.ndarray] = builtin_decode


def set_decoder(fn: Callable[[bytes, str], np.ndarray]) -> None:
    """Install an external decode kernel (PIL/librosa/ffmpeg) for
    compressed formats; the built-in default handles uncompressed
    WAV/PPM/PGM/BMP without any codec library."""
    global _DECODER
    _DECODER = fn


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


def synth_wav_bytes(n_samples: int = 800, freq_hz: float = 5.0,
                    rate: int = 8000, amplitude: float = 0.9) -> bytes:
    """Deterministic 16-bit mono PCM WAV sine — a REAL, decodable audio
    payload built with stdlib ``wave`` (no external data, per input_hint)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        a = int(32000 * amplitude)
        w.writeframes(
            b"".join(
                struct.pack("<h", int(a * math.sin(2 * math.pi * freq_hz * i / rate)))
                for i in range(n_samples)
            )
        )
    return buf.getvalue()


def synth_ppm_bytes(w: int = 16, h: int = 8) -> bytes:
    """Deterministic binary PPM (P6) gradient image."""
    head = f"P6\n{w} {h}\n255\n".encode()
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px.extend(
                ((x * 255) // max(w - 1, 1), (y * 255) // max(h - 1, 1), (x + y) % 256)
            )
    return head + bytes(px)


def synth_bmp_bytes(w: int = 7, h: int = 5) -> bytes:
    """Deterministic 24-bit BI_RGB BMP gradient (bottom-up, padded rows)."""
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    data_off = 54
    hdr = struct.pack("<2sIHHI", b"BM", data_off + img_size, 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        for x in range(w):
            r = (x * 255) // max(w - 1, 1)
            g = (y * 255) // max(h - 1, 1)
            bl = (x * y) % 256
            row.extend((bl, g, r))  # BGR on disk
        row.extend(b"\0" * (row_size - len(row)))
        rows.extend(row)
    return hdr + dib + bytes(rows)


def generate_real_media(spark: SparkSession, n: int = 30) -> DataFrame:
    """Media table whose payloads are REAL decodable bytes (WAV/PPM/BMP
    synths above) — exercises ``real_decode`` end to end, not the fake."""
    rows = []
    for i in range(n):
        m = i % 3
        if m == 0:
            ns = 400 + 40 * (i % 5)
            p = synth_wav_bytes(n_samples=ns, freq_hz=3.0 + (i % 7))
            rows.append((i, "audio", bytearray(p), "audio/wav", None, None, ns * 1000 // 8000))
        elif m == 1:
            w, h = 8 + i % 5, 6 + i % 4
            rows.append((i, "image", bytearray(synth_ppm_bytes(w, h)),
                         "image/x-portable-pixmap", w, h, None))
        else:
            w, h = 7 + i % 6, 5 + i % 3
            rows.append((i, "image", bytearray(synth_bmp_bytes(w, h)),
                         "image/bmp", w, h, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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
