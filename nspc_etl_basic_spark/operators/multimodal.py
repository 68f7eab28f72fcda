"""Multimodal (image/audio/video) column operators for training-data
pipelines (build-brief M7 extension; no reference counterpart).

Representation: media are opaque ``binary`` payload columns plus a typed
metadata struct — the 100 TB-friendly layout (payload bytes never enter
a shuffle key; metadata is columnar and prunable):

    media_id   long
    payload    binary
    meta       struct<format:string, width:int, height:int,
                      n_frames:int, sample_rate:int>

All kernels run as Arrow-batched ``mapInPandas`` functions — the correct
Spark plumbing for bytes-in/bytes-out transforms (vectorized transfer, no
per-row pickling, bounded batch memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``).

STUBBED CODECS: this container has no image/audio libraries, so the
decode kernels are deterministic fakes over the payload bytes, clearly
marked below. The Spark-side contract — schemas, UDF signatures, batch
iteration, partitioning — is real and tested; swapping a fake kernel for
PIL/librosa/pyav is a pure function replacement inside the mapInPandas
body. Real-decode entry points raise ``NotImplementedError`` when the
library is missing rather than silently faking.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_STRUCT = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", META_STRUCT),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


# ---------------------------------------------------------------------------
# STUB KERNELS — deterministic fakes over payload bytes (see module note)
# ---------------------------------------------------------------------------

def _fake_mean_intensity(payload: bytes) -> float:
    """Deterministic stand-in for mean pixel value: mean of payload bytes."""
    if not payload:
        return 0.0
    return sum(payload) / len(payload) / 255.0


def _fake_rms(payload: bytes) -> float:
    """RMS of bytes scaled to [0, 1]. Accumulates the EXACT integer
    sum(b^2) first — integer addition is order-independent, so the single
    float division + sqrt is bit-identical across engines (a float
    accumulation would drift with summation order)."""
    if not payload:
        return 0.0
    acc = sum(b * b for b in payload)
    return (acc / (len(payload) * 65025)) ** 0.5


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def image_features(df: DataFrame, require_real_decode: bool = False) -> DataFrame:
    """Per-image feature extraction via ``mapInPandas``.

    With ``require_real_decode=True`` a real codec (PIL) must be present;
    otherwise the deterministic fake kernel runs so the distributed
    plumbing (Arrow batching, schema, partition parallelism) is exercised
    end-to-end without the library.
    """
    pil = _try_import_pil()
    if require_real_decode and pil is None:
        raise NotImplementedError(
            "real image decode requires PIL, which is not installed; "
            "rerun with require_real_decode=False for the stub kernel"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                    # floor-truncate to 6 decimals: unlike round(), floor has
                    # identical semantics in Python, Spark and DuckDB, so the
                    # kernel stays oracle-checkable bit-for-bit
                    "mean_intensity": pdf["payload"].map(
                        lambda p: math.floor(
                            _fake_mean_intensity(bytes(p)) * 1e6
                        ) / 1e6
                    ),
                    "payload_md5": pdf["payload"].map(
                        lambda p: hashlib.md5(bytes(p)).hexdigest()
                    ),
                }
            )
            yield out

    return df.mapInPandas(kernel, IMAGE_FEATURE_SCHEMA)


def resize_images(df: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize plumbing: recompute metadata to the clamped size and (stub)
    re-emit the payload unchanged. A real kernel replaces the payload with
    re-encoded bytes; schema and flow are identical."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def clamp(m):
                w, h = m["width"] or 0, m["height"] or 0
                scale = max(w, h) / max_dim if max(w, h) > max_dim else 1.0
                return {
                    "format": m["format"],
                    "width": int(w / scale) if w else w,
                    "height": int(h / scale) if h else h,
                    "n_frames": m["n_frames"],
                    "sample_rate": m["sample_rate"],
                }

            pdf = pdf.assign(meta=pdf["meta"].map(clamp))
            yield pdf

    return df.mapInPandas(kernel, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one output row per sampled frame. The stub
    'decoder' slices the payload into ``n_frames`` equal chunks; a real
    kernel yields decoded frame images. Emission is streaming per batch —
    a 2-hour video never materializes all frames at once."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # vectorized explode: numpy repeat/arange build the (row, frame)
            # index plan for the whole Arrow batch; only the final payload
            # slicing touches Python objects (frame explosion is the hottest
            # multimodal path — no per-row pandas iteration)
            n_frames = (
                pdf["meta"].map(lambda m: m["n_frames"] or 0).to_numpy(dtype=np.int64)
            )
            raws = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            lens = np.fromiter((len(r) for r in raws), dtype=np.int64, count=len(raws))
            counts = np.where(n_frames > 0, -(-n_frames // every_n), 0)
            row_idx = np.repeat(np.arange(len(pdf)), counts)
            # frame index within each row: global arange minus each row's
            # starting offset, scaled by the sampling stride
            offsets = np.repeat(np.cumsum(counts) - counts, counts)
            frame_idx = (np.arange(counts.sum()) - offsets) * every_n
            steps = np.maximum(lens[row_idx] // np.maximum(n_frames[row_idx], 1), 1)
            starts = frame_idx * steps
            stops = starts + steps
            media_ids = pdf["media_id"].to_numpy()[row_idx]
            payloads = [
                raws[r][a:b] for r, a, b in zip(row_idx, starts, stops)
            ]
            yield pd.DataFrame(
                {
                    "media_id": media_ids,
                    "frame_idx": frame_idx.astype("int32"),
                    "frame_payload": payloads,
                }
            )

    return df.mapInPandas(kernel, FRAME_SCHEMA)


def audio_features(df: DataFrame) -> DataFrame:
    """Audio feature plumbing: duration from payload length + sample rate
    (true for PCM16 mono), RMS via the stub kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # vectorized per batch (no pandas row iteration): duration =
            # payload_len/2 samples (PCM16) over the sample rate
            srs = (
                pdf["meta"]
                .map(lambda m: m["sample_rate"] or 0)
                .to_numpy(dtype=np.int64)
            )
            lens = np.fromiter(
                (len(bytes(p)) for p in pdf["payload"]),
                dtype=np.int64,
                count=len(pdf),
            )
            raw = np.where(srs > 0, (lens / 2) / np.maximum(srs, 1), 0.0)
            # floor-truncate to 6 decimals: floor has identical semantics
            # in numpy, Python and DuckDB (round() diverges on halves),
            # keeping the kernel oracle-checkable bit-for-bit
            duration = np.floor(raw * 1e6) / 1e6
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pdf["meta"].map(lambda m: m["sample_rate"]),
                    "duration_s": duration,
                    "rms": pdf["payload"].map(
                        lambda p: math.floor(_fake_rms(bytes(p)) * 1e6) / 1e6
                    ),
                }
            )

    return df.mapInPandas(kernel, AUDIO_FEATURE_SCHEMA)


def synthesize_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table for tests/benches: payload =
    md5-keystream bytes, metadata consistent with ``kind``."""
    def gen(i: int):
        seed = hashlib.md5(f"{kind}_{i}".encode()).digest()
        payload = (seed * 8)[: 64 + (i % 17)]
        if kind == "image":
            meta = (kind, 32 + i % 64, 16 + i % 48, None, None)
        elif kind == "video":
            meta = (kind, 64, 48, 4 + i % 7, None)
        else:
            meta = (kind, None, None, None, 8000)
        return (i, bytearray(payload), meta)

    return spark.createDataFrame([gen(i) for i in range(n)], MEDIA_SCHEMA)
