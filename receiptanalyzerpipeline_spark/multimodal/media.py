"""Audio/video as opaque binary columns with typed metadata — decode,
frame-sample, and feature-extract plumbing over ``mapInPandas``.

Extends the image pipeline (multimodal/images.py) to time-based media,
per the training-data-pipeline brief: media stays an opaque ``binary``
column + a typed metadata struct; the heavy per-item work runs in
Arrow-batched ``mapInPandas`` so Spark sees an ordinary map-side
transform (no shuffle, scales with partition count).

Decode ladder (this container has no av/ffmpeg/librosa):
- ``STUBAV1:`` header → deterministic fake container: 16-byte header
  (duration_ms uint32, fps×100 uint32, sample_rate uint32, n_channels
  uint32 little-endian) followed by payload bytes. Real parsing, real
  metadata, fully testable.
- anything else → ``NotImplementedError`` raised INSIDE the UDF and
  captured per-row into an ``error`` column (per-item error isolation,
  same contract as the OCR boundary) — swap in PyAV/librosa decode on a
  cluster that has them.

Frame sampling emits one row per sampled frame (mapInPandas can change
cardinality — that's why it's used instead of a pandas_udf): frame
payloads are derived deterministically from (content md5, frame index)
so downstream plumbing (per-frame aHash, dedup, embedding) is exercised
end-to-end without a codec.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STUB_AV_MAGIC = b"STUBAV1:"
_HEADER = struct.Struct("<IIII")  # duration_ms, fps_x100, sample_rate, channels

MEDIA_META_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("kind", StringType()),  # 'audio' | 'video' | NULL on error
        StructField("duration_ms", LongType()),
        StructField("fps", DoubleType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("payload_bytes", LongType()),
        StructField("error", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_ms", LongType()),
        StructField("frame", BinaryType()),
        StructField("error", StringType()),
    ]
)


def make_stub_media(
    duration_ms: int,
    fps: float = 0.0,
    sample_rate: int = 0,
    n_channels: int = 0,
    payload: bytes = b"",
) -> bytes:
    """Build a deterministic fake media blob (fps>0 → video, else audio)."""
    return STUB_AV_MAGIC + _HEADER.pack(
        duration_ms, int(round(fps * 100)), sample_rate, n_channels
    ) + payload


def _parse_stub(content: bytes) -> dict:
    if not content.startswith(STUB_AV_MAGIC):
        raise NotImplementedError(
            "real A/V decode needs PyAV/ffmpeg/librosa (not in this container); "
            "only the STUBAV1 deterministic container is decodable here"
        )
    body = content[len(STUB_AV_MAGIC) :]
    if len(body) < _HEADER.size:
        raise ValueError("truncated STUBAV1 header")
    duration_ms, fps_x100, sample_rate, channels = _HEADER.unpack_from(body)
    return {
        "duration_ms": duration_ms,
        "fps": fps_x100 / 100.0,
        "sample_rate": sample_rate,
        "n_channels": channels,
        "payload": body[_HEADER.size :],
    }


def extract_media_meta(
    df: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(path, content) → typed metadata rows; decode failures land in the
    ``error`` column, never kill the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    m = _parse_stub(bytes(content))
                    out.append(
                        {
                            "path": path,
                            "kind": "video" if m["fps"] > 0 else "audio",
                            "duration_ms": m["duration_ms"],
                            "fps": m["fps"],
                            "sample_rate": m["sample_rate"],
                            "n_channels": m["n_channels"],
                            "payload_bytes": len(m["payload"]),
                            "error": None,
                        }
                    )
                except (NotImplementedError, ValueError) as e:
                    out.append(
                        {
                            "path": path,
                            "kind": None,
                            "duration_ms": None,
                            "fps": None,
                            "sample_rate": None,
                            "n_channels": None,
                            "payload_bytes": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return df.select(path_col, content_col).mapInPandas(run, MEDIA_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 16,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """One output row per sampled frame at ``every_ms`` spacing (capped at
    ``max_frames``). Frame payloads are md5(content, index)-derived fakes;
    a real build replaces ONLY the payload derivation with codec output —
    schema, batching, and cardinality-changing plumbing are identical."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    m = _parse_stub(bytes(content))
                    if m["fps"] <= 0:
                        raise ValueError("frame sampling needs video (fps > 0)")
                    n = min(max_frames, 1 + m["duration_ms"] // every_ms)
                    seed = hashlib.md5(bytes(content)).digest()
                    for i in range(int(n)):
                        fake = hashlib.md5(seed + struct.pack("<I", i)).digest()
                        out.append(
                            {
                                "path": path,
                                "frame_index": i,
                                "frame_ms": i * every_ms,
                                "frame": fake,
                                "error": None,
                            }
                        )
                except (NotImplementedError, ValueError) as e:
                    out.append(
                        {
                            "path": path,
                            "frame_index": None,
                            "frame_ms": None,
                            "frame": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select(path_col, content_col).mapInPandas(run, FRAME_SCHEMA)


def video_near_dup(
    df: DataFrame,
    threshold: float = 0.5,
    every_ms: int = 1000,
    max_frames: int = 16,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Video near-duplicate pairs by sampled-frame fingerprint overlap:
    sample frames, fingerprint each, and Jaccard-join the per-video
    fingerprint sets through an inverted index on the fingerprint — the
    q_d2 text-shingle plan applied to the video modality (near-dup cuts
    of the same footage share most sampled frames).

    The fingerprint here is md5 of the frame payload; a real build swaps
    in the perceptual aHash UDF (multimodal/images.py) over decoded
    frames so re-encodes still collide — the join shape, and therefore
    the scale behavior (shuffle on fingerprint, candidates bounded by
    fingerprint co-occurrence, never videos²), is identical. Decode
    failures are already isolated into sample_frames' error column and
    simply produce no fingerprints.
    """
    frames = sample_frames(
        df, every_ms=every_ms, max_frames=max_frames,
        path_col=path_col, content_col=content_col,
    ).where(F.col("error").isNull())
    fp = frames.select(
        F.col("path").alias("vid"), F.md5(F.col("frame")).alias("fhash")
    ).distinct()
    sizes = fp.groupBy("vid").agg(F.count("*").alias("n"))
    a = fp.select(F.col("vid").alias("vid_a"), "fhash")
    b = fp.select(F.col("vid").alias("vid_b"), "fhash")
    inter = (
        a.join(b, "fhash")
        .where(F.col("vid_a") < F.col("vid_b"))
        .groupBy("vid_a", "vid_b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("vid").alias("vid_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("vid").alias("vid_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "vid_a")
        .join(sb, "vid_b")
        .select(
            "vid_a",
            "vid_b",
            (
                F.col("i").cast("double")
                / (F.col("na") + F.col("nb") - F.col("i"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
