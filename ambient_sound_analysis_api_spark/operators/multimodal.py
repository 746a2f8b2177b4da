"""Multimodal (binary) column plumbing for image/audio/video payloads.

Media are opaque ``binary`` columns with typed metadata travelling beside
them. The Spark-side contracts — schema, Arrow batch shape, ``mapInPandas``
signatures, partition sizing — are real and tested; the actual codec work
(image decode, resample, frame extraction) is stubbed behind
``DecodeUnavailable`` / deterministic fakes because media libraries are not
available in this environment. A deployment swaps `_decode_*_impl` for
Pillow/torchaudio/pyav without touching any plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, payload_md5 string, "
    "feature array<double>"
)


class DecodeUnavailable(NotImplementedError):
    """Raised by real-codec paths in this environment (no media libs)."""


def _decode_image_impl(payload: bytes) -> object:
    raise DecodeUnavailable("image decode requires Pillow; stubbed here")


def _decode_audio_impl(payload: bytes) -> object:
    raise DecodeUnavailable("audio decode requires soundfile/ffmpeg; stubbed here")


def documents_as_media(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped table from text payloads (deterministic fake).

    UTF-8 bytes stand in for media payloads so the binary-column path is
    exercised end-to-end with real data movement.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_frames"),
    )


def extract_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Batch feature extraction over binary payloads via ``mapInPandas``.

    Arrow-batched: each partition streams pandas batches through Python once
    — the canonical shape for codec/model inference at scale (batch size is
    governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``). The
    deterministic fake "feature" is a byte-histogram projection so tests can
    assert exact values; a real extractor replaces only the inner loop.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "payload_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "feature": pdf["payload"].map(
                        lambda b: _byte_histogram(bytes(b or b""), feature_dim)
                    ),
                }
            )
            yield out

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def _byte_histogram(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake feature: normalized byte-value histogram."""
    if not payload:
        return [0.0] * dim
    counts = [0] * dim
    for byte in payload:
        counts[byte % dim] += 1
    total = float(len(payload))
    return [c / total for c in counts]
