"""Multimodal columns: image/audio/video as opaque BINARY with typed
metadata, processed by Arrow-batched ``mapInPandas`` operators.

The Spark-side plumbing (schemas, batch iteration, partition-preserving
map) is real and tested; the actual codec work (PIL/ffmpeg/librosa) is
NOT available in this container, so each operator routes through
``_decode_stub`` — a clearly-marked deterministic fake that yields the
same shaped output a real decoder would. Swap ``_HAVE_CODECS`` paths for
real libraries in production.

Design for 100 TB: media bytes never leave their scan partition — every
operator here is ``mapInPandas`` (narrow, no shuffle); only the small
extracted-feature frames flow onward.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover — codec libs absent in this container
    import PIL.Image  # noqa: F401

    _HAVE_CODECS = True
except ImportError:
    _HAVE_CODECS = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

IMAGE_META_SCHEMA = (
    "media_id long, n_bytes long, width int, height int, channels int, format string"
)

AUDIO_META_SCHEMA = "media_id long, n_bytes long, sample_rate int, n_samples long, duration_ms long"

FRAME_SCHEMA = "media_id long, frame_index int, frame_bytes binary"


def _decode_stub_image(buf: bytes) -> tuple:
    """STUB: deterministic fake image header (real impl: PIL.Image.open).
    Keeps downstream schemas/tests honest without codec libraries."""
    n = len(buf or b"")
    return (n, 64 + n % 577, 64 + (n * 7) % 417, 3, "stub")


def _decode_stub_audio(buf: bytes) -> tuple:
    n = len(buf or b"")
    sr = 16000
    n_samples = n * 4  # fake: 4 samples per byte
    return (n, sr, n_samples, n_samples * 1000 // sr)


def image_metadata(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Decode image headers per Arrow batch (mapInPandas; narrow)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_CODECS:  # pragma: no cover
                raise NotImplementedError("real PIL decode path not wired in this container")
            meta = pdf[content_col].map(_decode_stub_image)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": meta.map(lambda m: m[0]),
                    "width": meta.map(lambda m: m[1]),
                    "height": meta.map(lambda m: m[2]),
                    "channels": meta.map(lambda m: m[3]),
                    "format": meta.map(lambda m: m[4]),
                }
            )

    return df.select(id_col, content_col).mapInPandas(op, IMAGE_META_SCHEMA)


def audio_metadata(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_CODECS:  # pragma: no cover
                raise NotImplementedError("real audio decode path not wired")
            meta = pdf[content_col].map(_decode_stub_audio)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": meta.map(lambda m: m[0]),
                    "sample_rate": meta.map(lambda m: m[1]),
                    "n_samples": meta.map(lambda m: m[2]),
                    "duration_ms": meta.map(lambda m: m[3]),
                }
            )

    return df.select(id_col, content_col).mapInPandas(op, AUDIO_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Video frame sampling STUB: emits up to ``max_frames`` byte-slices
    per media as fake frames (real impl: ffmpeg keyframe extraction).
    Demonstrates the 1->N mapInPandas shape (row explosion stays inside
    the partition)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for mid, buf in zip(pdf[id_col], pdf[content_col]):
                buf = buf or b""
                for i in range(min(max_frames, max(1, len(buf) // every_n_bytes))):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_bytes.append(bytes(buf[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_index": out_idx, "frame_bytes": out_bytes}
            )

    return df.select(id_col, content_col).mapInPandas(op, FRAME_SCHEMA)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents fixture:
    text bytes as fake image content (the binary-column plumbing is what
    matters; content is opaque to every operator here)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.col("source"),
    )
