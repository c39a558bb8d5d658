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

try:  # pragma: no cover — audio lib absent in this container
    import soundfile  # noqa: F401

    _HAVE_AUDIO = True
except ImportError:
    _HAVE_AUDIO = False

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


def _decode_real_image(buf: bytes) -> tuple:  # pragma: no cover — realdeps
    """REAL decode (PIL): same tuple shape as the stub. Exercised by the
    ``realdeps`` pytest tier the moment PIL is importable."""
    import io

    import PIL.Image

    b = bytes(buf or b"")
    with PIL.Image.open(io.BytesIO(b)) as im:
        return (len(b), int(im.width), int(im.height),
                len(im.getbands()), (im.format or "unknown").lower())


def _decode_real_audio(buf: bytes) -> tuple:  # pragma: no cover — realdeps
    """REAL decode (soundfile): same tuple shape as the stub."""
    import io

    import soundfile as sf

    b = bytes(buf or b"")
    data, sr = sf.read(io.BytesIO(b), always_2d=True)
    n_samples = int(data.shape[0])
    return (len(b), int(sr), n_samples, n_samples * 1000 // int(sr))


def _decode_stub_audio(buf: bytes) -> tuple:
    n = len(buf or b"")
    sr = 16000
    n_samples = n * 4  # fake: 4 samples per byte
    return (n, sr, n_samples, n_samples * 1000 // sr)


def image_metadata(df: DataFrame, id_col: str = "media_id", content_col: str = "content",
                   codecs: bool = False) -> DataFrame:
    """Decode image headers per Arrow batch (mapInPandas; narrow).
    ``codecs=True`` runs the REAL PIL decode (requires PIL on the
    executors — the ``realdeps`` pytest tier); the default keeps the
    deterministic stub so synthetic fixtures stay oracle-pinned."""
    if codecs and not _HAVE_CODECS:
        raise RuntimeError("codecs=True requires PIL (pip install pillow)")
    decode = _decode_real_image if codecs else _decode_stub_image

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[content_col].map(decode)
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


def audio_metadata(df: DataFrame, id_col: str = "media_id", content_col: str = "content",
                   codecs: bool = False) -> DataFrame:
    """``codecs=True`` = REAL soundfile decode (realdeps tier); default
    keeps the deterministic stub (oracle-pinned fixtures)."""
    if codecs and not _HAVE_AUDIO:
        raise RuntimeError("codecs=True requires soundfile")
    decode = _decode_real_audio if codecs else _decode_stub_audio

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[content_col].map(decode)
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


# ------------------------------------------------ header probes (real) --
# Pure-Python container parsing — no codec libraries needed. Used by the
# AI proxy's PreprocessAction semantics (dims / sample-rate checks).

import struct as _struct


def probe_image_dims(buf: bytes):
    """(width, height) parsed from PNG / GIF / JPEG headers, or None for
    unrecognized content (the stub media fixtures land here)."""
    b = bytes(buf or b"")
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = _struct.unpack(">II", b[16:24])
        return int(w), int(h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = _struct.unpack("<HH", b[6:10])
        return int(w), int(h)
    if b[:2] == b"\xff\xd8":  # JPEG: walk markers to a SOF segment
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = _struct.unpack(">HH", b[i + 5 : i + 9])
                return int(w), int(h)
            seg_len = _struct.unpack(">H", b[i + 2 : i + 4])[0]
            i += 2 + seg_len
    return None


def probe_wav_sample_rate(buf: bytes):
    """Sample rate from a RIFF/WAVE fmt chunk, or None."""
    b = bytes(buf or b"")
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = _struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 16 <= len(b):
            return int(_struct.unpack("<I", b[i + 12 : i + 16])[0])
        i += 8 + size + (size & 1)
    return None


def probe_wav_duration_ms(buf: bytes):
    """Audio duration in milliseconds from a RIFF/WAVE header (data
    chunk bytes / fmt byte-rate), or None when not probeable — real
    header arithmetic, no codec needed."""
    b = bytes(buf or b"")
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    byte_rate = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = _struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            byte_rate = int(_struct.unpack("<I", b[i + 16 : i + 20])[0])
        elif cid == b"data":
            data_size = int(size)
        i += 8 + size + (size & 1)
    if not byte_rate or data_size is None:
        return None
    return int(round(data_size * 1000.0 / byte_rate))


# ------------------------------------ preprocessing transforms (stubs) --

def resize_image_stub(buf: bytes, width: int, height: int) -> bytes:
    """STUB resize (real impl: PIL resize + re-encode): a deterministic
    PNG-headed byte string carrying the target dims and a digest of the
    source — downstream embedding sees resized-content bytes, and
    probe_image_dims() reads back the new dims, exactly like a real
    re-encode would behave."""
    import hashlib

    ihdr = _struct.pack(">II", width, height)
    return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + ihdr + hashlib.md5(
        bytes(buf or b"")
    ).digest()


def resize_image_real(buf: bytes, width: int, height: int) -> bytes:  # pragma: no cover — realdeps
    """REAL resize: PIL decode -> resize -> PNG re-encode. Same contract
    as the stub (probe_image_dims reads back the target dims)."""
    import io

    import PIL.Image

    with PIL.Image.open(io.BytesIO(bytes(buf or b""))) as im:
        out = io.BytesIO()
        im.resize((width, height)).save(out, format="PNG")
        return out.getvalue()


def resample_audio_real(buf: bytes, sample_rate: int) -> bytes:  # pragma: no cover — realdeps
    """REAL resample: soundfile decode -> linear-interp resample ->
    WAV re-encode at the target rate (probe_wav_sample_rate reads it)."""
    import io

    import numpy as np
    import soundfile as sf

    data, sr = sf.read(io.BytesIO(bytes(buf or b"")), always_2d=True)
    if sr != sample_rate:
        n_out = max(1, int(round(data.shape[0] * sample_rate / sr)))
        xs = np.linspace(0.0, data.shape[0] - 1, n_out)
        data = np.stack(
            [np.interp(xs, np.arange(data.shape[0]), data[:, c])
             for c in range(data.shape[1])], axis=1,
        )
    out = io.BytesIO()
    sf.write(out, data, sample_rate, format="WAV")
    return out.getvalue()


def resample_audio_stub(buf: bytes, sample_rate: int) -> bytes:
    """STUB resample (real impl: decode -> resample -> mel): RIFF/WAVE
    header at the target rate + source digest."""
    import hashlib

    fmt = b"fmt " + _struct.pack("<I", 16) + _struct.pack("<HHIIHH", 1, 1, sample_rate,
                                                          sample_rate * 2, 2, 16)
    return b"RIFF" + _struct.pack("<I", 36) + b"WAVE" + fmt + hashlib.md5(
        bytes(buf or b"")
    ).digest()


def detect_faces_stub(buf: bytes, confidence_threshold: float = 0.0,
                      attributes: str = ""):
    """STUB face detection (real impl: YuNet / RetinaFace): a
    deterministic 1-3 faces per image, each as (crop_bytes, face_meta).
    The crop is the source bytes + one marker byte per face index, so a
    SQL oracle reproduces the downstream stub embedding exactly; bbox
    and the per-face confidence are derived from the content length.

    ``confidence_threshold`` / ``attributes`` mirror the reference's
    per-request ``model_params`` (buffalo_l_test.rs
    optimized_face_params / genderage_params): faces under the
    threshold are dropped; ``attributes='genderage'`` runs the (stub)
    second-stage attribute model and adds gender/age metadata."""
    b = bytes(buf or b"")
    k = 1 + len(b) % 3
    out = []
    for f in range(k):
        conf = ((len(b) * (f + 3) + 11) % 97) / 96.0
        if conf < float(confidence_threshold or 0.0):
            continue
        crop = b + bytes([65 + f])  # 'A' + face index
        bbox = f"{(len(b) * (f + 1)) % 640},{(len(b) * 7 * (f + 1)) % 640},80,80"
        # repr() round-trips the double exactly, so cross-engine
        # consumers (gate oracles) recompute identical values
        meta = {"face_index": str(f), "bbox": bbox,
                "confidence": repr(conf)}
        if attributes == "genderage":
            meta["gender"] = "M" if (len(b) + f) % 2 == 0 else "F"
            meta["age"] = str(18 + (len(b) * (f + 1)) % 50)
        out.append((crop, meta))
    return out
