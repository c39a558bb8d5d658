"""Embedding UDFs.

The reference runs ONNX models behind per-model task threads
(ahnlich/ai/src/manager/mod.rs:361-470). The Spark-first equivalent is a
Pandas UDF per model family (Arrow-batched; an ONNX session would be
created once per executor inside the UDF). Real model weights are not
available in this container, so the default embedder is the
**deterministic stub featurizer** below — a pure-integer polynomial over
character/byte codes, chosen so a SQL oracle can reproduce it exactly:

    s1 = sum(code_j * j) mod P,  s2 = sum(code_j) mod P   (j is 1-based)
    raw_i = (s1 * (i+1) + s2) mod 2001 - 1000              (i is 0-based)
    emb_i = raw_i / 1000                                   (float32)

(P = 1000003.) The same formula runs JVM-side as native expressions for
the hot path, and in the Pandas UDF for the ONNX plug-point demo.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ahnlich_spark.ai.models import get_model

P = 1_000_003
RANGE = 2001  # raw values in [-1000, 1000]


def _poly_sums(codes: Column) -> Column:
    """codes: ARRAY<INT> of character/byte codes -> STRUCT(s1, s2, j)."""
    zero = F.struct(
        F.lit(0).cast("long").alias("s1"),
        F.lit(0).cast("long").alias("s2"),
        F.lit(0).cast("long").alias("j"),
    )
    return F.aggregate(
        codes,
        zero,
        lambda acc, c: F.struct(
            ((acc["s1"] + c.cast("long") * (acc["j"] + 1)) % P).alias("s1"),
            ((acc["s2"] + c.cast("long")) % P).alias("s2"),
            (acc["j"] + 1).alias("j"),
        ),
    )


def _expand(sums: Column, dim: int) -> Column:
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            ((sums["s1"] * (i.cast("long") + 1) + sums["s2"]) % RANGE - 1000) / 1000.0
        ).cast(T.FloatType()),
    )


def embed_text_expr(text: Column, model: str) -> Column:
    """ARRAY<FLOAT> stub embedding of a text column, fully JVM-side."""
    spec = get_model(model)
    codes = F.transform(F.split(text, ""), lambda c: F.coalesce(F.ascii(c), F.lit(0)))
    return _expand(_poly_sums(codes), spec.embedding_size)


def embed_binary_expr(bin_col: Column, model: str) -> Column:
    """ARRAY<FLOAT> stub embedding of a BINARY column (image/audio
    bytes): same polynomial over byte values (via hex pair decoding,
    keeping everything in native expressions)."""
    spec = get_model(model)
    hexstr = F.lower(F.hex(bin_col))
    pairs = F.regexp_extract_all(hexstr, F.lit("(..)"), F.lit(1))
    codes = F.transform(pairs, lambda h: F.conv(h, 16, 10).cast("int"))
    return _expand(_poly_sums(codes), spec.embedding_size)


def embed_pandas_udf(model: str):
    """Arrow-batched Pandas UDF variant — the plug-point where a real
    ONNX Runtime / sentence-transformers session would run (create the
    session once per executor, encode per batch). Falls back to the stub
    featurizer when no runtime is importable (this container)."""
    spec = get_model(model)
    dim = spec.embedding_size

    try:  # pragma: no cover - not installed in this container
        import onnxruntime  # noqa: F401

        have_runtime = True
    except ImportError:
        have_runtime = False

    import numpy as np
    import pandas as pd

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        if have_runtime:
            # Real inference would go here: session.run(...) per batch.
            raise NotImplementedError("ONNX runtime path not wired in this container")

        def one(t: str):
            codes = np.frombuffer(str(t).encode("utf-8", "ignore"), dtype=np.uint8).astype(np.int64)
            j = np.arange(1, len(codes) + 1, dtype=np.int64)
            s1 = int((codes * j).sum() % P)
            s2 = int(codes.sum() % P)
            i = np.arange(1, dim + 1, dtype=np.int64)
            raw = (s1 * i + s2) % RANGE - 1000
            return (raw / 1000.0).astype(np.float32)

        return texts.map(one)

    return embed
