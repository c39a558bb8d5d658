"""Core value types.

The reference's data model (ahnlich/types/src/keyval.rs:8-50,
ahnlich/types/src/metadata.rs:3-18):

- StoreKey      = Vec<f32>                      -> ARRAY<FLOAT>
- MetadataValue = RawString | Image | Audio     -> STRUCT<kind, s, bin>
- StoreValue    = HashMap<String, MetadataValue>-> MAP<STRING, STRUCT<...>>
- StoreInput    = RawString | Image | Audio     -> STRUCT<kind, text, bin>

Equality of MetadataValue must distinguish RawString("x") from
Image(b"x") — hence the tagged struct rather than a plain string
(reference derives Eq/Hash over the enum tag, metadata.rs:10-17).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import functions as F
from pyspark.sql import types as T

KIND_RAW_STRING = "raw_string"
KIND_IMAGE = "image"
KIND_AUDIO = "audio"

# Reserved metadata key the AI layer uses to stash the original input
# (reference: ahnlich/ai/src/lib.rs:10).
AHNLICH_RESERVED_INPUT_KEY = "_ahnlich_input_key"

META_VALUE_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("s", T.StringType(), True),
        T.StructField("bin", T.BinaryType(), True),
    ]
)

META_MAP_TYPE = T.MapType(T.StringType(), META_VALUE_TYPE, valueContainsNull=False)

# Cast-target twin with every nullability constraint relaxed: Spark
# refuses to CAST a nullable struct field onto a NOT-NULL one, and any
# frame read back from parquet (store round-trips, CDC feeds) arrives
# all-nullable — so ingest paths cast to this shape and rely on the
# writers for actual non-null discipline.
META_MAP_TYPE_RELAXED = T.MapType(
    T.StringType(),
    T.StructType(
        [
            T.StructField("kind", T.StringType(), True),
            T.StructField("s", T.StringType(), True),
            T.StructField("bin", T.BinaryType(), True),
        ]
    ),
    valueContainsNull=True,
)

STORE_INPUT_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("bin", T.BinaryType(), True),
    ]
)


def store_schema() -> T.StructType:
    """The universal store-table schema (FIXTURES.md F1)."""
    return T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("key", T.ArrayType(T.FloatType(), True), False),
            T.StructField("meta", META_MAP_TYPE, True),
        ]
    )


@dataclass(frozen=True)
class MetadataValue:
    """Tagged metadata value (RawString | Image | Audio)."""

    kind: str
    s: Optional[str] = None
    bin: Optional[bytes] = None

    @staticmethod
    def raw_string(s: str) -> "MetadataValue":
        return MetadataValue(KIND_RAW_STRING, s=s)

    @staticmethod
    def image(b: bytes) -> "MetadataValue":
        return MetadataValue(KIND_IMAGE, bin=b)

    @staticmethod
    def audio(b: bytes) -> "MetadataValue":
        return MetadataValue(KIND_AUDIO, bin=b)

    def to_row(self) -> tuple:
        return (self.kind, self.s, self.bin)

    def lit(self):
        """Catalyst literal: a STRUCT<kind, s, bin> expression comparable
        against ``meta[key]`` values."""
        return F.struct(
            F.lit(self.kind).alias("kind"),
            F.lit(self.s).cast(T.StringType()).alias("s"),
            F.lit(self.bin).cast(T.BinaryType()).alias("bin"),
        )


def mv(value) -> MetadataValue:
    """Coerce a python value to MetadataValue (str -> raw_string,
    bytes -> image is ambiguous so bytes are NOT auto-coerced)."""
    if isinstance(value, MetadataValue):
        return value
    if isinstance(value, str):
        return MetadataValue.raw_string(value)
    raise TypeError(f"cannot coerce {type(value)} to MetadataValue; use MetadataValue.image/audio")


def meta_map(d: dict) -> dict:
    """Python dict {key: str|MetadataValue} -> row-ready dict of tuples."""
    return {k: mv(v).to_row() for k, v in d.items()}


@dataclass(frozen=True)
class StoreInput:
    """Raw AI-layer input (reference: ahnlich/types/src/keyval.rs:13-27)."""

    kind: str
    text: Optional[str] = None
    bin: Optional[bytes] = None

    @staticmethod
    def raw_string(s: str) -> "StoreInput":
        return StoreInput(KIND_RAW_STRING, text=s)

    @staticmethod
    def image(b: bytes) -> "StoreInput":
        return StoreInput(KIND_IMAGE, bin=b)

    @staticmethod
    def audio(b: bytes) -> "StoreInput":
        return StoreInput(KIND_AUDIO, bin=b)

    def to_row(self) -> tuple:
        return (self.kind, self.text, self.bin)

    def to_metadata_value(self) -> MetadataValue:
        if self.kind == KIND_RAW_STRING:
            return MetadataValue.raw_string(self.text or "")
        return MetadataValue(self.kind, bin=self.bin)


def vector_lit(vec: Sequence[float]):
    """A query vector as an ARRAY<FLOAT> literal. Values are round-tripped
    through float32 so comparisons against stored f32 keys are exact."""
    import numpy as np

    v32 = np.asarray(list(vec), dtype=np.float32)
    return F.array(*[F.lit(float(x)).cast(T.FloatType()) for x in v32])
