"""DSL operation structs.

One frozen dataclass per statement the reference DSL can produce —
the Python mirror of the protobuf query oneofs the pest parser lowers
into (reference: ahnlich/dsl/src/db.rs:56-358 lowering into
ahnlich/types/src/db/pipeline.rs:13-55, and ahnlich/dsl/src/ai.rs into
ahnlich/types/src/ai/pipeline.rs:13-60). Parse output IS the executable
form — the reference has no plan stage between parser and engine, and
neither does this front-end: the executor maps each op 1:1 onto an
Engine/AiEngine method call.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

from ahnlich_spark.operators.predicates import Predicate
from ahnlich_spark.types import MetadataValue, StoreInput

Vector = Tuple[float, ...]
MetaDict = Tuple[Tuple[str, MetadataValue], ...]  # ordered key/value pairs


class DslOp:
    """Marker base class for parsed statements."""


# ------------------------------------------------------------- server ops --

@dataclass(frozen=True)
class Ping(DslOp):
    pass


@dataclass(frozen=True)
class InfoServer(DslOp):
    pass


@dataclass(frozen=True)
class ListClients(DslOp):
    pass


@dataclass(frozen=True)
class ListStores(DslOp):
    schema: Optional[str] = None


@dataclass(frozen=True)
class GetStore(DslOp):
    store: str
    schema: Optional[str] = None


@dataclass(frozen=True)
class PurgeStores(DslOp):
    pass


# ---------------------------------------------------------------- DDL ops --

@dataclass(frozen=True)
class CreateStore(DslOp):
    store: str
    dimension: int
    predicates: Tuple[str, ...] = ()
    non_linear_algorithms: Tuple[str, ...] = ()
    error_if_exists: bool = True
    schema: Optional[str] = None


@dataclass(frozen=True)
class DropStore(DslOp):
    store: str
    error_if_not_exists: bool = True
    schema: Optional[str] = None


@dataclass(frozen=True)
class DropSchema(DslOp):
    schema: str


@dataclass(frozen=True)
class CreatePredIndex(DslOp):
    store: str
    keys: Tuple[str, ...]
    schema: Optional[str] = None


@dataclass(frozen=True)
class DropPredIndex(DslOp):
    store: str
    keys: Tuple[str, ...]
    error_if_not_exists: bool = True
    schema: Optional[str] = None


@dataclass(frozen=True)
class CreateNonLinearAlgorithmIndex(DslOp):
    store: str
    algorithms: Tuple[str, ...]
    schema: Optional[str] = None


@dataclass(frozen=True)
class DropNonLinearAlgorithmIndex(DslOp):
    store: str
    algorithms: Tuple[str, ...]
    error_if_not_exists: bool = True
    schema: Optional[str] = None


# -------------------------------------------------------------- query ops --

@dataclass(frozen=True)
class GetKey(DslOp):
    store: str
    keys: Tuple[Vector, ...]
    schema: Optional[str] = None


@dataclass(frozen=True)
class DelKey(DslOp):
    store: str
    keys: Tuple[Vector, ...]
    schema: Optional[str] = None


@dataclass(frozen=True)
class GetPred(DslOp):
    store: str
    condition: Predicate
    schema: Optional[str] = None


@dataclass(frozen=True)
class GetSimN(DslOp):
    store: str
    closest_n: int
    search_input: Vector
    algorithm: str
    condition: Optional[Predicate] = None
    schema: Optional[str] = None


@dataclass(frozen=True)
class Set(DslOp):
    store: str
    entries: Tuple[Tuple[Vector, MetaDict], ...]
    schema: Optional[str] = None


@dataclass(frozen=True)
class Upsert(DslOp):
    store: str
    condition: Predicate
    new_key: Optional[Vector] = None
    new_value: Optional[MetaDict] = None
    merge_metadata: bool = False
    schema: Optional[str] = None


@dataclass(frozen=True)
class DelPred(DslOp):
    """DELPRED is not in the reference grammar (delete-by-predicate is
    wire-only there); exposed here as a natural extension with the same
    shape as GetPred."""

    store: str
    condition: Predicate
    schema: Optional[str] = None


# ----------------------------------------------------------------- AI ops --

@dataclass(frozen=True)
class AiCreateStore(DslOp):
    store: str
    query_model: str
    index_model: str
    predicates: Tuple[str, ...] = ()
    non_linear_algorithms: Tuple[str, ...] = ()
    error_if_exists: bool = True
    store_original: bool = False
    schema: Optional[str] = None


@dataclass(frozen=True)
class AiSet(DslOp):
    store: str
    entries: Tuple[Tuple[StoreInput, MetaDict], ...]
    preprocess_action: str = "nopreprocessing"
    execution_provider: Optional[str] = None
    schema: Optional[str] = None


@dataclass(frozen=True)
class AiGetKey(DslOp):
    store: str
    inputs: Tuple[StoreInput, ...]
    schema: Optional[str] = None


@dataclass(frozen=True)
class AiDelKey(DslOp):
    store: str
    inputs: Tuple[StoreInput, ...]
    schema: Optional[str] = None


@dataclass(frozen=True)
class AiGetSimN(DslOp):
    store: str
    closest_n: int
    search_input: StoreInput
    algorithm: str
    preprocess_action: Optional[str] = None
    execution_provider: Optional[str] = None
    condition: Optional[Predicate] = None
    schema: Optional[str] = None


@dataclass(frozen=True)
class AiUpsert(DslOp):
    store: str
    condition: Predicate
    new_input: Optional[StoreInput] = None
    new_value: Optional[MetaDict] = None
    preprocess_action: str = "nopreprocessing"
    execution_provider: Optional[str] = None
    schema: Optional[str] = None
