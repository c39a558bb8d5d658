"""Predicate algebra -> Catalyst boolean expressions.

The reference's WHERE algebra (ahnlich/types/src/predicates.rs:3-79)
has four leaf predicates over ONE metadata key each, plus binary
And/Or. Semantics are pinned to the reference's full-scan path
(SURVEY.md §2.2; reference ahnlich/db/src/engine/store.rs:878-992):

- Equals(k, v):    meta[k] == v          ; missing key  => NO match
- NotEquals(k, v): meta[k] != v          ; missing key  => MATCH
- In(k, vs):       meta[k] in vs         ; missing key  => NO match
- NotIn(k, vs):    meta[k] not in vs     ; missing key  => MATCH

(The reference's *indexed* path diverges on NotEquals/NotIn — rows
missing the key are excluded there; the scan behavior is what the docs
and README promise, so it is the spec here. In Spark both "paths" are
the same Catalyst filter: an indexed predicate key only changes the
physical layout, never the answer.)

And = intersection, Or = union (predicates.rs:50-79), recursively
nestable — Catalyst boolean expressions give this natively.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

from ahnlich_spark.types import MetadataValue, mv


class Predicate:
    """Base class for the condition tree."""

    def to_column(self, meta: Column) -> Column:
        raise NotImplementedError

    # convenience combinators mirroring the DSL's `and` / `or`
    def and_(self, other: "Predicate") -> "And":
        return And(self, other)

    def or_(self, other: "Predicate") -> "Or":
        return Or(self, other)


def _value_eq(meta: Column, key: str, value: MetadataValue) -> Column:
    """meta[key] == tagged-literal; NULL (missing key) propagates."""
    return meta[key] == value.lit()


@dataclass(frozen=True)
class Equals(Predicate):
    key: str
    value: MetadataValue

    def __post_init__(self):
        object.__setattr__(self, "value", mv(self.value))

    def to_column(self, meta: Column) -> Column:
        # missing key -> NULL == v -> NULL -> filtered out (no match)
        return _value_eq(meta, self.key, self.value)


@dataclass(frozen=True)
class NotEquals(Predicate):
    key: str
    value: MetadataValue

    def __post_init__(self):
        object.__setattr__(self, "value", mv(self.value))

    def to_column(self, meta: Column) -> Column:
        # missing key -> NULL != v -> NULL -> coalesce(..., true) -> MATCH
        return F.coalesce(~_value_eq(meta, self.key, self.value), F.lit(True))


@dataclass(frozen=True)
class In(Predicate):
    key: str
    values: Tuple[MetadataValue, ...]

    def __post_init__(self):
        object.__setattr__(self, "values", tuple(mv(v) for v in self.values))

    def _membership(self, meta: Column) -> Column:
        # empty In matches nothing; NotIn's coalesce(~false, true) then
        # matches everything (reference set-membership semantics)
        if not self.values:
            return F.lit(False)
        cols = [_value_eq(meta, self.key, v) for v in self.values]
        out = cols[0]
        for c in cols[1:]:
            out = out | c
        return out

    def to_column(self, meta: Column) -> Column:
        return self._membership(meta)


@dataclass(frozen=True)
class NotIn(In):
    def to_column(self, meta: Column) -> Column:
        return F.coalesce(~self._membership(meta), F.lit(True))


@dataclass(frozen=True)
class And(Predicate):
    left: Predicate
    right: Predicate

    def to_column(self, meta: Column) -> Column:
        return self.left.to_column(meta) & self.right.to_column(meta)


@dataclass(frozen=True)
class Or(Predicate):
    left: Predicate
    right: Predicate

    def to_column(self, meta: Column) -> Column:
        return self.left.to_column(meta) | self.right.to_column(meta)


def compile_predicate(pred: Predicate, meta: Column | None = None) -> Column:
    """Compile a condition tree to a Catalyst boolean Column over the
    store's ``meta`` map column."""
    if meta is None:
        meta = F.col("meta")
    return pred.to_column(meta)
