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


# ------------------------------------------------- index pushdown hints --
# Map access (meta[k]) gets NO parquet pushdown, so an indexed predicate
# key materializes a flat ``_pred_<key>`` STRING column in the store
# files (the physical effect of CreatePredIndex; reference backfills an
# inverted index, predicate.rs:142-178). ``pushdown_hint`` derives a
# condition IMPLIED by the predicate tree over those flat columns — a
# sound conjunct that Catalyst pushes to the scan for row-group/file
# pruning, while the full tagged-struct filter keeps exactness.

import re as _re

_PRED_COL_OK = _re.compile(r"^[A-Za-z0-9_]+$")


def pred_col_name(key: str):
    """Materialized-column name for an indexed key; None when the key
    cannot be a safe flat column name."""
    return f"_pred_{key}" if _PRED_COL_OK.match(key) else None


def _leaf_hint(key: str, values, indexed_cols) -> "Column | None":
    col = pred_col_name(key)
    if col is None or col not in indexed_cols:
        return None
    svals = [v.s for v in values]
    if any(s is None for s in svals):  # non-string kinds live in .bin
        return None
    return F.col(col).isin(svals) if len(svals) != 1 else (F.col(col) == svals[0])


def pushdown_hint(pred: Predicate, indexed_cols) -> "Column | None":
    """A pushable conjunct implied by ``pred`` over the materialized
    predicate columns, or None when no sound hint exists. Negative
    leaves (NotEquals/NotIn) give no hint — missing keys must MATCH
    there, and the flat column is NULL for them."""
    if isinstance(pred, Equals):
        return _leaf_hint(pred.key, (pred.value,), indexed_cols)
    if isinstance(pred, NotIn) or isinstance(pred, NotEquals):
        return None
    if isinstance(pred, In):
        if not pred.values:
            return F.lit(False)
        return _leaf_hint(pred.key, pred.values, indexed_cols)
    if isinstance(pred, And):
        l = pushdown_hint(pred.left, indexed_cols)
        r = pushdown_hint(pred.right, indexed_cols)
        if l is not None and r is not None:
            return l & r
        return l if l is not None else r
    if isinstance(pred, Or):
        l = pushdown_hint(pred.left, indexed_cols)
        r = pushdown_hint(pred.right, indexed_cols)
        return (l | r) if l is not None and r is not None else None
    return None
