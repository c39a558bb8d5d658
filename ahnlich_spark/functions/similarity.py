"""Distance/similarity kernels as native Catalyst expressions.

The reference implements SIMD f32 kernels (ahnlich/similarity/src/
distance.rs:159-323). Spark-first equivalent: higher-order array
functions (``zip_with`` + ``aggregate``) that stay inside whole-stage
codegen — no Python in the hot path. All math is done in FLOAT by
default to match the reference's f32 semantics; pass ``precision=
"double"`` when exact cross-engine (duckdb-oracle) comparison matters.

Closeness (reference distance.rs:36-97): a uniform "greater = closer"
sort key — similarity metrics as-is, distances negated (exact in fp).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

COSINE = "cosine_similarity"
DOT = "dot_product"
EUCLIDEAN = "euclidean_distance"

#: metrics where greater score = closer (similarities vs distances)
_SIMILARITY_METRICS = {COSINE, DOT}


def _zero(precision: str) -> Column:
    return F.lit(0.0).cast(T.FloatType() if precision == "float" else T.DoubleType())


def _cast(c: Column, precision: str) -> Column:
    return c.cast(T.FloatType() if precision == "float" else T.DoubleType())


def dot_product(a: Column, b: Column, precision: str = "float") -> Column:
    """sum(a_i * b_i) — single pass, codegen'd (ref distance.rs:215-255)."""
    prods = F.zip_with(a, b, lambda x, y: _cast(x, precision) * _cast(y, precision))
    return F.aggregate(prods, _zero(precision), lambda acc, x: acc + x)


def _norm_sq(a: Column, precision: str) -> Column:
    return F.aggregate(
        a, _zero(precision), lambda acc, x: acc + _cast(x, precision) * _cast(x, precision)
    )


def cosine_similarity(a: Column, b: Column, precision: str = "float") -> Column:
    """dot / (||a|| * ||b||) (ref distance.rs:159-206 fuses the three
    accumulators into one SIMD pass; here each aggregate is one codegen'd
    array traversal — still JVM-side and allocation-free)."""
    raw = dot_product(a, b, precision) / (
        F.sqrt(_norm_sq(a, precision)) * F.sqrt(_norm_sq(b, precision))
    )
    # sqrt/division promote to double; fold back to f32 when asked
    return _cast(raw, precision)


def squared_euclidean_distance(a: Column, b: Column, precision: str = "float") -> Column:
    """sum((a_i-b_i)^2), no sqrt (ref distance.rs:328-343)."""
    diffs = F.zip_with(
        a, b, lambda x, y: (_cast(x, precision) - _cast(y, precision))
        * (_cast(x, precision) - _cast(y, precision))
    )
    return F.aggregate(diffs, _zero(precision), lambda acc, x: acc + x)


def euclidean_distance(a: Column, b: Column, precision: str = "float") -> Column:
    """sqrt(sum((a_i-b_i)^2)) (ref distance.rs:276-323)."""
    return _cast(F.sqrt(squared_euclidean_distance(a, b, precision)), precision)


_METRICS = {
    COSINE: cosine_similarity,
    DOT: dot_product,
    EUCLIDEAN: euclidean_distance,
}


def score_expr(metric: str, a: Column, b: Column, precision: str = "float") -> Column:
    """The metric's own reported score (ref GetSimN returns the raw metric
    value as `similarity`, types/src/db/server.rs:32-44)."""
    try:
        fn = _METRICS[metric]
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(_METRICS)}") from None
    return fn(a, b, precision)


def closeness(metric: str, score: Column) -> Column:
    """Uniform 'greater = closer' ordering key (ref distance.rs:36-97):
    similarity as-is; distance negated (negation is exact in fp)."""
    return score if metric in _SIMILARITY_METRICS else -score


def is_similarity(metric: str) -> bool:
    return metric in _SIMILARITY_METRICS
