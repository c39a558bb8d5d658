"""Deterministic random projection (Johnson-Lindenstrauss) for
embedding columns — the dimensionality-reduction stage in front of
large-scale similarity search: project 64-d -> 16-d, bucket/search in
the small space, exact-rescore survivors in the original space.

The projection matrix is a SEEDED Achlioptas sign matrix (+1/-1), not a
runtime RNG draw: entry (i, j) is derived from md5(f"{seed}:{i}:{j}")
parity, so the matrix — and every projected vector — is a pure function
of (seed, dims), reproducible across runs, engines and cluster sizes
(the same discipline as operators/sampling).

Scale notes (100 TB):
- ``project_expr`` builds each output component as a LEFT-ASSOCIATIVE
  chain of multiply-adds over the input components — plain binary
  arithmetic inside whole-stage codegen (no higher-order-function
  lambdas, no Python). d*d' fused multiply-adds per row, zero shuffle.
- The left-associative order is deliberate: an engine summing the same
  terms in the same order produces bit-identical doubles, so e4-scaled
  projections hash-match across engines (SQL's `+` chains are also
  left-associative).
"""

from __future__ import annotations

import hashlib
from typing import List

from pyspark.sql import Column
from pyspark.sql import functions as F


def sign_matrix(d_in: int, d_out: int, seed: int = 7) -> List[List[int]]:
    """d_in x d_out matrix of +1/-1 from md5 parity — deterministic."""
    return [
        [
            1
            if int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest(), 16) % 2 == 0
            else -1
            for j in range(d_out)
        ]
        for i in range(d_in)
    ]


def _sign_lit_array(signs: List[int]) -> Column:
    """64 sign literals as ONE foldable expression (split of a string
    literal, constant-folded to an array literal by the optimizer) —
    keeps the analyzed tree ~10 nodes instead of 64 Literal nodes per
    output dimension. A 16x64 projection written as explicit multiply-
    add chains is >1000 expression nodes; Catalyst analysis + codegen
    of that tree costs SECONDS per query, dwarfing the actual math."""
    return F.split(F.lit(",".join(str(float(s)) for s in signs)), ",").cast(
        "array<double>"
    )


def project_expr(vec: Column, matrix: List[List[int]]) -> List[Column]:
    """One Column per output dimension: sum_i vec[i] * m[i][j] as a
    sequential fold over ``zip_with`` — the same left-to-right
    summation order as SQL engines' ``list_sum(list_transform(...))``
    (verified bit-identical against DuckDB), with a compact constant-
    size expression tree per dimension."""
    d_out = len(matrix[0])
    outs = []
    vec_d = vec.cast("array<double>")
    for j in range(d_out):
        signs = _sign_lit_array([row[j] for row in matrix])
        outs.append(
            F.aggregate(
                F.zip_with(vec_d, signs, lambda x, s: x * s),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    return outs


def project_query(vec, matrix: List[List[int]]) -> List[float]:
    """Driver-side projection of a probe vector — the same sequential
    fold as ``project_expr`` (Python float arithmetic is IEEE double,
    so the result is bit-identical to the executor/SQL sums)."""
    d_in, d_out = len(matrix), len(matrix[0])
    out = []
    for j in range(d_out):
        acc = 0.0
        for i in range(d_in):
            acc = acc + float(vec[i]) * float(matrix[i][j])
        out.append(acc)
    return out


def _double_lit_array(values: List[float]) -> Column:
    """Double literals as one foldable split-of-string expression (see
    ``_sign_lit_array``); ``repr`` round-trips doubles exactly."""
    return F.split(F.lit(",".join(repr(float(v)) for v in values)), ",").cast(
        "array<double>"
    )


def projected_dist_expr(proj_cols: List[Column], q_proj: List[float]) -> Column:
    """Squared distance in the projected space: sequential fold over
    (p_j - q_j)^2 in dimension order — order-stable, compact tree."""
    p_arr = F.array(*proj_cols)
    q_arr = _double_lit_array(q_proj)
    return F.aggregate(
        F.zip_with(p_arr, q_arr, lambda p, q: (p - q) * (p - q)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def projected_top_k(
    df,
    query,
    k: int = 10,
    candidates: int = 128,
    d_out: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
):
    """Two-stage ANN via random projection: rank by squared distance in
    the d_out-dim projected space (scan-local expression, bounded
    TakeOrderedAndProject — no shuffle, no index artifact needed), keep
    ``candidates`` survivors, exact-rescore them in the original space.

    The JL guarantee makes the projected ordering a near-isometry, so a
    modest candidate multiple of k recovers the exact top-k with high
    probability; recall tunes with ``candidates`` exactly like IVF's
    n_probe. Returns (id, dist) rows, ascending exact distance, id
    tie-break. Deterministic end to end: seeded matrix, bit-stable
    chains, (dist, id) orderings."""
    import math

    q = [float(x) for x in query]
    m = sign_matrix(len(q), d_out, seed)
    q_proj = project_query(q, m)
    proj_cols = project_expr(F.col(vec_col), m)
    pdist = projected_dist_expr(proj_cols, q_proj)

    cand = (
        df.select(F.col(id_col), F.col(vec_col), pdist.alias("_pdist"))
        .orderBy(F.asc("_pdist"), F.asc(id_col))
        .limit(candidates)
    )
    # exact rescore in the original space (same compact fold)
    exact = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            _double_lit_array(q),
            lambda x, qq: (x - qq) * (x - qq),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        cand.select(F.col(id_col), F.sqrt(exact).alias("dist"))
        .orderBy(F.asc("dist"), F.asc(id_col))
        .limit(k)
    )


def project_df(
    df,
    d_out: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    d_in: int = None,
):
    """(id, proj ARRAY<DOUBLE>[d_out]): the projected embeddings."""
    if d_in is None:
        import pyspark.sql.functions as _F

        d_in = df.select(_F.size(vec_col)).first()[0]
    m = sign_matrix(d_in, d_out, seed)
    outs = project_expr(F.col(vec_col), m)
    return df.select(
        F.col(id_col), F.array(*outs).alias("proj")
    )
