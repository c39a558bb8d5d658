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


def project_expr(vec: Column, matrix: List[List[int]]) -> List[Column]:
    """One Column per output dimension: sum_i vec[i] * m[i][j], built as
    a left-associative add chain (codegen'd, order-stable)."""
    d_in, d_out = len(matrix), len(matrix[0])
    outs = []
    for j in range(d_out):
        acc = None
        for i in range(d_in):
            term = vec[i].cast("double") * F.lit(float(matrix[i][j]))
            acc = term if acc is None else acc + term
        outs.append(acc)
    return outs


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
