"""Exact integer-arithmetic SQL expression builders shared by the
quantile paths.

Both exact-quantile implementations (the histogram sketch in
``operators/sketches.py`` and the maintained-pair-multiset rollup in
``operators/ivm.py``) compute the same rank:

    rank = ceil(num * n / den)  =  (num * n + den - 1) div den

in pure 64-bit integer math so the Spark result is bit-identical to
the DuckDB oracle. BIGINT wraps once ``num * n + den - 1`` passes
2^63 - 1 — with ANSI mode off the wrap is SILENT and pins every
quantile to the group's first value. The wrap only threatens groups
past ~9.2e12 rows (num = 1e6-scale), so the expression branches on the
provably-safe bound: exact BIGINT for every realistic group,
DECIMAL(38,0) for the product past the bound (never wrong, merely
slower). Centralised here so the next quantile-path change cannot fix
one engine path and silently leave the other wrapped (the two sites
previously derived the bound independently).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_rank_expr(num_sql: str, den: int, n_sql: str,
                   num_max: int) -> Column:
    """``ceil(num * n / den)`` as an exact integer Column.

    ``num_sql`` / ``n_sql`` are SQL fragments (a column name or an
    integer literal rendered to a string) for the numerator and the
    row/multiplicity count; ``den`` is a literal > 0; ``num_max`` is a
    static upper bound on the numerator's VALUE (for a literal
    numerator, the literal itself; for a column, its domain maximum —
    e.g. 1_000_000 for an e6-scaled quantile fraction).

    The safe bound is the largest n for which
    ``num_max * n + den - 1 <= 2^63 - 1`` holds:
    ``n <= (2^63 - den) div num_max``. Below it the BIGINT product is
    provably exact; above it the product is computed in DECIMAL(38,0)
    and the quotient (always <= n, so always BIGINT-safe) cast back.
    """
    den = int(den)
    num_max = int(num_max)
    if den <= 0 or num_max <= 0:
        raise ValueError(f"den={den} and num_max={num_max} must be > 0")
    safe_n = (2**63 - den) // num_max
    # fragments are parenthesized so a compound expression argument
    # (e.g. n_sql="a + b") binds as a unit instead of leaking operator
    # precedence into the product
    num_sql, n_sql = f"({num_sql})", f"({n_sql})"
    return F.expr(
        f"CASE WHEN {n_sql} <= {safe_n} THEN "
        f"(CAST({num_sql} AS BIGINT) * {n_sql} "
        f"+ CAST({den - 1} AS BIGINT)) DIV CAST({den} AS BIGINT) "
        f"ELSE CAST((CAST({num_sql} AS DECIMAL(38,0)) * {n_sql} "
        f"+ {den - 1}) DIV {den} AS BIGINT) END"
    )
