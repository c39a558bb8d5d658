"""functions/intmath.safe_rank_expr — the shared exact-rank builder.

Both quantile engines (operators/sketches.histogram_quantiles and
operators/ivm.quantile_rollup) ride this ONE expression, so it gets
its own exhaustive contract check: the Spark Column must equal
Python's exact integer ``ceil(num * n / den)`` for every (num, den,
n) regime — tiny values, the exact BIGINT-safe threshold, one past it
(the DECIMAL path), and the ~9.2e18 extreme where a wrapped product
would be grossly wrong — plus compound-expression arguments, which
must bind as units (precedence pinning).
"""

import pytest
from pyspark.sql import functions as F

from ahnlich_spark.functions.intmath import safe_rank_expr


def _py_rank(num: int, n: int, den: int) -> int:
    return (num * n + den - 1) // den


def test_safe_rank_matches_python_across_regimes(spark):
    den = 1_000_000
    num_max = 1_000_000
    safe_n = (2**63 - den) // num_max
    cases = []
    for num in (1, 7, 500_000, 999_999, 1_000_000):
        for n in (0, 1, 2, 999, 10**6, 10**12,
                  safe_n - 1, safe_n, safe_n + 1,   # threshold straddle
                  9_000_000_000_000_000_000):       # deep DECIMAL regime
            cases.append((num, n))
    df = spark.createDataFrame(cases, "num long, n long")
    got = (
        df.withColumn(
            "rank", safe_rank_expr("num", den, "n", num_max=num_max))
        .collect()
    )
    for r in got:
        assert r["rank"] == _py_rank(r["num"], r["n"], den), \
            (r["num"], r["n"])


def test_safe_rank_varied_denominators(spark):
    # each (den, num_max) pair is a distinct Column; sweep a few
    # structurally different rationals (p50, p90, p999999, thirds)
    rows = [(1, 1), (1, 2), (9, 10), (999_999, 1_000_000), (2, 3)]
    n_vals = [0, 1, 17, 10**9, 4 * 10**12, 2**62]
    df = spark.createDataFrame([(n,) for n in n_vals], "n long")
    for num, den in rows:
        got = df.withColumn(
            "rank",
            safe_rank_expr(str(num), den, "n", num_max=num)).collect()
        for r in got:
            assert r["rank"] == _py_rank(num, r["n"], den), (num, den, r["n"])


def test_safe_rank_compound_fragments_bind_as_units(spark):
    # precedence pinning: compound SQL fragments must not leak
    # operator precedence into the product (the reason the helper
    # parenthesizes its arguments)
    df = spark.createDataFrame([(3, 4, 10, 7)], "a long, b long, c long, d long")
    den = 5
    got = df.withColumn(
        "rank",
        safe_rank_expr("a + b", den, "c + d", num_max=7)).collect()[0]
    assert got["rank"] == _py_rank(3 + 4, 10 + 7, den)


def test_safe_rank_rejects_bad_parameters():
    with pytest.raises(ValueError, match="must be > 0"):
        safe_rank_expr("x", 0, "n", num_max=1)
    with pytest.raises(ValueError, match="must be > 0"):
        safe_rank_expr("x", 10, "n", num_max=0)
