"""Random-projection tests: determinism, JL distance preservation,
scan-local plan."""

import math
import random

from pyspark.sql import functions as F

from ahnlich_spark.functions.projection import project_df, sign_matrix


def test_sign_matrix_deterministic():
    a = sign_matrix(8, 4, seed=7)
    b = sign_matrix(8, 4, seed=7)
    c = sign_matrix(8, 4, seed=8)
    assert a == b
    assert a != c
    assert all(v in (1, -1) for row in a for v in row)


def test_projection_preserves_relative_distances(spark):
    """JL sanity: for random points, projected distances (scaled by
    sqrt(d_in/d_out)) track original distances within a loose factor."""
    rnd = random.Random(42)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(64)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    proj = {r["vec_id"]: r["proj"] for r in project_df(df, d_out=16).collect()}
    orig = {i: v for i, v in rows}

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    scale = math.sqrt(16)  # E[|Sx|^2] = d_out * |x|^2 for sign matrices
    ratios = []
    for i in range(0, 20, 2):
        d0 = dist(orig[i], orig[i + 1])
        dp = dist(proj[i], proj[i + 1]) / scale
        ratios.append(dp / d0)
    # loose JL band — sign projections at d'=16 concentrate within ~2x
    assert all(0.3 < r < 3.0 for r in ratios), ratios


def test_projection_plan_scan_local(spark):
    df = spark.createDataFrame(
        [(1, [float(i) for i in range(64)])], "vec_id long, embedding array<double>"
    )
    plan = project_df(df, d_out=16)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
