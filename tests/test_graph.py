"""operators/graph.pagerank: integer fixed-point PageRank."""

import pytest
from pyspark.sql import functions as F

from ahnlich_spark.operators.graph import RANK_SCALE, pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank_e9"] for r in pagerank(df, **kw).collect()}


def test_star_hub_outranks_leaves(spark):
    # undirected star: hub 0 <-> leaves 1..4
    edges = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    r = _ranks(spark, edges, iterations=3)
    assert all(r[0] > r[i] for i in range(1, 5))
    assert len({r[i] for i in range(1, 5)}) == 1  # symmetry: equal leaves


def test_dangling_node_keeps_teleport_only(spark):
    # 1 -> 2, 2 has no out-edges: after round 1, node 1 receives nothing
    r = _ranks(spark, [(1, 2)], iterations=1, damping_e2=85)
    assert r[1] == (RANK_SCALE * 15) // 100
    assert r[2] == (RANK_SCALE * 15) // 100 + (85 * RANK_SCALE) // 100


def test_integer_math_is_partition_order_invariant(spark):
    edges = [(i, (i * 7 + 1) % 23) for i in range(46)]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df8 = spark.createDataFrame(list(reversed(edges)), "src long, dst long").repartition(8)
    r1 = {r["node"]: r["rank_e9"] for r in pagerank(df1, iterations=4).collect()}
    r8 = {r["node"]: r["rank_e9"] for r in pagerank(df8, iterations=4).collect()}
    assert r1 == r8


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_e2=100)
