"""Connected-components dedup clustering (operators/cluster.py)."""

import pytest
from pyspark.sql import functions as F

from ahnlich_spark.operators.cluster import connected_components, dedup_clusters


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "i bigint, j bigint")
    rows = connected_components(df).collect()
    return {r.node: r.component for r in rows}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter > 1, needs multiple propagation rounds
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_reversed_edges(spark):
    got = _cc(spark, [(9, 7), (7, 8), (3, 2)])
    assert got == {7: 7, 8: 7, 9: 7, 2: 2, 3: 2}


def test_clique_single_round(spark):
    got = _cc(spark, [(1, 2), (1, 3), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_dedup_clusters_singletons_and_reps(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id bigint")
    pairs = spark.createDataFrame([(2, 4), (4, 6)], "i bigint, j bigint")
    rows = {r.doc_id: (r.cluster_id, r.is_rep) for r in dedup_clusters(docs, pairs).collect()}
    assert rows == {
        1: (1, 1),
        2: (2, 1),  # representative of {2,4,6}
        3: (3, 1),
        4: (2, 0),
        5: (5, 1),
        6: (2, 0),
    }
    # exactly one representative per cluster
    df = dedup_clusters(docs, pairs)
    per = df.groupBy("cluster_id").agg(F.sum("is_rep").alias("nrep")).collect()
    assert all(r.nrep == 1 for r in per)


def test_kmeans_assign_deterministic_and_sane(spark):
    from ahnlich_spark.operators.cluster import kmeans_assign

    # two well-separated blobs around (0,0) and (10,10)
    rows = [(i, [0.0 + i * 0.01, 0.0]) for i in range(10)]
    rows += [(100 + i, [10.0, 10.0 + i * 0.01]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out1 = {r["vec_id"]: r["cluster_id"]
            for r in kmeans_assign(emb, k=2, iters=1).collect()}
    out2 = {r["vec_id"]: r["cluster_id"]
            for r in kmeans_assign(emb, k=2, iters=1).collect()}
    assert out1 == out2  # pure function of the data
    # seeds are the two lowest ids (both in blob A) but one Lloyd step
    # separates the blobs: every blob-B point lands in one cluster,
    # every blob-A point in the other
    a = {out1[i] for i in range(10)}
    b = {out1[100 + i] for i in range(10)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_kmeans_assign_plan_is_scan_local(spark):
    """The assignment pass must be a scan-local projection — no join,
    no shuffle: centroids ride in as literals."""
    from ahnlich_spark.operators.cluster import kmeans_assign

    emb = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    out = kmeans_assign(emb, k=2, iters=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_connected_components_small_and_distributed_paths_agree(spark):
    from ahnlich_spark.operators.cluster import connected_components

    # two chains + a singleton-free triangle
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "i long, j long",
    )
    small = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(pairs, small_graph_edges=0).collect()
    }
    assert small == dist
    assert small == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_chain_graph_converges_in_log_rounds(spark):
    """10k-node path graph — the adversarial case for min-label
    propagation (O(diameter)=10k rounds). Alternating large-star/
    small-star must converge within ~log2(n) alternations (VERDICT r02
    #6) and still label every node with the component minimum."""
    from ahnlich_spark.operators import cluster as C

    n = 10_000
    pairs = spark.range(n - 1).selectExpr("id AS i", "id + 1 AS j")
    rounds = {"n": 0}
    orig = C._persist

    def counting_persist(df, reliable):
        rounds["n"] += 1
        return orig(df, reliable)

    C._persist = counting_persist
    try:
        got = C.connected_components(pairs, max_iter=20, small_graph_edges=0)
        rows = got.collect()
    finally:
        C._persist = orig
    assert len(rows) == n
    assert all(r["component"] == 0 for r in rows)
    # persist is called once for edges + nodes + once per alternation;
    # the last alternation is the no-change fixpoint confirmation, so
    # productive alternations = total - 1 (~log2(10k) = 13.3)
    assert rounds["n"] - 2 <= 16, f"{rounds['n'] - 2} alternations"


def test_semantic_dedup_keeps_lowest_id_representative(spark):
    """Planted near-identical groups: exactly the lowest id of each
    co-clustered group survives; distinct vectors are never marked."""
    import numpy as np

    from ahnlich_spark.operators.cluster import semantic_dedup

    rng = np.random.RandomState(4)
    base = rng.normal(size=(6, 16))
    rows = []
    vid = 0
    groups = []
    for b in base:
        members = []
        for _ in range(3):  # 3 near-identical copies per group
            rows.append((vid, (b + rng.normal(0, 1e-3, 16)).tolist()))
            members.append(vid)
            vid += 1
        groups.append(members)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           semantic_dedup(df, k=4, iters=1, threshold=0.99).collect()}
    assert len(out) == vid
    for members in groups:
        cids = {out[m]["cluster_id"] for m in members}
        assert len(cids) == 1, "near-identical copies must co-cluster"
        flags = [out[m]["is_dup"] for m in sorted(members)]
        assert flags == [0, 1, 1], "keep exactly the lowest id"


# ------------------------------------------------------ kNN graph --

def test_knn_graph_twin_vectors_rank_first(spark):
    """Identical vectors share a bucket by construction and must be each
    other's rank-1 neighbor with cosine 1."""
    import random

    from ahnlich_spark.operators.cluster import knn_graph

    rng = random.Random(11)
    base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(20)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows.append((100, list(base[0])))  # twin of node 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    g = knn_graph(df, k=2, n_sign_bits=4, d_in=8)
    got = {(r["i"], r["rank_n"]): (r["j"], round(r["cos"], 9)) for r in g.collect()}
    assert got[(0, 1)] == (100, 1.0)
    assert got[(100, 1)] == (0, 1.0)


def test_knn_graph_dimension_mismatch_raises(spark):
    """A vector shorter than d_in would NULL every projection and drop
    all rows into bucket 0 (an all-pairs join) — it must error loudly."""
    import pytest

    from ahnlich_spark.operators.cluster import knn_graph

    df = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [1.0] * 4)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="!= d_in=8"):
        knn_graph(df, k=1, n_sign_bits=2, d_in=8).collect()


def test_knn_graph_shape_and_bucket_scope(spark):
    import random

    from ahnlich_spark.functions.projection import project_query, sign_matrix
    from ahnlich_spark.operators.cluster import knn_graph

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    edges = knn_graph(df, k=3, n_sign_bits=3, d_in=8).collect()
    per_node = {}
    for r in edges:
        per_node.setdefault(r["i"], []).append((r["rank_n"], r["cos"], r["j"]))
    m = sign_matrix(8, 3, 7)
    bucket = {
        i: sum(
            (1 << j) if p >= 0 else 0
            for j, p in enumerate(project_query(v, m))
        )
        for i, v in rows
    }
    for i, lst in per_node.items():
        lst.sort()
        # ranks are 1..n with n <= k, cos non-increasing, neighbors come
        # from the node's own bucket only
        assert [r for r, _, _ in lst] == list(range(1, len(lst) + 1))
        assert all(lst[a][1] >= lst[a + 1][1] for a in range(len(lst) - 1))
        assert all(bucket[j] == bucket[i] for _, _, j in lst)


def test_knn_graph_partition_order_invariant(spark):
    import random

    from ahnlich_spark.operators.cluster import knn_graph

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = sorted((r["i"], r["rank_n"], r["j"]) for r in knn_graph(df, k=2, n_sign_bits=3, d_in=8).collect())
    b = sorted(
        (r["i"], r["rank_n"], r["j"])
        for r in knn_graph(df.repartition(9), k=2, n_sign_bits=3, d_in=8).collect()
    )
    assert a == b and len(a) > 0
