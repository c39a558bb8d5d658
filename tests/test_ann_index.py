"""Materialized ANN index artifacts: engine queries must READ the index
(embedded _ann_* columns + partition layout) instead of recomputing
signatures per query, probe planning must cost zero cluster scans, and
the partition layout must prune files at the scan.

Reference parity: index built once on creation/backfill, maintained on
writes, queried (ahnlich/db/src/engine/store.rs non_linear.rs:186-205);
kdtree n_nearest is EXACT (kdtree.rs:437-529)."""

import contextlib
import io
import os

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ahnlich_spark.functions import similarity as S
from ahnlich_spark.operators.topk import top_k_similar

DIM = 32
N = 6000  # > BRUTE_FORCE_THRESHOLD so the approximate path engages


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _vectors(n, dim, seed=11, n_clusters=120):
    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 1.0, size=(n_clusters, dim))
    assign = rng.randint(0, n_clusters, size=n)
    return (centers[assign] + rng.normal(0, 0.15, size=(n, dim))).astype(np.float32)


VECS = _vectors(N, DIM)


def _big_entries():
    return [(v.tolist(), {"i": str(i)}) for i, v in enumerate(VECS)]


@pytest.fixture(scope="module")
def indexed_engine(spark, tmp_path_factory):
    from ahnlich_spark import Engine

    eng = Engine(spark, str(tmp_path_factory.mktemp("ann_wh")))
    eng.create_store("vecs", dimension=DIM)
    eng.set("vecs", _big_entries())
    # create AFTER data exists -> exercises the backfill rewrite
    eng.create_non_linear_algorithm_index("vecs", ["hnsw", "ivf", "kdtree", "pq"])
    return eng


def test_store_files_carry_index_columns_and_layout(indexed_engine):
    eng = indexed_engine
    meta = eng.catalog.get_store("vecs")
    path = eng.catalog.store_path(meta)
    raw = eng.spark.read.parquet(path)
    assert {"_ann_sig", "_ann_sigp", "_ann_bucket"} <= set(raw.columns)
    # IVF bucket is the partition-layout key (dir-partitioned parquet)
    assert any(d.startswith("_ann_bucket=") for d in os.listdir(path))
    # centroids persisted next to the version dirs
    assert os.path.exists(eng.catalog.store_aux_path(meta, "ivf_centroids.npy"))


def test_query_plan_reads_index_not_recomputes(indexed_engine):
    """The hnsw query plan must read the precomputed signature column
    from the scan, NOT re-project it: a signature recompute would add
    n_planes (16) per-plane dot-product expressions; the only
    higher-order expressions allowed are the rescore cosine's (one
    zip_with + its norm aggregates)."""
    q = VECS[3].tolist()
    top = indexed_engine.get_sim_n("vecs", q, closest_n=10, algorithm="hnsw")
    plan = plan_of(top)
    assert plan.count("zip_with") <= 2, plan
    # candidate filter reads the stored signature and reaches the scan
    assert "_ann_sig" in plan.split("ReadSchema")[1].split("\n")[0]
    assert "bit_count" in plan
    # the sig-prefix probe set is pushed to the parquet scan
    assert "_ann_sigp" in plan.split("PushedFilters")[1].split("\n")[0]


def test_ivf_query_partition_prunes(indexed_engine):
    q = VECS[5].tolist()
    top = indexed_engine.get_sim_n("vecs", q, closest_n=10, algorithm="ivf")
    plan = plan_of(top)
    # bucket probe reaches the scan as a PARTITION filter (file pruning)
    assert "_ann_bucket" in plan.split("PartitionFilters")[1].split("\n")[0]


def test_histograms_collected_once_per_version(indexed_engine):
    """Probe planning runs on CACHED per-version statistics: after the
    first collection, _ann_state must return the same object with zero
    Spark jobs (no per-query histogram scans — the round-1 weakness)."""
    eng = indexed_engine
    meta = eng.catalog.get_store("vecs")
    tracker = eng.spark.sparkContext.statusTracker()
    s1 = eng._ann_state(meta, "hnsw")  # may collect (first use)
    before = tracker.getJobIdsForGroup(None)
    s2 = eng._ann_state(meta, "hnsw")
    after = tracker.getJobIdsForGroup(None)
    assert s2 is s1
    assert len(after) == len(before), "cached _ann_state launched Spark jobs"
    assert s1["count"] >= N
    assert sum(s1["sig_counts"].values()) == s1["count"]


@pytest.mark.parametrize("algo,metric", [("hnsw", S.COSINE), ("ivf", S.EUCLIDEAN)])
def test_materialized_path_recall(indexed_engine, spark, algo, metric):
    eng = indexed_engine
    store = eng.store_df("vecs")
    rng = np.random.RandomState(3)
    recalls = []
    for i in rng.choice(N, size=5, replace=False):
        q = VECS[i].tolist()
        approx = {r["id"] for r in eng.get_sim_n("vecs", q, 50, algorithm=algo).collect()}
        exact = {r["id"] for r in top_k_similar(store, q, metric, 50).collect()}
        recalls.append(len(approx & exact) / 50)
    avg = sum(recalls) / len(recalls)
    assert avg > 0.90, f"{algo}: avg recall {avg:.3f} ({recalls})"


def test_pq_artifact_built_and_read(indexed_engine):
    """PQ code column embedded in the store files, codebooks persisted,
    and the query plan reads the stored codes (an encode recompute would
    put m*k = 128 aggregate folds in the plan — the candidate stage must
    carry only the ADC chain's element_at lookups)."""
    eng = indexed_engine
    meta = eng.catalog.get_store("vecs")
    raw = eng.spark.read.parquet(eng.catalog.store_path(meta))
    assert "_ann_pqcode" in raw.columns
    assert os.path.exists(eng.catalog.store_aux_path(meta, "pq_codebooks.npy"))

    q = VECS[7].tolist()
    plan = plan_of(eng.get_sim_n("vecs", q, closest_n=10, algorithm="pq"))
    assert "_ann_pqcode" in plan.split("ReadSchema")[1].split("\n")[0]
    # rescore cosine/euclidean contributes <= 2 zip_with; encode would add 128
    assert plan.count("zip_with") <= 2, plan


def test_pq_recall(indexed_engine):
    eng = indexed_engine
    store = eng.store_df("vecs")
    rng = np.random.RandomState(5)
    recalls = []
    for i in rng.choice(N, size=5, replace=False):
        q = VECS[i].tolist()
        approx = {r["id"] for r in eng.get_sim_n("vecs", q, 50, algorithm="pq").collect()}
        exact = {r["id"] for r in top_k_similar(store, q, S.EUCLIDEAN, 50).collect()}
        recalls.append(len(approx & exact) / 50)
    avg = sum(recalls) / len(recalls)
    assert avg > 0.80, f"pq: avg recall {avg:.3f} ({recalls})"


def test_pq_dimension_guard(spark, tmp_path_factory):
    from ahnlich_spark import Engine

    eng = Engine(spark, str(tmp_path_factory.mktemp("pq_guard_wh")))
    eng.create_store("odd", dimension=30)
    with pytest.raises(ValueError, match="divisible"):
        eng.create_non_linear_algorithm_index("odd", ["pq"])


def test_kdtree_is_exact(indexed_engine):
    """Reference KD-tree contract: n_nearest is exact k-NN."""
    eng = indexed_engine
    store = eng.store_df("vecs")
    q = VECS[11].tolist()
    got = [r["id"] for r in eng.get_sim_n("vecs", q, 20, algorithm="kdtree").collect()]
    exact = [r["id"] for r in top_k_similar(store, q, S.EUCLIDEAN, 20).collect()]
    assert got == exact


def test_index_maintained_across_writes(indexed_engine):
    """A post-index Set must keep the artifact current: new rows are
    findable through the approximate path."""
    eng = indexed_engine
    probe = (_vectors(1, DIM, seed=99)[0] + 0.001).astype(np.float32).tolist()
    eng.set("vecs", [(probe, {"i": "new"})])
    top = eng.get_sim_n("vecs", probe, closest_n=1, algorithm="hnsw").collect()
    assert len(top) == 1 and abs(top[0]["similarity"] - 1.0) < 1e-6


def test_ivf_pq_composed_partition_prune(indexed_engine):
    """With BOTH ivf and pq indexes the pq query composes them: the
    coarse quantizer prunes bucket partitions at the SCAN (partition
    filter on _ann_bucket) and the ADC chain ranks only the survivors;
    recall against exact stays >= 0.8."""
    eng = indexed_engine
    q = VECS[21].tolist()
    top = eng.get_sim_n("vecs", q, closest_n=10, algorithm="pq")
    plan = plan_of(top)
    assert "_ann_bucket" in plan.split("PartitionFilters")[1].split("\n")[0]
    assert "_ann_pqcode" in plan.split("ReadSchema")[1].split("\n")[0]

    store = eng.store_df("vecs")
    rng = np.random.RandomState(9)
    recalls = []
    for i in rng.choice(N, size=5, replace=False):
        qq = VECS[i].tolist()
        approx = {r["id"] for r in eng.get_sim_n("vecs", qq, 50, algorithm="pq").collect()}
        exact = {r["id"] for r in top_k_similar(store, qq, S.EUCLIDEAN, 50).collect()}
        recalls.append(len(approx & exact) / 50)
    assert sum(recalls) / len(recalls) > 0.80, recalls


# ------------------------------------ driver-gate pruned-path coverage --

@pytest.mark.parametrize("gate,layout_col", [
    ("ann_pruned_lsh_topk", "_ann_sigp"),
    ("ann_pruned_ivf_topk", "_ann_bucket"),
])
def test_pruned_gates_take_pruned_path_not_brute_force(spark, gate, layout_col):
    """The CORRECTNESS gates added for VERDICT r02 #2 must actually run
    the engine's histogram-planned pruned read: the final plan reads the
    persisted index column with a partition/pushdown probe filter — a
    silent fall-back to the exact scan would make the gate vacuous."""
    from ahnlich_spark import entry_queries as EQ

    df = EQ.QUERIES[gate](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    # the index column IS the store's partition-layout key in both gate
    # stores (sig-prefix for hnsw-only, bucket for ivf) — the probe set
    # must reach the scan as a PARTITION filter (whole-file pruning)
    assert layout_col in plan.split("PartitionFilters")[1].split("\n")[0], plan


@pytest.mark.parametrize("gate", ["ann_pruned_lsh_topk", "ann_pruned_ivf_topk"])
def test_pruned_gates_selfhit_and_shape(spark, gate):
    """Sanity on the gate output: the query vector itself (vec_id 0,
    Hamming/bucket distance 0 — always inside the probe set) must come
    back at rank 1 with a perfect score, and the gate returns a full
    top-k. The >=0.9 recall CONTRACT (sift_dataset_validation.rs:97-113)
    is asserted on the CLUSTERED 6k fixture in
    test_materialized_path_recall — the gate corpus is uniform-random,
    where no sublinear method can reach 0.9 recall and the gate's job is
    hash-exactness of the pruned pipeline instead."""
    from ahnlich_spark import entry_queries as EQ

    rows = {r["vec_id"]: r for r in EQ.QUERIES[gate](spark, "/root/testdata/sf0.001").collect()}
    assert len(rows) == 10
    assert rows[0]["rank_n"] == 1
    # cosine self-sim 1.0 -> 10000; euclidean self-dist 0.0 -> 0
    assert rows[0]["score_e4"] in (10000, 0)


def test_batch_lsh_one_pruned_scan_for_all_probes(spark):
    """Engine._batch_lsh: the whole probe batch reads the store ONCE
    through a partition-pruned scan (unioned prefixes) with per-probe
    radii applied in a broadcast join — no per-probe scans, no
    brute-force fallback."""
    from ahnlich_spark import entry_queries as EQ

    eng = EQ._pruned_engine(spark, "/root/testdata/sf0.001", "hnsw")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = [(int(r["vec_id"]), list(r["embedding"]))
              for r in emb.filter("vec_id < 4").collect()]
    out = eng.get_sim_n_batch("annp", probes, closest_n=5,
                              algorithm="hnsw", precision="double")
    plan = plan_of(out)
    assert "_ann_sigp" in plan.split("PartitionFilters")[1].split("\n")[0], plan
    # exactly one file source in the whole plan (tree header + detail
    # both print the node name, so count Location: lines)
    assert plan.count("Location:") == 1, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    rows = out.collect()
    assert len(rows) == 4 * 5
    # every probe's own vector comes back at rank 1 (Hamming 0)
    by_probe = {r["qid"]: r for r in rows if r["rank_n"] == 1}
    for pid, vec in probes:
        assert [float(x) for x in by_probe[pid]["key"]] == [
            float(np.float32(x)) for x in vec
        ]


@pytest.mark.parametrize("algo", ["hnsw", "ivf"])
def test_batch_path_matches_single_probe_path(indexed_engine, algo):
    """The batch pruned path must return EXACTLY what the single-probe
    pruned path returns for each probe — same planner formulas, same
    candidate sets, same ranking."""
    eng = indexed_engine
    probes = [(int(i), VECS[i].tolist()) for i in (2, 17, 33)]
    batch = eng.get_sim_n_batch("vecs", probes, closest_n=10, algorithm=algo)
    by_probe = {}
    for r in batch.collect():
        by_probe.setdefault(r["qid"], []).append((r["rank_n"], r["id"]))
    for pid, vec in probes:
        single = [r["id"] for r in
                  eng.get_sim_n("vecs", vec, closest_n=10, algorithm=algo).collect()]
        got = [i for _rn, i in sorted(by_probe[pid])]
        assert got == single, (algo, pid)


def test_pq_and_ivf_maintained_across_delta_writes(indexed_engine):
    """Delta upserts must carry pq codes and ivf buckets (not just LSH
    signatures) so every index path sees post-index writes."""
    eng = indexed_engine
    probe = (_vectors(1, DIM, seed=123)[0] + 0.002).astype(np.float32).tolist()
    eng.set("vecs", [(probe, {"i": "delta-new"})])
    for algo in ("pq", "ivf"):
        top = eng.get_sim_n("vecs", probe, closest_n=1, algorithm=algo).collect()
        assert len(top) == 1, algo
        assert list(top[0]["key"]) == [float(np.float32(x)) for x in probe], algo


@pytest.mark.parametrize("cfg,floor", [
    ({"m": 12, "ef_construction": 50}, 0.80),
    ({"m": 16, "ef_construction": 100}, 0.90),
    ({"m": 24, "ef_construction": 200, "extend_candidates": True}, 0.90),
])
def test_hnsw_recall_parameter_sweep(spark, tmp_path_factory, cfg, floor):
    """Mirror of the reference's SIFT parameter-sweep recall assertions
    (sift_dataset_validation.rs:138-188): recall@50 holds its floor
    across HNSW configs, exercised through the reference tunables (m ->
    n_planes, ef_construction = candidate quota, extend_candidates ->
    wider radius floor) on the clustered fixture."""
    from ahnlich_spark import Engine

    eng = Engine(spark, str(tmp_path_factory.mktemp("sweep_wh")))
    eng.create_store("sw", dimension=DIM)
    eng.set("sw", _big_entries())
    eng.create_non_linear_algorithm_index("sw", ["hnsw"], config=cfg)
    store = eng.store_df("sw")
    rng = np.random.RandomState(13)
    recalls = []
    for i in rng.choice(N, size=4, replace=False):
        q = VECS[i].tolist()
        approx = {r["id"] for r in eng.get_sim_n("sw", q, 50, algorithm="hnsw").collect()}
        exact = {r["id"] for r in top_k_similar(store, q, S.COSINE, 50).collect()}
        recalls.append(len(approx & exact) / 50)
    avg = sum(recalls) / len(recalls)
    assert avg >= floor, (cfg, avg, recalls)


def test_batch_pq_composes_ivf_partition_prune(indexed_engine):
    """Batch ADC with BOTH ivf and pq indexes: the union of per-probe
    bucket sets prunes partitions at the scan, and recall vs exact
    stays at the single-probe pq level."""
    eng = indexed_engine
    probes = [(int(i), VECS[i].tolist()) for i in (4, 40, 400)]
    out = eng.get_sim_n_batch("vecs", probes, closest_n=10, algorithm="pq")
    plan = plan_of(out)
    assert "_ann_bucket" in plan.split("PartitionFilters")[1].split("\n")[0], plan
    store = eng.store_df("vecs")
    for pid, vec in probes:
        got = {r["id"] for r in out.collect() if r["qid"] == pid}
        exact = {r["id"] for r in top_k_similar(store, vec, S.EUCLIDEAN, 10).collect()}
        assert len(got & exact) >= 7, (pid, len(got & exact))


def test_train_centroids_partition_invariant(spark):
    """The quantizer trains on a HASH-ORDERED sample: at 100 TB the
    store is disk-clustered by source/date, so a limit(N)
    first-partitions sample would skew every IVF bucket. Centroids must
    be byte-identical however the input is partitioned or ordered
    (VERDICT r03 #1)."""
    from ahnlich_spark.operators.ann import train_centroids

    vecs = _vectors(3000, 8, seed=29)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id long, key array<float>")
    a = train_centroids(df.repartition(1), 8, n_clusters=16, sample=1000)
    b = train_centroids(
        df.orderBy(F.desc("id")).repartition(13), 8, n_clusters=16, sample=1000
    )
    assert np.array_equal(a, b)
    # and the sample is NOT the first partitions: shifting which rows
    # come "first" must not change the trained centroids
    c = train_centroids(
        df.orderBy("id").coalesce(3), 8, n_clusters=16, sample=1000
    )
    assert np.array_equal(a, c)


def test_train_codebooks_df_partition_invariant(spark):
    from ahnlich_spark.operators.pq import train_codebooks_df

    vecs = _vectors(2000, 16, seed=31)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id long, key array<float>")
    a = train_codebooks_df(df.repartition(1), m=4, k=8, sample=700)
    b = train_codebooks_df(df.orderBy(F.desc("id")).repartition(7), m=4, k=8, sample=700)
    assert a is not None and np.array_equal(a, b)


def test_batch_planning_distributed_parity(indexed_engine):
    """Answers must be IDENTICAL either side of BATCH_PLAN_THRESHOLD:
    the distributed pandas-UDF planners run the same choose_probes /
    choose_radius logic on the same cached statistics as the driver
    loop (VERDICT r03 #4), so flipping the threshold must not change a
    single (qid, id, rank) for hnsw OR ivf."""
    eng = indexed_engine
    probes = [(i, VECS[i * 7].tolist()) for i in range(30)]
    for algo in ("hnsw", "ivf"):
        eng.BATCH_PLAN_THRESHOLD = 10_000  # driver loop
        a = {(r["qid"], r["rank_n"]): r["id"]
             for r in eng.get_sim_n_batch("vecs", probes, closest_n=5,
                                          algorithm=algo).collect()}
        eng.BATCH_PLAN_THRESHOLD = 1  # distributed planners
        try:
            b = {(r["qid"], r["rank_n"]): r["id"]
                 for r in eng.get_sim_n_batch("vecs", probes, closest_n=5,
                                              algorithm=algo).collect()}
        finally:
            del eng.BATCH_PLAN_THRESHOLD  # back to the class default
        assert a == b, algo
        assert len(a) == 30 * 5


def test_batch_planning_dim_check_threshold_invariant(indexed_engine, spark):
    """A wrong-dimension probe batch raises the typed DimensionMismatch
    on BOTH sides of BATCH_PLAN_THRESHOLD — the distributed planner
    branch must not surface it as an opaque executor pandas-UDF error."""
    import pytest

    from ahnlich_spark import errors

    eng = indexed_engine
    bad_rows = [(0, VECS[0].tolist()), (1, VECS[1].tolist() + [0.0])]
    bad_df = spark.createDataFrame(bad_rows, "qid long, qkey array<float>")
    # a NULL probe key must be flagged too: under ANSI mode
    # size(NULL) is NULL, so a bare size != dim predicate would pass
    # the row silently and die later inside the executor
    null_df = spark.createDataFrame(
        [(0, VECS[0].tolist()), (1, None)], "qid long, qkey array<float>"
    )
    for algo in ("hnsw", "ivf"):
        for thresh in (10_000, 1):
            eng.BATCH_PLAN_THRESHOLD = thresh
            try:
                for probes in (bad_rows, bad_df, null_df):
                    with pytest.raises(errors.DimensionMismatch):
                        eng.get_sim_n_batch("vecs", probes, closest_n=3,
                                            algorithm=algo)
            finally:
                del eng.BATCH_PLAN_THRESHOLD


def test_batch_pq_chunked_parity(indexed_engine):
    eng = indexed_engine
    probes = [(i, VECS[i * 5].tolist()) for i in range(24)]
    a = {(r["qid"], r["rank_n"]): r["id"]
         for r in eng.get_sim_n_batch("vecs", probes, closest_n=3,
                                      algorithm="pq").collect()}
    eng.BATCH_PLAN_THRESHOLD = 7  # force 4 chunks
    try:
        b = {(r["qid"], r["rank_n"]): r["id"]
             for r in eng.get_sim_n_batch("vecs", probes, closest_n=3,
                                          algorithm="pq").collect()}
    finally:
        del eng.BATCH_PLAN_THRESHOLD
    assert a == b and len(a) == 24 * 3


def test_huge_probe_batch_completes(spark, tmp_path_factory):
    """A probe batch far above the planning threshold must complete
    without unbounded driver work: planning runs executor-side and only
    the bounded bucket union returns to the driver (100k-probe smoke,
    VERDICT r03 #4)."""
    from ahnlich_spark import Engine

    rng = np.random.RandomState(41)
    dim, n = 8, 1500
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    eng = Engine(spark, str(tmp_path_factory.mktemp("huge_wh")))
    eng.brute_force_threshold = 64  # tiny candidate quotas
    eng.create_store("hp", dimension=dim)
    eng.create_non_linear_algorithm_index("hp", ["ivf"])
    eng.set("hp", [(v.tolist(), {}) for v in vecs])

    n_probes = 100_000
    pvecs = vecs[rng.randint(0, n, size=n_probes)]
    probes_df = spark.createDataFrame(
        [(i, pvecs[i].tolist()) for i in range(n_probes)],
        "qid long, qkey array<float>",
    )
    out = eng.get_sim_n_batch("hp", probes_df, closest_n=1, algorithm="ivf")
    assert out.groupBy().count().first()[0] == n_probes


def test_wide_signature_histogram_is_bounded(spark, tmp_path_factory):
    """n_planes > SIG_HISTOGRAM_MAX_PLANES: the driver must never
    collect the full signature histogram (2^32 possible entries) —
    planning runs on a fixed-size hash-ordered sample scaled to the
    store count, and the pruned path still answers with decent recall
    (VERDICT r03 #6)."""
    from ahnlich_spark import Engine

    eng = Engine(spark, str(tmp_path_factory.mktemp("wide_wh")))
    eng.create_store("wide", dimension=DIM,
                     non_linear_indices=["hnsw"],
                     non_linear_config={"hnsw": {"n_planes": 32}})
    eng.set("wide", _big_entries())
    meta = eng.catalog.get_store("wide")
    state = eng._ann_state(meta, "hnsw")
    assert state.get("sampled") is True
    assert len(state["sig_counts"]) <= Engine.SIG_HISTOGRAM_SAMPLE
    assert state["count"] == N

    q = VECS[11].tolist()
    approx = {r["id"] for r in
              eng.get_sim_n("wide", q, closest_n=10, algorithm="hnsw").collect()}
    exact = {r["id"] for r in
             top_k_similar(eng.store_df("wide"), q, S.COSINE, 10).collect()}
    assert len(approx & exact) >= 8, len(approx & exact)


@pytest.fixture(scope="module")
def residual_engine(spark, tmp_path_factory):
    """Store with the ivf+pq RESIDUAL composition (FAISS IVFPQ): codes
    are taken against each row's bucket centroid."""
    from ahnlich_spark import Engine

    eng = Engine(spark, str(tmp_path_factory.mktemp("resid_wh")))
    eng.brute_force_threshold = 64
    eng.create_store("rv", dimension=DIM)
    eng.create_non_linear_algorithm_index(
        "rv", ["ivf", "pq"],
        config={"residual": True, "n_clusters": 12, "n_probe": 6},
    )
    eng.set("rv", _big_entries())
    return eng


def test_residual_requires_ivf(spark, tmp_path_factory):
    from ahnlich_spark import Engine

    eng = Engine(spark, str(tmp_path_factory.mktemp("resid_guard")))
    eng.create_store("g", dimension=DIM)
    with pytest.raises(ValueError, match="residual"):
        eng.create_non_linear_algorithm_index("g", ["pq"], config={"residual": True})


def test_residual_ivfpq_recall_and_plan(residual_engine):
    """The residual pq path must (a) prune bucket partitions at the
    scan, (b) rank from the persisted residual codes without re-encoding,
    (c) hold a recall floor against the exact scan."""
    eng = residual_engine
    store = eng.store_df("rv")
    hits = total = 0
    for i in (3, 41, 97):
        q = VECS[i].tolist()
        top = eng.get_sim_n("rv", q, closest_n=10, algorithm="pq")
        if i == 3:
            plan = plan_of(top)
            assert "_ann_bucket" in plan.split("PartitionFilters")[1].split("\n")[0]
            assert "_ann_pqcode" in plan.split("ReadSchema")[1].split("\n")[0]
        got = {r["id"] for r in top.collect()}
        exact = {r["id"] for r in
                 top_k_similar(store, q, S.EUCLIDEAN, 10).collect()}
        hits += len(got & exact)
        total += 10
    assert hits / total >= 0.8, hits / total


def test_residual_codes_maintained_across_delta_writes(residual_engine):
    """A post-index Set must encode the delta rows' residual codes
    against their own buckets — the new vector is findable through the
    residual pq path."""
    eng = residual_engine
    probe = (_vectors(1, DIM, seed=321)[0] + 0.002).astype(np.float32).tolist()
    eng.set("rv", [(probe, {"i": "resid-delta"})])
    top = eng.get_sim_n("rv", probe, closest_n=1, algorithm="pq").collect()
    assert len(top) == 1
    assert list(top[0]["key"]) == [float(np.float32(x)) for x in probe]


def test_residual_batch_matches_single_probe_pruned(residual_engine):
    """Residual batch face (one pruned scan for the whole batch): each
    probe dispatches ONLY its own picked buckets' LUTs, so per-probe
    answers — ids AND ranks — are identical to #probes single
    get_sim_n calls through the pruned residual path. The scan is
    bucket-partition-pruned, and chunked planning (threshold forced to
    1 probe per chunk) returns the same answers."""
    eng = residual_engine
    probes = [(i, VECS[i].tolist()) for i in range(4)]
    out = eng.get_sim_n_batch("rv", probes, closest_n=5, algorithm="pq",
                              precision="double")
    plan = plan_of(out)
    assert "_ann_bucket" in plan.split("PartitionFilters")[1].split("\n")[0], plan
    got = {}
    for r in out.collect():
        got.setdefault(r["qid"], []).append((r["rank_n"], r["id"]))

    want = {}
    for pid, v in probes:
        rows = eng.get_sim_n("rv", v, closest_n=5, algorithm="pq",
                             precision="double").collect()
        want[pid] = [(rk, r["id"]) for rk, r in enumerate(rows, start=1)]
    assert got == want

    prev = eng.BATCH_PLAN_THRESHOLD
    eng.BATCH_PLAN_THRESHOLD = 1  # instance attr shadows the class attr
    try:
        chunked = {}
        for r in eng.get_sim_n_batch("rv", probes, closest_n=5,
                                     algorithm="pq",
                                     precision="double").collect():
            chunked.setdefault(r["qid"], []).append((r["rank_n"], r["id"]))
    finally:
        eng.BATCH_PLAN_THRESHOLD = prev
    assert chunked == want


def test_residual_store_refuses_dropping_ivf_alone(residual_engine):
    """The coarse quantizer cannot be dropped out from under residual
    codes (they decode against its centroids); dropping both together
    is fine."""
    eng = residual_engine
    with pytest.raises(ValueError, match="residual"):
        eng.drop_non_linear_algorithm_index("rv", ["ivf"])
    assert set(eng.catalog.get_store("rv").non_linear) >= {"ivf", "pq"}


def test_residual_batch_small_store_exact_shortcut(residual_engine):
    """Below the brute-force threshold BOTH residual faces answer
    exactly (the code-review r4 regression: the batch face must apply
    the same small-store shortcut as single-probe _ann_top_k, or
    batch==singles breaks exactly where users least expect it)."""
    from ahnlich_spark.operators.topk import top_k_batch

    eng = residual_engine
    probes = [(i, VECS[i].tolist()) for i in range(3)]
    prev = eng.brute_force_threshold
    eng.brute_force_threshold = 10**9  # instance attr: store is "small"
    try:
        out = eng.get_sim_n_batch("rv", probes, closest_n=5, algorithm="pq",
                                  precision="double")
        got = {}
        for r in out.collect():
            got.setdefault(r["qid"], set()).add((r["rank_n"], r["id"]))
        probes_df = eng.spark.createDataFrame(
            [(int(p), [float(x) for x in v]) for p, v in probes],
            "qid long, qkey array<float>",
        )
        want = {}
        for r in top_k_batch(eng.store_df("rv"), probes_df, S.EUCLIDEAN, 5,
                             precision="double", rank_col="rank_n").collect():
            want.setdefault(r["qid"], set()).add((r["rank_n"], r["id"]))
        assert got == want
    finally:
        eng.brute_force_threshold = prev


def test_maintain_index_drift_retrain_restores_recall(spark):
    """Engine.maintain_index end-to-end: baseline pinned at first call,
    below-threshold drift keeps the index, above-threshold drift
    retrains (artifacts re-derived, version bumped) and restores the
    recall floor the stale codebooks provably miss. Mirrors the
    ann_drift_retrain gate's scenario on the sf0.001 fixture."""
    import numpy as np
    import tempfile

    import pytest

    from ahnlich_spark import errors
    from ahnlich_spark.entry_queries import (
        _DRIFT_CAND,
        _DRIFT_SHIFT,
        _drift_fresh_codebooks,
    )
    from ahnlich_spark.functions import similarity as S
    from ahnlich_spark.operators.pq import train_codebooks
    from ahnlich_spark.plans.engine import Engine

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .filter(F.col("vec_id") < 300)
    eng = Engine(spark, tempfile.mkdtemp())
    eng.brute_force_threshold = 128
    # no trained-quantizer index -> typed error
    eng.create_store("plainx", dimension=64)
    with pytest.raises(errors.NonLinearIndexNotFound):
        eng.maintain_index("plainx")
    eng.create_store("drift", dimension=64)
    eng.create_non_linear_algorithm_index(
        "drift", ["pq"],
        config={"m": 8, "k_centroids": 16, "candidates": _DRIFT_CAND},
    )
    meta = eng.catalog.get_store("drift")
    np.save(eng.catalog.store_aux_path(meta, "pq_codebooks.npy"),
            train_codebooks())
    eng.set("drift", emb.select(F.col("embedding").alias("key")))
    assert eng.maintain_index("drift")["baseline_initialized"] == 1
    # no mutation -> zero drift -> keep
    keep = eng.maintain_index("drift")
    assert keep == {"max_drift_e9": 0, "retrained": 0,
                    "baseline_initialized": 0}
    shift = F.transform(
        F.col("embedding"),
        lambda x: (x.cast("double") + F.lit(_DRIFT_SHIFT)).cast("float"),
    )
    eng.set("drift", emb.select(shift.cast("array<float>").alias("key")))
    qrows = sorted(emb.filter(F.col("vec_id") < 5)
                   .select("vec_id", "embedding").collect(),
                   key=lambda r: r["vec_id"])
    queries = [[float(np.float32(np.float64(x) + _DRIFT_SHIFT))
                for x in r["embedding"]] for r in qrows]

    def hits():
        total = 0
        for qv in queries:
            exact = {r["id"] for r in eng.get_sim_n(
                "drift", qv, closest_n=10, algorithm=S.EUCLIDEAN,
                precision="double").collect()}
            approx = {r["id"] for r in eng.get_sim_n(
                "drift", qv, closest_n=10, algorithm="pq",
                precision="double").collect()}
            total += len(exact & approx)
        return total

    n_before = hits()
    # threshold above the drift -> keep, stale recall unchanged
    high = eng.maintain_index("drift", drift_threshold_e9=10**9)
    assert high["retrained"] == 0 and high["max_drift_e9"] > 100_000_000
    v_before = eng.catalog.get_store("drift").version
    got = eng.maintain_index("drift", codebooks=_drift_fresh_codebooks())
    assert got["retrained"] == 1
    assert eng.catalog.get_store("drift").version > v_before
    n_after = hits()
    # the pinned floor: stale provably misses what fresh restores
    assert n_before <= 25 and n_after >= 30, (n_before, n_after)
    # post-retrain the baseline is refreshed: drift back to zero
    assert eng.maintain_index("drift")["max_drift_e9"] == 0


def test_batch_conditioned_ann_equals_singles(indexed_engine, spark):
    """Conditioned non-linear BATCH queries mirror the single-probe
    dispatch: exact filtered top-k per probe (the accept-list
    brute-force semantics), identical to running each probe through
    get_sim_n with the same condition. kdtree batch is exact k-NN with
    or without a condition."""
    from ahnlich_spark.operators.predicates import In

    eng = indexed_engine
    cond = In("i", [str(i) for i in range(0, 600, 3)])
    probes = [(j, VECS[j * 11].tolist()) for j in range(4)]
    for algo in ("hnsw", "ivf", "pq", "kdtree"):
        batch = {}
        for r in eng.get_sim_n_batch("vecs", probes, closest_n=5,
                                     algorithm=algo, condition=cond,
                                     precision="double").collect():
            batch[(r["qid"], r["rank_n"])] = r["id"]
        # single-probe results carry no rank column -> enumerate the
        # returned (already closeness-ordered) rows
        singles = {}
        for pid, v in probes:
            rows = eng.get_sim_n("vecs", v, closest_n=5, algorithm=algo,
                                 condition=cond,
                                 precision="double").collect()
            for rk, r in enumerate(rows, 1):
                singles[(pid, rk)] = r["id"]
        assert batch == singles, algo
        assert len(batch) == 4 * 5


def test_batch_unknown_algorithm_error(indexed_engine):
    import pytest

    with pytest.raises(ValueError, match="unknown algorithm"):
        indexed_engine.get_sim_n_batch("vecs", [(0, VECS[0].tolist())],
                                       closest_n=2, algorithm="faiss")
