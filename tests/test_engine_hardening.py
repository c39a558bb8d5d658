"""Regression pins for engine-core hardening: NULL-key validation under
ANSI semantics, index-artifact lifecycle, config validation parity
between the two index-creation doors, ANN cache invalidation, and batch
pq schema/answer parity with the other get_sim_n_batch paths."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ahnlich_spark import Engine, errors


def _mk(spark, tmp_path_factory, name, dim=4):
    eng = Engine(spark, str(tmp_path_factory.mktemp(name)))
    return eng


def test_set_dataframe_rejects_null_keys(spark, engine):
    """A NULL key in the DataFrame set path must fail the WHOLE batch
    with the typed error — under ANSI size(NULL) is NULL, so without
    the isNull guard the row would land under the constant
    xxhash64(NULL) id and silently shadow every other NULL-key row."""
    engine.create_store("nk", dimension=2)
    mt = "map<string,struct<kind:string,s:string,bin:binary>>"
    df = spark.createDataFrame(
        [([1.0, 0.0], {"t": ("str", "a", None)}),
         (None, {"t": ("str", "b", None)})],
        f"key array<float>, meta {mt}",
    )
    with pytest.raises(errors.DimensionMismatch):
        engine.set("nk", df)
    assert engine.get_store("nk").len == 0          # nothing written


def test_apply_changes_rejects_null_key_upserts(spark, engine):
    """Same ANSI hole on the replication path: a NULL-key upsert in a
    change batch fails the whole batch before any write."""
    engine.create_store("nc", dimension=2)
    engine.set("nc", [([1.0, 0.0], {"t": "a"})])
    mt = "map<string,struct<kind:string,s:string,bin:binary>>"
    batch = spark.createDataFrame(
        [("upsert", 7, None, {"t": ("str", "x", None)})],
        f"op string, id long, key array<float>, meta {mt}",
    )
    with pytest.raises(errors.DimensionMismatch):
        engine.apply_changes("nc", batch)
    assert engine.get_store("nc").len == 1


def test_create_store_validates_pq_like_index_create(engine):
    """Both index-creation doors enforce the pq structural checks: a
    non-divisible m and residual-without-ivf refuse at CreateStore too,
    not just CreateNonLinearAlgorithmIndex."""
    with pytest.raises(ValueError, match="divisible"):
        engine.create_store("pv1", dimension=10, non_linear_indices=["pq"])
    with pytest.raises(ValueError, match="residual"):
        engine.create_store(
            "pv2", dimension=16, non_linear_indices=["pq"],
            non_linear_config={"pq": {"residual": True}})
    # valid configs still pass
    engine.create_store(
        "pv3", dimension=16, non_linear_indices=["ivf", "pq"],
        non_linear_config={"pq": {"residual": True}})


def test_explicit_n_planes_bound_enforced(engine):
    """An explicit hnsw n_planes outside [1, 62] refuses — signatures
    serialize as BIGINT bit masks, so 63+ planes overflow."""
    with pytest.raises(ValueError, match="n_planes"):
        engine.create_store("np1", dimension=4, non_linear_indices=["hnsw"],
                            non_linear_config={"hnsw": {"n_planes": 70}})
    with pytest.raises(ValueError, match="n_planes"):
        engine.create_store("np2", dimension=4, non_linear_indices=["hnsw"],
                            non_linear_config={"hnsw": {"n_planes": 0}})


def test_drop_index_removes_stale_artifacts(engine):
    """Dropping pq removes pq_codebooks.npy so a re-create with a
    different m trains FRESH codebooks instead of encoding against the
    stale ones (mismatched subvector splits -> garbage ADC)."""
    import os

    engine.create_store("ar", dimension=8)
    engine.set("ar", [([float(i)] * 8, {"i": str(i)}) for i in range(32)])
    engine.create_non_linear_algorithm_index("ar", ["ivf", "pq"])
    meta = engine.catalog.get_store("ar")
    pq_path = engine.catalog.store_aux_path(meta, "pq_codebooks.npy")
    ivf_path = engine.catalog.store_aux_path(meta, "ivf_centroids.npy")
    assert os.path.exists(pq_path) and os.path.exists(ivf_path)
    engine.drop_non_linear_algorithm_index("ar", ["pq"])
    assert not os.path.exists(pq_path)
    assert os.path.exists(ivf_path)                  # ivf survives
    m8 = np.load(ivf_path)
    engine.create_non_linear_algorithm_index("ar", ["pq"],
                                             config={"m": 4})
    fresh = np.load(engine.catalog.store_aux_path(
        engine.catalog.get_store("ar"), "pq_codebooks.npy"))
    assert fresh.shape[0] == 4                       # trained under m=4
    assert np.array_equal(m8, np.load(ivf_path))


def test_ann_cache_purged_on_drop_store(engine):
    """drop_store + recreate restarts at the SAME (version, deltas)
    cache key — stale histograms from the dead store must not plan
    probes for data that no longer exists."""
    dim = 4
    engine.create_store("cp", dimension=dim, non_linear_indices=["ivf"])
    engine.set("cp", [([float(i), 0.0, 0.0, 0.0], {}) for i in range(50)])
    meta = engine.catalog.get_store("cp")
    s1 = engine._ann_state(meta, "ivf")
    assert s1["count"] == 50
    engine.drop_store("cp")
    engine.create_store("cp", dimension=dim, non_linear_indices=["ivf"])
    engine.set("cp", [([9.0, 9.0, 9.0, 9.0], {})])
    meta2 = engine.catalog.get_store("cp")
    assert (meta2.version, meta2.deltas) == (meta.version, meta.deltas)
    s2 = engine._ann_state(meta2, "ivf")
    assert s2["count"] == 1                          # fresh, not stale


@pytest.fixture(scope="module")
def pq_batch_engine(spark, tmp_path_factory):
    """A store past the brute-force threshold with ivf+pq indexes plus
    a predicate index — the surface of the batch-parity pins."""
    rng = np.random.RandomState(3)
    vecs = rng.normal(0, 1, size=(4200, 8)).astype(np.float32)
    eng = Engine(spark, str(tmp_path_factory.mktemp("pqb")))
    eng.create_store("pb", dimension=8, predicates=["lbl"])
    eng.set("pb", [(v.tolist(), {"lbl": str(i % 3)})
                   for i, v in enumerate(vecs)])
    eng.create_non_linear_algorithm_index("pb", ["ivf", "pq", "hnsw"])
    return eng, vecs


def test_batch_pq_carries_store_columns(pq_batch_engine):
    """get_sim_n_batch(algorithm='pq') returns the same store columns
    (key, meta) as the hnsw/ivf/linear paths and as its own
    missing-codebook fallback — the schema must not flip on whether
    the code artifact exists."""
    eng, vecs = pq_batch_engine
    probes = [(0, vecs[0].tolist()), (1, vecs[1].tolist())]
    out = eng.get_sim_n_batch("pb", probes, closest_n=3, algorithm="pq")
    assert {"qid", "id", "key", "meta", "rank_n", "similarity"} \
        <= set(out.columns)
    rows = out.filter(F.col("rank_n") == 1).collect()
    assert {r["qid"]: r["meta"]["lbl"]["s"] for r in rows} \
        == {0: "0", 1: "1"}
    lsh = eng.get_sim_n_batch("pb", probes, closest_n=3, algorithm="hnsw")
    assert set(out.columns) == set(lsh.columns)


def test_batch_pq_small_store_matches_singles(spark, tmp_path_factory):
    """On a store between pq candidates and the brute-force threshold,
    the batch pq path takes the SAME exact shortcut as single-probe pq
    — batch == #probes singles everywhere, not just for hnsw/ivf."""
    rng = np.random.RandomState(7)
    vecs = rng.normal(0, 1, size=(1000, 8)).astype(np.float32)
    eng = Engine(spark, str(tmp_path_factory.mktemp("pqs")))
    eng.create_store("ps", dimension=8)
    eng.set("ps", [(v.tolist(), {}) for v in vecs])
    eng.create_non_linear_algorithm_index("ps", ["pq"])
    probes = [(i, vecs[i].tolist()) for i in range(3)]
    batch = eng.get_sim_n_batch("ps", probes, closest_n=5, algorithm="pq")
    got = {
        (r["qid"], r["rank_n"], r["id"]) for r in batch.collect()
    }
    want = set()
    for pid, v in probes:
        for rk, r in enumerate(
            eng.get_sim_n("ps", v, closest_n=5, algorithm="pq").collect(), 1
        ):
            want.add((pid, rk, r["id"]))
    assert got == want


def test_batch_pq_null_probe_typed_error(spark, pq_batch_engine):
    """A NULL probe key through the pq batch path raises the typed
    DimensionMismatch like every other batch path, not a TypeError."""
    eng, _ = pq_batch_engine
    probes = spark.createDataFrame(
        [(0, None)], "qid long, qkey array<float>")
    with pytest.raises(errors.DimensionMismatch, match="NULL probe"):
        eng.get_sim_n_batch("pb", probes, closest_n=3, algorithm="pq")


def test_ann_top_k_drops_pred_columns(pq_batch_engine):
    """get_sim_n over a predicate-indexed store returns NO internal
    _pred_ columns on the pruned path — the schema matches the exact
    fallback below the threshold."""
    eng, vecs = pq_batch_engine
    for algo in ("hnsw", "ivf", "pq"):
        out = eng.get_sim_n("pb", vecs[5].tolist(), closest_n=3,
                            algorithm=algo)
        leaked = [c for c in out.columns
                  if c.startswith(("_pred_", "_ann_"))]
        assert not leaked, (algo, leaked)
