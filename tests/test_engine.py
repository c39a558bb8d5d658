"""DB-surface behavior: set counting (F7), get_key/del_key, get_sim_n
golden ranking with tie-break (F2), DDL/catalog ops, schemas."""

import numpy as np
import pytest

from ahnlich_spark import errors
from ahnlich_spark.functions import similarity as S
from ahnlich_spark.operators.predicates import Equals


def test_create_store_and_exists(engine):
    engine.create_store("s1", dimension=4)
    with pytest.raises(errors.StoreAlreadyExists):
        engine.create_store("s1", dimension=4)
    engine.create_store("s1", dimension=4, error_if_exists=False)  # no raise
    info = engine.get_store("s1")
    assert info.dimension == 4 and info.len == 0


def test_set_counts_inserts_and_updates(engine):
    """The vector is the primary key: duplicates update, not insert
    (ref store.rs:1050-1135; store_key_id.rs:19-36)."""
    engine.create_store("s", dimension=2)
    r1 = engine.set("s", [([1.0, 2.0], {"a": "1"}), ([3.0, 4.0], {"a": "2"})])
    assert (r1.inserted, r1.updated) == (2, 0)
    # one duplicate of an existing vector + one new; duplicate WITHIN batch
    r2 = engine.set(
        "s",
        [
            ([1.0, 2.0], {"a": "updated"}),
            ([5.0, 6.0], {"a": "3"}),
            ([5.0, 6.0], {"a": "3-last-wins"}),
        ],
    )
    assert (r2.inserted, r2.updated) == (1, 1)
    assert engine.get_store("s").len == 3
    rows = {tuple(r["key"]): dict(r["meta"]) for r in engine.store_df("s").collect()}
    assert rows[(1.0, 2.0)]["a"][1] == "updated"
    assert rows[(5.0, 6.0)]["a"][1] == "3-last-wins"


def test_set_dimension_mismatch_fails_batch(engine):
    engine.create_store("s", dimension=3)
    with pytest.raises(errors.DimensionMismatch):
        engine.set("s", [([1.0, 2.0, 3.0], {}), ([1.0, 2.0], {})])
    assert engine.get_store("s").len == 0


def test_get_key_and_del_key(engine):
    engine.create_store("s", dimension=2)
    engine.set("s", [([1.0, 2.0], {"a": "1"}), ([3.0, 4.0], {"a": "2"})])
    got = engine.get_key("s", [[1.0, 2.0], [9.0, 9.0]])
    assert [list(r["key"]) for r in got.collect()] == [[1.0, 2.0]]
    d = engine.del_key("s", [[1.0, 2.0], [9.0, 9.0]])
    assert d.deleted_count == 1
    assert engine.get_store("s").len == 1


def test_del_pred(engine):
    engine.create_store("s", dimension=2)
    engine.set("s", [([1.0, 0.0], {"t": "x"}), ([0.0, 1.0], {"t": "y"}), ([1.0, 1.0], {})])
    d = engine.del_pred("s", Equals("t", "x"))
    assert d.deleted_count == 1
    assert engine.get_store("s").len == 2


GOLDEN = {
    # deterministic mini golden set (F2-style): query = [1,0,0]
    "exact": [1.0, 0.0, 0.0],
    "close": [0.9, 0.1, 0.0],
    "mid": [0.5, 0.5, 0.0],
    "far": [0.0, 0.0, 1.0],
    "neg": [-1.0, 0.0, 0.0],
}


@pytest.fixture
def golden_store(engine):
    engine.create_store("g", dimension=3)
    engine.set("g", [(v, {"label": k}) for k, v in GOLDEN.items()])
    return "g"


def labels(df):
    return [r["meta"]["label"][1] for r in df.collect()]


def test_get_sim_n_cosine_ranking(engine, golden_store):
    got = engine.get_sim_n("g", [1.0, 0.0, 0.0], closest_n=3, algorithm=S.COSINE)
    assert labels(got) == ["exact", "close", "mid"]
    sims = [r["similarity"] for r in got.collect()]
    assert sims == sorted(sims, reverse=True)
    assert sims[0] == pytest.approx(1.0, abs=1e-6)


def test_get_sim_n_euclidean_ranking(engine, golden_store):
    got = engine.get_sim_n("g", [1.0, 0.0, 0.0], closest_n=3, algorithm=S.EUCLIDEAN)
    assert labels(got) == ["exact", "close", "mid"]
    dists = [r["similarity"] for r in got.collect()]
    assert dists == sorted(dists)  # closest-first => ascending distance


def test_get_sim_n_dot_ranking(engine, golden_store):
    got = engine.get_sim_n("g", [2.0, 0.0, 0.0], closest_n=2, algorithm=S.DOT)
    assert labels(got) == ["exact", "close"]


def test_get_sim_n_with_predicate(engine, golden_store):
    got = engine.get_sim_n(
        "g", [1.0, 0.0, 0.0], closest_n=2, algorithm=S.COSINE,
        condition=Equals("label", "far"),
    )
    assert labels(got) == ["far"]


def test_get_sim_n_tie_break_by_id(engine):
    """Equal scores order by ascending id (ref algorithm/mod.rs:68-74)."""
    engine.create_store("t", dimension=2)
    engine.set("t", [([1.0, 1.0], {"n": "a"}), ([2.0, 2.0], {"n": "b"}), ([3.0, 3.0], {"n": "c"})])
    got = engine.get_sim_n("t", [1.0, 1.0], closest_n=3, algorithm=S.COSINE).collect()
    assert all(r["similarity"] == pytest.approx(1.0, abs=1e-6) for r in got)
    ids = [r["id"] for r in got]
    assert ids == sorted(ids)


def test_get_sim_n_dimension_check(engine, golden_store):
    with pytest.raises(errors.DimensionMismatch):
        engine.get_sim_n("g", [1.0, 0.0], closest_n=1)


def test_non_linear_requires_index(engine, golden_store):
    with pytest.raises(errors.NonLinearIndexNotFound):
        engine.get_sim_n("g", [1.0, 0.0, 0.0], closest_n=1, algorithm="hnsw")
    assert engine.create_non_linear_algorithm_index("g", ["hnsw"]) == 1
    got = engine.get_sim_n("g", [1.0, 0.0, 0.0], closest_n=2, algorithm="hnsw")
    assert labels(got) == ["exact", "close"]


def test_pred_index_ddl(engine):
    engine.create_store("p", dimension=2)
    assert engine.create_pred_index("p", ["a", "b"]) == 2
    assert engine.create_pred_index("p", ["b", "c"]) == 1  # idempotent
    assert engine.drop_pred_index("p", ["a"]) == 1
    with pytest.raises(errors.PredicateIndexNotFound):
        engine.drop_pred_index("p", ["zz"])
    assert engine.drop_pred_index("p", ["zz"], error_if_not_exists=False) == 0


def test_schemas(engine):
    engine.create_store("s", dimension=2, schema="team1")
    engine.create_store("s2", dimension=2, schema="team1")
    assert len(engine.list_stores(schema="team1")) == 2
    assert engine.drop_schema("team1") == 2
    with pytest.raises(errors.SchemaNotEmptyOrProtected):
        engine.drop_schema("public")
    with pytest.raises(errors.SchemaNotFound):
        engine.drop_schema("team1")


def test_pipeline_collects_errors_inline(engine):
    out = engine.pipeline(
        [
            ("create_store", {"name": "pl", "dimension": 2}),
            ("create_store", {"name": "pl", "dimension": 2}),  # duplicate -> error
            ("set", {"store": "pl", "entries": [([1.0, 2.0], {})]}),
            ("ping", {}),
        ]
    )
    assert [o["ok"] for o in out] == [True, False, True, True]
    assert "StoreAlreadyExists" in out[1]["error"]


def test_drop_store(engine):
    engine.create_store("d", dimension=2)
    assert engine.drop_store("d") == 1
    with pytest.raises(errors.StoreNotFound):
        engine.drop_store("d")
    assert engine.drop_store("d", error_if_not_exists=False) == 0


def test_drop_store_deletes_data_dir(engine):
    import os

    engine.create_store("gc1", dimension=2)
    engine.set("gc1", [([1.0, 0.0], {}), ([0.0, 1.0], {})])
    meta = engine.catalog.get_store("gc1")
    base = os.path.dirname(engine.catalog.store_path(meta))
    assert os.path.isdir(base)
    engine.drop_store("gc1")
    assert not os.path.isdir(base)


def test_writes_gc_superseded_versions(engine):
    """Mutations append delta segments over one base version; compaction
    folds them into a fresh base, and superseded version dirs AND their
    delta segments are garbage-collected (ADVICE r01 + VERDICT r02 #1)."""
    import os

    engine.create_store("gc2", dimension=2)
    for i in range(4):
        engine.set("gc2", [([float(i), 1.0], {})])
    meta = engine.catalog.get_store("gc2")
    base = os.path.dirname(engine.catalog.store_path(meta))
    # first SET wrote base v1; the other three are O(batch) deltas
    assert meta.version == 1 and meta.deltas == 3
    assert sorted(d for d in os.listdir(base) if d.startswith("v")) == ["v1"]
    assert sorted(d for d in os.listdir(base) if d.startswith("d")) == [
        "d1_1", "d1_2", "d1_3",
    ]
    assert engine.compact("gc2") == 3
    meta = engine.catalog.get_store("gc2")
    assert meta.version == 2 and meta.deltas == 0
    # retention window: current + previous base (lazy readers survive one
    # rewrite); vacuum reclaims the previous base and its delta chain
    assert sorted(d for d in os.listdir(base) if d.startswith("v")) == ["v1", "v2"]
    assert engine.vacuum("gc2") == 4  # v1 + its three delta segments
    assert sorted(
        d for d in os.listdir(base) if d.startswith(("v", "d"))
    ) == ["v2"]
    # the surviving version still reads fine and holds all rows
    assert engine.get_store("gc2").len == 4


def test_derive_buckets_scales_with_size(spark):
    from ahnlich_spark.sources.store_io import derive_buckets

    small = spark.range(10).selectExpr("id", "cast(id as string) s")
    big = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    nb_small = derive_buckets(small)
    nb_big = derive_buckets(big)
    assert 1 <= nb_small <= nb_big <= 65536
    # a ~few-MB parquet should stay near a handful of buckets
    assert nb_big <= 64


def test_list_clients_registry(spark, warehouse):
    from ahnlich_spark import Engine

    e1 = Engine(spark, warehouse)
    e2 = Engine(spark, warehouse)
    try:
        clients = e1.list_clients()
        assert len(clients) == 2
        assert {c["client_id"] for c in clients} == {
            e1._client_entry["client_id"], e2._client_entry["client_id"]
        }
        assert all(c["address"] == spark.sparkContext.applicationId for c in clients)
        e2.close()
        assert len(e1.list_clients()) == 1
    finally:
        e1.close()
        e2.close()  # idempotent


def test_get_sim_n_batch_matches_per_probe(spark, engine):
    from pyspark.sql import functions as F

    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.7, 0.7, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    engine.create_store("batchy", dimension=3)
    engine.set("batchy", [(v, {"i": str(i)}) for i, v in vecs])

    out = engine.get_sim_n_batch(
        "batchy", [(i, v) for i, v in vecs[:2]], closest_n=2
    ).collect()
    by_probe = {}
    for r in out:
        by_probe.setdefault(r["qid"], []).append((r["rank_n"], r["id"]))
    assert set(by_probe) == {0, 1} and all(len(v) == 2 for v in by_probe.values())
    # each probe's batch answer == its single-probe answer
    for pid, v in vecs[:2]:
        single = [r["id"] for r in engine.get_sim_n("batchy", v, closest_n=2).collect()]
        batch = [i for _rank, i in sorted(by_probe[pid])]
        assert batch == single


def test_get_sim_n_batch_plan_scans_store_once(spark, engine):
    engine.create_store("batchp", dimension=3)
    engine.set("batchp", [([float(i), 0.0, 0.0], None) for i in range(1, 6)])
    out = engine.get_sim_n_batch("batchp", [(0, [1.0, 0.0, 0.0])], closest_n=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_hnsw_tunables_mapped_not_dropped(engine):
    """Reference HNSW tunables (hnsw/mod.rs:285-296) map onto the LSH
    analog (VERDICT r02 #7): m -> n_planes, extend_candidates -> wider
    hamming_radius floor; explicit LSH knobs win; m0/keep_pruned are
    recorded but inert."""
    import pytest as _pytest

    engine.create_store("tun1", dimension=4)
    engine.create_non_linear_algorithm_index(
        "tun1", ["hnsw"], config={"m": 24, "extend_candidates": True,
                                  "m0": 48, "keep_pruned_connections": True})
    cfg = engine.catalog.get_store("tun1").non_linear_config["hnsw"]
    assert cfg["n_planes"] == 24
    assert cfg["hamming_radius"] == 4  # default 3 + extend_candidates
    assert cfg["m0"] == 48 and cfg["keep_pruned_connections"] is True

    # explicit LSH knobs win over the mapped reference tunables
    engine.create_store("tun2", dimension=4)
    engine.create_non_linear_algorithm_index(
        "tun2", ["hnsw"],
        config={"m": 24, "n_planes": 12, "extend_candidates": True,
                "hamming_radius": 2})
    cfg = engine.catalog.get_store("tun2").non_linear_config["hnsw"]
    assert cfg["n_planes"] == 12 and cfg["hamming_radius"] == 2

    engine.create_store("tun3", dimension=4)
    with _pytest.raises(ValueError, match="n_planes"):
        engine.create_non_linear_algorithm_index("tun3", ["hnsw"],
                                                 config={"m": 99})


def test_dataframe_batch_dimension_check(engine, spark):
    """DataFrame batches validate dimension inside the counting job:
    the whole batch fails, nothing is written."""
    engine.create_store("dfdim", dimension=3)
    bad = spark.createDataFrame(
        [([1.0, 2.0, 3.0],), ([1.0, 2.0],)], "key array<float>"
    )
    with pytest.raises(errors.DimensionMismatch):
        engine.set("dfdim", bad)
    assert engine.get_store("dfdim").len == 0


def test_closest_n_must_be_positive(engine, golden_store):
    """Reference parity: closest_n is NonZeroUsize — zero is a request
    decode error, not an empty result."""
    with pytest.raises(ValueError, match="closest_n"):
        engine.get_sim_n("g", [1.0, 0.0, 0.0], closest_n=0)
    with pytest.raises(ValueError, match="closest_n"):
        engine.get_sim_n_batch("g", [(0, [1.0, 0.0, 0.0])], closest_n=0)


def test_create_store_with_index_config_and_liststores_echo(engine):
    """Reference parity (server_tests:
    test_create_store_with_hnsw_configuration,
    test_list_stores_returns_nonlinear_config): CreateStore accepts a
    per-index config (incl. proto wire names maximum_connections/_zero)
    and ListStores echoes the stored configuration back."""
    engine.create_store(
        "cfgstore", dimension=4, non_linear_indices=["hnsw", "kdtree"],
        non_linear_config={"hnsw": {
            "ef_construction": 150, "maximum_connections": 24,
            "maximum_connections_zero": 48, "extend_candidates": True,
            "keep_pruned_connections": True,
        }},
    )
    info = engine.get_store("cfgstore")
    assert info.non_linear == ("hnsw", "kdtree")
    hc = info.non_linear_config["hnsw"]
    assert hc["ef_construction"] == 150
    assert hc["n_planes"] == 24          # maximum_connections -> m -> n_planes
    assert hc["m0"] == 48
    assert hc["hamming_radius"] == 4     # extend_candidates widened the floor
    assert hc["keep_pruned_connections"] is True
    listed = {s.name: s for s in engine.list_stores()}
    assert listed["cfgstore"].non_linear_config["hnsw"] == hc
    # duplicate index creation stays idempotent: 0 created, config kept
    assert engine.create_non_linear_algorithm_index(
        "cfgstore", ["hnsw"], config={"ef_construction": 500}) == 0
    assert engine.get_store("cfgstore").non_linear_config["hnsw"]["ef_construction"] == 150


def test_maximum_client_restriction(spark, warehouse):
    """Reference parity: connections beyond --maximum-clients are
    refused (server_tests test_maximum_client_restriction_works);
    close() frees a slot."""
    from ahnlich_spark import Engine

    e1 = Engine(spark, warehouse, max_clients=2)
    e2 = Engine(spark, warehouse, max_clients=2)
    assert len(e1.list_clients()) == 2
    with pytest.raises(errors.MaxClientsReached):
        Engine(spark, warehouse, max_clients=2)
    e2.close()
    e3 = Engine(spark, warehouse, max_clients=2)  # freed slot reusable
    assert len(e3.list_clients()) == 2
    e1.close(); e3.close()


def test_register_views_exposes_stores_to_sql(engine, spark):
    """Stores double as Spark SQL tables: register_views publishes the
    merged current state as temp views, queryable and joinable with any
    other DataFrame/SQL source."""
    engine.create_store("sqlv", dimension=2)
    engine.set("sqlv", [([1.0, 0.0], {"label": "a"}), ([0.0, 1.0], {"label": "b"}),
                        ([1.0, 1.0], {"label": "a"})])
    names = engine.register_views()
    assert "ahnlich_sqlv" in names
    got = {
        (r["l"], r["n"]) for r in spark.sql(
            "SELECT meta['label'].s AS l, count(*) AS n "
            "FROM ahnlich_sqlv GROUP BY 1").collect()
    }
    assert got == {("a", 2), ("b", 1)}
    # the view pins the snapshot it was built from (snapshot isolation);
    # re-registering shows the post-mutation state
    engine.del_pred("sqlv", __import__("ahnlich_spark.operators.predicates",
                                       fromlist=["Equals"]).Equals("label", "a"))
    engine.register_views()
    assert spark.sql("SELECT count(*) AS n FROM ahnlich_sqlv").first()["n"] == 1


def test_store_info_is_metadata_only(engine):
    """ListStores/GetStore on a populated store must launch ZERO Spark
    jobs (VERDICT r03 #2): len/bytes are maintained from the counts
    mutations already compute (the reference caches len with a dirty
    flag, store.rs:72-101) — at 100 TB a catalog listing can't afford a
    store scan. The cached values must equal a cold recount."""
    engine.create_store("cat", dimension=4, predicates=["p"])
    engine.set("cat", [([float(i), 0.0, 0.0, 0.0], {"p": str(i % 3)})
                       for i in range(500)])
    # 2 updates + 5 inserts, then one delete
    engine.set("cat", [([float(i), 0.0, 0.0, 0.0], {}) for i in range(498, 505)])
    assert engine.del_key("cat", [[1.0, 0.0, 0.0, 0.0]]).deleted_count == 1

    tracker = engine.spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    infos = {i.name: i for i in engine.list_stores()}
    info = engine.get_store("cat")
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "catalog listing launched Spark jobs"
    assert info.len == 504 and infos["cat"].len == 504
    assert info.size_in_bytes > 0

    # cached statistics == a cold recount (dirty-flag path)
    meta = engine.catalog.get_store("cat")
    meta.len_cache = -1
    meta.bytes_cache = -1
    engine.catalog.put_store(meta)
    cold = engine.get_store("cat")
    assert (cold.len, cold.size_in_bytes) == (info.len, info.size_in_bytes)


def test_store_info_exact_after_unaccountable_mutations(engine):
    """Paths that can't account the net row change cheaply (key-changing
    upsert, fold-in deletes) dirty the cache; the next info call must
    recount exactly and re-cache."""
    from ahnlich_spark.operators.predicates import Equals

    engine.create_store("dirt", dimension=2, predicates=["p"])
    engine.set("dirt", [([float(i), 0.0], {"p": str(i)}) for i in range(20)])
    # key-changing upsert onto an EXISTING other row's vector: row count
    # shrinks by one (old row tombstoned, replacement shadows row 3)
    engine.upsert("dirt", Equals("p", "5"), new_key=[3.0, 0.0],
                  new_value={"p": "x"})
    assert engine.catalog.get_store("dirt").len_cache == -1
    assert engine.get_store("dirt").len == 19
    assert engine.catalog.get_store("dirt").len_cache == 19  # re-cached
