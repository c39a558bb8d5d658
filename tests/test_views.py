"""Engine-managed materialized views (plans/views.py): catalog-recorded
definitions + fold coordinates + parquet generations, refreshed
O(changes) from the change feed, surviving engine restarts."""

import os

import pytest
from pyspark.sql import functions as F

from ahnlich_spark import Engine, errors
from ahnlich_spark.operators import ivm as IVM
from ahnlich_spark.operators.predicates import Equals


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: (t[0] is not None, t[0] or "", t[1:]),
    )


def _seed(engine, store="vs"):
    engine.create_store(store, dimension=2, predicates=["g", "v"])
    engine.set(store, [
        ([1.0, 0.0], {"g": "a", "v": "1"}),
        ([2.0, 0.0], {"g": "a", "v": "3"}),
        ([3.0, 0.0], {"g": "a", "v": "3"}),
        ([4.0, 0.0], {"g": "b", "v": "2"}),
        ([5.0, 0.0], {"g": "b"}),                 # NULL value
    ])


E2 = "CAST(round(key[0] * 100) AS BIGINT)"
VL = "CAST(meta['v']['s'] AS BIGINT)"
G = "meta['g']['s']"


def test_view_lifecycle_refresh_matches_recompute(engine):
    """All three view kinds created at the base snapshot refresh to the
    full recompute after group-moving updates, a predicate delete, and
    an insert — each refresh O(changes), the no-op refresh skipping the
    write entirely (generation pointer unchanged)."""
    _seed(engine)
    engine.create_materialized_view("va", "vs", G, measures={"e2": E2})
    engine.create_materialized_view("vd", "vs", G, value=VL)
    engine.create_materialized_view(
        "ve", "vs", G, extrema={"mx": ("max", VL), "mn": ("min", VL)})
    engine.del_pred("vs", Equals("v", "3"))       # a's max dies twice
    engine.set("vs", [([4.0, 0.0], {"g": "c", "v": "2"})])   # b -> c move
    engine.set("vs", [([9.0, 0.0], {"g": "b", "v": "7"})])
    for n in ("va", "vd", "ve"):
        f, t = engine.refresh_materialized_view(n)
        assert f == (1, 0) and t != f
    grp = F.col("meta")["g"]["s"]
    assert _rows(engine.read_materialized_view("va")) == _rows(
        IVM.full_agg(engine, "vs", grp, {"e2": F.expr(E2)}))
    assert _rows(engine.read_materialized_view("vd")) == _rows(
        IVM.full_agg_distinct(engine, "vs", grp, F.expr(VL)))
    assert _rows(engine.read_materialized_view("vd", quantile=(1, 2))
                 ) == _rows(IVM.quantile_rollup(
                     IVM.full_distinct_inner(engine, "vs", grp, F.expr(VL)),
                     1, 2))
    assert _rows(engine.read_materialized_view("ve")) == _rows(
        IVM.full_agg_extrema(engine, "vs", grp,
                             {"mx": ("max", F.expr(VL)),
                              "mn": ("min", F.expr(VL))}))
    # no-op refresh: coords equal, generation pointer untouched
    from ahnlich_spark.plans import views as V

    before = V._get(engine.catalog, "va", "public")["table"]
    f, t = engine.refresh_materialized_view("va")
    assert f == t
    assert V._get(engine.catalog, "va", "public")["table"] == before


def test_view_survives_engine_restart(spark, warehouse):
    """Definitions, coordinates, and the current generation live in the
    warehouse: a FRESH Engine refreshes a view created by a previous
    one, folding exactly the changes the first engine never saw."""
    eng1 = Engine(spark, warehouse)
    _seed(eng1, "rs")
    eng1.create_materialized_view("rv", "rs", G, measures={"e2": E2})
    eng1.set("rs", [([8.0, 0.0], {"g": "c", "v": "4"})])
    eng2 = Engine(spark, warehouse)
    assert eng2.list_materialized_views() == [
        ("rv", "agg", "rs", (1, 0))]
    f, t = eng2.refresh_materialized_view("rv")
    assert f == (1, 0)
    grp = F.col("meta")["g"]["s"]
    assert _rows(eng2.read_materialized_view("rv")) == _rows(
        IVM.full_agg(eng2, "rs", grp, {"e2": F.expr(E2)}))


def test_view_errors_and_drop(engine):
    """Duplicate create refuses (unless error_if_exists=False), view
    names cannot shadow stores, exactly one kind spec is required,
    quantile reads demand the pair state, drop removes entry + data,
    and missing views raise the standard not-found error."""
    _seed(engine, "es")
    engine.create_materialized_view("ev", "es", G, measures={"e2": E2})
    with pytest.raises(errors.StoreAlreadyExists, match="already exists"):
        engine.create_materialized_view("ev", "es", G, measures={"e2": E2})
    assert engine.create_materialized_view(
        "ev", "es", G, measures={"e2": E2}, error_if_exists=False
    )["name"] == "ev"
    with pytest.raises(errors.StoreAlreadyExists, match="names a store"):
        engine.create_materialized_view("es", "es", G, measures={"e2": E2})
    with pytest.raises(ValueError, match="exactly one"):
        engine.create_materialized_view("e2", "es", G)
    with pytest.raises(ValueError, match="exactly one"):
        engine.create_materialized_view(
            "e2", "es", G, measures={"e2": E2}, value=VL)
    with pytest.raises(errors.StoreNotFound):
        engine.create_materialized_view("x", "nostore", G,
                                        measures={"e2": E2})
    with pytest.raises(ValueError, match="pair state"):
        engine.read_materialized_view("ev", quantile=(1, 2))
    from ahnlich_spark.plans import views as V

    d = V._view_dir(engine.catalog, "public", "ev")
    assert os.path.isdir(d)
    engine.drop_materialized_view("ev")
    assert not os.path.isdir(d)
    assert engine.list_materialized_views() == []
    with pytest.raises(errors.StoreNotFound, match="materialized view"):
        engine.refresh_materialized_view("ev")
    with pytest.raises(errors.StoreNotFound, match="materialized view"):
        engine.drop_materialized_view("ev")


def test_view_sql_door(engine):
    """Managed views register as Spark SQL temp views over their
    current generation — a pinned snapshot until the next
    re-registration after refresh."""
    _seed(engine, "sq")
    engine.create_materialized_view("sqa", "sq", G, measures={"e2": E2})
    engine.create_materialized_view("sqd", "sq", G, value=VL)
    names = engine.register_materialized_views()
    assert names == ["ahnlich_mv_sqa", "ahnlich_mv_sqd"]
    spark = engine.spark
    got = {r["group"]: r["n"] for r in
           spark.sql("SELECT group, n FROM ahnlich_mv_sqa").collect()}
    assert got == {"a": 3, "b": 2}
    nd = {r["group"]: r["n_distinct"] for r in spark.sql(
        "SELECT group, n_distinct FROM ahnlich_mv_sqd").collect()}
    assert nd == {"a": 2, "b": 1}
    # the registered view is a pinned generation: a refresh after more
    # mutations is visible only after re-registering
    engine.set("sq", [([7.0, 0.0], {"g": "c", "v": "9"})])
    engine.refresh_materialized_view("sqa")
    still = {r["group"] for r in
             spark.sql("SELECT group FROM ahnlich_mv_sqa").collect()}
    assert still == {"a", "b"}
    engine.register_materialized_views()
    now = {r["group"] for r in
           spark.sql("SELECT group FROM ahnlich_mv_sqa").collect()}
    assert now == {"a", "b", "c"}


def test_store_view_namespace_and_drop_dependency(engine, monkeypatch):
    """The namespace and lifecycle couplings between stores and views:
    create_store refuses a name a managed view holds (the mirror of
    view creation's store check); drop_store refuses while dependent
    views exist unless cascade_views=True drops them too; and a failed
    seed write unwinds the half-created catalog entry so the name is
    reusable and a later unrelated _flush can't persist a coords=None
    entry."""
    _seed(engine, "ns")
    engine.create_materialized_view("nv", "ns", G, measures={"e2": E2})
    with pytest.raises(errors.StoreAlreadyExists,
                       match="names a materialized view"):
        engine.create_store("nv", dimension=2)
    with pytest.raises(errors.StoreHasDependentViews, match="nv"):
        engine.drop_store("ns")
    assert engine.catalog.has_store("ns")          # refused = untouched
    assert engine.drop_store("ns", cascade_views=True) == 1
    assert engine.list_materialized_views() == []
    assert not engine.catalog.has_store("ns")

    # seed-write failure: entry must NOT survive in the catalog
    from ahnlich_spark.plans import views as V

    _seed(engine, "fs")

    def boom(*a, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(V, "_write_generation", boom)
    with pytest.raises(RuntimeError, match="disk full"):
        engine.create_materialized_view("fv", "fs", G, measures={"e2": E2})
    monkeypatch.undo()
    assert engine.list_materialized_views() == []  # would crash on
    # coords=None if the half-created entry had leaked
    engine.catalog._flush()
    eng2 = Engine(engine.spark, engine.catalog.warehouse)
    assert eng2.list_materialized_views() == []    # nothing persisted
    # the name is reusable after the failure
    entry = engine.create_materialized_view("fv", "fs", G,
                                            measures={"e2": E2})
    assert entry["coords"] is not None


JA = "a_meta['k']['s']"
JB = "b_meta['k']['s']"
JG = "b_meta['r']['s']"
JM = "CAST(round(a_key[0] * 100) AS BIGINT)"


def _seed_join(engine):
    engine.create_store("jf", dimension=2, predicates=["k"])       # facts
    engine.set("jf", [
        ([0.01 * i, 0.0], {"k": str(i % 4)}) for i in range(1, 9)
    ])
    engine.create_store("jd", dimension=2, predicates=["k", "r"])  # dim
    engine.set("jd", [
        ([float(k), 0.0], {"k": str(k), "r": str(k % 2)}) for k in range(4)
    ])


def test_join_view_lifecycle_matches_recompute(engine):
    """A managed JOIN view refreshes by the bilinear delta to exactly
    the re-joined final snapshots after mutations on BOTH sides — a
    fact delete + insert, a dim row delete orphaning its facts, and a
    dim upsert moving a row between groups; a no-op refresh skips the
    write on both coordinate pairs."""
    _seed_join(engine)
    engine.create_materialized_view(
        "jv", "jf", JG, measures={"c100": JM},
        store_b="jd", join_on=(JA, JB))
    # both sides move
    engine.del_pred("jf", Equals("k", "1"))
    engine.set("jf", [([0.99, 0.0], {"k": "2"})])
    engine.del_pred("jd", Equals("k", "3"))            # orphans k=3 facts
    engine.set("jd", [([2.0, 0.0], {"k": "2", "r": "9"})])  # group move
    f, t = engine.refresh_materialized_view("jv")
    assert f != t
    assert _rows(engine.read_materialized_view("jv")) == _rows(
        IVM.full_join_agg(
            engine, "jf", engine, "jd",
            F.expr(JA), F.expr(JB), F.expr(JG), {"c100": F.expr(JM)}))
    # no-op refresh: paired coordinates equal, generation untouched
    from ahnlich_spark.plans import views as V

    before = V._get(engine.catalog, "jv", "public")["table"]
    f, t = engine.refresh_materialized_view("jv")
    assert f == t
    assert V._get(engine.catalog, "jv", "public")["table"] == before
    # listing carries the paired coordinates
    (nm, kind, st, coords), = engine.list_materialized_views()
    assert (nm, kind, st) == ("jv", "join", "jf")
    assert len(coords) == 2 and all(len(c) == 2 for c in coords)
    # the SQL door serves a join view like any other kind
    assert "ahnlich_mv_jv" in engine.register_materialized_views()
    door = engine.spark.sql(
        "SELECT group, n FROM ahnlich_mv_jv").collect()
    assert sorted(tuple(r) for r in door) == sorted(
        (r["group"], r["n"])
        for r in engine.read_materialized_view("jv").collect())
    # drop_store guards BOTH sides of a join view
    with pytest.raises(errors.StoreHasDependentViews):
        engine.drop_store("jd")
    engine.drop_store("jd", cascade_views=True)
    assert engine.list_materialized_views() == []
    # bad specs refuse
    with pytest.raises(ValueError, match="BOTH store_b and join_on"):
        engine.create_materialized_view(
            "jx", "jf", JG, measures={"c100": JM}, store_b="jf")
    # extrema over a join: refused by construction (a one-side
    # delete's rescan trigger set spans the join — the pinned
    # impossibility argument in create_materialized_view)
    with pytest.raises(ValueError, match="re-joining the snapshots"):
        engine.create_materialized_view(
            "jx", "jf", JG, extrema={"mx": ("max", JM)},
            store_b="jf", join_on=(JA, JB))


def test_join_distinct_view_lifecycle_matches_recompute(engine):
    """A DISTINCT-over-JOIN view: the joined (group, value) pair
    multiset is additive, so the same bilinear fold maintains it —
    after deletes, inserts, and a group-moving dim upsert on BOTH
    sides, the rolled-up read and the exact discrete quantile both
    equal the full re-join recompute; a no-op refresh skips the
    write."""
    from ahnlich_spark.plans import views as V

    _seed_join(engine)
    engine.create_materialized_view(
        "jdv", "jf", JG, value=JM, store_b="jd", join_on=(JA, JB))
    assert V._get(engine.catalog, "jdv", "public")["kind"] == "join_distinct"
    # both sides move: fact delete + duplicate-value insert, dim
    # delete orphaning facts, dim upsert moving rows between groups
    engine.del_pred("jf", Equals("k", "1"))
    engine.set("jf", [([0.02, 0.0], {"k": "2"})])      # dup value in group
    engine.del_pred("jd", Equals("k", "3"))
    engine.set("jd", [([2.0, 0.0], {"k": "2", "r": "9"})])
    f, t = engine.refresh_materialized_view("jdv")
    assert f != t

    def recompute_inner():
        return IVM.full_join_distinct_inner(
            engine, "jf", engine, "jd",
            F.expr(JA), F.expr(JB), F.expr(JG), F.expr(JM))

    assert _rows(engine.read_materialized_view("jdv")) == _rows(
        IVM.distinct_rollup(recompute_inner()))
    assert _rows(engine.read_materialized_view("jdv", quantile=(1, 2))
                 ) == _rows(IVM.quantile_rollup(recompute_inner(), 1, 2))
    # no-op refresh: paired coordinates equal, generation untouched
    before = V._get(engine.catalog, "jdv", "public")["table"]
    f, t = engine.refresh_materialized_view("jdv")
    assert f == t
    assert V._get(engine.catalog, "jdv", "public")["table"] == before
    # drop_store guards BOTH sides
    with pytest.raises(errors.StoreHasDependentViews):
        engine.drop_store("jd")
    engine.drop_store("jd", cascade_views=True)
    assert engine.list_materialized_views() == []


def test_generation_gc_bounded_across_refreshes(engine):
    """The keep-two retention contract, pinned the way store_io
    compaction is gated: N refreshes leave at most 2 generation dirs
    (current + previous) on disk, the catalog pointer always names one
    of them, a reader pinned to the PREVIOUS generation still reads
    after one refresh, and DROP removes the whole view dir."""
    from ahnlich_spark.plans import views as V

    _seed(engine, "gs")
    engine.create_materialized_view("gv", "gs", G, measures={"e2": E2})
    base = V._view_dir(engine.catalog, "public", "gv")
    assert len(os.listdir(base)) == 1
    prev_gen = None
    for i in range(5):
        entry = V._get(engine.catalog, "gv", "public")
        prev_gen = entry["table"]
        engine.set("gs", [([10.0 + i, 0.0], {"g": "a", "v": str(10 + i)})])
        f, t = engine.refresh_materialized_view("gv")
        assert f != t
        entry = V._get(engine.catalog, "gv", "public")
        gens = sorted(os.listdir(base))
        assert len(gens) <= 2, f"generation leak after refresh {i}: {gens}"
        assert entry["table"] in gens
        assert prev_gen in gens  # previous retained through ONE refresh
    # a reader pinned to the pre-refresh generation still reads
    pinned = engine.spark.read.parquet(os.path.join(base, prev_gen))
    assert pinned.count() > 0
    engine.drop_materialized_view("gv")
    assert not os.path.exists(base)


def test_join_view_survives_engine_restart(spark, warehouse):
    """A join view created by one engine is refreshed by a FRESH
    engine on the same warehouse, folding mutations the first engine
    never saw from BOTH stores' recorded coordinates."""
    eng1 = Engine(spark, warehouse)
    _seed_join(eng1)
    eng1.create_materialized_view(
        "jr", "jf", JG, measures={"c100": JM},
        store_b="jd", join_on=(JA, JB))
    eng1.set("jf", [([0.5, 0.0], {"k": "0"})])
    eng2 = Engine(spark, warehouse)
    eng2.set("jd", [([9.0, 0.0], {"k": "0", "r": "5"})])
    f, t = eng2.refresh_materialized_view("jr")
    assert f != t
    assert _rows(eng2.read_materialized_view("jr")) == _rows(
        IVM.full_join_agg(
            eng2, "jf", eng2, "jd",
            F.expr(JA), F.expr(JB), F.expr(JG), {"c100": F.expr(JM)}))


def test_join_distinct_view_survives_engine_restart(spark, warehouse):
    """The join_distinct catalog entry (value expr + store_b + join
    exprs + PAIRED coordinates) round-trips through the warehouse JSON:
    a FRESH engine refreshes a view created by a previous one, folding
    both-side mutations the first engine never saw, and the rolled-up
    read equals the re-join recompute."""
    eng1 = Engine(spark, warehouse)
    _seed_join(eng1)
    eng1.create_materialized_view(
        "jdr", "jf", JG, value=JM, store_b="jd", join_on=(JA, JB))
    eng1.set("jf", [([0.5, 0.0], {"k": "0"})])
    eng2 = Engine(spark, warehouse)
    eng2.set("jd", [([9.0, 0.0], {"k": "0", "r": "5"})])
    f, t = eng2.refresh_materialized_view("jdr")
    assert f != t
    assert _rows(eng2.read_materialized_view("jdr")) == _rows(
        IVM.distinct_rollup(IVM.full_join_distinct_inner(
            eng2, "jf", eng2, "jd",
            F.expr(JA), F.expr(JB), F.expr(JG), F.expr(JM))))


def test_streaming_doorbell_refresh_catches_up(engine, tmp_path):
    """streaming_refresh_materialized_view keeps a managed view current
    from a change-feed doorbell: triggers fold from the catalog's
    recorded coordinates (batch rows never consumed), a no-movement
    trigger is a generation no-op, and mutations landing while the
    stream is DOWN fold on the first trigger after it returns —
    restart survival inherited from the catalog."""
    from ahnlich_spark.plans import views as V

    _seed(engine, "sb")
    engine.create_materialized_view("sbv", "sb", G, measures={"e2": E2})
    engine.del_pred("sb", Equals("v", "3"))
    engine.set("sb", [([7.0, 0.0], {"g": "c", "v": "9"})])

    def feed():
        return engine.store_changes_stream("sb", max_files_per_trigger=1)

    ck = str(tmp_path / "doorbell_ck")
    q = engine.streaming_refresh_materialized_view(feed(), "sbv",
                                                   checkpoint=ck)
    q.processAllAvailable()
    q.stop()
    grp = F.col("meta")["g"]["s"]
    assert _rows(engine.read_materialized_view("sbv")) == _rows(
        IVM.full_agg(engine, "sb", grp, {"e2": F.expr(E2)}))
    gen = V._get(engine.catalog, "sbv", "public")["table"]
    # mutations while the stream is down
    engine.set("sb", [([8.0, 0.0], {"g": "d", "v": "1"})])
    engine.del_pred("sb", Equals("g", "a"))
    q2 = engine.streaming_refresh_materialized_view(feed(), "sbv",
                                                    checkpoint=ck)
    q2.processAllAvailable()
    q2.stop()
    assert _rows(engine.read_materialized_view("sbv")) == _rows(
        IVM.full_agg(engine, "sb", grp, {"e2": F.expr(E2)}))
    assert V._get(engine.catalog, "sbv", "public")["table"] != gen
    # a missing view fails fast at wiring time, not first trigger
    with pytest.raises(errors.StoreNotFound, match="materialized view"):
        engine.streaming_refresh_materialized_view(feed(), "nope")


def test_doorbell_refresh_concurrent_user_mutations(engine, tmp_path):
    """The doorbell refresh runs on the stream-execution thread while
    the USER thread keeps mutating the same engine — the catalog RLock
    serializes every mutate+flush unit, so nothing crashes
    mid-json.dump and a final refresh equals the full recompute."""
    _seed(engine, "cc")
    engine.create_materialized_view("ccv", "cc", G, measures={"e2": E2})
    q = engine.streaming_refresh_materialized_view(
        engine.store_changes_stream("cc", max_files_per_trigger=1),
        "ccv", checkpoint=str(tmp_path / "cc_ck"))
    try:
        for i in range(6):   # user-thread DDL + DML racing the triggers
            engine.set("cc", [([float(i), 1.0],
                               {"g": "rt" + str(i % 2), "v": str(i)})])
            engine.create_store(f"cc_side{i}", dimension=2)
            engine.drop_store(f"cc_side{i}")
        q.processAllAvailable()
    finally:
        q.stop()
    engine.refresh_materialized_view("ccv")    # catch any tail
    grp = F.col("meta")["g"]["s"]
    assert _rows(engine.read_materialized_view("ccv")) == _rows(
        IVM.full_agg(engine, "cc", grp, {"e2": F.expr(E2)}))


def test_doorbell_refresh_join_distinct_both_sides(engine, tmp_path):
    """The doorbell keeps a DISTINCT-over-JOIN view current from a
    UNION of BOTH stores' change streams (the docstring's join recipe):
    mutations on either side wake the fold, which catches BOTH sides up
    from the catalog's paired coordinates — the final state equals the
    full re-join recompute, rolled up and at the exact quantile."""
    _seed_join(engine)
    engine.create_materialized_view(
        "dbj", "jf", JG, value=JM, store_b="jd", join_on=(JA, JB))
    engine.del_pred("jf", Equals("k", "1"))
    engine.set("jd", [([2.0, 0.0], {"k": "2", "r": "9"})])  # group move

    feed = engine.store_changes_stream(
        "jf", max_files_per_trigger=1
    ).unionByName(engine.store_changes_stream("jd", max_files_per_trigger=1))
    q = engine.streaming_refresh_materialized_view(
        feed, "dbj", checkpoint=str(tmp_path / "dbj_ck"))
    q.processAllAvailable()
    q.stop()

    def recompute_inner():
        return IVM.full_join_distinct_inner(
            engine, "jf", engine, "jd",
            F.expr(JA), F.expr(JB), F.expr(JG), F.expr(JM))

    assert _rows(engine.read_materialized_view("dbj")) == _rows(
        IVM.distinct_rollup(recompute_inner()))
    assert _rows(engine.read_materialized_view("dbj", quantile=(3, 4))
                 ) == _rows(IVM.quantile_rollup(recompute_inner(), 3, 4))


def test_ai_purge_cascades_views(spark, warehouse):
    """PurgeStores routes through the engine drop so managed views over
    an AI store are cascade-dropped, never left dangling."""
    from ahnlich_spark.ai import AiEngine
    from ahnlich_spark.types import StoreInput

    ai = AiEngine(Engine(spark, warehouse))
    ai.create_store("pv", query_model="all-minilm-l6-v2",
                    index_model="all-minilm-l6-v2", store_original=True)
    ai.set("pv", [(StoreInput.raw_string("alpha text"), {"g": "a"}),
                  (StoreInput.raw_string("beta text"), {"g": "b"})])
    eng = ai.engine
    eng.create_materialized_view("pvv", "pv", G, measures={"n2": "1"})
    assert ai.purge_stores() == 1
    assert eng.list_materialized_views() == []   # cascaded, not dangling
    with pytest.raises(errors.StoreNotFound):
        eng.refresh_materialized_view("pvv")
