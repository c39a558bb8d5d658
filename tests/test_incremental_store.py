"""Base+delta incremental store layout (VERDICT r02 item #1).

The reference's SET is an O(batch) map insert
(ahnlich/db/src/engine/store.rs:1050-1135); the disk-backed analog is:
mutations append small delta segments (upsert rows + id tombstones),
reads merge keep-last-by-id, compaction folds segments into a fresh
base. These tests pin (a) the O(batch) write-amplification contract —
a small SET into a large store must not touch the base files — and
(b) merge semantics across every mutation path.
"""

import os

import pytest
from pyspark.sql import functions as F


def _files(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                p = os.path.join(root, fn)
                out[p] = os.path.getsize(p)
    return out


def _rows(engine, store):
    return {
        tuple(r["key"]): dict(r["meta"] or {})
        for r in engine.store_df(store).collect()
    }


def test_small_set_writes_o_batch_bytes(engine):
    """A 10-row SET into a populated store must leave every base file
    byte-identical and add only a small delta segment — the single
    highest-leverage scale contract from VERDICT r02."""
    engine.create_store("inc", dimension=8)
    bulk = [([float(i)] * 8, {"i": str(i)}) for i in range(2000)]
    engine.set("inc", bulk)
    meta = engine.catalog.get_store("inc")
    base_path = engine.catalog.store_path(meta)
    before = _files(base_path)
    base_bytes = sum(before.values())

    r = engine.set("inc", [([float(10_000 + i)] * 8, {}) for i in range(10)])
    assert (r.inserted, r.updated) == (10, 0)

    assert _files(base_path) == before, "base files must not be rewritten"
    meta = engine.catalog.get_store("inc")
    assert meta.deltas == 1
    delta_bytes = sum(_files(engine.catalog.delta_path(meta, 1)).values())
    assert 0 < delta_bytes < base_bytes / 5
    assert engine.get_store("inc").len == 2010


def test_delete_paths_write_tombstones_not_base(engine):
    from ahnlich_spark.operators.predicates import Equals

    engine.create_store("incdel", dimension=2, predicates=["grp"])
    engine.set(
        "incdel",
        [([float(i), 0.0], {"grp": "a" if i % 2 else "b"}) for i in range(100)],
    )
    meta = engine.catalog.get_store("incdel")
    before = _files(engine.catalog.store_path(meta))

    assert engine.del_key("incdel", [[1.0, 0.0], [3.0, 0.0]]).deleted_count == 2
    assert engine.del_pred("incdel", Equals("grp", "b")).deleted_count == 50
    meta = engine.catalog.get_store("incdel")
    assert meta.deltas == 2
    assert _files(engine.catalog.store_path(meta)) == before
    # merged view: odd i (grp=a) minus i=1,3
    keys = {k[0] for k in _rows(engine, "incdel")}
    assert keys == {float(i) for i in range(100) if i % 2 and i not in (1, 3)}


def test_merge_keeps_last_by_id_across_segments(engine):
    engine.create_store("incm", dimension=2)
    engine.set("incm", [([1.0, 1.0], {"v": "one"}), ([2.0, 2.0], {"v": "two"})])
    # delta 1: update vector 1's metadata (same id -> update)
    r = engine.set("incm", [([1.0, 1.0], {"v": "one'"})])
    assert (r.inserted, r.updated) == (0, 1)
    # delta 2: delete vector 1
    assert engine.del_key("incm", [[1.0, 1.0]]).deleted_count == 1
    # delta 3: resurrect vector 1 — later segment must win over tombstone
    r = engine.set("incm", [([1.0, 1.0], {"v": "one''"})])
    assert (r.inserted, r.updated) == (1, 0)
    rows = _rows(engine, "incm")
    assert rows[(1.0, 1.0)]["v"]["s"] == "one''"
    assert rows[(2.0, 2.0)]["v"]["s"] == "two"


def test_remove_condition_folds_into_one_segment(engine):
    """DelPred-before-Set (the AI proxy pipeline) lands tombstones and
    upserts in ONE segment; an upsert beats a tombstone for the same id
    within the segment."""
    from ahnlich_spark.operators.predicates import Equals

    engine.create_store("incrm", dimension=2)
    engine.set("incrm", [([1.0, 0.0], {"g": "x"}), ([2.0, 0.0], {"g": "y"})])
    meta0 = engine.catalog.get_store("incrm")
    # remove g=x (which matches vector 1) and re-insert vector 1 itself
    engine.set(
        "incrm",
        [([1.0, 0.0], {"g": "z"})],
        remove_condition=Equals("g", "x"),
    )
    meta = engine.catalog.get_store("incrm")
    assert meta.deltas == meta0.deltas + 1  # one segment, not two
    rows = _rows(engine, "incrm")
    assert rows[(1.0, 0.0)]["g"]["s"] == "z"
    assert rows[(2.0, 0.0)]["g"]["s"] == "y"


def test_upsert_via_delta_rekeys_and_merges(engine):
    from ahnlich_spark.operators.predicates import Equals

    engine.create_store("incup", dimension=2)
    engine.set("incup", [([1.0, 0.0], {"n": "a"}), ([2.0, 0.0], {"n": "b"})])
    meta0 = engine.catalog.get_store("incup")
    before = _files(engine.catalog.store_path(meta0))
    # re-key the n=a row; old id must be tombstoned, not rewritten away
    engine.upsert("incup", Equals("n", "a"), new_key=[9.0, 9.0],
                  new_value={"n": "a2"})
    meta = engine.catalog.get_store("incup")
    assert meta.deltas == meta0.deltas + 1
    assert _files(engine.catalog.store_path(meta)) == before
    rows = _rows(engine, "incup")
    assert set(rows) == {(9.0, 9.0), (2.0, 0.0)}
    assert rows[(9.0, 9.0)]["n"]["s"] == "a2"


def test_auto_compaction_bounds_segment_chain(engine):
    old = type(engine).AUTO_COMPACT_SEGMENTS
    type(engine).AUTO_COMPACT_SEGMENTS = 3
    try:
        engine.create_store("incac", dimension=2)
        for i in range(5):
            engine.set("incac", [([float(i), 1.0], {})])
        meta = engine.catalog.get_store("incac")
        # base v1 + deltas 1..3 -> auto-compact to v2 at the 4th set,
        # 5th set appends delta 1 over v2
        assert meta.version == 2 and meta.deltas == 1
        assert engine.get_store("incac").len == 5
    finally:
        type(engine).AUTO_COMPACT_SEGMENTS = old


def test_compaction_preserves_merged_contents(engine):
    from ahnlich_spark.operators.predicates import Equals

    engine.create_store("incc", dimension=2, predicates=["g"])
    engine.set("incc", [([float(i), 0.0], {"g": str(i % 3)}) for i in range(30)])
    engine.del_pred("incc", Equals("g", "1"))
    engine.set("incc", [([100.0, 0.0], {"g": "9"})])
    engine.del_key("incc", [[0.0, 0.0]])
    before = _rows(engine, "incc")
    folded = engine.compact("incc")
    assert folded == 3
    meta = engine.catalog.get_store("incc")
    assert meta.deltas == 0
    assert _rows(engine, "incc") == before
    assert engine.compact("incc") == 0  # idempotent when clean


def test_merged_reads_stay_index_aware(engine):
    """Delta rows must carry the store's ANN/pred index columns so
    merged GetPred pushdown hints and GetSimN index paths stay exact."""
    from ahnlich_spark.operators.predicates import Equals
    from ahnlich_spark.sources.store_io import read_store

    engine.create_store("incidx", dimension=4, predicates=["lbl"],
                        non_linear_indices=["hnsw"])
    engine.set(
        "incidx",
        [([float(i), 1.0, 0.0, 0.0], {"lbl": str(i % 2)}) for i in range(50)],
    )
    engine.set(
        "incidx",
        [([float(100 + i), 1.0, 0.0, 0.0], {"lbl": "7"}) for i in range(5)],
    )
    meta = engine.catalog.get_store("incidx")
    assert meta.deltas == 1
    raw = read_store(engine.spark, engine.catalog, meta, canonical=False)
    assert {"_ann_sig", "_ann_sigp", "_pred_lbl"} <= set(raw.columns)
    # index columns populated on BOTH sides of the merge
    assert raw.filter(F.col("_ann_sig").isNull()).count() == 0
    assert raw.filter(F.col("_pred_lbl").isNull()).count() == 0
    got = engine.get_pred("incidx", Equals("lbl", "7"))
    assert got.count() == 5
    top = engine.get_sim_n("incidx", [104.0, 1.0, 0.0, 0.0], closest_n=1,
                           algorithm="euclidean_distance").collect()
    assert list(top[0]["key"]) == [104.0, 1.0, 0.0, 0.0]


def test_store_info_counts_delta_bytes(engine):
    engine.create_store("incsz", dimension=2)
    engine.set("incsz", [([1.0, 1.0], {})])
    sz_base = engine.get_store("incsz").size_in_bytes
    engine.set("incsz", [([2.0, 2.0], {})])
    assert engine.get_store("incsz").size_in_bytes > sz_base


# ------------------------------- model-based mutation-sequence check --

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_VEC = st.tuples(st.integers(0, 3), st.integers(0, 3))  # 16 possible keys
_TAG = st.sampled_from(["a", "b", "c"])
_OP = st.one_of(
    st.tuples(st.just("set"),
              st.lists(st.tuples(_VEC, _TAG), min_size=1, max_size=4)),
    st.tuples(st.just("delkey"), st.sets(_VEC, min_size=1, max_size=3)),
    st.tuples(st.just("delpred"), _TAG),
    st.tuples(st.just("compact"), st.none()),
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=st.lists(_OP, min_size=2, max_size=6))
def test_mutation_sequence_matches_dict_model(spark, ops):
    """Any interleaving of Set / DelKey / DelPred / compact over the
    base+delta layout must agree — per-op counts AND final contents —
    with the reference's in-RAM map semantics (a plain Python dict,
    vector is the key, keep-last within a batch)."""
    import tempfile

    from ahnlich_spark import Engine
    from ahnlich_spark.operators.predicates import Equals

    eng = Engine(spark, tempfile.mkdtemp(prefix="ahnlich_prop_"))
    eng.create_store("m", dimension=2)
    model = {}
    for kind, arg in ops:
        if kind == "set":
            batch = [([float(a), float(b)], {"t": tag}) for (a, b), tag in arg]
            dedup = {}
            for (a, b), tag in arg:  # keep-last within batch
                dedup[(float(a), float(b))] = tag
            updated = sum(1 for v in dedup if v in model)
            r = eng.set("m", batch)
            assert (r.inserted, r.updated) == (len(dedup) - updated, updated)
            model.update({v: t for v, t in dedup.items()})
        elif kind == "delkey":
            probes = [[float(a), float(b)] for a, b in arg]
            expect = sum(1 for a, b in arg if (float(a), float(b)) in model)
            assert eng.del_key("m", probes).deleted_count == expect
            for a, b in arg:
                model.pop((float(a), float(b)), None)
        elif kind == "delpred":
            expect = sum(1 for t in model.values() if t == arg)
            assert eng.del_pred("m", Equals("t", arg)).deleted_count == expect
            model = {v: t for v, t in model.items() if t != arg}
        else:
            eng.compact("m")
    got = {
        tuple(r["key"]): r["meta"]["t"]["s"]
        for r in eng.store_df("m").collect()
    }
    assert got == model

    # change-feed apply contract over the SAME random sequence: for any
    # end state, applying store_changes(base-of-current-version ..
    # current) to that base snapshot must reconstruct the final model,
    # with every row classified consistently (insert ∉ base, update ∈
    # base carrying the post-image, delete ∈ base carrying the
    # PRE-image)
    meta = eng.catalog.get_store("m")
    if meta.version >= 1:
        base_state = {
            tuple(r["key"]): r["meta"]["t"]["s"]
            for r in eng.store_df("m", version=meta.version, segments=0).collect()
        }
        rebuilt = dict(base_state)
        for r in eng.store_changes("m", from_version=meta.version,
                                   from_segments=0).collect():
            k, t = tuple(r["key"]), r["change_type"]
            if t == "insert":
                assert k not in base_state
                rebuilt[k] = r["meta"]["t"]["s"]
            elif t == "update":
                assert k in base_state
                rebuilt[k] = r["meta"]["t"]["s"]
            else:
                assert t == "delete" and k in base_state
                assert r["meta"]["t"]["s"] == base_state[k]  # pre-image
                rebuilt.pop(k)
        assert rebuilt == model


def test_merged_read_broadcasts_delta_ids_no_base_shuffle(engine):
    """The merge-on-read scale contract: the (100 TB) base side is
    anti-joined against a BROADCAST delta-id set — a sort-merge join
    here would shuffle the whole store on every read."""
    import contextlib
    import io

    engine.create_store("incplan", dimension=4)
    engine.set("incplan", [([float(i), 0.0, 0.0, 0.0], {}) for i in range(500)])
    engine.set("incplan", [([9999.0, 0.0, 0.0, 0.0], {})])
    meta = engine.catalog.get_store("incplan")
    assert meta.deltas == 1
    df = engine.store_df("incplan")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "LeftAnti" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pruned_ann_reads_merged_view(engine):
    """Delta rows must be reachable through the PRUNED ANN path: the
    planner's histograms re-collect per (version, deltas) and the
    partition-pruned base read unions the (small) delta side."""
    import numpy as np

    rng = np.random.RandomState(6)
    vecs = rng.normal(size=(600, 8)).astype(np.float32)
    engine.create_store("incann", dimension=8, non_linear_indices=["hnsw"])
    engine.set("incann", [(v.tolist(), {}) for v in vecs])
    engine.brute_force_threshold = 64  # force the pruned path
    probe = (rng.normal(size=8) * 3).astype(np.float32)
    engine.set("incann", [(probe.tolist(), {"new": "yes"})])  # delta row
    meta = engine.catalog.get_store("incann")
    assert meta.deltas == 1
    top = engine.get_sim_n("incann", probe.tolist(), closest_n=1,
                           algorithm="hnsw").collect()
    # the delta row IS its own nearest neighbor (Hamming distance 0 to
    # the query -> always inside the probe ball)
    assert len(top) == 1
    assert list(top[0]["key"]) == [float(x) for x in probe]


def test_time_travel_reads_retained_snapshots(engine):
    """Every retained (version, segments) pair is a readable immutable
    snapshot — the Delta-VERSION-AS-OF analog the layout gives for free."""
    engine.create_store("tt", dimension=2)
    engine.set("tt", [([1.0, 0.0], {"s": "v1"})])           # base v1
    engine.set("tt", [([2.0, 0.0], {"s": "d1"})])           # v1 + d1
    engine.del_key("tt", [[1.0, 0.0]])                      # v1 + d2
    engine.compact("tt")                                    # base v2

    assert engine.list_versions("tt") == [(1, 2), (2, 0)]
    keys = lambda **kw: {tuple(r["key"]) for r in engine.store_df("tt", **kw).collect()}
    assert keys() == {(2.0, 0.0)}
    assert keys(version=1, segments=0) == {(1.0, 0.0)}
    assert keys(version=1, segments=1) == {(1.0, 0.0), (2.0, 0.0)}
    assert keys(version=1) == {(2.0, 0.0)}  # all segments of v1
    assert keys(version=2) == {(2.0, 0.0)}

    with pytest.raises(ValueError, match="not retained"):
        engine.store_df("tt", version=99).collect()
    with pytest.raises(ValueError, match="segments"):
        engine.store_df("tt", version=1, segments=7).collect()
    # vacuum reclaims history; old snapshots stop being addressable
    engine.vacuum("tt")
    assert engine.list_versions("tt") == [(2, 0)]
    with pytest.raises(ValueError, match="not retained"):
        engine.store_df("tt", version=1).collect()


def test_pure_delete_delta_on_partitioned_store(engine):
    """Tombstone-only segments on a store whose base is directory-
    partitioned by an ANN layout key: the segment mirrors the base
    schema (incl. the partition column) with nulls, and merged reads /
    index queries stay correct."""
    engine.create_store("incpd", dimension=4, non_linear_indices=["hnsw"])
    engine.set(
        "incpd", [([float(i), 1.0, 0.0, 0.0], {"i": str(i)}) for i in range(40)]
    )
    before = _files(engine.catalog.store_path(engine.catalog.get_store("incpd")))
    assert engine.del_key("incpd", [[3.0, 1.0, 0.0, 0.0]]).deleted_count == 1
    meta = engine.catalog.get_store("incpd")
    assert meta.deltas == 1
    assert _files(engine.catalog.store_path(meta)) == before
    assert engine.get_store("incpd").len == 39
    assert {k[0] for k in _rows(engine, "incpd")} == {
        float(i) for i in range(40) if i != 3
    }
    top = engine.get_sim_n("incpd", [5.0, 1.0, 0.0, 0.0], closest_n=1,
                           algorithm="hnsw").collect()
    assert list(top[0]["key"]) == [5.0, 1.0, 0.0, 0.0]


def test_mutations_after_index_drop_still_merge(engine):
    """Dropping an index leaves its stale columns in the base; later
    delta segments must still merge (the segment mirrors the base
    schema with nulls for columns it no longer computes)."""
    from ahnlich_spark.operators.predicates import Equals

    engine.create_store("incdrop", dimension=4, predicates=["g"],
                        non_linear_indices=["hnsw"])
    engine.set("incdrop", [([float(i), 0.0, 0.0, 0.0], {"g": str(i % 2)})
                           for i in range(30)])
    engine.drop_non_linear_algorithm_index("incdrop", ["hnsw"])
    engine.drop_pred_index("incdrop", ["g"])
    r = engine.set("incdrop", [([100.0, 0.0, 0.0, 0.0], {"g": "9"})])
    assert (r.inserted, r.updated) == (1, 0)
    assert engine.del_key("incdrop", [[0.0, 0.0, 0.0, 0.0]]).deleted_count == 1
    assert engine.get_store("incdrop").len == 30
    assert engine.get_pred("incdrop", Equals("g", "9")).count() == 1
    # compaction clears the stale columns
    engine.compact("incdrop")
    from ahnlich_spark.sources.store_io import read_store

    meta = engine.catalog.get_store("incdrop")
    raw = read_store(engine.spark, engine.catalog, meta, canonical=False)
    assert not [c for c in raw.columns if c.startswith("_ann_")]


def test_concurrent_facades_never_clobber_segments(spark, warehouse):
    """Two Engine facades on one warehouse (the MAX_CLIENTS registry
    supports exactly this) racing a delta write: the loser must claim
    the NEXT segment number after a catalog reload, never silently
    overwrite the winner's committed rows (ADVICE r03)."""
    from ahnlich_spark import Engine

    a = Engine(spark, warehouse)
    a.create_store("race", dimension=4)
    a.set("race", [([1.0, 0.0, 0.0, 0.0], {"w": "base"})])
    b = Engine(spark, warehouse)  # loads catalog: version=1, deltas=0

    a.set("race", [([2.0, 0.0, 0.0, 0.0], {"w": "a"})])   # claims d1_1
    # b's in-memory meta still says deltas=0 -> it will try d1_1 too
    b.set("race", [([3.0, 0.0, 0.0, 0.0], {"w": "b"})])   # must land in d1_2

    fresh = Engine(spark, warehouse)
    rows = {tuple(r["key"])[0]: (r["meta"] or {})["w"]["s"]
            for r in fresh.store_df("race").collect()}
    assert rows == {1.0: "base", 2.0: "a", 3.0: "b"}
    assert fresh.catalog.get_store("race").deltas == 2


def test_store_changes_net_per_id(engine):
    """Change feed between two snapshots: net per-id classification
    (insert / update / delete), no-op tombstones dropped, and applying
    the changes to the FROM snapshot reconstructs the TO snapshot
    exactly (the incremental-refresh contract)."""
    engine.create_store("cdf", dimension=2)
    engine.set("cdf", [([float(i), 0.0], {"v": "base"}) for i in range(20)])
    # d1: 3 updates (5,6,7) + 2 inserts (100, 101)
    engine.set("cdf", [([float(i), 0.0], {"v": "d1"}) for i in (5, 6, 7, 100, 101)])
    # d2: delete 2 existing + update one of d1's inserts
    engine.del_key("cdf", [[1.0, 0.0], [2.0, 0.0]])
    engine.set("cdf", [([100.0, 0.0], {"v": "d2"})])

    ch = engine.store_changes("cdf", from_version=1, from_segments=0)
    got = {(tuple(r["key"])[0], r["change_type"]): dict(r["meta"] or {}).get("v")
           for r in ch.collect()}
    types = {}
    for (k, t), v in got.items():
        types.setdefault(t, set()).add(k)
    assert types["update"] == {5.0, 6.0, 7.0}
    assert types["insert"] == {100.0, 101.0}
    assert types["delete"] == {1.0, 2.0}
    # net winner: id 100 inserted in d1, re-set in d2 -> ONE insert row
    # carrying d2's value
    assert got[(100.0, "insert")]["s"] == "d2"
    # delete rows carry the PRE-IMAGE payload (Delta-CDF style)
    assert got[(1.0, "delete")]["s"] == "base"
    assert ch.count() == 7

    # reconstruction: (FROM snapshot - deletes - update ids) + new rows
    # == TO snapshot, the incremental-refresh contract
    a = {k[0] for r in engine.store_df("cdf", version=1, segments=0).collect()
         for k in [tuple(r["key"])]}
    b = {k[0] for r in engine.store_df("cdf").collect()
         for k in [tuple(r["key"])]}
    ins = {k for (k, t) in got if t == "insert"}
    del_ = {k for (k, t) in got if t == "delete"}
    assert (a - del_) | ins == b


def test_store_changes_span_compaction(engine):
    """A change range spanning a compaction (version bump) chains the
    old version's retained segments with the new version's — the
    rewrite itself contributes zero logical changes."""
    engine.create_store("cdfc", dimension=2)
    engine.set("cdfc", [([float(i), 0.0], {}) for i in range(10)])
    engine.set("cdfc", [([50.0, 0.0], {})])        # v1 d1: insert
    engine.compact("cdfc")                          # -> v2, folds d1
    engine.set("cdfc", [([51.0, 0.0], {})])        # v2 d1: insert
    engine.del_key("cdfc", [[0.0, 0.0]])            # v2 d2: delete

    ch = engine.store_changes("cdfc", from_version=1, from_segments=0)
    got = {(tuple(r["key"])[0], r["change_type"]) for r in ch.collect()}
    assert got == {(50.0, "insert"), (51.0, "insert"), (0.0, "delete")}
    # and a range that starts AFTER v1's segment sees only v2's changes
    ch2 = engine.store_changes("cdfc", from_version=1, from_segments=1)
    got2 = {(tuple(r["key"])[0], r["change_type"]) for r in ch2.collect()}
    assert got2 == {(51.0, "insert"), (0.0, "delete")}
    # empty range -> empty frame with the change schema
    empty = engine.store_changes("cdfc", from_version=2,
                                 from_segments=2)
    assert empty.count() == 0 and "change_type" in empty.columns


def test_store_changes_rejects_vacuumed_range(engine):
    import pytest as _pytest

    engine.create_store("cdfv", dimension=2)
    engine.set("cdfv", [([1.0, 0.0], {})])
    with _pytest.raises(ValueError, match="not retained"):
        engine.store_changes("cdfv", from_version=99)


def test_store_changes_plan_never_shuffles_snapshot(engine):
    """CDF scale contract: the FROM snapshot (the 100 TB side) is
    probed with BROADCAST joins only — a sort-merge join would shuffle
    the whole store to classify a handful of changes."""
    import contextlib
    import io

    engine.create_store("cdfplan", dimension=4)
    engine.set("cdfplan", [([float(i), 0.0, 0.0, 0.0], {}) for i in range(500)])
    engine.set("cdfplan", [([9999.0, 0.0, 0.0, 0.0], {})])
    engine.del_key("cdfplan", [[3.0, 0.0, 0.0, 0.0]])
    ch = engine.store_changes("cdfplan", from_version=1, from_segments=0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ch.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastExchange") >= 2, plan  # id probe + pre-image


def test_cdf_from_empty_snapshot_and_empty_store_views(spark, engine):
    """Changes since the EMPTY snapshot (version 0) are the TO-snapshot
    rows as inserts — the case a derived view created on an empty store
    hits on its first refresh (version 0 never exists on disk, the
    first SET writes the v1 base, not a delta)."""
    from pyspark.sql import functions as F

    from ahnlich_spark.operators import ivm as IVM

    engine.create_store("z0", dimension=2, predicates=["g"])
    engine.create_materialized_view("z0v", "z0", "meta['g']['s']",
                                    measures={"c": "1"})
    engine.set("z0", [([1.0, 0.0], {"g": "a"}), ([2.0, 0.0], {"g": "b"})])
    engine.del_pred("z0", __import__(
        "ahnlich_spark.operators.predicates", fromlist=["Equals"]
    ).Equals("g", "b"))
    f, t = engine.refresh_materialized_view("z0v")
    assert f == (0, 0) and t != f
    got = sorted(tuple(r) for r in
                 engine.read_materialized_view("z0v").collect())
    want = sorted(tuple(r) for r in IVM.full_agg(
        engine, "z0", F.col("meta")["g"]["s"], {"c": F.lit(1)}).collect())
    assert got == want == [("a", 1, 1)]
    ch = engine.store_changes("z0", 0, 0)
    assert {r["change_type"] for r in ch.collect()} <= {"insert"}
    # historical to_segments defaults like read_store's time travel
    assert engine.store_changes("z0", 0, 0, to_version=1).count() >= 1


def test_torn_segment_excluded_from_retained_counts(spark, engine):
    """A crashed writer's partial segment (no _SUCCESS marker) is
    invisible to list_versions, so time travel and the CDF can never
    merge a torn directory into a snapshot that was never committed."""
    import os

    engine.create_store("tn", dimension=2)
    engine.set("tn", [([1.0, 0.0], {})])
    engine.set("tn", [([2.0, 0.0], {})])       # d1_1 committed
    meta = engine.catalog.get_store("tn")
    torn = engine.catalog.delta_path(meta, meta.deltas + 1)
    os.makedirs(torn)                            # partial: no _SUCCESS
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
        f.write(b"not parquet")
    retained = dict(engine.catalog.list_versions(meta))
    assert retained[meta.version] == meta.deltas  # torn dir not counted
    assert engine.store_df("tn", version=meta.version).count() == 2


def test_parse_byte_size_units():
    from ahnlich_spark.sources.store_io import _parse_byte_size

    assert _parse_byte_size("128m") == 128 * 1024 ** 2
    assert _parse_byte_size("134217728") == 134217728
    assert _parse_byte_size("1g") == 1024 ** 3
    assert _parse_byte_size("512k") == 512 * 1024
    assert _parse_byte_size("64MB") == 64 * 1024 ** 2
    assert _parse_byte_size("nonsense") == 134217728
