"""Extrema (min/max) incremental view maintenance: inserts fold
monotonically, removals that reach a group's current extremum trigger a
rescan BOUNDED to exactly the triggered groups, and the refreshed view
equals the full recompute row for row."""

import pytest
from pyspark.sql import functions as F

from ahnlich_spark.operators import ivm as IVM


def _m():
    return F.col("meta")["m"]["s"].cast("long")


def _g():
    return F.col("meta")["g"]["s"]


EXTREMA = {"mn": ("min", _m), "mx": ("max", _m)}


def _extrema():
    return {name: (kind, expr()) for name, (kind, expr) in EXTREMA.items()}


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: (t[0] is not None, t[0] or "", t[1:]),
    )


def test_extrema_refresh_bounded_rescan_matches_full(engine):
    """Deletes/updates hitting a group extremum trigger that group's
    rescan; inserts (even new group minima) and non-extremum removals
    fold without any rescan — and the result equals the recompute."""
    engine.create_store("ex", dimension=2, predicates=["g"])
    engine.set("ex", [
        ([1.0, 0.0], {"g": "a", "m": "1"}),
        ([2.0, 0.0], {"g": "a", "m": "5"}),
        ([3.0, 0.0], {"g": "a", "m": "9"}),
        ([4.0, 0.0], {"g": "b", "m": "2"}),
        ([5.0, 0.0], {"g": "b", "m": "4"}),
        ([6.0, 0.0], {"g": "c", "m": "7"}),
        ([7.0, 0.0], {"g": "c", "m": "7"}),
        ([8.0, 0.0], {"g": "e", "m": "1"}),
        ([9.0, 0.0], {"g": "e", "m": "5"}),
        ([10.0, 0.0], {"g": "e", "m": "9"}),
    ])                                                          # base v1
    view = IVM.full_agg_extrema(
        engine, "ex", _g(), _extrema(), version=1, segments=0
    ).localCheckpoint()
    engine.del_key("ex", [[3.0, 0.0]])       # a's max 9 -> trigger a
    engine.set("ex", [([11.0, 0.0], {"g": "b", "m": "0"})])  # new b min
    engine.set("ex", [([12.0, 0.0], {"g": "d", "m": "3"})])  # new group
    engine.set("ex", [([6.0, 0.0], {"g": "c", "m": "6"})])   # pre 7 = c max
    engine.del_key("ex", [[9.0, 0.0]])       # e's MIDDLE 5: no trigger
    refreshed, rescan = IVM.cdf_extrema_refresh(
        engine, "ex", view, 1, 0, _g(), _extrema()
    )
    assert sorted(r["group"] for r in rescan.collect()) == ["a", "c"]
    got = _rows(refreshed)
    want = _rows(IVM.full_agg_extrema(engine, "ex", _g(), _extrema()))
    assert got == want
    assert ("b", 3, 0, 4) in got      # folded min, never rescanned
    assert ("d", 1, 3, 3) in got      # new group from the fold
    assert ("e", 2, 1, 9) in got      # non-extremum removal kept extrema


def test_extrema_refresh_chains_and_drops_empty_groups(engine):
    """A second refresh composes on the first's output, and a group
    whose last row is removed vanishes from the view (the rescan finds
    no TO-snapshot rows for it)."""
    engine.create_store("ex2", dimension=2)
    engine.set("ex2", [
        ([1.0, 0.0], {"g": "a", "m": "4"}),
        ([2.0, 0.0], {"g": "d", "m": "3"}),
    ])                                                          # base v1
    view = IVM.full_agg_extrema(
        engine, "ex2", _g(), _extrema(), version=1, segments=0
    ).localCheckpoint()
    m1 = engine.catalog.get_store("ex2")
    engine.set("ex2", [([3.0, 0.0], {"g": "a", "m": "6"})])
    v1, _ = IVM.cdf_extrema_refresh(
        engine, "ex2", view, m1.version, m1.deltas, _g(), _extrema()
    )
    v1 = v1.localCheckpoint()
    m2 = engine.catalog.get_store("ex2")
    engine.del_key("ex2", [[2.0, 0.0]])       # d's only row
    v2, rescan = IVM.cdf_extrema_refresh(
        engine, "ex2", v1, m2.version, m2.deltas, _g(), _extrema()
    )
    assert [r["group"] for r in rescan.collect()] == ["d"]
    got = _rows(v2)
    assert got == _rows(IVM.full_agg_extrema(engine, "ex2", _g(), _extrema()))
    assert [g for g, *_ in got] == ["a"]      # d dropped


def test_extrema_refresh_null_groups_and_null_measures(engine):
    """NULL-group rows stay ONE group through the null-safe joins, and
    NULL measure rows are ignored by min/max on both paths — a group
    whose measure is NULL everywhere reads NULL extrema but keeps its
    count maintained."""
    engine.create_store("ex3", dimension=2)
    engine.set("ex3", [
        ([1.0, 0.0], {"m": "8"}),            # no g -> NULL group
        ([2.0, 0.0], {"m": "2"}),            # NULL group
        ([3.0, 0.0], {"g": "a"}),            # NULL measure
        ([4.0, 0.0], {"g": "a"}),            # NULL measure
    ])                                                          # base v1
    view = IVM.full_agg_extrema(
        engine, "ex3", _g(), _extrema(), version=1, segments=0
    ).localCheckpoint()
    engine.del_key("ex3", [[2.0, 0.0]])      # NULL group's min -> rescan
    engine.del_key("ex3", [[3.0, 0.0]])      # NULL measure: NO trigger
    engine.set("ex3", [([5.0, 0.0], {"m": "5"})])   # NULL-group insert
    refreshed, rescan = IVM.cdf_extrema_refresh(
        engine, "ex3", view, 1, 0, _g(), _extrema()
    )
    assert [r["group"] for r in rescan.collect()] == [None]
    got = _rows(refreshed)
    want = _rows(IVM.full_agg_extrema(engine, "ex3", _g(), _extrema()))
    assert got == want
    assert (None, 2, 5, 8) in got
    assert ("a", 1, None, None) in got       # all-NULL measure group


def test_extrema_validation_rejects_bad_kinds_and_names(engine):
    with pytest.raises(ValueError, match="'min' or 'max'"):
        IVM._check_extrema({"x": ("median", F.lit(1))})
    with pytest.raises(ValueError, match="reserved"):
        IVM._check_extrema({"dn": ("min", F.lit(1))})


# ---------------------------------------------- distinct-count IVM --


def test_distinct_refresh_matches_full_recompute(engine):
    """The (group, value, multiplicity) inner state maintained
    additively yields exact COUNT(DISTINCT) after value moves, the
    removal of a group's LAST instance of a value, and inserts — with
    no rescan and NULL values excluded from n_distinct but counted in
    n (ANSI semantics)."""
    from ahnlich_spark.operators.predicates import Equals

    engine.create_store("dc", dimension=2, predicates=["g", "v"])
    engine.set("dc", [
        ([1.0, 0.0], {"g": "a", "v": "x"}),
        ([2.0, 0.0], {"g": "a", "v": "x"}),
        ([3.0, 0.0], {"g": "a", "v": "y"}),
        ([4.0, 0.0], {"g": "b", "v": "x"}),
        ([5.0, 0.0], {"g": "b"}),                 # NULL value row
    ])                                            # base v1
    grp, val = _g(), F.col("meta")["v"]["s"]
    inner = IVM.full_distinct_inner(
        engine, "dc", grp, val, version=1, segments=0
    ).localCheckpoint()
    engine.set("dc", [([1.0, 0.0], {"g": "a", "v": "z"})])  # x multiplicity 2->1
    engine.del_pred("dc", Equals("v", "y"))       # a's ONLY y gone
    engine.set("dc", [([9.0, 9.0], {"g": "b", "v": "w"})])
    engine.set("dc", [([2.0, 0.0], {"g": "c", "v": "x"})])  # group move
    refreshed = IVM.cdf_distinct_refresh(engine, "dc", inner, 1, 0, grp, val)
    got = _rows(IVM.distinct_rollup(refreshed))
    want = _rows(IVM.full_agg_distinct(engine, "dc", grp, val))
    assert got == want and got
    # a: rows {z}, distinct 1; b: rows {x, NULL, w} -> n=3 distinct 2
    assert ("a", 1, 1) in got and ("b", 3, 2) in got and ("c", 1, 1) in got


def test_distinct_refresh_group_emptied_and_all_null(engine):
    """A group whose rows all vanish drops from the rollup; a group
    whose values are all NULL reads n_distinct == 0, matching the full
    recompute exactly."""
    from ahnlich_spark.operators.predicates import Equals

    engine.create_store("dn", dimension=2, predicates=["g", "v"])
    engine.set("dn", [
        ([1.0, 0.0], {"g": "a", "v": "x"}),
        ([2.0, 0.0], {"g": "b"}),
        ([3.0, 0.0], {"g": "b"}),
    ])
    grp, val = _g(), F.col("meta")["v"]["s"]
    inner = IVM.full_distinct_inner(
        engine, "dn", grp, val, version=1, segments=0
    ).localCheckpoint()
    engine.del_pred("dn", Equals("g", "a"))       # a emptied
    refreshed = IVM.cdf_distinct_refresh(engine, "dn", inner, 1, 0, grp, val)
    got = _rows(IVM.distinct_rollup(refreshed))
    want = _rows(IVM.full_agg_distinct(engine, "dn", grp, val))
    assert got == want == [("b", 2, 0)]


# ------------------------------------------------------ join-view IVM --


def _ab():
    return (F.col("a_meta")["k"]["s"], F.col("b_meta")["k"]["s"])


def test_join_refresh_matches_full_after_both_side_mutations(engine):
    """The bilinear delta identity dA><B0 + A1><dB folds join-key
    moves, deletes on either side, and SAME-WINDOW changes on both
    sides exactly once — the refreshed join view equals re-joining the
    final snapshots."""
    from ahnlich_spark.operators.predicates import Equals

    engine.create_store("jva", dimension=2, predicates=["k"])
    engine.create_store("jvb", dimension=2, predicates=["k", "w"])
    engine.set("jva", [([1.0, 0.0], {"k": "p"}), ([0.0, 1.0], {"k": "q"}),
                       ([2.0, 2.0], {"k": "r"}), ([4.0, 1.0], {})])  # NULL key
    engine.set("jvb", [([5.0, 0.0], {"k": "p", "w": "2"}),
                       ([6.0, 0.0], {"k": "q", "w": "3"}),
                       ([7.0, 0.0], {"k": "z", "w": "9"})])
    ja, jb = _ab()
    grp = F.col("b_meta")["w"]["s"]
    meas = {"s_e2": (F.element_at("a_key", 1) * 100).cast("long")}
    view = IVM.full_join_agg(
        engine, "jva", engine, "jvb", ja, jb, grp, meas,
        version_a=1, segments_a=0, version_b=1, segments_b=0,
    ).localCheckpoint()
    engine.set("jva", [([0.0, 1.0], {"k": "p"})])   # join-key move q->p
    engine.set("jva", [([8.0, 8.0], {"k": "z"})])   # first match for z
    engine.del_pred("jvb", Equals("k", "q"))        # b side loses q
    engine.set("jvb", [([5.0, 0.0], {"k": "p", "w": "5"})])  # b group move
    delta = IVM.cdf_join_agg_delta(
        engine, "jva", (1, 0), engine, "jvb", (1, 0), ja, jb, grp, meas,
    )
    got = _rows(IVM.apply_agg_delta(view, delta, ["s_e2"]))
    want = _rows(IVM.full_join_agg(
        engine, "jva", engine, "jvb", ja, jb, grp, meas,
    ))
    assert got == want and got
    # NULL join keys never matched (ANSI inner join), before or after
    assert all(g is not None for g, *_ in got)


def test_join_refresh_cross_term_cancels(engine):
    """A row inserted into A while its ONLY match was deleted from B in
    the same window must contribute NOTHING: the +pair from dA><B0 and
    the -pair from A1><dB cancel. Pinned by a window where that is the
    only activity, so any miscount leaves a visible group."""
    from ahnlich_spark.operators.predicates import Equals

    engine.create_store("jxa", dimension=2, predicates=["k"])
    engine.create_store("jxb", dimension=2, predicates=["k", "w"])
    engine.set("jxa", [([1.0, 0.0], {"k": "p"})])
    engine.set("jxb", [([5.0, 0.0], {"k": "p", "w": "2"}),
                       ([6.0, 0.0], {"k": "g", "w": "7"})])
    ja, jb = _ab()
    grp = F.col("b_meta")["w"]["s"]
    view = IVM.full_join_agg(
        engine, "jxa", engine, "jxb", ja, jb, grp, {},
        version_a=1, segments_a=0, version_b=1, segments_b=0,
    ).localCheckpoint()
    engine.set("jxa", [([9.0, 9.0], {"k": "g"})])   # new a row for g...
    engine.del_pred("jxb", Equals("k", "g"))        # ...whose match dies
    delta = IVM.cdf_join_agg_delta(
        engine, "jxa", (1, 0), engine, "jxb", (1, 0), ja, jb, grp, {},
    )
    got = _rows(IVM.apply_agg_delta(view, delta, []))
    want = _rows(IVM.full_join_agg(
        engine, "jxa", engine, "jxb", ja, jb, grp, {},
    ))
    assert got == want == [("2", 1)]


def test_join_refresh_one_side_quiet(engine):
    """Changes confined to one store leave the other term empty and the
    fold still equals the recompute (the common production window)."""
    engine.create_store("jqa", dimension=2, predicates=["k"])
    engine.create_store("jqb", dimension=2, predicates=["k", "w"])
    engine.set("jqa", [([1.0, 0.0], {"k": "p"}), ([2.0, 0.0], {"k": "p"})])
    engine.set("jqb", [([5.0, 0.0], {"k": "p", "w": "2"})])
    ja, jb = _ab()
    grp = F.col("b_meta")["w"]["s"]
    meas = {"s_e2": (F.element_at("a_key", 1) * 100).cast("long")}
    view = IVM.full_join_agg(
        engine, "jqa", engine, "jqb", ja, jb, grp, meas,
        version_a=1, segments_a=0, version_b=1, segments_b=0,
    ).localCheckpoint()
    engine.set("jqa", [([3.0, 0.0], {"k": "p"})])   # only A moves
    delta = IVM.cdf_join_agg_delta(
        engine, "jqa", (1, 0), engine, "jqb", (1, 0), ja, jb, grp, meas,
    )
    got = _rows(IVM.apply_agg_delta(view, delta, ["s_e2"]))
    want = _rows(IVM.full_join_agg(
        engine, "jqa", engine, "jqb", ja, jb, grp, meas,
    ))
    assert got == want == [("2", 3, 600)]


def test_quantile_rollup_definition_and_refresh(engine):
    """quantile_rollup reads exact discrete quantiles from the pair
    state: lower median and p90 pinned on known multisets (an all-NULL
    group reads q = NULL), and the MAINTAINED state after mutations
    yields the same quantiles as the state rebuilt from the final
    snapshot."""
    from ahnlich_spark.operators.predicates import Equals

    engine.create_store("qr", dimension=2, predicates=["g", "v"])
    vals = {"a": [1, 3, 3, 7, 9], "b": [2, 4, 6, 8], "c": [5]}
    rows, i = [], 0
    for g, vs in vals.items():
        for v in vs:
            rows.append(([float(i), 0.0], {"g": g, "v": str(v)}))
            i += 1
    rows.append(([float(i), 0.0], {"g": "d"}))        # all-NULL group
    engine.set("qr", rows)                            # base v1
    grp, val = _g(), F.col("meta")["v"]["s"].cast("long")
    inner0 = IVM.full_distinct_inner(
        engine, "qr", grp, val, version=1, segments=0
    ).localCheckpoint()
    med = _rows(IVM.quantile_rollup(inner0, 1, 2))
    assert med == [("a", 5, 3), ("b", 4, 4), ("c", 1, 5), ("d", 1, None)]
    p90 = _rows(IVM.quantile_rollup(inner0, 9, 10))
    assert p90[0] == ("a", 5, 9) and p90[1] == ("b", 4, 8)
    with pytest.raises(ValueError, match="quantile"):
        IVM.quantile_rollup(inner0, 3, 2)
    # mutate: delete a's current median instances, move a row into b
    engine.del_pred("qr", Equals("v", "3"))           # a loses both 3s
    engine.set("qr", [([0.0, 0.0], {"g": "b", "v": "10"})])  # a's 1 -> b's 10
    refreshed = IVM.cdf_distinct_refresh(engine, "qr", inner0, 1, 0, grp, val)
    got = _rows(IVM.quantile_rollup(refreshed, 1, 2))
    want = _rows(IVM.quantile_rollup(
        IVM.full_distinct_inner(engine, "qr", grp, val), 1, 2))
    assert got == want
    # a is now {7, 9} -> lower median 7; b {2,4,6,8,10} -> 6
    assert ("a", 2, 7) in got and ("b", 5, 6) in got


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_join_distinct_refresh_randomized_chains(engine, seed):
    """Adversarial randomized both-side mutation chains (seeded, so
    failures replay): 4 windows of random upserts / join-key moves /
    value changes / predicate deletes on BOTH stores, the pair state
    refreshed after EVERY window via cdf_join_distinct_refresh — after
    each fold the maintained state's rollup AND exact median equal the
    state rebuilt from a full re-join of the current snapshots. Catches
    fold-composition bugs (a window folded against state the previous
    window corrupted) that single-window tests cannot."""
    import random

    from ahnlich_spark.operators.predicates import Equals

    rng = random.Random(seed)
    sa, sb = f"rja{seed}", f"rjb{seed}"
    engine.create_store(sa, dimension=2, predicates=["k"])
    engine.create_store(sb, dimension=2, predicates=["k", "w"])
    keys = [str(k) for k in range(6)]
    engine.set(sa, [
        ([float(i), float(rng.randint(0, 3))], {"k": rng.choice(keys)})
        for i in range(12)
    ] + [([99.0, 0.0], {})])                       # NULL join key on A
    engine.set(sb, [
        ([float(k), 0.0], {"k": str(k), "w": str(k % 3)})
        for k in range(5)                          # key '5' unmatched on B
    ])
    ja, jb = F.col("a_meta")["k"]["s"], F.col("b_meta")["k"]["s"]
    grp = F.col("b_meta")["w"]["s"]
    val = (F.element_at("a_key", 2) * 100).cast("long")

    def coords(store):
        m = engine.catalog.get_store(store)
        return (m.version, m.deltas)

    ca, cb = coords(sa), coords(sb)
    inner = IVM.full_join_distinct_inner(
        engine, sa, engine, sb, ja, jb, grp, val,
        version_a=ca[0], segments_a=ca[1],
        version_b=cb[0], segments_b=cb[1],
    ).localCheckpoint()

    for _ in range(4):
        # random window on A: upserts (vector-is-PK → key/value moves)
        engine.set(sa, [
            ([float(rng.randint(0, 13)), float(rng.randint(0, 3))],
             {"k": rng.choice(keys)})
            for _ in range(rng.randint(1, 4))
        ])
        if rng.random() < 0.5:
            engine.del_pred(sa, Equals("k", rng.choice(keys)))
        # random window on B: regroup moves, deletes, late key arrival
        if rng.random() < 0.6:
            k = rng.randint(0, 5)
            engine.set(sb, [([float(k), 0.0],
                             {"k": str(k), "w": str(rng.randint(0, 4))})])
        if rng.random() < 0.3:
            engine.del_pred(sb, Equals("k", str(rng.randint(0, 5))))
        ta, tb = coords(sa), coords(sb)
        inner = IVM.cdf_join_distinct_refresh(
            engine, sa, inner, ca, engine, sb, cb, ja, jb, grp, val,
            to_a=ta, to_b=tb,
        ).localCheckpoint()
        ca, cb = ta, tb
        rebuilt = IVM.full_join_distinct_inner(
            engine, sa, engine, sb, ja, jb, grp, val)
        assert _rows(IVM.distinct_rollup(inner)) == _rows(
            IVM.distinct_rollup(rebuilt))
        assert _rows(IVM.quantile_rollup(inner, 1, 2)) == _rows(
            IVM.quantile_rollup(rebuilt, 1, 2))


def test_quantile_rollup_past_bigint_wrap_threshold(spark):
    """The DECIMAL branch, exercised without 9e12 actual rows: the pair
    state carries MULTIPLICITIES, so a handful of pairs with huge n put
    a group past the BIGINT-safe bound ((2^63 - den) div num). An
    extreme rational (999999/1000000) whose BIGINT product would wrap
    (and, with ANSI off, silently pin the quantile to the FIRST value)
    must still pick the true p999999 value; a small group in the same
    call rides the fast BIGINT branch and must agree with hand-ranked
    truth."""
    rows = [
        # big group: tot = 3e13 > safe_tot ~ 9.2e12 for num=999999
        (("big", 10), 10_000_000_000_000),
        (("big", 20), 10_000_000_000_000),
        (("big", 30), 10_000_000_000_000),
        # small group: rank math must stay exact on the fast path
        (("small", 1), 2),
        (("small", 5), 3),
    ]
    inner = spark.createDataFrame(
        [{"group": {"g": g, "v": v}, "n": n} for (g, v), n in rows],
        "group struct<g:string,v:long>, n long",
    )
    got = {r["group"]: (r["n"], r["q"])
           for r in IVM.quantile_rollup(inner, 999999, 1000000).collect()}
    # big: rank = ceil(0.999999 * 3e13) = 29999970000000 <= cum(30)
    #      and > cum(20)=2e13 -> q = 30 (first-bin pinning would say 10)
    assert got["big"] == (30_000_000_000_000, 30)
    # small: tot=5, rank = ceil(4.999995) = 5 -> q = 5
    assert got["small"] == (5, 5)
