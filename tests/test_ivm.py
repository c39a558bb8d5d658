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
