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
