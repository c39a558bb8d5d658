"""Engine-MANAGED materialized views: the incremental view maintenance
algebra (operators/ivm.py) productized as a catalog object with a
CREATE / REFRESH / READ / DROP lifecycle.

A managed view records, in the warehouse catalog, its defining
expressions (SQL strings over the canonical (key, meta) store row — the
portable form a catalog can persist), the coordinates of the snapshot
it last folded, and a pointer to its current parquet generation. A
REFRESH folds the store's change feed from the recorded coordinates to
the current ones — O(changes) for additive aggregates and the
distinct/quantile pair state, O(changes + triggered groups) for
extrema — and swaps in a new generation; it NEVER rescans the store.
Because everything lives in the warehouse (catalog entry + parquet
generation), a managed view SURVIVES engine restarts: a fresh Engine on
the same warehouse refreshes it from where the last one stopped.

View kinds:

- ``agg``      — (group, n, <additive integer measures>...)
- ``distinct`` — persisted state is the (group, value, multiplicity)
                 pair table; reads roll it up to (group, n, n_distinct)
                 or an exact discrete quantile — both from the same
                 O(distinct pairs) state, exact under deletes where
                 sketches cannot subtract
- ``extrema``  — (group, n, min/max...) with removal-triggered rescans
                 bounded to the touched groups
- ``join``     — an aggregate over the equi-join of TWO stores,
                 maintained by the bilinear delta identity
                 dA><B0 + A1><dB (operators/ivm.cdf_join_agg_delta):
                 each refresh scans ONE base relation per term probed
                 by a BROADCAST of the other side's delta, never
                 re-joining the snapshots; the catalog records BOTH
                 stores' fold coordinates
- ``join_distinct`` — the distinct/quantile pair state over an
                 equi-join: the joined (group, value) MULTISET is
                 additive (each pair's multiplicity is a sum over
                 joined rows), so the SAME bilinear fold maintains it
                 with a struct(g, v) group; reads roll up exactly like
                 a single-store distinct view. Extrema over a join are
                 REFUSED by construction: a removal-triggered rescan's
                 trigger set spans the join (a delete on A can evict
                 the max of any group fed through any matching B row),
                 so the bounded-rescan contract would silently become
                 a full re-join — see create_materialized_view

The reference has no derived-view machinery at all (its stores answer
point and similarity queries only); this is capability the base+delta
layout and the CDF unlock.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ahnlich_spark import errors
from ahnlich_spark.catalog import PUBLIC_SCHEMA
from ahnlich_spark.operators import ivm as IVM

_KINDS = ("agg", "distinct", "extrema", "join", "join_distinct")


def _views(catalog, schema: str) -> dict:
    if schema not in catalog._data["schemas"]:
        raise errors.SchemaNotFound(f"schema {schema!r} not found")
    return catalog._data["schemas"][schema].setdefault("views", {})


def _view_dir(catalog, schema: str, name: str) -> str:
    return os.path.join(catalog.warehouse, "data", schema, "_views", name)


def _get(catalog, name: str, schema: str) -> dict:
    vs = _views(catalog, schema)
    if name not in vs:
        raise errors.StoreNotFound(
            f"materialized view {schema}.{name} not found"
        )
    return vs[name]


def _exprs(spec: Dict[str, str]):
    return {k: F.expr(v) for k, v in spec.items()}


def _state_df(engine, entry: dict, coords) -> DataFrame:
    """The view's PERSISTED state computed by a full scan of one
    snapshot — the seed shape each kind maintains thereafter. For
    single-store kinds ``coords`` is (version, segments); a join view
    seeds at the PAIRED coordinates ((va, sa), (vb, sb)) — the only
    full join the view ever computes."""
    kind, store, schema = entry["kind"], entry["store"], entry["schema"]
    group = F.expr(entry["group"])
    if kind == "join":
        (va, sa), (vb, sb) = coords
        return IVM.full_join_agg(
            engine, store, engine, entry["store_b"],
            F.expr(entry["join_a"]), F.expr(entry["join_b"]),
            group, _exprs(entry["measures"]),
            version_a=va, segments_a=sa, version_b=vb, segments_b=sb,
            schema=schema,
        )
    if kind == "join_distinct":
        (va, sa), (vb, sb) = coords
        return IVM.full_join_distinct_inner(
            engine, store, engine, entry["store_b"],
            F.expr(entry["join_a"]), F.expr(entry["join_b"]),
            group, F.expr(entry["value"]),
            version_a=va, segments_a=sa, version_b=vb, segments_b=sb,
            schema=schema,
        )
    version, segments = coords
    if kind == "agg":
        return IVM.full_agg(
            engine, store, group, _exprs(entry["measures"]),
            version=version, segments=segments, schema=schema,
        )
    if kind == "distinct":
        return IVM.full_distinct_inner(
            engine, store, group, F.expr(entry["value"]),
            version=version, segments=segments, schema=schema,
        )
    extrema = {k: (kd, F.expr(e)) for k, (kd, e) in entry["extrema"].items()}
    return IVM.full_agg_extrema(
        engine, store, group, extrema,
        version=version, segments=segments, schema=schema,
    )


def _flat_coords(coords):
    for c in coords:
        if isinstance(c, (list, tuple)):
            yield from c
        else:
            yield c


def _json_coords(coords):
    """Coordinates in catalog-JSON shape: [v, s] for single-store
    kinds, [[va, sa], [vb, sb]] for a join view."""
    if any(isinstance(c, (list, tuple)) for c in coords):
        return [[int(v), int(s)] for v, s in coords]
    return [int(coords[0]), int(coords[1])]


def _write_generation(engine, entry: dict, df: DataFrame,
                      coords) -> None:
    """New parquet generation + catalog pointer swap; the CURRENT and
    PREVIOUS generations are retained and older ones GC'd — the same
    keep-two discipline the streaming fold persistence uses, so a
    reader pinned to the prior generation (e.g. a registered SQL temp
    view) survives one refresh."""
    catalog = engine.catalog
    base = _view_dir(catalog, entry["schema"], entry["name"])
    gen = "g" + "_".join(str(int(x)) for x in _flat_coords(coords))
    from ahnlich_spark.functions import nullable_schema

    # nullable-normalized: a pinned read schema is trusted as-is by the
    # file source, so write-plan non-nullability must not ride into it
    # (ADVICE r11) — plan analysis only, no job
    table_schema = nullable_schema(df.schema).json()
    df.write.mode("overwrite").parquet(os.path.join(base, gen))
    with catalog._lock:
        # coords + table + flush are ONE unit: another thread's flush
        # between the two field writes would persist coords paired with
        # the previous generation (wrong fold start after a restart)
        entry["coords"] = _json_coords(coords)
        # pinned read schema: read_state then skips parquet schema
        # inference (a per-read file listing + footer job)
        entry["table_schema"] = table_schema
        prev, entry["table"] = entry.get("table"), gen
        catalog._flush()
    keep = {gen, prev} if prev else {gen}
    for d in os.listdir(base):
        if d not in keep:
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)


def create_materialized_view(
    engine,
    name: str,
    store: str,
    group: str,
    measures: Optional[Dict[str, str]] = None,
    value: Optional[str] = None,
    extrema: Optional[Dict[str, tuple]] = None,
    store_b: Optional[str] = None,
    join_on: Optional[tuple] = None,
    schema: str = PUBLIC_SCHEMA,
    error_if_exists: bool = True,
) -> dict:
    """CREATE: seed the view by one full aggregate of the store's
    CURRENT snapshot, persist it, and record the definition + fold
    coordinates in the catalog. Exactly one of ``measures`` (agg),
    ``value`` (distinct), ``extrema`` ({name: (kind, expr)}) picks the
    view kind; all expressions are SQL strings over (key, meta).

    ``store_b`` + ``join_on=(expr_a, expr_b)`` turn an agg view into a
    JOIN view (and a distinct view into a JOIN_DISTINCT view) over the
    equi-join ``store >< store_b`` — the ONLY time the two snapshots
    are actually joined is this seed; every refresh is the bilinear
    delta. Join/group/measure/value expressions then range over the
    joined row's (a_key, a_meta, b_key, b_meta) columns, and NULL join
    keys never match (ANSI equality). Extrema + store_b is refused —
    see the pinned impossibility argument below."""
    given = [x is not None for x in (measures, value, extrema)]
    if sum(given) != 1:
        raise ValueError(
            "exactly one of measures (agg view), value (distinct view), "
            "extrema (min/max view) must be given"
        )
    if (store_b is None) != (join_on is None):
        raise ValueError(
            "a join view needs BOTH store_b and join_on=(expr_a, expr_b)"
        )
    if store_b is not None and extrema is not None:
        # Pinned impossibility, not a TODO: extrema refreshes bound
        # their removal-triggered rescans to the TOUCHED groups of ONE
        # store's snapshot (ivm.cdf_extrema_refresh). Over a join, a
        # single delete on A evicts the max of every group reached
        # through any matching B row — the trigger set is defined by
        # the JOIN, so the "bounded rescan" is a re-join of the
        # snapshots, precisely what the view contract (seed is the
        # only full join ever computed) forbids. agg (additive) and
        # distinct (pair multiset, also additive) stay O(changes).
        raise ValueError(
            "extrema over a join are not maintainable without "
            "re-joining the snapshots (a one-side delete's rescan "
            "trigger set spans the join); use measures (additive agg) "
            "or value (distinct/quantile pair state) for join views"
        )
    m = engine.catalog.get_store(store, schema)  # raises if missing
    m_b = (engine.catalog.get_store(store_b, schema)
           if store_b is not None else None)
    vs = _views(engine.catalog, schema)
    if name in vs:
        if error_if_exists:
            raise errors.StoreAlreadyExists(
                f"materialized view {schema}.{name} already exists"
            )
        return vs[name]
    if engine.catalog.has_store(name, schema):
        raise errors.StoreAlreadyExists(
            f"{schema}.{name} already names a store"
        )
    if store_b is not None:
        kind = "join" if measures is not None else "join_distinct"
    else:
        kind = ("agg" if measures is not None else
                "distinct" if value is not None else "extrema")
    entry = {
        "name": name, "schema": schema, "store": store, "kind": kind,
        "group": group, "coords": None, "table": None,
    }
    if kind in ("agg", "join"):
        IVM._check_measures(_exprs(measures))
        entry["measures"] = dict(measures)
    if kind in ("distinct", "join_distinct"):
        entry["value"] = value
    if kind in ("join", "join_distinct"):
        entry["store_b"] = store_b
        entry["join_a"], entry["join_b"] = join_on
    if kind == "extrema":
        ex = {k: (kd, F.expr(e)) for k, (kd, e) in extrema.items()}
        IVM._check_extrema(ex)
        entry["extrema"] = {k: [kd, e] for k, (kd, e) in extrema.items()}
    coords = ((m.version, m.deltas) if m_b is None else
              ((m.version, m.deltas), (m_b.version, m_b.deltas)))
    seed = _state_df(engine, entry, coords)
    with engine.catalog._lock:
        vs[name] = entry
    try:
        _write_generation(engine, entry, seed, coords)
    except BaseException:
        # the seed write failed: remove the half-created entry so a
        # later unrelated _flush can't persist a coords=None view
        # (which would crash list_materialized_views and squat the
        # name forever), and re-flush in case _write_generation
        # already persisted the catalog before dying in GC
        with engine.catalog._lock:
            vs.pop(name, None)
            engine.catalog._flush()
        shutil.rmtree(_view_dir(engine.catalog, schema, name),
                      ignore_errors=True)
        raise
    return entry


def refresh_materialized_view(engine, name: str,
                              schema: str = PUBLIC_SCHEMA) -> tuple:
    """REFRESH: fold the store's change feed from the view's recorded
    coordinates to the store's current ones and swap in the new
    generation — O(changes), never a store rescan (extrema add a
    TO-snapshot scan bounded to removal-triggered groups). A no-op
    (and no write) when the store hasn't moved. Returns (from_coords,
    to_coords)."""
    entry = _get(engine.catalog, name, schema)
    store = entry["store"]
    m = engine.catalog.get_store(store, schema)
    group = F.expr(entry["group"])
    kind = entry["kind"]
    if kind in ("join", "join_distinct"):
        ca, cb = (tuple(c) for c in entry["coords"])
        m_b = engine.catalog.get_store(entry["store_b"], schema)
        ta, tb = (m.version, m.deltas), (m_b.version, m_b.deltas)
        if (ca, cb) == (ta, tb):
            return (ca, cb), (ta, tb)
        if kind == "join":
            measures = _exprs(entry["measures"])
            delta = IVM.cdf_join_agg_delta(
                engine, store, ca, engine, entry["store_b"], cb,
                F.expr(entry["join_a"]), F.expr(entry["join_b"]),
                group, measures, to_a=ta, to_b=tb, schema=schema,
            )
            new = IVM.apply_agg_delta(
                read_state(engine, name, schema), delta, list(measures)
            )
        else:
            new = IVM.cdf_join_distinct_refresh(
                engine, store, read_state(engine, name, schema), ca,
                engine, entry["store_b"], cb,
                F.expr(entry["join_a"]), F.expr(entry["join_b"]),
                group, F.expr(entry["value"]),
                to_a=ta, to_b=tb, schema=schema,
            )
        _write_generation(engine, entry, new, (ta, tb))
        return (ca, cb), (ta, tb)
    v0, s0 = entry["coords"]
    v1, s1 = m.version, m.deltas
    if (v0, s0) == (v1, s1):
        return (v0, s0), (v1, s1)
    state = read_state(engine, name, schema)
    if kind == "agg":
        measures = _exprs(entry["measures"])
        delta = IVM.cdf_agg_delta(
            engine, store, v0, s0, group, measures,
            to_version=v1, to_segments=s1, schema=schema,
        )
        new = IVM.apply_agg_delta(state, delta, list(measures))
    elif kind == "distinct":
        new = IVM.cdf_distinct_refresh(
            engine, store, state, v0, s0, group, F.expr(entry["value"]),
            to_version=v1, to_segments=s1, schema=schema,
        )
    else:
        extrema = {
            k: (kd, F.expr(e)) for k, (kd, e) in entry["extrema"].items()
        }
        new, _ = IVM.cdf_extrema_refresh(
            engine, store, state, v0, s0, group, extrema,
            to_version=v1, to_segments=s1, schema=schema,
        )
    _write_generation(engine, entry, new, (v1, s1))
    return (v0, s0), (v1, s1)


def read_state(engine, name: str, schema: str = PUBLIC_SCHEMA) -> DataFrame:
    """The persisted state table of the view's current generation."""
    import json as _json

    from pyspark.sql import types as _T

    entry = _get(engine.catalog, name, schema)
    reader = engine.spark.read
    if entry.get("table_schema"):
        # schema pinned at generation write: no inference job per read
        reader = reader.schema(
            _T.StructType.fromJson(_json.loads(entry["table_schema"])))
    return reader.parquet(os.path.join(
        _view_dir(engine.catalog, schema, name), entry["table"]
    ))


def read_materialized_view(
    engine,
    name: str,
    schema: str = PUBLIC_SCHEMA,
    quantile: Optional[tuple] = None,
) -> DataFrame:
    """READ: the view as a DataFrame. agg/extrema views read their
    state directly; a distinct view rolls the pair state up to
    (group, n, n_distinct) — or, with ``quantile=(num, den)``, to the
    exact discrete quantile (group, n, q). Quantiles are only
    answerable from the pair state: pass them on a distinct view."""
    entry = _get(engine.catalog, name, schema)
    state = read_state(engine, name, schema)
    if entry["kind"] not in ("distinct", "join_distinct"):
        if quantile is not None:
            raise ValueError(
                f"quantile reads need the pair state a 'distinct' or "
                f"'join_distinct' view maintains; {schema}.{name} is "
                f"kind {entry['kind']!r}"
            )
        return state
    if quantile is not None:
        return IVM.quantile_rollup(state, *quantile)
    return IVM.distinct_rollup(state)


def drop_materialized_view(engine, name: str,
                           schema: str = PUBLIC_SCHEMA) -> None:
    """DROP: remove the catalog entry and the view's data directory."""
    vs = _views(engine.catalog, schema)
    with engine.catalog._lock:
        if name not in vs:
            raise errors.StoreNotFound(
                f"materialized view {schema}.{name} not found"
            )
        del vs[name]
        engine.catalog._flush()
    shutil.rmtree(_view_dir(engine.catalog, schema, name),
                  ignore_errors=True)


def dependent_views(catalog, store: str, schema: str = PUBLIC_SCHEMA) -> list:
    """Names of managed views that fold from ``store`` (either side of
    a join view counts) — what ``Engine.drop_store`` must refuse or
    cascade through, or the views dangle and every later refresh dies
    with StoreNotFound."""
    if schema not in catalog._data["schemas"]:
        return []
    return sorted(
        e["name"]
        for e in catalog._data["schemas"][schema].get("views", {}).values()
        if e["store"] == store or e.get("store_b") == store
    )


def has_view(catalog, name: str, schema: str = PUBLIC_SCHEMA) -> bool:
    """Catalog-only existence probe (no Spark jobs, no exceptions) —
    the reverse of the store-name collision check view creation runs."""
    if schema not in catalog._data["schemas"]:
        return False
    return name in catalog._data["schemas"][schema].get("views", {})


def list_materialized_views(engine, schema: str = PUBLIC_SCHEMA) -> list:
    """Catalog-only listing (zero Spark jobs): [(name, kind, store,
    coords)] sorted by name."""
    return sorted(
        (e["name"], e["kind"], e["store"],
         tuple(tuple(c) if isinstance(c, (list, tuple)) else c
               for c in e["coords"]))
        for e in _views(engine.catalog, schema).values()
    )


def streaming_refresh_materialized_view(
    feed,
    engine,
    name: str,
    schema: str = PUBLIC_SCHEMA,
    checkpoint: Optional[str] = None,
):
    """Continuously refresh a MANAGED view from a change-feed DOORBELL:
    each micro-batch trigger calls ``refresh_materialized_view``, which
    folds the store's CDF from the CATALOG-recorded coordinates to the
    store's current ones — the batch rows themselves are never
    consumed, so exactly-once is trivial (a replayed or re-batched
    trigger folds from the persisted coordinates and lands the same or
    a further catch-up; there is nothing to double-count), and restart
    survival is inherited from the catalog: mutations landing while the
    stream is down fold on the first trigger after it returns. Works
    for every view kind — agg, distinct, extrema, and join (for a join
    view, union both stores' change streams so either side wakes the
    fold; a one-sided feed still catches the quiet side up on the next
    trigger). Per-trigger cost is the view's refresh contract
    (O(changes), coordinate no-ops skip the write entirely).

    This is the managed-catalog face of
    ``streaming/pipeline.streaming_materialized_agg``: use that when
    the view should fold into a REPLICA it also maintains; use this
    when the store mutates in place and the catalog object should
    simply stay current. Returns the StreamingQuery.

    Thread safety: the refresh runs on the STREAM-EXECUTION thread
    while the user thread keeps mutating the same engine — every
    catalog mutate+flush unit (here and in the engine's DDL/DML)
    serializes on the catalog's RLock, so concurrent mutations can
    neither crash the flush mid-iteration nor persist a view entry
    whose coordinates point past its stored generation."""
    _get(engine.catalog, name, schema)  # fail fast on a missing view

    def _sink(batch_df, batch_id: int) -> None:
        refresh_materialized_view(engine, name, schema=schema)

    writer = feed.writeStream.foreachBatch(_sink).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def register_sql_views(engine, schema: str = PUBLIC_SCHEMA,
                       prefix: str = "ahnlich_mv_") -> list:
    """Expose every managed materialized view in ``schema`` to Spark
    SQL as a temp view ``<prefix><name>`` — the same SQL door
    ``Engine.register_views`` opens for stores, over the view's
    CURRENT persisted generation (distinct views read rolled-up).
    Because a generation is an immutable parquet dir and the previous
    generation is retained through the next refresh, the temp view is
    a pinned snapshot-consistent read that survives ONE refresh;
    re-register after a refresh to follow the new generation. Returns
    the registered names."""
    names = []
    for name, _, _, _ in list_materialized_views(engine, schema):
        sql_name = f"{prefix}{name}"
        read_materialized_view(engine, name, schema=schema) \
            .createOrReplaceTempView(sql_name)
        names.append(sql_name)
    return names
