"""Incremental view maintenance over the store's change data feed.

A derived aggregate (a materialized view) is refreshed from the CDF
rows between two retained snapshots — O(changes) plus ONE broadcast-
probed scan of the FROM snapshot for update pre-images (the same scan
shape ``read_changes`` itself uses) — never by rescanning the store.
This is the contract that makes a 100 TB derived table affordable: a
day of mutations refreshes it at the cost of the day's changes.

The delta algebra (reference analog: the reference has no CDF at all —
its DelPred answers only ``Del{count}``; this module is the Spark-
native capability the base+delta layout unlocks):

- insert rows ADD their new image;
- delete rows SUBTRACT the pre-image the feed itself records;
- update rows SUBTRACT the FROM-snapshot pre-image (one semi-join
  probe by id) and ADD the new image.

``cdf_agg_delta`` emits the per-group signed deltas; ``apply_agg_delta``
folds them into a maintained aggregate (full-outer coalesce-sum, empty
groups dropped). Both the batch gate (``incremental_agg_refresh``) and
the streaming fold (``streaming/pipeline.streaming_materialized_agg``)
run exactly this code — one algebra, two drivers.

Measures must be ADDITIVE integer expressions over (key, meta) rows
(counts, scaled-integer sums): additivity is what makes the refresh a
pure fold, and integer math keeps it bit-identical across engines and
partitionings. A measure expression that evaluates to NULL on a row
contributes 0 — ``cdf_agg_delta`` and ``full_agg`` both coalesce it,
so the maintained view and the full recompute agree by construction
even for off-contract nullable measures.
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ahnlich_spark.functions.intmath import safe_rank_expr


_RESERVED_MEASURES = {"group", "n", "dn"}


def _check_measures(measures: Dict[str, Column]) -> None:
    bad = sorted(
        m for m in measures
        if m in _RESERVED_MEASURES or m.startswith("d_")
    )
    if bad:
        raise ValueError(
            f"measure names {bad} collide with the view's reserved "
            f"columns (group/n/dn and the d_ delta prefix) — rename them"
        )


def signed_changes(
    engine,
    store: str,
    from_version: int,
    from_segments: int,
    to_version=None,
    to_segments=None,
    schema: str = "public",
) -> DataFrame:
    """The change feed between two snapshots as SIGNED canonical rows
    (key, meta, _w): insert/update post-images carry +1, delete
    pre-images (recorded by the feed) and update pre-images (ONE
    broadcast-probed semi-join of the FROM snapshot) carry -1. Summing
    any row expression weighted by ``_w`` gives that expression's exact
    aggregate delta — the primitive under single-store, distinct-count,
    and join view maintenance."""
    ch = engine.store_changes(
        store, from_version=from_version, from_segments=from_segments,
        to_version=to_version, to_segments=to_segments, schema=schema,
    )
    upd_pre = engine.store_df(
        store, schema=schema, version=from_version, segments=from_segments
    ).join(
        # the id list is O(changes): BROADCAST it so the FROM snapshot
        # (the 100 TB side) is probed in place, never sort-shuffled by
        # id — explicit, not left to AQE's runtime conversion
        F.broadcast(
            ch.filter(F.col("change_type") == "update").select("id")
        ),
        "id", "left_semi",
    )
    neg = (
        ch.filter(F.col("change_type") == "delete").select("key", "meta")
        .unionByName(upd_pre.select("key", "meta"))
        .withColumn("_w", F.lit(-1))
    )
    pos = (
        ch.filter(F.col("change_type") != "delete").select("key", "meta")
        .withColumn("_w", F.lit(1))
    )
    return neg.unionByName(pos)


def _weighted_group_delta(
    signed: DataFrame, group_expr: Column, measures: Dict[str, Column],
    weight: Column,
) -> DataFrame:
    """(group, dn, d_<measure>...) from signed rows under ``weight``."""
    return (
        signed.groupBy(group_expr.alias("group"))
        .agg(
            F.sum(weight).cast("long").alias("dn"),
            *[
                F.sum(weight * F.coalesce(expr, F.lit(0)))
                .cast("long").alias(f"d_{name}")
                for name, expr in measures.items()
            ],
        )
    )


def cdf_agg_delta(
    engine,
    store: str,
    from_version: int,
    from_segments: int,
    group_expr: Column,
    measures: Dict[str, Column],
    to_version=None,
    to_segments=None,
    schema: str = "public",
) -> DataFrame:
    """Per-group signed aggregate deltas from the change feed between
    two snapshots: (group, dn, d_<measure>...). ``group_expr`` and
    every measure are Column expressions over the canonical store row
    (key, meta) — evaluated identically on pre- and post-images."""
    _check_measures(measures)
    signed = signed_changes(
        engine, store, from_version, from_segments,
        to_version=to_version, to_segments=to_segments, schema=schema,
    )
    return _weighted_group_delta(signed, group_expr, measures, F.col("_w"))


def apply_agg_delta(
    agg: DataFrame, delta: DataFrame, measure_names,
    keep_zero: bool = False,
) -> DataFrame:
    """Fold a signed delta table into a maintained (group, n,
    <measures>...) aggregate: full-outer coalesce-sum per group, groups
    whose count reaches zero dropped. The join is NULL-SAFE — rows
    whose group expression is NULL (meta missing the grouped key) form
    ONE group on both sides, exactly like groupBy put them there; a
    plain equality join would split them into two partial rows and the
    view would diverge from the full recompute. ``agg`` columns: group,
    n, and one column per measure name; ``delta`` comes from
    ``cdf_agg_delta``. ``keep_zero=True`` keeps n==0 rows instead —
    the keyed sink writes them as per-group tombstones that keep-last
    merge resolves (the reader filters n>0 on drain)."""
    a, d = agg.alias("a"), delta.alias("d")
    cols = [
        F.coalesce(F.col("a.group"), F.col("d.group")).alias("group"),
        (F.coalesce("a.n", F.lit(0)) + F.coalesce("d.dn", F.lit(0)))
        .cast("long").alias("n"),
    ] + [
        (F.coalesce(f"a.{name}", F.lit(0))
         + F.coalesce(f"d.d_{name}", F.lit(0)))
        .cast("long").alias(name)
        for name in measure_names
    ]
    out = (
        a.join(d, F.col("a.group").eqNullSafe(F.col("d.group")),
               "full_outer")
        .select(*cols)
    )
    return out if keep_zero else out.filter(F.col("n") > 0)


def _check_extrema(extrema: Dict[str, Tuple[str, Column]]) -> None:
    _check_measures({name: kc[1] for name, kc in extrema.items()})
    bad = sorted(n for n, (k, _) in extrema.items() if k not in ("min", "max"))
    if bad:
        raise ValueError(
            f"extrema {bad} must declare 'min' or 'max' as their kind"
        )


def full_agg_extrema(
    engine,
    store: str,
    group_expr: Column,
    extrema: Dict[str, Tuple[str, Column]],
    version=None,
    segments=None,
    schema: str = "public",
) -> DataFrame:
    """Per-group (n, min/max...) computed by a full snapshot scan — the
    seed for an extrema-maintained view and the recompute the refreshed
    table must equal. ``extrema`` maps name -> ("min"|"max", integer
    Column expr); NULL measure rows are ignored by min/max on both the
    Spark and oracle side (ANSI semantics), so a group whose expr is
    NULL everywhere reads NULL."""
    _check_extrema(extrema)
    return (
        engine.store_df(store, schema=schema, version=version,
                        segments=segments)
        .groupBy(group_expr.alias("group"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            *[
                (F.min(expr) if kind == "min" else F.max(expr))
                .cast("long").alias(name)
                for name, (kind, expr) in extrema.items()
            ],
        )
    )


def cdf_extrema_refresh(
    engine,
    store: str,
    view: DataFrame,
    from_version: int,
    from_segments: int,
    group_expr: Column,
    extrema: Dict[str, Tuple[str, Column]],
    to_version=None,
    to_segments=None,
    schema: str = "public",
):
    """Refresh a min/max-maintained view from the change feed between
    two snapshots. Extrema break pure additivity in ONE direction only:

    - INSERTS (and update post-images) fold monotonically —
      ``least(old_min, batch_min)`` / ``greatest(old_max, batch_max)``
      — pure O(changes), no rescan;
    - a REMOVAL (delete pre-image, or update pre-image probed from the
      FROM snapshot) that reaches the group's CURRENT extremum
      invalidates it, and only a rescan of that group can find the
      runner-up. The rescan is bounded to exactly the TRIGGERED groups:
      one TO-snapshot scan filtered by a broadcast of the (tiny)
      triggered-group list — groups whose removals never touch their
      extremum, and groups only inserted into, are folded without
      rescanning anything (row-count-pinned in tests).

    The CDF is net-per-id (insert rows live at TO, delete pre-images
    lived at FROM), which is what makes the fold sound: an inserted
    value can never be retracted inside the same delta, and every
    removal's group already exists in the view. NULL-group rows are one
    group throughout (null-safe joins); group counts are maintained
    additively and zero-count groups drop.

    Returns ``(refreshed_view, rescan_groups)`` — the second DataFrame
    is the triggered-group list, exposed so callers (and tests) can pin
    that the rescan really was bounded."""
    _check_extrema(extrema)
    spark = view.sparkSession
    ch = engine.store_changes(
        store, from_version=from_version, from_segments=from_segments,
        to_version=to_version, to_segments=to_segments, schema=schema,
    )
    upd_pre = engine.store_df(
        store, schema=schema, version=from_version, segments=from_segments
    ).join(
        # the id list is O(changes): BROADCAST it so the FROM snapshot
        # (the 100 TB side) is probed in place, never sort-shuffled by
        # id — explicit, not left to AQE's runtime conversion
        F.broadcast(
            ch.filter(F.col("change_type") == "update").select("id")
        ),
        "id", "left_semi",
    )

    def project(df: DataFrame) -> DataFrame:
        return df.select(
            group_expr.alias("group"),
            *[expr.cast("long").alias(name)
              for name, (_, expr) in extrema.items()],
        )

    removed = project(
        ch.filter(F.col("change_type") == "delete").select("key", "meta")
        .unionByName(upd_pre.select("key", "meta"))
    )
    added = project(
        ch.filter(F.col("change_type") != "delete").select("key", "meta")
    )
    add_agg = added.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("_add_n"),
        *[
            (F.min(name) if kind == "min" else F.max(name))
            .alias(f"_add_{name}")
            for name, (kind, _) in extrema.items()
        ],
    )
    rem_agg = removed.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("_rem_n"),
        *[
            (F.min(name) if kind == "min" else F.max(name))
            .alias(f"_rem_{name}")
            for name, (kind, _) in extrema.items()
        ],
    )
    # triggered groups: a removed value REACHES the current extremum
    # (<= for min, >= for max — equality is the real case on a
    # consistent view; the inequality also absorbs a stale-view caller)
    v, r = view.alias("v"), rem_agg.alias("r")
    trig = F.lit(False)
    for name, (kind, _) in extrema.items():
        hit = (
            F.col(f"r._rem_{name}") <= F.col(f"v.{name}")
            if kind == "min"
            else F.col(f"r._rem_{name}") >= F.col(f"v.{name}")
        )
        trig = trig | F.coalesce(hit, F.lit(False))
    rescan_groups = (
        r.join(v, F.col("r.group").eqNullSafe(F.col("v.group")), "inner")
        .filter(trig)
        .select(F.col("r.group").alias("group"))
    ).localCheckpoint()
    # bounded rescan: ONE TO-snapshot aggregation restricted to the
    # triggered groups via a broadcast semi-join on the group expression
    snap = engine.store_df(
        store, schema=schema, version=to_version, segments=to_segments
    ).withColumn("group", group_expr)
    rescanned = (
        snap.join(F.broadcast(rescan_groups),
                  snap["group"].eqNullSafe(rescan_groups["group"]),
                  "left_semi")
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            *[
                (F.min(expr) if kind == "min" else F.max(expr))
                .cast("long").alias(name)
                for name, (kind, expr) in extrema.items()
            ],
        )
    )
    # fold path for every untriggered group: counts additively, extrema
    # monotonically (least/greatest skip NULLs)
    def anti(df: DataFrame) -> DataFrame:
        return df.join(
            F.broadcast(rescan_groups),
            df["group"].eqNullSafe(rescan_groups["group"]),
            "left_anti",
        )

    delta = (
        anti(add_agg).alias("d")
        .join(anti(rem_agg.select("group", "_rem_n")).alias("e"),
              F.col("d.group").eqNullSafe(F.col("e.group")), "full_outer")
        .select(
            F.coalesce(F.col("d.group"), F.col("e.group")).alias("group"),
            (F.coalesce("d._add_n", F.lit(0))
             - F.coalesce("e._rem_n", F.lit(0))).alias("dn"),
            *[F.col(f"d._add_{name}") for name in extrema],
        )
    )
    a, d = anti(view).alias("a"), delta.alias("d")
    fold_fn = {"min": F.least, "max": F.greatest}
    folded = (
        a.join(d, F.col("a.group").eqNullSafe(F.col("d.group")),
               "full_outer")
        .select(
            F.coalesce(F.col("a.group"), F.col("d.group")).alias("group"),
            (F.coalesce("a.n", F.lit(0)) + F.coalesce("d.dn", F.lit(0)))
            .cast("long").alias("n"),
            *[
                fold_fn[kind](F.col(f"a.{name}"), F.col(f"d._add_{name}"))
                .cast("long").alias(name)
                for name, (kind, _) in extrema.items()
            ],
        )
        .filter(F.col("n") > 0)
    )
    return folded.unionByName(rescanned), rescan_groups


def full_agg(
    engine,
    store: str,
    group_expr: Column,
    measures: Dict[str, Column],
    version=None,
    segments=None,
    schema: str = "public",
) -> DataFrame:
    """The same aggregate computed by a full scan of a snapshot — the
    seed for a maintained view, and the recompute the refreshed table
    must equal (pytest-pinned)."""
    _check_measures(measures)
    return (
        engine.store_df(store, schema=schema, version=version,
                        segments=segments)
        .groupBy(group_expr.alias("group"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            *[
                F.sum(F.coalesce(expr, F.lit(0))).cast("long").alias(name)
                for name, expr in measures.items()
            ],
        )
    )


# ----------------------------------------------- distinct-count IVM --

def full_agg_distinct(
    engine,
    store: str,
    group_expr: Column,
    value_expr: Column,
    version=None,
    segments=None,
    schema: str = "public",
) -> DataFrame:
    """Per-group (n, n_distinct) by a full snapshot scan — the
    recompute a distinct-maintained view must equal. ``n_distinct``
    follows ANSI COUNT(DISTINCT x): NULL values don't count."""
    return (
        engine.store_df(store, schema=schema, version=version,
                        segments=segments)
        .groupBy(group_expr.alias("group"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_distinct(value_expr).cast("long").alias("n_distinct"),
        )
    )


def full_distinct_inner(
    engine,
    store: str,
    group_expr: Column,
    value_expr: Column,
    version=None,
    segments=None,
    schema: str = "public",
) -> DataFrame:
    """Seed of the distinct-count view's INNER state: one row per
    (group, value) pair with its multiplicity, shaped exactly like an
    agg view whose group is struct(g, v) — so the generic additive fold
    maintains it unchanged."""
    return full_agg(
        engine, store,
        F.struct(group_expr.alias("g"), value_expr.alias("v")),
        {}, version=version, segments=segments, schema=schema,
    )


def cdf_distinct_refresh(
    engine,
    store: str,
    inner: DataFrame,
    from_version: int,
    from_segments: int,
    group_expr: Column,
    value_expr: Column,
    to_version=None,
    to_segments=None,
    schema: str = "public",
) -> DataFrame:
    """Refresh the inner (group, value, multiplicity) state from the
    change feed. COUNT(DISTINCT) is not additive — but the pair
    MULTISET is: maintain (g, v) -> count additively (the generic
    cdf_agg_delta/apply_agg_delta fold over a struct group, zero-count
    pairs dropping out), and distinctness falls out as "pair present".
    Pure O(changes) + the standard update-pre-image probe; unlike
    extrema, NO rescan is ever needed, because a removed value's
    runner-up is the pair table itself. The inner state is O(distinct
    pairs) — bigger than the rolled-up view, and exactly what makes
    deletes exact where sketches (HLL/KMV) cannot subtract."""
    delta = cdf_agg_delta(
        engine, store, from_version, from_segments,
        F.struct(group_expr.alias("g"), value_expr.alias("v")), {},
        to_version=to_version, to_segments=to_segments, schema=schema,
    )
    return apply_agg_delta(inner, delta, [])


def distinct_rollup(inner: DataFrame) -> DataFrame:
    """(group, n, n_distinct) from the inner pair state: one
    O(distinct pairs) aggregation — never a store rescan. NULL values
    contribute their rows to ``n`` but not to ``n_distinct`` (ANSI
    COUNT(DISTINCT) semantics); the NULL group stays one group."""
    return (
        inner.groupBy(F.col("group.g").alias("group"))
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.count(F.col("group.v")).cast("long").alias("n_distinct"),
        )
    )


# ----------------------------------------------------- join-view IVM --
#
# A maintained aggregate over the EQUI-JOIN of two mutating stores.
# The joined row exposes (a_key, a_meta, b_key, b_meta); join/group/
# measure expressions are Columns over those names. The delta algebra
# is the classic bilinear identity over signed multisets:
#
#   A1><B1 - A0><B0  =  dA><B0  +  A1><dB        (dX = X1 - X0 signed)
#
# — each signed pair weighted w_a*w_b, so one refresh is O(changes on
# both sides) plus ONE scan of each base relation probed by a BROADCAST
# of the other side's (tiny) delta: never a re-join of the snapshots.
# A base relation bucketed/partitioned on its join key would prune even
# that scan; the identity itself is layout-independent.


def _join_side(df: DataFrame, prefix: str) -> DataFrame:
    return df.select(F.col("key").alias(f"{prefix}_key"),
                     F.col("meta").alias(f"{prefix}_meta"))


def full_join_agg(
    eng_a,
    store_a: str,
    eng_b,
    store_b: str,
    join_a: Column,
    join_b: Column,
    group_expr: Column,
    measures: Dict[str, Column],
    version_a=None,
    segments_a=None,
    version_b=None,
    segments_b=None,
    schema: str = "public",
) -> DataFrame:
    """The join view computed by actually joining two snapshots — the
    seed for a join-maintained view and the recompute the refreshed
    table must equal. ANSI inner-join semantics: NULL join keys never
    match (plain equality, not null-safe — matching the SQL oracle)."""
    _check_measures(measures)
    a = _join_side(eng_a.store_df(store_a, schema=schema,
                                  version=version_a, segments=segments_a),
                   "a")
    b = _join_side(eng_b.store_df(store_b, schema=schema,
                                  version=version_b, segments=segments_b),
                   "b")
    return (
        a.join(b, join_a == join_b, "inner")
        .groupBy(group_expr.alias("group"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            *[
                F.sum(F.coalesce(expr, F.lit(0))).cast("long").alias(name)
                for name, expr in measures.items()
            ],
        )
    )


def cdf_join_agg_delta(
    eng_a,
    store_a: str,
    from_a,
    eng_b,
    store_b: str,
    from_b,
    join_a: Column,
    join_b: Column,
    group_expr: Column,
    measures: Dict[str, Column],
    to_a=None,
    to_b=None,
    schema: str = "public",
) -> DataFrame:
    """Per-group signed deltas of the JOIN view between two snapshot
    pairs: (group, dn, d_<measure>...), foldable by ``apply_agg_delta``
    exactly like a single-store delta. ``from_a``/``from_b`` (and the
    optional ``to_*``, defaulting to current state) are (version,
    segments) coordinate pairs.

    Both terms of the identity keep the BASE relation as the scanned
    side and BROADCAST the signed delta: dA><B0 probes the B snapshot
    with A's changes, A1><dB probes the post-delta A snapshot with B's
    changes. Updates that MOVE a row's join key, deletes on either
    side, and changes landing on BOTH sides in the same window all fold
    exactly once — the cross term (a inserted while its match was
    deleted) cancels between the two terms by construction."""
    _check_measures(measures)
    if to_a is None:
        m = eng_a.catalog.get_store(store_a, schema)
        to_a = (m.version, m.deltas)
    if to_b is None:
        m = eng_b.catalog.get_store(store_b, schema)
        to_b = (m.version, m.deltas)
    d_a = signed_changes(
        eng_a, store_a, from_a[0], from_a[1],
        to_version=to_a[0], to_segments=to_a[1], schema=schema,
    ).select(F.col("key").alias("a_key"), F.col("meta").alias("a_meta"),
             F.col("_w").alias("_wa"))
    d_b = signed_changes(
        eng_b, store_b, from_b[0], from_b[1],
        to_version=to_b[0], to_segments=to_b[1], schema=schema,
    ).select(F.col("key").alias("b_key"), F.col("meta").alias("b_meta"),
             F.col("_w").alias("_wb"))
    b0 = _join_side(
        eng_b.store_df(store_b, schema=schema,
                       version=from_b[0], segments=from_b[1]), "b",
    ).withColumn("_wb", F.lit(1))
    a1 = _join_side(
        eng_a.store_df(store_a, schema=schema,
                       version=to_a[0], segments=to_a[1]), "a",
    ).withColumn("_wa", F.lit(1))
    cond = join_a == join_b
    pairs = (
        F.broadcast(d_a).join(b0, cond, "inner")
        .unionByName(a1.join(F.broadcast(d_b), cond, "inner"))
    )
    return _weighted_group_delta(
        pairs, group_expr, measures, F.col("_wa") * F.col("_wb")
    )


def full_join_distinct_inner(
    eng_a,
    store_a: str,
    eng_b,
    store_b: str,
    join_a: Column,
    join_b: Column,
    group_expr: Column,
    value_expr: Column,
    version_a=None,
    segments_a=None,
    version_b=None,
    segments_b=None,
    schema: str = "public",
) -> DataFrame:
    """Seed of a DISTINCT-over-JOIN view's inner state: the (group,
    value, multiplicity) pair table of the equi-join — the only time
    the two snapshots are actually joined, exactly like the agg join
    seed. Same shape as ``full_distinct_inner`` (group = struct(g, v),
    n = multiplicity), so ``distinct_rollup``/``quantile_rollup`` read
    it unchanged. Group/value expressions range over the joined row's
    (a_key, a_meta, b_key, b_meta)."""
    return full_join_agg(
        eng_a, store_a, eng_b, store_b, join_a, join_b,
        F.struct(group_expr.alias("g"), value_expr.alias("v")), {},
        version_a=version_a, segments_a=segments_a,
        version_b=version_b, segments_b=segments_b, schema=schema,
    )


def cdf_join_distinct_refresh(
    eng_a,
    store_a: str,
    inner: DataFrame,
    from_a,
    eng_b,
    store_b: str,
    from_b,
    join_a: Column,
    join_b: Column,
    group_expr: Column,
    value_expr: Column,
    to_a=None,
    to_b=None,
    schema: str = "public",
) -> DataFrame:
    """Refresh a DISTINCT-over-JOIN inner state from both stores'
    change feeds. COUNT(DISTINCT) over a join is not additive — but
    the joined pair MULTISET is: each (g, v) pair's multiplicity is a
    SUM over joined rows, so the bilinear identity dA><B0 + A1><dB
    maintains it with the struct(g, v) group and zero measures, and
    distinctness falls out as "pair present" exactly like the
    single-store distinct fold. O(changes on both sides) per refresh,
    one broadcast-probed base scan per term, zero-multiplicity pairs
    drop out in the fold; deletes stay exact where sketches cannot
    subtract and extrema-over-join cannot avoid a re-join (see
    plans/views.create_materialized_view)."""
    delta = cdf_join_agg_delta(
        eng_a, store_a, from_a, eng_b, store_b, from_b,
        join_a, join_b,
        F.struct(group_expr.alias("g"), value_expr.alias("v")), {},
        to_a=to_a, to_b=to_b, schema=schema,
    )
    return apply_agg_delta(inner, delta, [])


def quantile_rollup(inner: DataFrame, num: int, den: int) -> DataFrame:
    """(group, n, q) — the EXACT per-group discrete quantile at
    p = num/den from the same maintained (group, value, multiplicity)
    state the distinct rollup reads: one window over the O(distinct
    pairs) state ordered by value, never a store scan. The quantile is
    percentile_disc-style: the smallest value whose cumulative
    multiplicity reaches ceil(p * non-null count), computed in pure
    integer math (rank = (num*tot + den - 1) div den) so both engines
    agree bit-for-bit. NULL values are excluded from the rank (ANSI);
    a group whose values are ALL NULL reads q = NULL. Maintaining the
    pair multiset thus buys exact COUNT(DISTINCT) and exact quantiles
    under the SAME O(changes) refresh — sketches (t-digest) can
    neither subtract a delete nor promise exactness."""
    from pyspark.sql.window import Window

    if not (isinstance(num, int) and isinstance(den, int) and
            0 < num <= den):
        raise ValueError(f"quantile {num}/{den} must satisfy 0 < num <= den")
    groups = (
        inner.groupBy(F.col("group.g").alias("group"))
        .agg(F.sum("n").cast("long").alias("n"))
    )
    vals = inner.filter(F.col("group.v").isNotNull()).select(
        F.col("group.g").alias("group"), F.col("group.v").alias("v"),
        F.col("n").alias("_cnt"),
    )
    cum = Window.partitionBy("group").orderBy("v")
    tot = Window.partitionBy("group")
    # rank = ceil(num/den * tot) in true 64-bit integer division (SQL
    # `div`), NOT double division cast to long — doubles lose integer
    # exactness once num * tot nears 2^53, breaking the bit-for-bit
    # promise. safe_rank_expr supplies the shared BIGINT-wrap
    # hardening (DECIMAL(38,0) product only past the provably-safe
    # per-group bound — the ~9.2e12-rows regime for p999999-style
    # rationals): ONE derivation of the bound for this path and
    # operators/sketches.histogram_quantiles both.
    hit = (
        vals.withColumn("_cum", F.sum("_cnt").over(cum))
        .withColumn("_tot", F.sum("_cnt").over(tot))
        .filter(F.col("_cum") >= safe_rank_expr(
            str(int(num)), int(den), "_tot", num_max=int(num)))
        .groupBy("group").agg(F.min("v").alias("q"))
    )
    g, h = groups.alias("g"), hit.alias("h")
    return (
        g.join(h, F.col("g.group").eqNullSafe(F.col("h.group")), "left")
        .select(F.col("g.group").alias("group"), F.col("g.n").alias("n"),
                F.col("h.q").alias("q"))
    )
