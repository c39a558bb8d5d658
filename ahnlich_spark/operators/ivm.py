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
    ch = engine.store_changes(
        store, from_version=from_version, from_segments=from_segments,
        to_version=to_version, to_segments=to_segments, schema=schema,
    )
    upd_pre = engine.store_df(
        store, schema=schema, version=from_version, segments=from_segments
    ).join(
        ch.filter(F.col("change_type") == "update").select("id"),
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
    return (
        neg.unionByName(pos)
        .groupBy(group_expr.alias("group"))
        .agg(
            F.sum("_w").cast("long").alias("dn"),
            *[
                F.sum(F.col("_w") * F.coalesce(expr, F.lit(0)))
                .cast("long").alias(f"d_{name}")
                for name, expr in measures.items()
            ],
        )
    )


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
        ch.filter(F.col("change_type") == "update").select("id"),
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
