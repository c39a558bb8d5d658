"""As-of (point-in-time) join: for every left row, the most recent
right row with the same key at-or-before the left row's timestamp.

This is the temporal join Spark lacks as a built-in (pandas has
``merge_asof``; kdb/QuestDB have ``aj``). The naive formulation — a
range join ``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` plus a
max-per-left dedup — explodes quadratically per key (every left row
pairs with ALL earlier right rows before the dedup throws them away).

The implementation here is the union-window formulation instead:

1. tag right rows 0 and left rows 1, union them on (key, ts, tag),
2. one window partitioned by key ordered by (ts, tag, right-tiebreak)
   carries ``last_value(right_cols, ignoreNulls)`` forward,
3. keep the left rows.

Cost: ONE shuffle of |L| + |R| rows on the join key and a per-key sort
— the same price as the groupBy it replaces, with no intermediate
blow-up. Ties: a right row at exactly ts sorts BEFORE the left row
(tag 0 < 1), so "at-or-before" is inclusive; among right rows with
equal ts the highest tiebreak column wins deterministically.

Reference parity: part of this repo's training-data-pipeline extension
surface (the reference engine, deven96/ahnlich, has no joins at all —
SURVEY.md §2.5).

Scale notes (100 TB): the window is a single ROWS-frame running
last_value — Spark evaluates it in one pass per partition after the
sort, no buffering beyond the current row. Skewed keys (one user with
millions of events) serialize within the key under the plain
formulation; both joins take an OPT-IN time-slice decomposition
(``slice_us`` / ``sliced=True``) that re-keys the shuffle to
(key, time-slice) so a hot key spreads across slices — the windowed
analog of hot-key salting (per-key salting alone cannot split a
window, because the frame needs ordered continuity; slicing restores
it with per-slice carry-in seeds / duplicated boundary rows).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_count_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window_us: int,
    left_ts_us: str = "ts_us",
    right_ts_us: str = "ts_us",
    count_col: str = "n_right",
    sum_col: Optional[str] = None,
    sum_out: str = "sum_right",
    sliced: bool = False,
) -> DataFrame:
    """Interval (range) join as a windowed aggregation: every left row
    gains ``count_col`` = number of right rows with the same ``on`` key
    and ``right.ts in [left.ts - window_us, left.ts)`` — the strictly-
    preceding sliding window — plus optionally ``sum_out`` = SUM of
    ``sum_col`` over the same rows.

    The naive formulation ``l JOIN r ON key AND r.ts BETWEEN l.ts - w
    AND l.ts`` pairs every left row with every right row in the window
    BEFORE aggregating — O(|L| * window_density) intermediate rows, a
    blow-up Spark's join planner cannot prune. This implementation
    unions the two sides and computes a running RANGE-frame aggregate
    over integer epoch-microseconds instead:

    1. tag right rows 0 / left rows 1, union on (key, ts_us, tag),
    2. one window partitioned by key, ordered by ts_us, with frame
       ``RANGE BETWEEN window_us PRECEDING AND 1 PRECEDING`` summing a
       right-only indicator (and payload),
    3. keep the left rows.

    Cost: ONE shuffle of |L| + |R| rows on the key and a per-key sort —
    no intermediate pair table at any scale. The range frame is evaluated
    with two moving pointers per partition, O(n) per key.

    Frame semantics: bounds are value-inclusive, so ``[-window_us, -1]``
    over integer microseconds is exactly ``ts - w <= r.ts < ts``. Right
    rows at the same microsecond as the left row are NOT counted
    (strict past — no self-count when left and right are the same
    table/row).

    ``sliced=True`` (opt-in skew handling): shuffle on (key, time-slice
    of width window_us) instead of key alone — every right row is
    emitted into its own slice AND the next one, so each left row's
    window is fully contained in its slice partition (a row at most
    window_us in the past is in the same or the previous slice). A hot
    key then spreads across its time range instead of serializing one
    reducer. Costs 2x right rows; results are identical (pinned by
    tests/test_joins.py)."""
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts_us).cast("long").alias("__tus"),
        F.lit(1).cast("long").alias("__is_r"),
        (F.col(sum_col) if sum_col is not None else F.lit(0)).cast("double").alias("__pay"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("__left"),
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts_us).cast("long").alias("__tus"),
        F.lit(0).cast("long").alias("__is_r"),
        F.lit(0.0).alias("__pay"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    unioned = r.unionByName(l)
    if sliced:
        # slice width = window width: a counted right row is in the left
        # row's slice or the previous one; emitting each right row into
        # both makes every (key, slice) partition self-contained
        slc = F.floor(F.col("__tus") / F.lit(int(window_us)))
        rs = r.withColumn(
            "__slc", F.explode(F.array(slc.cast("long"), slc.cast("long") + 1))
        )
        ls = l.withColumn("__slc", slc.cast("long"))
        unioned = rs.unionByName(ls)
        part_cols = ["__key", "__slc"]
    else:
        part_cols = ["__key"]
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.asc("__tus"))
        .rangeBetween(-int(window_us), -1)
    )
    out = (
        unioned
        .withColumn("__n", F.coalesce(F.sum("__is_r").over(w), F.lit(0)))
        .withColumn("__s", F.coalesce(F.sum(F.col("__pay") * F.col("__is_r")).over(w), F.lit(0.0)))
        .filter(F.col("__left").isNotNull())
    )
    cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    cols.append(F.col("__n").alias(count_col))
    if sum_col is not None:
        cols.append(F.col("__s").alias(sum_out))
    return out.select(*cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[Sequence[str]] = None,
    tiebreak: Optional[str] = None,
    prefix: str = "asof_",
    slice_us: Optional[int] = None,
) -> DataFrame:
    """Left as-of join. Every left row gains ``prefix + c`` for each c in
    ``right_cols`` (and ``prefix + right_ts``), holding the values of
    the latest right row with the same ``on`` key and
    ``right.ts <= left.ts`` — NULL when no such row exists.

    ``tiebreak`` (a right column, e.g. an event id) makes "latest"
    deterministic among right rows sharing a timestamp: the greatest
    tiebreak value wins.

    ``slice_us`` (opt-in skew handling): decompose each key's timeline
    into slices of that many microseconds and shuffle on (key, slice),
    so one hot key no longer serializes a single reducer. The as-of
    lookback is unbounded, so slices are stitched with carry-in seeds:
    the latest right row of every PRECEDING slice is computed on a tiny
    per-(key, slice) summary table and joined back, and each slice's
    window runs locally seeded by it. Results are identical to the
    plain path (pinned by tests/test_joins.py)."""
    right_cols = [c for c in (right_cols or right.columns) if c not in (on, right_ts)]
    if tiebreak is not None and tiebreak not in right_cols:
        right_cols = right_cols + [tiebreak]

    # The carried payload: one struct so a single last_value() suffices
    # regardless of how many right columns ride along.
    payload = F.struct(
        F.col(right_ts).cast("timestamp").alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__tag"),
        (F.col(tiebreak) if tiebreak is not None else F.lit(0)).cast("long").alias("__tb"),
        payload.alias("__payload"),
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    r = r.withColumn("__left", F.lit(None).cast(l.schema["__left"].dataType))

    unioned = r.unionByName(l)
    if slice_us is None:
        w = (
            Window.partitionBy("__key")
            .orderBy(F.asc("__ts"), F.asc("__tag"), F.asc("__tb"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.withColumn(
            "__match", F.last("__payload", ignorenulls=True).over(w)
        ).filter(F.col("__tag") == 1)
    else:
        carried = _asof_sliced(unioned, int(slice_us))

    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"__match.__ts").alias(f"{prefix}{right_ts}"))
    out_cols.extend(
        F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols
    )
    return carried.select(*out_cols)


def _asof_sliced(unioned: DataFrame, slice_us: int) -> DataFrame:
    """Time-sliced as-of evaluation: the shuffle key becomes
    (key, slice), each slice's window runs locally, and cross-slice
    lookback is restored by seeding every slice with the latest right
    row of all preceding slices — computed on a per-(key, slice)
    summary table that has one row per NON-EMPTY slice, so the stitch
    costs nothing even for a key with millions of rows."""
    u = unioned.withColumn(
        "__slc", F.floor(F.unix_micros(F.col("__ts")) / F.lit(slice_us)).cast("long")
    )
    w = (
        Window.partitionBy("__key", "__slc")
        .orderBy(F.asc("__ts"), F.asc("__tag"), F.asc("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__within", F.last("__payload", ignorenulls=True).over(w))
    # struct max = (ts, tiebreak)-greatest right row, matching the
    # window's (ts asc, tb asc, last-wins) semantics
    summary = (
        u.filter(F.col("__tag") == 0)
        .groupBy("__key", "__slc")
        .agg(F.max(F.struct(F.col("__ts"), F.col("__tb"), F.col("__payload"))).alias("__m"))
    )
    slices = u.select("__key", "__slc").distinct()
    wseed = (
        Window.partitionBy("__key")
        .orderBy(F.asc("__slc"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = (
        slices.join(summary, ["__key", "__slc"], "left")
        .withColumn("__seed", F.max("__m").over(wseed))
        .select("__key", "__slc", F.col("__seed.__payload").alias("__seedp"))
    )
    return (
        u.join(seeds, ["__key", "__slc"])
        .withColumn("__match", F.coalesce(F.col("__within"), F.col("__seedp")))
        .filter(F.col("__tag") == 1)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_source: Optional[str] = None,
) -> DataFrame:
    """Skew-safe equi-join: a hot key on the LEFT (one user with
    millions of events, one boilerplate fingerprint) lands every one of
    its rows in a single reducer under plain hash partitioning — the
    straggler that decides the stage's wall time at 100 TB. Salting
    splits each key across ``n_salts`` reducers: left rows get
    ``salt = hash(row) % n_salts``; the right side is replicated once
    per salt (an n_salts-way explode of the SMALL side only); the join
    key becomes (key, salt). For the supported join types (inner, left,
    left_semi, left_anti) results are identical to the plain join —
    salting only changes row routing. Right/full outer joins would emit
    every unmatched right row once per salt, so they are rejected.

    Use when the right side is per-key small but too big (or too
    dynamic) to broadcast, and AQE's skew splitting can't kick in
    (e.g. the skew is in a single in-memory stage, or the join feeds a
    window that must see the key co-located anyway). For broadcast-able
    right sides, ``F.broadcast`` is strictly better — no shuffle at
    all.

    ``salt_source`` names a left column to derive the salt from
    (deterministic routing); default derives it from the whole row's
    partition-local order, which is free and routing-only."""
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti joins, got "
            f"{how!r}: replicating the right side per salt would duplicate "
            f"unmatched right rows under right/full outer semantics"
        )
    if salt_source is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    l = left.withColumn("__salt", salt.cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    out = l.join(r, [on, "__salt"], how)
    return out.drop("__salt")


def range_lookup_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    granularity: int = None,
    how: str = "inner",
) -> DataFrame:
    """Map each fact row's integer value into the band whose
    ``[lo, hi)`` range contains it — the IP-geolocation / price-band /
    latency-bucket lookup shape.

    The naive formulation is a non-equi theta join: Spark plans it as a
    BroadcastNestedLoopJoin that evaluates EVERY band predicate per fact
    row — O(|bands|) work per row, ruinous when the band table has
    thousands of entries. This operator decomposes ranges onto a bucket
    grid instead: each band replicates to every ``granularity``-sized
    bucket it overlaps, facts compute their bucket scan-locally, and the
    join becomes a broadcast HASH join on the bucket key with a residual
    range predicate — O(bands-per-bucket) ~ O(1) per row, zero shuffle
    of the fact side, whatever the band count.

    ``granularity`` defaults to the smallest band width (one tiny
    aggregation job on the band side — the metadata a real pipeline
    would cache with the band table). Values and bounds must be
    integral (use scaled-integer money/time like the rest of this
    repo). ``how`` = "inner" or "left" (keep unmatched facts with NULL
    band columns). Bands are expected non-overlapping; if they overlap,
    a fact joins every band that contains it.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if granularity is None:
        row = bands.select(
            F.min(F.col(hi_col) - F.col(lo_col)).alias("g")
        ).collect()[0]
        granularity = max(int(row["g"] or 1), 1)
    g = int(granularity)
    if g < 1:
        raise ValueError("granularity must be >= 1")
    # exact integer floor division: (c - pmod(c, g)) is a multiple of g,
    # so truncating `div` equals floor(c / g) for NEGATIVE values too.
    # F.floor(col / g) would round-trip through double and misbucket
    # 64-bit values at or above 2^53 — silently dropping them from the
    # hash join before the residual predicate could catch it.
    def _fdiv(c):
        c = F.col(c) if isinstance(c, str) else c
        c = c.cast("long")
        num = c - F.pmod(c, F.lit(g))  # exact multiple of g -> div == floor
        return F.call_function("div", num, F.lit(g))

    b = bands.withColumn(
        "_bk",
        F.explode(
            F.sequence(_fdiv(lo_col), _fdiv(F.col(hi_col) - 1))
        ),
    )
    f = facts.withColumn("_bk", _fdiv(value_col))
    cond = (
        (f["_bk"] == b["_bk"])
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) < F.col(hi_col))
    )
    return f.join(F.broadcast(b), cond, how).drop("_bk")


def rolling_window_features(
    df: DataFrame,
    key_col: str,
    time_col: str,
    window_us: int,
    sum_col: str = None,
    count_out: str = "n_window",
    sum_out: str = "sum_window",
) -> DataFrame:
    """Per-row trailing-window features: for every event, the count (and
    optional sum) of the SAME key's events in ``[t - window_us, t]`` —
    the fraud/abuse/engagement feature-engineering shape ("events by
    this user in the last 24 h").

    One RANGE-frame window over integer epoch-micros = ONE shuffle on
    the key, no self-join, no pair table (the naive formulation is the
    O(rows x window-occupancy) range self-join). Frame bounds are
    inclusive at both ends and tie rows (equal timestamps) are frame
    peers — semantics identical to SQL ``RANGE BETWEEN w PRECEDING AND
    CURRENT ROW``, so any engine replays it."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(time_col).cast("long"))
        .rangeBetween(-int(window_us), 0)
    )
    out = df.withColumn(count_out, F.count(F.lit(1)).over(w).cast("long"))
    if sum_col is not None:
        out = out.withColumn(
            sum_out, F.coalesce(F.sum(sum_col).over(w), F.lit(0)).cast("long")
        )
    return out


def skew_profile(
    df: DataFrame,
    key_col: str,
    target_rows_per_task: int,
    k: int = 20,
    capacity: int = 4096,
) -> DataFrame:
    """Join-key skew advisor: the keys hot enough to need salting, with
    the salt factor that brings each one under
    ``target_rows_per_task`` — the measurement step BEFORE reaching for
    ``salted_join`` (salting every key taxes the 99% that don't need
    it; salting none lets one celebrity key own a task for hours).

    Returns (key, cnt, n_salts): the top-``k`` keys by count (ties by
    key string ascending) whose count exceeds the target;
    ``n_salts`` = ceil(cnt / target) in exact integer math. Feed
    ``n_salts``'s max into ``salted_join``, or use the key list for
    per-key slicing.

    Scale shape: counts come from the Misra-Gries two-pass
    (``sketches.heavy_hitters``) — O(capacity) memory per partition,
    candidate-only exact counting, NO vocabulary shuffle; the head of
    the key distribution is exactly what the MG summary preserves.
    ``verify=False`` because an advisor wants the head even when
    rank-k exactness can't be certified."""
    from ahnlich_spark.operators.sketches import heavy_hitters

    t = int(target_rows_per_task)
    if t < 1:
        raise ValueError("target_rows_per_task must be >= 1")
    hh = heavy_hitters(df, key_col, k=k, capacity=capacity, verify=False)
    return (
        hh.filter(F.col("cnt") > t)
        .select(
            F.col("value").alias("key"),
            F.col("cnt").cast("long").alias("cnt"),
            F.call_function(
                "div", F.col("cnt") + F.lit(t - 1), F.lit(t)
            ).cast("long").alias("n_salts"),
        )
    )
