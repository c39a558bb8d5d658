"""Bounded-memory frequency sketches: mergeable Misra-Gries heavy
hitters with an exact verification pass.

A 100 TB corpus cannot afford ``GROUP BY term`` over its full token
stream when only the frequency head is wanted: the shuffle carries the
entire vocabulary (URLs, hashes, typos — billions of singleton keys)
just to throw it away at the final top-k. The classic fix is a two-pass
*candidates → exact counts* plan built on the Misra-Gries (MG) summary
[Misra & Gries 1982; mergeable form: Agarwal et al., PODS 2012]:

pass 1 (candidates)
    Each input partition streams its values through an MG summary of
    ``capacity`` counters (``mapInPandas``; O(capacity) memory per
    partition, never O(distinct)). MG invariant: any value whose count
    within a partition exceeds ``n_p / (capacity+1)`` survives that
    partition's summary. Pigeonhole across partitions: any value with
    GLOBAL count > ``N / (capacity+1)`` must exceed the local threshold
    somewhere, so the union of partition summaries is a superset of
    every global heavy hitter.

pass 2 (exact)
    One aggregation counts ONLY the candidate values: the token stream
    is semi-joined against the (broadcast) candidate set before the
    groupBy, so the shuffle carries at most ``capacity × partitions``
    distinct keys instead of the vocabulary. Counts are exact, not
    estimates — MG's undercounting never reaches the output.

exactness certificate
    The k-th exact candidate count is compared against the global
    non-candidate ceiling ``N / (capacity+1)``: strictly above it, no
    non-candidate can displace (or tie into) the returned top-k, so the
    result provably equals the full ``GROUP BY``'s top-k. ``verify=True``
    turns a failed certificate into an error instead of a silent
    approximation.

Reference parity: part of this repo's training-data-pipeline extension
surface (the reference engine, deven96/ahnlich, stops at store/query
primitives); the vocabulary twin ``operators/textstats.vocab_table``
is the exhaustive-shuffle formulation this sketch replaces at scale.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ahnlich_spark.functions import local_rows_df

from ahnlich_spark.functions.intmath import safe_rank_expr

__all__ = [
    "mg_summary_merge",
    "heavy_hitter_candidates",
    "heavy_hitters",
    "certified_topk",
    "kmv_distinct",
    "kmv_minima",
    "kmv_hash",
    "kmv_estimate",
    "KMV_HASH_BITS",
    "histogram_summary",
    "histogram_quantiles",
    "cms_table",
    "cms_estimate",
    "cms_join_size",
    "bloom_bit_exprs",
    "bloom_build",
    "bloom_probe",
    "hll_registers",
    "hll_estimate",
    "hll_distinct",
    "merge_summaries",
    "kmv_set_ops",
    "kmv_pair_set_ops",
]

# 44-bit hash space: (k-1) << 44 stays far inside BIGINT for any sane k,
# so the estimator is pure integer math on BOTH engines (no HUGEINT, no
# float). 2^44 ~ 1.8e13 hash slots — collision-negligible for the
# sketch sizes a cardinality estimate tolerates anyway.
KMV_HASH_BITS = 44


def mg_summary_merge(counter: dict, batch_counts, capacity: int) -> dict:
    """Fold ``batch_counts`` (an iterable of (value, count)) into an MG
    summary of at most ``capacity`` counters. This is the *mergeable
    summaries* formulation (Agarwal et al. 2012): add the incoming
    counts, then if more than ``capacity`` counters remain, subtract the
    (capacity+1)-th largest count from every counter and drop the
    non-positive ones. Each reduction subtracts equally from all
    counters, so the undercount of any value after folding n items
    total is at most n/(capacity+1) — the survival guarantee in the
    module docstring follows."""
    for v, c in batch_counts:
        counter[v] = counter.get(v, 0) + int(c)
    if len(counter) > capacity:
        cut = sorted(counter.values(), reverse=True)[capacity]
        counter = {v: c - cut for v, c in counter.items() if c > cut}
    return counter


def heavy_hitter_candidates(
    df: DataFrame, value_col: str, capacity: int = 4096
) -> DataFrame:
    """Pass 1: per-partition MG summaries. Returns (value, mg_est,
    part_rows) — one row per surviving counter plus the partition's own
    row total folded onto its first summary row (part_rows is summed
    downstream to recover N without a second scan of the input).

    Scale shape: a single ``mapInPandas`` over the input's NATURAL
    partitioning — no shuffle, no repartition — emitting at most
    ``capacity`` rows per partition whatever the partition holds."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    cap = int(capacity)

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counter: dict = {}
        n_rows = 0
        pruned = False
        for pdf in batches:
            col = pdf[value_col].dropna()
            n_rows += len(col)
            # vectorized pre-aggregation: value_counts collapses the
            # batch before the per-value Python loop, so the loop runs
            # over the batch's DISTINCT values only
            vc = col.value_counts()
            before = len(set(counter).union(vc.index))
            counter = mg_summary_merge(counter, vc.items(), cap)
            # a reduction step can only SHRINK the union of supports:
            # if it never fires, the summary holds every distinct value
            pruned = pruned or len(counter) < before
        if not counter:
            if n_rows:  # all-null partition still contributes to N
                yield pd.DataFrame(
                    {"value": pd.Series([None], dtype=object),
                     "mg_est": [0], "part_rows": [n_rows],
                     "pruned": [pruned]}
                )
            return
        vals = list(counter)
        yield pd.DataFrame(
            {
                "value": vals,
                "mg_est": [counter[v] for v in vals],
                "part_rows": [n_rows] + [0] * (len(vals) - 1),
                "pruned": [pruned] + [False] * (len(vals) - 1),
            }
        )

    src = df.select(F.col(value_col).cast("string").alias(value_col))
    return src.mapInPandas(
        summarize, schema="value string, mg_est long, part_rows long, pruned boolean"
    )


def merge_summaries(summaries: DataFrame, capacity: int, fan_in: int = 256) -> DataFrame:
    """Tree-merge per-partition MG summaries down to ONE summary of at
    most ``capacity`` counters. Mergeability (Agarwal et al. 2012) is
    exact: merging two capacity-c summaries and re-reducing to c keeps
    the global guarantee (count > N/(c+1) -> survives), so the merged
    support is a valid — and always-broadcastable — candidate set.

    Scale shape: with p input partitions the raw candidate union is
    O(capacity * p) rows, which at 100k-partition scale outgrows a
    broadcast. Two rounds of grouped pandas merges (fan_in groups, then
    one) bound every task at O(capacity * fan_in) rows and return a
    frame of <= capacity candidates, independent of p."""
    cap = int(capacity)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counter: dict = {}
        pruned = False
        for pdf in batches:
            pruned = pruned or bool(pdf["pruned"].any())
            live = pdf[pdf["value"].notna()]
            before = len(set(counter).union(live["value"]))
            counter = mg_summary_merge(
                counter, zip(live["value"], live["mg_est"]), cap
            )
            pruned = pruned or len(counter) < before
        if counter:
            vals = list(counter)
            yield pd.DataFrame(
                {
                    "value": vals,
                    "mg_est": [counter[v] for v in vals],
                    "pruned": [pruned] + [False] * (len(vals) - 1),
                }
            )
        elif pruned:
            yield pd.DataFrame(
                {"value": pd.Series([None], dtype=object),
                 "mg_est": [0], "pruned": [True]}
            )

    out_schema = "value string, mg_est long, pruned boolean"
    lvl1 = (
        summaries.select("value", "mg_est", "pruned")
        .repartition(int(fan_in), F.crc32(F.col("value")))
        .mapInPandas(fold, schema=out_schema)
    )
    # second round: every per-group summary collapses into one summary.
    # The fan-in round partitions by VALUE hash, so each value's
    # counters all meet in one group and estimates stay additive. The
    # survival guarantee holds across the whole merge DAG by the
    # standard potential argument: every reduction step subtracts its
    # cut from > capacity counters, consuming > cut*(capacity+1) of the
    # stream's total mass N, so the summed undercount of ANY value is
    # <= N/(capacity+1) no matter how many rounds fire. The ``pruned``
    # flag ORs across partitions AND merge rounds, so the caller's
    # no-pruning-anywhere shortcut stays sound.
    return lvl1.coalesce(1).mapInPandas(fold, schema=out_schema)


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 50,
    capacity: int = 4096,
    verify: bool = True,
    max_broadcast_candidates: int = 4_000_000,
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``df[value_col]`` without
    a full-vocabulary shuffle: MG candidates (pass 1), exact counts of
    candidates only (pass 2), certificate that the k-th count clears
    the non-candidate ceiling N/(capacity+1).

    Returns (value, cnt) with cnt the EXACT global count, ordered
    cnt desc, value asc — identical to the exhaustive
    ``GROUP BY value ORDER BY count(*) DESC, value LIMIT k`` whenever
    the certificate holds. With ``verify=True`` (default) a failed
    certificate raises ValueError naming the capacity that would have
    sufficed, rather than returning a silently unproven head.

    The k result rows (plus two scalars) are the only driver-side
    materialization; the candidate set itself stays distributed and is
    broadcast by Spark into the semi-join. The raw candidate union is
    O(capacity × partitions); past ``max_broadcast_candidates`` it is
    first tree-merged (``merge_summaries``) into a single ≤ capacity
    summary — always broadcastable, same N/(capacity+1) guarantee —
    before the semi-join."""
    summaries = heavy_hitter_candidates(df, value_col, capacity)
    # cache: pass 2 reads the candidate values, the certificate reads N
    summaries = summaries.localCheckpoint(eager=False)
    n_parts = df.rdd.getNumPartitions()
    merged = None
    if int(capacity) * max(1, n_parts) > int(max_broadcast_candidates):
        merged = merge_summaries(summaries, capacity).localCheckpoint(eager=False)
        cand = merged.filter(F.col("value").isNotNull()).select("value")
    else:
        cand = summaries.filter(F.col("value").isNotNull()).select("value").distinct()
    if verify:
        stats = summaries.agg(
            F.sum("part_rows").alias("n"), F.max("pruned").alias("pruned")
        ).first()
        total = stats["n"] or 0
        any_pruned = bool(stats["pruned"])
        if merged is not None:
            any_pruned = any_pruned or bool(
                merged.agg(F.max("pruned")).first()[0]
            )
    else:
        total, any_pruned = 0, True
    return certified_topk(
        df, value_col, cand, k, capacity, total, any_pruned, verify
    )


def certified_topk(
    df: DataFrame,
    value_col: str,
    cand: DataFrame,
    k: int,
    capacity: int,
    total: int,
    any_pruned: bool,
    verify: bool,
) -> DataFrame:
    """Pass 2 + certificate, shared by batch ``heavy_hitters`` and the
    streaming fold: exact counts of ONLY the candidate values (one
    semi-joined aggregation — the shuffle carries candidates, never the
    vocabulary), top-k by (cnt desc, value asc), then the exactness
    certificate against the non-candidate ceiling N/(capacity+1)."""
    src = df.select(F.col(value_col).cast("string").alias("value"))
    exact = (
        src.join(F.broadcast(cand), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    top = exact.orderBy(F.desc("cnt"), F.asc("value")).limit(int(k))
    if not verify:
        return top
    rows = top.collect()
    # no partition ever reduced its summary -> candidates == all distinct
    # values and the top-k is unconditionally the exhaustive answer;
    # otherwise the k-th count must strictly clear the ceiling
    # N/(capacity+1) (a tie at the ceiling could let an unseen value
    # share rank k), and a short result (< k rows) cannot be certified
    # at all — any pruned-away singleton would deserve one of the empty
    # slots. The comparison is the exact integer cross-multiplication
    # cnt*(capacity+1) > N — a float quotient would round past 2^53 and
    # could certify a top-k an uncounted non-candidate ties.
    certified = not any_pruned or (
        len(rows) == int(k)
        and int(rows[-1]["cnt"]) * (int(capacity) + 1) > int(total)
    )
    if not certified:
        ceiling = total / (capacity + 1)
        worst = float(rows[-1]["cnt"]) if rows else 1.0
        need = int(total // worst) + 1
        raise ValueError(
            f"heavy_hitters: cannot certify exactness — rank-{len(rows)} "
            f"count {worst:.0f} does not clear the non-candidate ceiling "
            f"N/(capacity+1) = {ceiling:.1f}; retry with capacity >= {need}"
        )
    spark = df.sparkSession
    return spark.createDataFrame(rows, schema=top.schema)


def kmv_minima(hashes: DataFrame, group_cols, k: int, n_salts: int = 64) -> DataFrame:
    """Each group's k smallest distinct ``_h`` values — the sketch STATE.
    This is what a pipeline persists per slice: minima tables of
    disjoint slices union (then re-take k) into the whole-corpus sketch
    without rescanning values. Two window levels keep every task
    bounded: per (group, _h % n_salts) first — no single task ever
    sorts a whole group's distinct set — then per group over the
    surviving <= n_salts * k rows.

    Input rows are deduplicated on (group, _h) first: minima tables of
    two ROW-disjoint slices still share hashes for values that occur in
    both (e.g. a common shingle), and keeping the duplicate through the
    row_number windows would shrink the k-th minimum and inflate the
    estimate. The dedup rides the SAME window spec as the salt-level
    top-k (equal hashes share a salt and sort adjacent, so a lag
    compare drops them) — truly no extra exchange, where a distinct()
    would shuffle on (group, _h) and then exchange AGAIN for the
    (group, salt) window."""
    group_cols = list(group_cols)
    w_salt = Window.partitionBy(*group_cols, F.col("_h") % n_salts).orderBy("_h")
    local = (
        hashes
        .withColumn("_prev", F.lag("_h").over(w_salt))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("_h")))
        .drop("_prev")
        .withColumn("_rn", F.row_number().over(w_salt))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    w_grp = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        local.withColumn("_rn", F.row_number().over(w_grp))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols,
    k: int = 64,
    n_salts: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimation via the KMV (k minimum
    values) sketch [Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007]:
    hash every value into a 44-bit space, keep each group's k SMALLEST
    distinct hashes, and estimate |distinct| from the k-th minimum —
    ``(k-1) * 2^44 div h_k``. Groups with fewer than k distinct values
    return their EXACT count (the sketch saw everything).

    Deterministic by construction — the hash is md5-derived, the k
    minima are order statistics, and the estimator is integer floor
    division — so two engines (or two cluster runs) agree bit-for-bit,
    unlike HyperLogLog implementations. Standard error is ~1/sqrt(k-2)
    (~13% at k=64, ~4% at k=512).

    Scale shape: ONE distinct-aggregation on (group, hash) with map-side
    partial dedup carries 8-byte hashes, never values; the k-minima are
    taken in two window levels — per (group, hash % n_salts) first, so
    no single task ever sorts a whole group's distinct set, then per
    group over the surviving <= n_salts * k rows. Unlike
    ``count(DISTINCT)`` the final state per group is O(k), and sketches
    of disjoint slices MERGE (union the minima, re-take k) — the
    incremental/streaming property exact counting lacks.

    Returns (group_cols..., n_sketch, kth_min, est_distinct).
    """
    group_cols = list(group_cols)
    dist = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, kmv_hash(F.col(value_col)).alias("_h")
    )
    # kmv_minima dedupes (group, _h) — the ONE distinct aggregation
    return kmv_estimate(kmv_minima(dist, group_cols, k, n_salts), group_cols, k)


def kmv_hash(c) -> "F.Column":
    """The sketch's 44-bit md5-derived value hash — exposed so batch
    and streaming producers hash identically."""
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 11), 16, 10).cast("long")


def kmv_estimate(minima: DataFrame, group_cols, k: int) -> DataFrame:
    """Estimates from a k-minima table (``kmv_minima`` output or any
    fold of slice minima): (group..., n_sketch, kth_min, est_distinct).
    Groups whose sketch never filled (n_sketch < k) report their EXACT
    distinct count."""
    group_cols = list(group_cols)
    two_b = 1 << KMV_HASH_BITS
    return minima.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_sketch"),
        F.max("_h").cast("long").alias("kth_min"),
    ).select(
        *group_cols,
        "n_sketch",
        "kth_min",
        F.when(F.col("n_sketch") < k, F.col("n_sketch"))
        .otherwise(F.expr(f"CAST({k - 1} AS BIGINT) * {two_b} div kth_min"))
        .cast("long")
        .alias("est_distinct"),
    )


# ------------------------------------------------------------------
# Mergeable histogram quantile sketch
# ------------------------------------------------------------------

def _bin_of(c, width: int):
    """Exact integer floor division of a BIGINT column by ``width`` —
    never routed through double (2^53 rounding) and floor (not
    truncate-toward-zero) for negative values."""
    c = (F.col(c) if isinstance(c, str) else c).cast("long")
    num = c - F.pmod(c, F.lit(int(width)))
    return F.call_function("div", num, F.lit(int(width)))


def histogram_summary(
    df: DataFrame,
    value_col: str,
    group_cols,
    bin_width: int,
) -> DataFrame:
    """Per-group fixed-grid histogram — the mergeable STATE of the
    quantile sketch: (group..., bin, cnt) where ``bin`` =
    floor(value / bin_width) in exact integer math. Values must be
    integral (use the repo's scaled-integer discipline, e.g. cents).

    Merge rule: summaries of arbitrary (even overlapping-in-value)
    slices UNION then re-sum per (group, bin) — counts are additive, so
    the merged summary equals the summary of the concatenated data.
    That is what ``count(DISTINCT)``-style exact quantiles lack: the
    state per group is O(value_range / bin_width), independent of row
    count, and a streaming pipeline can fold each batch's summary into
    a running one.

    Scale shape: ONE groupBy with map-side partial aggregation; the
    shuffle carries (group, bin) keys — bounded by the grid, not the
    data. NULL values are excluded (SQL aggregate semantics).
    """
    group_cols = list(group_cols)
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, _bin_of(value_col, bin_width).alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_quantiles(
    summary: DataFrame,
    qs,
    group_cols,
    bin_width: int,
) -> DataFrame:
    """Quantile estimates from a ``histogram_summary`` (or any union of
    summaries — pass the union straight in; bins are re-summed here).
    For each group and each q the q-quantile's bin is the FIRST bin (in
    ascending order) whose running count reaches ``ceil(q * n)`` — the
    rank-based lower quantile, exactly SQL's
    ``min(v) over the rows with cume_dist >= q`` on binned data.

    Returns (group..., q_e6, n, bin, lo, hi): the true q-quantile of
    the sketched data lies in ``[lo, hi)`` = [bin*w, (bin+1)*w) — a
    guaranteed error bound of one ``bin_width``, deterministic (pure
    integer arithmetic: rank = ceil-division on e6-scaled q), and
    bit-identical across engines — unlike t-digest/GK implementations
    whose estimates depend on merge order.

    Scale shape: the summary is tiny (grid-bounded), so the cumulative
    window and the q cross-join are metadata-scale work whatever the
    original row count.
    """
    group_cols = list(group_cols)
    w = int(bin_width)
    agg = summary.groupBy(*group_cols, "bin").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    win = Window.partitionBy(*group_cols).orderBy("bin")
    cum = agg.withColumn("cum", F.sum("cnt").over(win)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*group_cols))
    )
    q_rows = [(int(round(q * 1_000_000)),) for q in qs]
    spark = summary.sparkSession
    # one slice: a handful of quantile points, not #cores slices
    q_df = local_rows_df(spark, q_rows, "q_e6 long")
    # rank = ceil(q_e6 * n / 1e6), clamped to >= 1 (q=0 -> first row).
    # safe_rank_expr supplies the shared BIGINT-wrap hardening: exact
    # 64-bit integer path whenever the product provably fits, else the
    # DECIMAL(38,0) slow path (groups past ~9.2e12 rows — a 100 TB
    # token corpus exceeds it; with ANSI off the wrap would silently
    # pin every quantile to the group's first bin). q_e6 <= 1e6 is the
    # static numerator bound. The rank itself is <= n and casts back
    # safely on both branches.
    rank = F.greatest(
        F.lit(1).cast("long"),
        safe_rank_expr("q_e6", 1_000_000, "n", num_max=1_000_000),
    )
    hit = cum.crossJoin(F.broadcast(q_df)).filter(F.col("cum") >= rank)
    return (
        hit.groupBy(*group_cols, "q_e6")
        .agg(F.min("bin").alias("bin"), F.max("n").alias("n"))
        .select(
            *group_cols,
            "q_e6",
            "n",
            F.col("bin").cast("long").alias("bin"),
            (F.col("bin") * w).cast("long").alias("lo"),
            ((F.col("bin") + 1) * w).cast("long").alias("hi"),
        )
    )


# ------------------------------------------------------------------
# Count-Min sketch
# ------------------------------------------------------------------

def _cms_bucket(c, row: int, width: int):
    """Row-salted md5 bucket for the CM sketch — 60-bit positive hash
    mod width, deterministic and replayable in any SQL engine."""
    c = F.col(c) if isinstance(c, str) else c
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}|"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (h % int(width)).cast("long")


def cms_table(
    df: DataFrame,
    value_col: str,
    group_cols=(),
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch [Cormode & Muthukrishnan 2005] of a value
    stream: ``depth`` hash rows of ``width`` counters each — the
    bounded-state structure answering "how often did THIS key occur?"
    for ARBITRARY keys, where Misra-Gries only answers for the head.
    The pipeline uses: estimate join-key frequencies before choosing a
    salting strategy, rate-limit crawl domains, spot stuffed n-grams —
    all without ever shuffling the key vocabulary.

    Returns (group..., row, bucket, cnt) — at most depth x width rows
    per group whatever the stream length. Merge rule: sketches of any
    slices union then re-sum per (group, row, bucket); counts are
    additive, so the merged sketch equals the sketch of the
    concatenated stream (streaming-foldable like the KMV/histogram
    sketches here).

    Scale shape: ONE aggregation; the depth-way explode happens
    scan-locally and map-side combine collapses each partition's
    contribution to <= depth x width rows before the shuffle, whose key
    space is the fixed grid, never the vocabulary. Deterministic:
    row-salted md5 buckets — two engines build identical tables.
    """
    group_cols = list(group_cols)
    rows = F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("row"),
                _cms_bucket(value_col, r, width).alias("bucket"),
            )
            for r in range(int(depth))
        ]
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, F.explode(rows).alias("_rb"))
        .select(*group_cols, F.col("_rb.row").alias("row"), F.col("_rb.bucket").alias("bucket"))
        .groupBy(*group_cols, "row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    group_cols=(),
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``probes`` rows from a
    ``cms_table`` (or any union of them — re-summed here): the minimum
    of the key's ``depth`` bucket counters. Classic CM guarantee:
    NEVER an underestimate; overestimate bounded by collisions
    (<= e/width x stream length with probability 1 - e^-depth per
    probe). Returns (group..., value, est).

    Scale shape: the probe side replicates depth-fold scan-locally and
    joins the grid-bounded sketch on (group, row, bucket) — Spark
    broadcasts whichever side is small; nothing touches the original
    stream."""
    group_cols = list(group_cols)
    agg = sketch.groupBy(*group_cols, "row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("row"),
                _cms_bucket(value_col, r, width).alias("bucket"),
            )
            for r in range(int(depth))
        ]
    )
    p = (
        probes.filter(F.col(value_col).isNotNull())
        .select(*group_cols, F.col(value_col).alias("value"), F.explode(rows).alias("_rb"))
        .select(
            *group_cols,
            "value",
            F.col("_rb.row").alias("row"),
            F.col("_rb.bucket").alias("bucket"),
        )
    )
    joined = p.join(agg, group_cols + ["row", "bucket"], "left")
    return joined.groupBy(*group_cols, "value").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est")
    )


def cms_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    group_cols=(),
) -> DataFrame:
    """Equi-join cardinality estimate from two Count-Min sketches built
    on the join keys (the classic CM inner product [Cormode &
    Muthukrishnan 2005 §4.2]): per hash row, sum over buckets of
    cnt_a x cnt_b; the estimate is the MINIMUM across rows. Never an
    underestimate — colliding keys only add — so it is a safe upper
    bound for join planning (pick broadcast vs shuffle vs salting
    BEFORE paying for the join; the sketches cost one scan each and
    are reusable/mergeable).

    Returns (group..., est_join_rows). Work is O(depth x width) per
    group — metadata-scale, independent of either table."""
    group_cols = list(group_cols)

    def _agg(s, out):
        return s.groupBy(*group_cols, "row", "bucket").agg(
            F.sum("cnt").cast("long").alias(out)
        )

    a = _agg(sketch_a, "ca")
    b = _agg(sketch_b, "cb")
    overlap = (
        a.join(b, group_cols + ["row", "bucket"])
        .groupBy(*group_cols, "row")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("ip"))
    )
    # a (group, row) pair whose buckets are fully DISJOINT between the
    # two sketches has inner product 0 — it must participate in the min
    # (it PROVES the join is empty), not vanish from the inner join;
    # the grid below restores those rows for every group present in
    # both sketches (each sketch populates all its depth rows for any
    # group it saw, so the distinct projections are the full grid)
    grid = (
        a.select(*group_cols, "row").distinct()
        .join(b.select(*group_cols, "row").distinct(),
              group_cols + ["row"])
    )
    per_row = grid.join(overlap, group_cols + ["row"], "left").select(
        *group_cols, "row", F.coalesce(F.col("ip"), F.lit(0)).alias("ip")
    )
    return per_row.groupBy(*group_cols).agg(
        F.min("ip").cast("long").alias("est_join_rows")
    )


# ------------------------------------------------------------------
# HyperLogLog with exact-integer register math
# ------------------------------------------------------------------

# 60-bit md5-derived hash; after the bucket index is peeled off, the
# remaining geometric bits bound rho, and every 2^-rho harmonic term is
# kept as the exact BIGINT 2^(S - rho), S = _hll_scale_bits(m) (53 for
# m <= 512, shrinking with m so the sum fits int64) — the harmonic sum
# is INTEGER, so two engines agree bit-for-bit on the sketch state AND
# on the estimate (the one float op left is a single division by that
# integer, identical doubles in, identical double out). This is the
# determinism discipline that stock HLL implementations (engine-native
# hash, float accumulation) lack — same reasoning as ``kmv_distinct``.
HLL_HASH_BITS = 60
HLL_SCALE_BITS = 53


def _hll_scale_bits(m: int) -> int:
    """Per-m scale exponent S: harmonic terms are 2^(S-r), empty
    buckets 2^S, so the worst-case sum is < m * 2^S. Capping S at
    62 - log2(m) keeps that below 2^62 for ANY power-of-two m — with
    ANSI off Spark wraps BIGINT silently, so an m >= 2048 at a fixed
    S=53 would overflow into garbage/negative estimates. For
    256 <= m <= 512 this returns the historic 53, keeping existing
    sketch gates bit-identical. The FLOOR is rho_max: the g == 0
    sentinel register holds rho = HLL_HASH_BITS - log2(m) + 2, and a
    scale below it makes shiftleft(1, scale - rho) a negative shift —
    Java masks it to 63 and the term wraps to Long.MIN_VALUE (m = 128
    hit exactly this: rho_max 54 > the flat 53). Raising the scale
    multiplies numerator and denominator by the same power of two, so
    estimates for every already-working m are unchanged."""
    rho_max = HLL_HASH_BITS - m.bit_length() + 2
    return max(min(HLL_SCALE_BITS, 62 - (m.bit_length() - 1)), rho_max)


def _hll_alpha_m2_scaled(m: int) -> float:
    # alpha_m * m^2 * 2^S(m) (Flajolet et al. 2007, m >= 128)
    return (0.7213 / (1.0 + 1.079 / m)) * m * m * float(1 << _hll_scale_bits(m))


def hll_registers(
    df: DataFrame, value_col: str, group_cols, m: int = 256
) -> DataFrame:
    """Per-group HLL register table (group..., bucket, r) — the sketch
    STATE a pipeline persists per slice. ``r`` is the max rho (1 +
    number of trailing zero bits of the post-bucket hash) seen in the
    bucket; slices MERGE by unioning register tables and re-taking
    ``groupBy(group, bucket).max(r)`` — no rescan, and the merge is the
    same aggregation shape as the build (a streaming aggregation can
    maintain it incrementally).

    Scale shape: ONE aggregation keyed on (group, bucket) with map-side
    combine — at most ``m`` rows of state per group ever cross the
    shuffle, never the value stream. rho is computed JVM-side from the
    lowest set bit (``length(bin(g & -g))`` — exact, no float log)."""
    if m < 128 or (m & (m - 1)) != 0:
        raise ValueError("m must be a power of two >= 128")
    group_cols = list(group_cols)
    rho_max = HLL_HASH_BITS - m.bit_length() + 2  # g == 0 sentinel
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, h.alias("_h")
    )
    rho = F.expr(
        f"CASE WHEN _h div {m} = 0 THEN {rho_max} "
        f"ELSE length(bin((_h div {m}) & -(_h div {m}))) END"
    )
    return (
        base.select(
            *group_cols,
            F.pmod(F.col("_h"), F.lit(m)).cast("long").alias("bucket"),
            rho.cast("long").alias("_rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").cast("long").alias("r"))
    )


def hll_estimate(registers: DataFrame, group_cols, m: int = 256) -> DataFrame:
    """Estimates from a register table (``hll_registers`` output or any
    union-max fold of slice registers): (group..., n_filled,
    est_distinct). The harmonic sum is the exact BIGINT
    ``sum(2^(53-r)) + empty * 2^53``; linear counting takes over below
    2.5m when empty buckets remain (the standard small-range
    correction); no large-range correction is needed inside a 2^52
    hash space until ~1e15 distinct. The scale exponent shrinks with m
    (``_hll_scale_bits``) so the integer sum cannot overflow BIGINT at
    large m."""
    group_cols = list(group_cols)
    if m < 128 or (m & (m - 1)) != 0:
        raise ValueError("m must be a power of two >= 128")
    scale = _hll_scale_bits(m)
    alpha = repr(_hll_alpha_m2_scaled(m))
    two53 = 1 << scale
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_filled"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - r)"))
        .cast("long")
        .alias("_s_part"),
    )
    return agg.select(
        *group_cols,
        "n_filled",
        F.expr(
            f"CAST(CASE WHEN {m} - n_filled > 0 "
            f"AND {alpha} / (_s_part + ({m} - n_filled) * CAST({two53} AS BIGINT))"
            f" <= 2.5 * {m} "
            f"THEN round({m} * ln(CAST({m} AS DOUBLE) / ({m} - n_filled))) "
            f"ELSE round({alpha} / "
            f"(_s_part + ({m} - n_filled) * CAST({two53} AS BIGINT))) END AS BIGINT)"
        ).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame, value_col: str, group_cols, m: int = 256
) -> DataFrame:
    """Per-group distinct-count estimation via HyperLogLog [Flajolet et
    al. 2007] with deterministic integer register math (see
    ``hll_registers``). Standard error ~1.04/sqrt(m) (~6.5% at m=256,
    ~3.2% at m=1024). Fixed m-row state per group; prefer
    ``kmv_distinct`` when small groups must report exact counts, HLL
    when state must stay fixed-size and mergeable by simple max."""
    return hll_estimate(
        hll_registers(df, value_col, group_cols, m), group_cols, m
    )


def kmv_pair_set_ops(
    minima: DataFrame,
    group_col: str,
    k: int,
    pairs: Optional[DataFrame] = None,
) -> DataFrame:
    """Pairwise set-operation estimates between groups' KMV sketches
    [Beyer et al., SIGMOD 2007]: for every unordered group pair, the
    combined k-minima of the two sketches estimate the UNION size
    (standard KMV rule), and the combined minima found in BOTH input
    sketches estimate intersection and Jaccard. Membership tests are
    sound because the combined k-th minimum is <= each side's own k-th
    minimum: any value of A hashing below it is guaranteed present in
    A's minima table.

    All integer math — ``(k-1)*2^44 div h_k``, ``(n_common * est_union)
    div k``, ``n_common * 10^6 div n_union_sketch`` — so estimates are
    bit-identical across engines and runs. Pairs whose combined sketch
    never filled (n_union_sketch < k) report EXACT union/intersection
    counts (both sketches saw everything).

    Scale shape: this operates on SKETCH STATE, never data — G groups
    contribute G*k hash rows, and the pair expansion is O(|pairs|*k)
    with every join broadcast-sized. All-pairs is the default
    (|pairs| = G(G-1)/2, the per-source / per-shard comparison case);
    for large G pass ``pairs`` (columns ``a``, ``b``) to restrict to
    candidate pairs from a blocking pass.

    Returns (<group_col>_a, <group_col>_b, n_union_sketch, est_union,
    est_intersection, jaccard_e6).
    """
    ca, cb = f"{group_col}_a", f"{group_col}_b"
    a = minima.select(F.col(group_col).alias(ca), "_h")
    b = minima.select(F.col(group_col).alias(cb), "_h")
    if pairs is None:
        pairs = (
            a.select(ca).distinct()
            .join(F.broadcast(b.select(cb).distinct()), F.col(ca) < F.col(cb))
        )
    else:
        pairs = pairs.select(F.col("a").alias(ca), F.col("b").alias(cb))
    # pairs is candidate-bounded (G^2 at worst, a blocking pass's output
    # otherwise) — broadcast it so the sketch table never shuffles for
    # the expansion
    pairs = F.broadcast(pairs)
    tagged = (
        pairs.join(a, ca)
        .select(ca, cb, "_h", F.lit(1).alias("_ia"), F.lit(0).alias("_ib"))
        .unionAll(
            pairs.join(b, cb)
            .select(ca, cb, "_h", F.lit(0).alias("_ia"), F.lit(1).alias("_ib"))
        )
        # same hash in both sketches == one combined-sketch entry
        .groupBy(ca, cb, "_h")
        .agg(F.max("_ia").alias("_ia"), F.max("_ib").alias("_ib"))
    )
    w = Window.partitionBy(ca, cb).orderBy("_h")
    kept = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    two_b = 1 << KMV_HASH_BITS
    agg = kept.groupBy(ca, cb).agg(
        F.count(F.lit(1)).cast("long").alias("n_union_sketch"),
        F.max("_h").alias("_kth"),
        F.sum(F.col("_ia") * F.col("_ib")).cast("long").alias("_n_common"),
    )
    est_u = F.when(
        F.col("n_union_sketch") < k, F.col("n_union_sketch")
    ).otherwise(F.expr(f"CAST({k - 1} AS BIGINT) * {two_b} div _kth"))
    return agg.select(
        ca,
        cb,
        "n_union_sketch",
        est_u.cast("long").alias("est_union"),
        F.when(F.col("n_union_sketch") < k, F.col("_n_common"))
        .otherwise(
            F.expr(
                f"_n_common * (CAST({k - 1} AS BIGINT) * {two_b} div _kth) div {k}"
            )
        )
        .cast("long")
        .alias("est_intersection"),
        F.expr("_n_common * 1000000 div n_union_sketch")
        .cast("long")
        .alias("jaccard_e6"),
    )


def kmv_set_ops(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 64,
    n_salts: int = 64,
    pairs: Optional[DataFrame] = None,
) -> DataFrame:
    """Build per-group KMV sketches and compare every group pair —
    union / intersection / Jaccard estimates from O(k) state per group
    (see ``kmv_pair_set_ops``). The corpus overlap matrix a dedup or
    mixture audit needs, WITHOUT the value-level self-join: values are
    hashed and reduced to k minima per group first, and only sketch
    state enters the pairwise stage."""
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        group_col, kmv_hash(F.col(value_col)).alias("_h")
    )
    minima = kmv_minima(hashed, [group_col], k, n_salts)
    return kmv_pair_set_ops(minima, group_col, k, pairs=pairs)


# ------------------------------------------------------- Bloom filter --

BLOOM_SALT = "bf"


def bloom_bit_exprs(value, m_bits: int, k_hashes: int, salt: str = BLOOM_SALT):
    """The k bit positions of one value: ``md5('{salt}{j}|' || value) %
    m_bits`` for j in 0..k-1 — one md5 per (value, j), portable
    bit-for-bit to DuckDB (``('0x' || substring(md5(...), 1, 15))::
    BIGINT % m``). Returns an ARRAY<BIGINT> expression; ``value`` must
    be a cheap column reference (it is referenced per hash)."""
    value = F.col(value) if isinstance(value, str) else value
    return F.array(*[
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{salt}{j}|"), value.cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long") % m_bits
        )
        for j in range(k_hashes)
    ])


def bloom_build(
    df: DataFrame,
    value_col: str,
    group_cols,
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
    salt: str = BLOOM_SALT,
) -> DataFrame:
    """Per-group Bloom filter [Bloom 1970] as a SPARSE bit table
    (group..., bit) — the set-bit positions, distinct. Sparse rows are
    the Spark-native filter state: filters of disjoint slices MERGE by
    ``union().distinct()`` (same aggregation shape as the build, so a
    streaming job can maintain it), the per-group state is bounded by
    ``m_bits`` rows of one BIGINT regardless of input size, and a probe
    is a plain equi-join — no bitmap blob to ship or mutate.

    False-positive rate after n insertions: ~(1 - e^(-kn/m))^k; size m
    for the build cardinality (m = 16n bits, k = 3 gives ~0.3%). There
    are no false NEGATIVES — the semi-join-pruning contract
    (``bloom_probe`` with ``definitely absent`` verdicts is safe to
    drop rows on).

    Scale shape: ONE aggregation keyed (group, bit) with map-side
    combine — at most m_bits rows per group cross the shuffle, never
    the value stream. The 100 TB use: build over a huge dimension's
    keys, broadcast the (small) bit table, and pre-prune a fact scan
    before the real join (the distributed analog of Spark's runtime
    bloom-filter join, but persistable, mergeable, and engine-portable)."""
    if m_bits < 2 or k_hashes < 1:
        raise ValueError("need m_bits >= 2 and k_hashes >= 1")
    group_cols = list(group_cols)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, F.col(value_col).alias("_v"))
        .select(
            *group_cols,
            F.explode(bloom_bit_exprs(F.col("_v"), m_bits, k_hashes, salt)).alias("bit"),
        )
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    probes: DataFrame,
    value_col: str,
    group_cols,
    m_bits: int,
    k_hashes: int = 3,
    salt: str = BLOOM_SALT,
    broadcast_bits: bool = True,
) -> DataFrame:
    """Membership verdicts: (group..., value, in_bloom) for every
    (probe value x group) row of ``probes``. ``in_bloom`` false =
    DEFINITELY absent (safe to drop); true = present or a false
    positive at the filter's design rate.

    The probe explodes each value to its k bit rows, left-joins the bit
    table, and demands all k present. With ``broadcast_bits`` (the
    semi-join-pruning deployment: m_bits sized to fit an executor) the
    probe side never shuffles; for giant filters pass False and the
    join shuffles on (group, bit)."""
    group_cols = list(group_cols)
    b = bits.select(*group_cols, F.col("bit").alias("bit")).withColumn(
        "_set", F.lit(1)
    )
    if broadcast_bits:
        b = F.broadcast(b)
    # distinct FIRST: the verdict demands count(_set) == k_hashes, so a
    # duplicated probe row (the norm when pre-pruning a fact scan)
    # would double its bit rows and read as a FALSE NEGATIVE — breaking
    # the "false = definitely absent, safe to drop" contract
    pr = (
        probes.select(*group_cols, F.col(value_col).alias("_v"))
        .distinct()
        .select(
            "*",
            F.explode(
                bloom_bit_exprs(F.col("_v"), m_bits, k_hashes, salt)
            ).alias("bit"),
        )
    )
    return (
        pr.join(b, [*group_cols, "bit"], "left")
        .groupBy(*group_cols, "_v")
        .agg((F.count("_set") == k_hashes).alias("in_bloom"))
        .select(*group_cols, F.col("_v").alias(value_col), "in_bloom")
    )
