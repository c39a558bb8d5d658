"""Record linkage / entity resolution: composite-blocked fuzzy matching.

The classic two-stage shape (Fellegi-Sunter practice, Papadakis et al.
blocking surveys): a cheap BLOCKING pass proposes candidate pairs and
an expensive pairwise similarity (edit distance here) verifies only
candidates. All-pairs comparison is quadratic and never acceptable.

Two guards keep the candidate set small on degenerate inputs:

1. **Dedupe-before-compare.** Blocking, verification, and best-match
   selection all run on DISTINCT NAMES, not records. Real corpora
   repeat strings heavily (TPC-H part names draw ~64 distinct values
   over any row count; crawl metadata repeats domains/licenses
   millions of times), and every record with the same string has the
   same match — so the record-level formulation re-verified each
   string pair once per id pair (measured: 15M candidate id-pairs
   from 20k x 6.6k rows whose distinct-string join is ~600 x 64).
   At 100x the data the string-level join is CONSTANT; only the
   scans and the final winner join-back grow linearly.
2. **Composite (token, length-bucket) keys** — see
   ``operators.blocking``. Plain token blocking degenerates on
   low-cardinality vocabularies; the length bucket restores
   selectivity for free: ``levenshtein <= d`` implies
   ``abs(len diff) <= d``, so bucketing at width ``max(d, 1)`` with
   3-bucket probing on the dirty side is LOSSLESS versus plain token
   blocking (pinned by
   tests/test_linkage.py::test_composite_keys_equal_naive_blocking).

Hot blocks past ``max_block_size`` (measured in distinct names — the
actual join fan-out) are still dropped, but never silently:
``dropped_block_stats`` reports the dropped keys, their name counts,
and — the actual recall signal — the dirty RECORDS whose every key
was dropped and therefore cannot link at all.

Reference parity: part of this repo's training-data-pipeline extension
surface (the reference engine, deven96/ahnlich, has no string-linkage
ops); the same blocking discipline as operators/dedup's LSH pipelines.

Determinism: edit distance is Spark's built-in ``levenshtein``
(unit-cost insert/delete/substitute) — identical to DuckDB's
``levenshtein``, so gates pin exact integer distances cross-engine.
Tie-breaks: winner per dirty record is (min distance, then min clean
id), identical to the record-level formulation because a clean name's
best representative is its minimum id.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ahnlich_spark.operators.blocking import token_length_keys


def _name_key_tables(
    dirty_names: DataFrame,
    clean_names: DataFrame,
    max_distance: int,
    length_blocking: bool,
):
    """Blocking-key tables over DISTINCT-NAME frames (one column
    ``nm``): composite (tok, lb) with 3-bucket probing on the dirty
    side, or plain token keys (lb pinned to 0) when
    ``length_blocking`` is off. The name string doubles as the id at
    this level (``{side}_id`` carries it)."""
    width = max(int(max_distance), 1) if length_blocking else 1
    d = token_length_keys(dirty_names, "nm", "nm", "d", width,
                          probe=length_blocking)
    c = token_length_keys(clean_names, "nm", "nm", "c", width, probe=False)
    if not length_blocking:
        d = d.withColumn("lb", F.lit(0).cast("long"))
        c = c.withColumn("lb", F.lit(0).cast("long"))
    return d, c


def _block_sizes(d: DataFrame, c: DataFrame) -> DataFrame:
    """(tok, lb, nd, nc) for every composite key present on BOTH
    sides (one-sided keys generate no pairs and cannot be hot).
    Counts are DISTINCT NAMES per key — the join fan-out measure."""
    return (
        d.groupBy("tok", "lb").agg(F.count(F.lit(1)).alias("nd"))
        .join(
            c.groupBy("tok", "lb").agg(F.count(F.lit(1)).alias("nc")),
            ["tok", "lb"],
        )
    )


def _verified_name_pairs(
    dirty: DataFrame,
    clean: DataFrame,
    max_distance: int,
    text_col: str,
    id_col: str,
    max_block_size: Optional[int],
    length_blocking: bool,
) -> DataFrame:
    """(d_nm, c_nm, rep_id, distance): every distinct NAME pair that
    shares a surviving blocking key, passes the length pre-filter, and
    verifies at ``levenshtein <= max_distance``. ``rep_id`` is the
    clean name's minimum id — the deterministic representative the
    (distance, clean_id) tie-break resolves to."""
    dn = dirty.select(F.col(text_col).alias("nm")).distinct()
    cn = clean.groupBy(F.col(text_col).alias("nm")).agg(
        F.min(F.col(id_col)).alias("rep_id")
    )
    d, c = _name_key_tables(dn, cn.select("nm"), max_distance,
                            length_blocking)
    if max_block_size is not None:
        keep = (
            _block_sizes(d, c)
            .filter((F.col("nd") + F.col("nc")) <= int(max_block_size))
            .select("tok", "lb")
        )
        d = d.join(F.broadcast(keep), ["tok", "lb"])
        c = c.join(F.broadcast(keep), ["tok", "lb"])
    cand = (
        d.join(c, ["tok", "lb"])
        .filter(
            F.abs(F.col("d_len") - F.col("c_len")) <= int(max_distance)
        )
        .select(F.col("d_id").alias("d_nm"), F.col("c_id").alias("c_nm"))
        .distinct()
    )
    return (
        cand.withColumn(
            "distance", F.levenshtein(F.col("d_nm"), F.col("c_nm"))
        )
        .filter(F.col("distance") <= int(max_distance))
        .join(cn.withColumnRenamed("nm", "c_nm"), "c_nm")
        .select("d_nm", "c_nm", "rep_id",
                F.col("distance").cast("long").alias("distance"))
    )


def token_blocked_link(
    dirty: DataFrame,
    clean: DataFrame,
    max_distance: int = 2,
    text_col: str = "nm",
    id_col: str = "id",
    max_block_size: Optional[int] = 10_000,
    keep_all_matches: bool = False,
    length_blocking: bool = True,
) -> DataFrame:
    """Link every ``dirty`` record to its best ``clean`` match:
    candidate DISTINCT-NAME pairs share >= 1 composite (lowercase
    token, length-bucket) blocking key, pass the length pre-filter
    ``abs(len_d - len_c) <= max_distance`` (a necessary condition for
    the edit distance, checked on two ints before anything joins
    wide), and are verified by ``levenshtein <= max_distance``; the
    winner per dirty record is (min distance, then min clean id) —
    deterministic, and identical to verifying at the record level.

    Returns (dirty_id, dirty_nm, clean_id, clean_nm, distance); with
    ``keep_all_matches`` every verified record-level candidate row
    instead (ranked semantics left to the caller — note this expands
    each verified name pair by both sides' duplication factors, which
    is inherent to id-level output). Dirty records with no verified
    candidate emit no row (standard linkage: unmatched goes to a
    residual queue, not a forced wrong match).

    ``length_blocking=False`` falls back to plain token blocking
    (same verified pairs when no cap binds — the composite keys plus
    probing are lossless — kept for the identity test and for callers
    whose comparator is not length-bounded).

    Scale shape (100 TB): each side is reduced to DISTINCT NAMES
    before anything pairwise — blocking, the candidate ``distinct()``,
    and the levenshtein pass all run at vocabulary size, not corpus
    size, so the expensive stage is CONSTANT in row count. The only
    corpus-sized steps are the two name-dedup shuffles and the final
    winner join-back on the name key. ``max_block_size`` drops hot
    keys (a key shared by B names fans out O(B^2) pairs — the
    standard blocking-key cap), and ``dropped_block_stats`` reports
    what the cap cost instead of letting recall collapse silently."""
    ver = _verified_name_pairs(dirty, clean, max_distance, text_col,
                               id_col, max_block_size, length_blocking)
    d_recs = dirty.select(
        F.col(id_col).alias("dirty_id"), F.col(text_col).alias("d_nm")
    )
    if keep_all_matches:
        c_recs = clean.select(
            F.col(id_col).alias("clean_id"), F.col(text_col).alias("c_nm")
        )
        return (
            ver.join(d_recs, "d_nm")
            .join(c_recs, "c_nm")
            .select(
                "dirty_id",
                F.col("d_nm").alias("dirty_nm"),
                "clean_id",
                F.col("c_nm").alias("clean_nm"),
                "distance",
            )
        )
    w = Window.partitionBy("d_nm").orderBy(
        F.asc("distance"), F.asc("rep_id")
    )
    best = (
        ver.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return d_recs.join(best, "d_nm").select(
        "dirty_id",
        F.col("d_nm").alias("dirty_nm"),
        F.col("rep_id").alias("clean_id"),
        F.col("c_nm").alias("clean_nm"),
        "distance",
    )


def dropped_block_stats(
    dirty: DataFrame,
    clean: DataFrame,
    max_distance: int = 2,
    text_col: str = "nm",
    max_block_size: int = 10_000,
    length_blocking: bool = True,
) -> DataFrame:
    """Accounting for what ``max_block_size`` cost: ONE summary row
    (n_dropped_keys, dropped_dirty_names, dropped_clean_names,
    fully_blocked_dirty) where fully_blocked_dirty counts dirty
    RECORDS whose name had at least one two-sided blocking key and
    lost them ALL to the cap — those records cannot link at all, the
    silent-recall-cliff signal the cap used to hide. Zero rows
    dropped yields the explicit all-zero row, so monitoring joins
    never confuse 'no drops' with 'not measured'."""
    dn = dirty.select(F.col(text_col).alias("nm")).distinct()
    cn = clean.select(F.col(text_col).alias("nm")).distinct()
    d, c = _name_key_tables(dn, cn, max_distance, length_blocking)
    sizes = _block_sizes(d, c)
    dropped = sizes.filter(
        (F.col("nd") + F.col("nc")) > int(max_block_size)
    )
    kept = sizes.filter(
        (F.col("nd") + F.col("nc")) <= int(max_block_size)
    ).select("tok", "lb")
    # dirty names with no surviving key. A name whose keys are ALL
    # one-sided also cannot link, but that is data (no shared token),
    # not the cap's doing — restrict to names that HAD at least one
    # two-sided key, then count the RECORDS carrying those names.
    had_key = d.join(sizes.select("tok", "lb"), ["tok", "lb"]).select(
        F.col("d_id").alias("nm")
    ).distinct()
    survives = d.join(kept, ["tok", "lb"]).select(
        F.col("d_id").alias("nm")
    ).distinct()
    blocked_names = had_key.join(survives, "nm", "left_anti")
    fb = (
        dirty.select(F.col(text_col).alias("nm"))
        .join(F.broadcast(blocked_names), "nm")
        .agg(F.count(F.lit(1)).cast("long").alias("fully_blocked_dirty"))
    )
    agg = dropped.agg(
        F.count(F.lit(1)).cast("long").alias("n_dropped_keys"),
        F.coalesce(F.sum("nd"), F.lit(0)).cast("long")
        .alias("dropped_dirty_names"),
        F.coalesce(F.sum("nc"), F.lit(0)).cast("long")
        .alias("dropped_clean_names"),
    )
    return agg.crossJoin(fb)
