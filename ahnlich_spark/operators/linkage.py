"""Record linkage / entity resolution: token-blocked fuzzy matching.

The classic two-stage shape (Fellegi-Sunter practice, Papadakis et al.
blocking surveys): a cheap BLOCKING pass proposes candidate pairs —
records sharing at least one blocking key — and an expensive pairwise
similarity (edit distance here) verifies only candidates. All-pairs
comparison is quadratic and never acceptable; token blocking keeps the
join linear in (records x tokens) with hot-block capping for stopword
keys.

Reference parity: part of this repo's training-data-pipeline extension
surface (the reference engine, deven96/ahnlich, has no string-linkage
ops); the same blocking discipline as operators/dedup's LSH pipelines.

Determinism: edit distance is Spark's built-in ``levenshtein``
(unit-cost insert/delete/substitute) — identical to DuckDB's
``levenshtein``, so gates pin exact integer distances cross-engine.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ahnlich_spark.functions import text as X


def _token_keys(df: DataFrame, text_col: str, id_col: str, side: str) -> DataFrame:
    # distinct lowercase tokens per record: the blocking keys. Staged
    # token array (see text.ngrams_of) and array_distinct BEFORE the
    # explode keep this scan-local.
    return (
        df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(text_col).alias(f"{side}_nm"),
            X.tokens(F.lower(F.col(text_col))).alias("_toks"),
        )
        .select(
            f"{side}_id",
            f"{side}_nm",
            F.explode(F.array_distinct("_toks")).alias("blk"),
        )
    )


def token_blocked_link(
    dirty: DataFrame,
    clean: DataFrame,
    max_distance: int = 2,
    text_col: str = "nm",
    id_col: str = "id",
    max_block_size: Optional[int] = 10_000,
    keep_all_matches: bool = False,
) -> DataFrame:
    """Link every ``dirty`` record to its best ``clean`` match:
    candidate pairs share >= 1 lowercase token (token blocking), are
    verified by ``levenshtein <= max_distance``, and the winner per
    dirty record is (min distance, then min clean id) — deterministic.

    Returns (dirty_id, dirty_nm, clean_id, clean_nm, distance); with
    ``keep_all_matches`` every verified candidate row instead (ranked
    semantics left to the caller). Dirty records with no verified
    candidate emit no row (standard linkage: unmatched goes to a
    residual queue, not a forced wrong match).

    Scale shape (100 TB): ONE shuffle on the token key builds the
    candidate set; pairs are de-duplicated BEFORE the levenshtein pass
    so each (dirty, clean) pair pays the edit distance once, however
    many tokens it shares. ``max_block_size`` drops stopword-degree
    blocking keys (a key shared by B records fans out O(B^2) pairs —
    the standard blocking-key cap; a dropped key only loses pairs that
    share NO rarer token, the usual recall trade documented by every
    blocking survey). The final best-match window partitions by
    dirty_id — candidate-sized, never corpus-sized."""
    d = _token_keys(dirty, text_col, id_col, "d")
    c = _token_keys(clean, text_col, id_col, "c")
    if max_block_size is not None:
        sizes = (
            d.groupBy("blk").agg(F.count(F.lit(1)).alias("nd"))
            .join(c.groupBy("blk").agg(F.count(F.lit(1)).alias("nc")), "blk")
            .filter((F.col("nd") + F.col("nc")) <= int(max_block_size))
            .select("blk")
        )
        d = d.join(F.broadcast(sizes), "blk")
        c = c.join(F.broadcast(sizes), "blk")
    cand = (
        d.join(c, "blk")
        .select("d_id", "d_nm", "c_id", "c_nm")
        .distinct()
    )
    verified = cand.withColumn(
        "distance", F.levenshtein(F.col("d_nm"), F.col("c_nm"))
    ).filter(F.col("distance") <= int(max_distance))
    out = verified.select(
        F.col("d_id").alias("dirty_id"),
        F.col("d_nm").alias("dirty_nm"),
        F.col("c_id").alias("clean_id"),
        F.col("c_nm").alias("clean_nm"),
        F.col("distance").cast("long").alias("distance"),
    )
    if keep_all_matches:
        return out
    w = Window.partitionBy("dirty_id").orderBy(
        F.asc("distance"), F.asc("clean_id")
    )
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
