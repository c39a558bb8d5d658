"""Composite blocking keys for string-matching candidate generation.

Plain token blocking degenerates on low-cardinality vocabularies: when
every record draws its tokens from a ~100-word palette (TPC-H part
names, license strings, domain suffixes), each token key holds a large
fraction of the corpus and the candidate join approaches all-pairs.
The standard repair (Papadakis et al., "Blocking and Filtering
Techniques for Entity Resolution", CSUR 2020; the length filter is
Gravano et al. VLDB 2001) is a COMPOSITE key: (token, length-bucket).
Edit distance bounds length drift — ``levenshtein(a, b) <= d`` implies
``abs(len(a) - len(b)) <= d`` — so with bucket width ``B >= d`` a true
match's bucket differs by at most 1, and probing the three adjacent
buckets on ONE side is lossless versus plain token blocking.

Recall contract: for any pair with a shared token and
``abs(len_a - len_b) <= max_distance``, the pair shares at least one
composite key (the probe side emits buckets ``lb-1, lb, lb+1``).
Pairs with a larger length gap can never verify, so dropping them is
free selectivity, not a recall trade.

Shared by ``operators.linkage`` (token blocking) and
``operators.dedup`` (MinHash band keys on short texts) so both get the
same degenerate-vocabulary guard.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ahnlich_spark.functions import text as X


def jaccard_size_bucket(n_features: Column, threshold: float) -> Column:
    """Log-ratio size bucket for Jaccard-thresholded joins:
    ``J(A, B) >= t`` forces ``t <= |A|/|B| <= 1/t`` (size filtering,
    Gravano et al. VLDB 2001 / Xiao et al. WWW 2008), so bucketing
    ``ln(|A|)`` at width ``ln(1/t)`` puts any qualifying pair within
    +-1 bucket. Composite (LSH band, size bucket) keys split the
    giant buckets a degenerate vocabulary produces (near-identical
    short texts collide on every band) without losing any pair the
    threshold could accept — the probing side expands +-1.

    ``threshold == 1`` degenerates to exact set size equality (width
    would be 0), so the count itself is the bucket. Docs with zero
    features get a NULL bucket and fall out of the join — they have
    no shingles and no qualifying pairs anyway."""
    t = float(threshold)
    if not (0.0 < t <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    n = n_features.cast("double")
    if t == 1.0:
        return n_features.cast("long")
    width = math.log(1.0 / t)
    return F.floor(F.log(n) / F.lit(width)).cast("long")


def length_bucket(length: Column, bucket_width: int) -> Column:
    """Floor-division bucket id for a nonnegative length column —
    identical to DuckDB ``len // width`` for the oracle twins."""
    return F.floor(length / F.lit(int(bucket_width))).cast("long")


def token_length_keys(
    df: DataFrame,
    text_col: str,
    id_col: str,
    side: str,
    bucket_width: int,
    probe: bool = False,
) -> DataFrame:
    """Composite (token, length-bucket) blocking keys:
    ``({side}_id, {side}_len, tok, lb)`` — one row per distinct
    lowercase token per record, times 3 adjacent buckets when
    ``probe`` (the probing side emits ``lb-1, lb, lb+1``, clamped at
    0, so a build-side record in any reachable bucket is found).

    Scale shape: the token array is staged once per row
    (``array_distinct`` BEFORE the explode), lengths ride along as a
    single int — the key table is O(records x tokens) skinny rows and
    never carries the text itself.
    """
    b = int(bucket_width)
    if b < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    base = df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.length(F.col(text_col)).cast("long").alias(f"{side}_len"),
        X.tokens(F.lower(F.col(text_col))).alias("_toks"),
    ).select(
        f"{side}_id",
        f"{side}_len",
        F.explode(F.array_distinct("_toks")).alias("tok"),
        length_bucket(F.col(f"{side}_len"), b).alias("_lb0"),
    )
    if not probe:
        return base.select(
            f"{side}_id", f"{side}_len", "tok", F.col("_lb0").alias("lb")
        )
    return (
        base.select(
            f"{side}_id",
            f"{side}_len",
            "tok",
            F.explode(
                F.array(F.col("_lb0") - 1, F.col("_lb0"), F.col("_lb0") + 1)
            ).alias("lb"),
        )
        .filter(F.col("lb") >= 0)
    )
