"""Approximate nearest neighbour as a Spark-first two-stage plan.

The reference maintains incremental KD-tree / HNSW graphs in RAM
(ahnlich/similarity/src/kdtree.rs, hnsw/index.rs). Pointer-chasing graph
traversal is the wrong shape for a 1000-executor cluster; the classic
Spark-native equivalent is **bucket pruning + exact rescore**:

1. signature: sign-bits of the key against ``n_planes`` fixed random
   hyperplanes (random-projection LSH) — batch-precomputable as an index
   artifact co-partitioned with the store;
2. candidate pruning: keep rows whose signature is within a Hamming
   radius of the query's signature (partition/file pruning at scale when
   the store is laid out by signature prefix);
3. exact top-k rescore over the surviving candidates.

Two reference behaviors are preserved deliberately:
- accept-lists <= 4096 short-circuit to exact brute force
  (ahnlich/similarity/src/hnsw/index.rs:24) — here: if the candidate set
  is small (or the radius prunes too hard), we widen and ultimately fall
  back to the exact scan, so recall never collapses;
- exact mode must reach recall 1.0, approximate > 0.9 @ k=50
  (sift_dataset_validation.rs:97-113) — validated in tests/test_ann.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ahnlich_spark.functions import similarity as S
from ahnlich_spark.operators.topk import top_k_similar

DEFAULT_N_PLANES = 16
DEFAULT_SEED = 7


def hyperplanes(dim: int, n_planes: int = DEFAULT_N_PLANES, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Deterministic random hyperplanes (fixed seed => index is stable
    across rebuilds and across the query/build sides)."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float32)


def signature_expr(key: Column, planes: np.ndarray) -> Column:
    """Sign-bit signature of ARRAY<FLOAT> ``key`` as a BIGINT, JVM-side.

    One codegen'd dot product per plane; used at index-build time (the
    per-row cost is paid once, not per query)."""
    from ahnlich_spark.types import vector_lit

    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = S.dot_product(key, vector_lit(p), precision="float")
        sig = sig + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def signature_of(vec: Sequence[float], planes: np.ndarray) -> int:
    v = np.asarray(list(vec), dtype=np.float32)
    bits = (planes @ v) >= 0
    return int(sum(1 << i for i, b in enumerate(bits) if b))


def build_signature_index(df: DataFrame, dim: int, n_planes: int = DEFAULT_N_PLANES,
                          seed: int = DEFAULT_SEED) -> DataFrame:
    """(id, sig) index artifact; co-partition by id with the store so the
    candidate join never shuffles the store side."""
    planes = hyperplanes(dim, n_planes, seed)
    return df.select("id", signature_expr(F.col("key"), planes).alias("sig"))


def lsh_top_k(
    df: DataFrame,
    query_vector: Sequence[float],
    metric: str = S.COSINE,
    k: int = 10,
    precision: str = "float",
    brute_force_threshold: int = 4096,
    n_planes: int = DEFAULT_N_PLANES,
    seed: int = DEFAULT_SEED,
    hamming_radius: int = 3,
    index_df: Optional[DataFrame] = None,
) -> DataFrame:
    """Approximate top-k: Hamming-ball bucket pruning + exact rescore.

    ``index_df`` is a prebuilt (id, sig) artifact; without one the
    signature is computed on the fly (correct, but pays the per-row
    projection cost at query time — create the index for repeated use).

    An adaptive widen-then-fallback loop keeps recall honest: if a radius
    prunes below max(4*k, brute_force_threshold/8) candidates, widen; if
    the widest radius still starves, run the exact scan (the reference's
    small-accept-list brute-force shortcut, hnsw/index.rs:24).
    """
    dim = len(list(query_vector))

    # The reference's small-store shortcut (hnsw/index.rs:24): below the
    # brute-force threshold the exact scan IS the fast path — skip the
    # signature projection entirely (one cheap count vs evaluating
    # n_planes dot products per row just to discover pruning won't pay).
    if df.limit(brute_force_threshold + 1).count() <= brute_force_threshold:
        return top_k_similar(df, query_vector, metric, k, precision=precision)

    planes = hyperplanes(dim, n_planes, seed)
    qsig = signature_of(query_vector, planes)

    if index_df is not None:
        cand_base = df.join(index_df, "id")
    else:
        cand_base = df.withColumn("sig", signature_expr(F.col("key"), planes))

    min_candidates = max(4 * k, brute_force_threshold // 8)
    dist = F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig)))
    # AQE-style runtime decision from ONE pass: the Hamming-distance
    # histogram (n_planes+1 tiny rows) picks the smallest radius whose
    # cumulative candidate count fills the quota — instead of paying a
    # full signature evaluation per probed radius.
    hist = dict(
        cand_base.select(dist.alias("d")).groupBy("d").count().collect()
    )
    cum = 0
    chosen = None
    for radius in range(n_planes + 1):
        cum += hist.get(radius, 0)
        if radius >= hamming_radius and cum >= min_candidates:
            chosen = radius
            break
    if chosen is None or cum < min_candidates:
        return top_k_similar(df, query_vector, metric, k, precision=precision)
    cands = cand_base.filter(dist <= chosen).drop("sig")
    return top_k_similar(cands, query_vector, metric, k, precision=precision)
