"""Retrieval-quality evaluation: recall@k of an approximate (pruned)
search path against the exact scan, computed as a distributed join.

Every ANN deployment needs this loop — FAISS ships it as a benchmark
harness, the reference pins it in its SIFT validation suite
(ahnlich/dsl & db sift_dataset_validation.rs:97-188, which asserts
recall >= 0.9 for tuned HNSW) — and at 100 TB it must run as a plan,
not a driver loop: both result sets are (probe, id) tables, recall is
one broadcast-sized join + aggregate per evaluation batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(
    exact: DataFrame,
    approx: DataFrame,
    probe_col: str = "qid",
    id_col: str = "id",
) -> DataFrame:
    """Per-probe recall counts: how many of each probe's EXACT top-k ids
    the approximate path also returned.

    ``exact`` and ``approx`` are (probe, id, ...) result frames — e.g.
    two ``Engine.get_sim_n_batch`` outputs, one linear and one pruned —
    with k rows per probe. Returns one row per probe:
    (probe, n_exact, n_hits); recall@k = n_hits / n_exact, left as an
    exact integer pair so callers (and cross-engine hash compares)
    never touch a float.

    Plan shape: the exact side left-joins the approximate side on
    (probe, id) — both are k*|batch| rows, tiny relative to any store —
    then one aggregate on probe. No store scan happens here at all;
    evaluation cost is independent of corpus size.
    """
    e = exact.select(F.col(probe_col).alias("_p"), F.col(id_col).alias("_i"))
    # distinct: a duplicated (probe, id) on the approx side (e.g. a
    # union of chunked result frames) must not fan out the join and
    # inflate both counts
    a = (
        approx.select(F.col(probe_col).alias("_p"), F.col(id_col).alias("_i"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        e.join(a, ["_p", "_i"], "left")
        .groupBy("_p")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"),
        )
        .select(F.col("_p").alias(probe_col), "n_exact", "n_hits")
    )


def dim_means_e9(
    df: DataFrame, vec_col: str = "embedding", group_col=None
) -> DataFrame:
    """Per-dimension mean of an embedding column, e9-scaled integer —
    (group?, dim, n, mean_e9). Components are e9-rounded BEFORE the
    integer sum, so the result is exact under any aggregation order and
    bit-identical across engines (a raw double mean is neither).

    Scale shape: posexplode is a scan-local map-stage expansion (dim x
    rows) that map-side combine collapses to per-partition per-dim
    partials before the shuffle — the exchange carries O(dims x
    partitions) rows whatever the corpus size. Integer headroom: e9
    components of unit-normalized embeddings sum safely past 1e9 rows
    per dimension (5e8 x 1e9 < 2^63 x 0.06)."""
    keys = [group_col] if group_col else []
    # explicit double: comp is FLOAT in the parquet, and float x int
    # promotes to FLOAT in both engines — f32 multiply rounds before
    # the e9 round does, off-by-one vs the double path
    comp_e9 = F.round(F.col("comp").cast("double") * 1_000_000_000).cast("long")
    return (
        df.select(
            *keys, F.posexplode(F.col(vec_col)).alias("dim", "comp")
        )
        .select(*keys, "dim", comp_e9.alias("c"))
        .groupBy(*keys, "dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("sum(c) div count(1)").cast("long").alias("mean_e9"),
        )
    )


def embedding_drift(
    slice_a: DataFrame,
    slice_b: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension distribution drift between two corpus slices
    (yesterday's crawl vs today's, one source vs another) — the
    monitoring signal that catches an upstream embedding-model change
    or a content shift before it contaminates similarity search.
    Returns (dim, mean_a_e9, mean_b_e9, drift_e9 = |mean_a - mean_b|),
    one row per dimension; sum drift_e9 for a corpus-level L1 score.

    Both slices reduce to dims-sized tables before they meet, so the
    comparison join is metadata-scale regardless of slice sizes."""
    a = dim_means_e9(slice_a, vec_col).select(
        "dim", F.col("mean_e9").alias("mean_a_e9")
    )
    b = dim_means_e9(slice_b, vec_col).select(
        "dim", F.col("mean_e9").alias("mean_b_e9")
    )
    return a.join(b, "dim").select(
        F.col("dim").cast("long").alias("dim"),
        "mean_a_e9",
        "mean_b_e9",
        F.abs(F.col("mean_a_e9") - F.col("mean_b_e9")).cast("long").alias("drift_e9"),
    )
