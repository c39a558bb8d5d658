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
