from ahnlich_spark.functions.similarity import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    squared_euclidean_distance,
    closeness,
    score_expr,
)
from ahnlich_spark.functions.hashing import store_key_id
from ahnlich_spark.functions.projection import project_df, projected_top_k, sign_matrix

__all__ = [
    "local_rows_df",
    "project_df",
    "projected_top_k",
    "sign_matrix",
    "cosine_similarity",
    "dot_product",
    "euclidean_distance",
    "squared_euclidean_distance",
    "closeness",
    "score_expr",
    "store_key_id",
]

def local_rows_df(spark, rows, schema, slice_rows: int = 100_000):
    """DataFrame over a bounded DRIVER-SIDE row list, sliced by data
    size instead of by core count. ``spark.createDataFrame(list)``
    parallelizes into defaultParallelism slices, so a 50-row probe
    batch becomes #cores near-empty partitions and every downstream
    stage (broadcast build, window, aggregation) schedules #cores
    tasks of pure overhead; each slice evaluation also pays its own
    Python-worker round trip, which a post-hoc ``coalesce(1)`` would
    serialize (measured ~0.2 s/slice). One slice per ``slice_rows``
    rows keeps wire-sized batches at exactly ONE partition while a
    genuinely large driver list still converts in parallel."""
    n_slices = max(1, -(-len(rows) // slice_rows)) if rows else 1
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), schema
    )
