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
