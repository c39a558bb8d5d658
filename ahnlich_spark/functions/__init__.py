from ahnlich_spark.functions.similarity import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    squared_euclidean_distance,
    closeness,
    score_expr,
)
from ahnlich_spark.functions.hashing import store_key_id

__all__ = [
    "cosine_similarity",
    "dot_product",
    "euclidean_distance",
    "squared_euclidean_distance",
    "closeness",
    "score_expr",
    "store_key_id",
]
