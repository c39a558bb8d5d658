from ahnlich_spark.operators.predicates import (
    Predicate,
    Equals,
    NotEquals,
    In,
    NotIn,
    And,
    Or,
    compile_predicate,
)
from ahnlich_spark.operators.topk import top_k_similar
from ahnlich_spark.operators.joins import asof_join
from ahnlich_spark.operators.cluster import connected_components, dedup_clusters, kmeans_assign

__all__ = [
    "asof_join",
    "connected_components",
    "dedup_clusters",
    "kmeans_assign",
    "Predicate",
    "Equals",
    "NotEquals",
    "In",
    "NotIn",
    "And",
    "Or",
    "compile_predicate",
    "top_k_similar",
]
