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

__all__ = [
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
