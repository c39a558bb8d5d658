"""ahnlich_spark — a PySpark-native engine with the query surface of
deven96/ahnlich (an in-memory vector store), rebuilt Spark-first.

Stores are parquet-backed DataFrames; predicates compile to Catalyst
boolean expressions; top-N similarity is a ``score -> ORDER BY -> LIMIT``
plan (TakeOrderedAndProject: per-partition bounded heap + driver merge,
the distributed equivalent of the reference's rayon fold/reduce,
reference ahnlich/db/src/algorithm/mod.rs:87-128).
"""

from ahnlich_spark.types import MetadataValue, StoreInput
from ahnlich_spark.plans.engine import Engine

__all__ = ["Engine", "MetadataValue", "StoreInput"]
__version__ = "0.1.0"


def __getattr__(name):
    # lazy imports to avoid a circular import at package load
    if name == "DslExecutor":
        from ahnlich_spark.dsl import DslExecutor

        return DslExecutor
    if name == "AiEngine":
        from ahnlich_spark.ai import AiEngine

        return AiEngine
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
