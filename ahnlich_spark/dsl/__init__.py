"""Textual query language front-end (the reference's DSL surface,
ahnlich/dsl/ — re-expressed as a from-scratch recursive-descent parser
producing op structs executed against the Spark engine)."""

from ahnlich_spark.dsl import ops
from ahnlich_spark.dsl.executor import DslExecutor, StatementResult
from ahnlich_spark.dsl.parser import parse_ai_query, parse_db_query

__all__ = [
    "ops",
    "DslExecutor",
    "StatementResult",
    "parse_ai_query",
    "parse_db_query",
]
