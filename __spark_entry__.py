"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All pairs live in ``ahnlich_spark/entry_queries.py``; outputs are
integer/string-only (scores as scaled BIGINTs) so cross-engine float
drift cannot break the value hash.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: top-10 cosine GetSimN on sf0.001 embeddings."""
    from ahnlich_spark.entry_queries import flagship

    return flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ahnlich_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ahnlich_spark.entry_queries import ORACLES

    return dict(ORACLES)
