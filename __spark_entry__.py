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


def _read_round() -> int:
    """The current build round, pinned in the tracked ROUND file — a
    clean clone therefore grades the same 50-gate window as this tree,
    and the window cannot shift mid-round (the old inference from
    untracked CORRECTNESS_r*.json files could do both)."""
    try:
        with open(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "ROUND"
        )) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return 0


_ROUND = _read_round()  # once at import: stable for the whole run


def _rotation_offset(n: int) -> int:
    """Deterministic per-round rotation of the gate registry order.

    The driver grades only the FIRST 50 registered gates per round
    (CORRECTNESS_r{N}.json); the full set is far larger, so without
    rotation the same 50 get driver-graded forever. Rotating by
    50 * round walks a fresh window across the registry every round
    while keeping every gate present for the in-suite rehearsal. Pure
    reordering — no gate is added, dropped, or renamed by rotation."""
    return (50 * _ROUND) % n if n else 0


def _rotated(mapping: dict, all_names: list) -> dict:
    # one rotation, derived from the full GATE name list, applied to
    # both dicts — so queries() and oracle_sql() stay aligned even if
    # a rows-only gate (present in QUERIES, absent from ORACLES) is
    # ever registered
    off = _rotation_offset(len(all_names))
    order = all_names[off:] + all_names[:off]
    return {k: mapping[k] for k in order if k in mapping}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ahnlich_spark.entry_queries import QUERIES

    return _rotated(dict(QUERIES), sorted(QUERIES))


def oracle_sql() -> dict[str, str]:
    from ahnlich_spark.entry_queries import ORACLES, QUERIES

    return _rotated(dict(ORACLES), sorted(QUERIES))
