"""One-scan table profiling: the data-quality audit a pipeline runs on
every new ingest slice before trusting it (null explosions, cardinality
collapses, duplicated feeds all show up here first).

Scale shape: ALL per-column statistics come out of ONE aggregation over
ONE scan. Spark plans the multi-column ``count(DISTINCT ...)`` set with
a single Expand (row x (n_cols+1) map-side blowup, collapsed by partial
aggregation before the one exchange) — the alternative, one job per
column, scans the table n_cols times. The long-format pivot afterwards
touches a single row.

Output is deliberately integer-only (counts, distinct counts) so the
profile is bit-identical on any engine and safely hash-compared across
runs — drift in these numbers between ingest slices IS the alert
signal. Min/max/quantiles of numeric columns belong to
``sketches.histogram_quantiles`` which brackets them deterministically.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: Optional[Sequence[str]] = None) -> DataFrame:
    """(column, n_rows, n_null, n_distinct) for every requested column
    — exact counts from one scan. ``n_distinct`` counts non-null
    values (SQL ``count(DISTINCT col)`` semantics); ``n_null`` =
    n_rows - count(col)."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).cast("long").alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"_nd_{c}"))
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stacked}) AS (column, _nn, n_distinct)", "_n"
    ).select(
        "column",
        F.col("_n").alias("n_rows"),
        (F.col("_n") - F.col("_nn")).cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )


def fk_audit(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity audit: how many child rows reference a key
    absent from the parent — run on every ingest slice against the
    current dimension snapshot, where a non-zero count usually means
    early-arriving facts (the dimension feed lags) rather than
    corruption, and the count's TREND is the alert. NULL child keys are
    counted separately (they violate nothing but usually mean a broken
    extractor).

    Returns ONE row: (n_child, n_null_keys, n_orphans,
    n_orphan_keys). Scale shape: the parent reduces to its DISTINCT
    key set before a left-anti join (broadcast when it fits, AQE
    otherwise); two aggregations, no child rescans — orphan stats come
    from the anti-join output alone plus one count of the child."""
    keys = parent.select(F.col(parent_key).alias("_pk")).distinct()
    ch = child.select(F.col(child_key).alias("_ck"))
    base = ch.agg(
        F.count(F.lit(1)).cast("long").alias("n_child"),
        F.sum(F.col("_ck").isNull().cast("long")).cast("long").alias("n_null_keys"),
    )
    orphans = (
        ch.filter(F.col("_ck").isNotNull())
        .join(keys, F.col("_ck") == F.col("_pk"), "left_anti")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orphans"),
            F.countDistinct("_ck").cast("long").alias("n_orphan_keys"),
        )
    )
    return base.crossJoin(orphans)
