"""Physical-layout helpers: partition-count hygiene for compute-heavy
stages.

A small parquet file scans as ONE task, which serializes any expensive
per-row work (pandas-UDF inference, shingle explosion, per-char hashing)
onto one core while the rest of the cluster idles. ``fan_out`` raises
the partition count to the cluster's default parallelism ONLY when the
input is narrower than that — at real scale the scan partitioning is
already wide and this is a no-op, so no extra shuffle is ever added on
the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive
        return df
    return df.repartition(target) if current < target else df
