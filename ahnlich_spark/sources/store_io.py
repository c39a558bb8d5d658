"""Parquet-backed store tables.

The reference holds each store as a concurrent hashmap in RAM with
whole-DB JSON snapshots (ahnlich/utils/src/persistence.rs:109-180).
Spark-first replacement: each store version is an immutable parquet
directory, hash-distributed by ``id`` so key lookups / upsert joins
co-locate without a shuffle at read time; mutations write a NEW version
directory and flip the catalog pointer (readers of the old version are
never disturbed — same tempfile+rename idea, at directory granularity).

At 100 TB the versioned-rewrite SET path would be replaced by a
MERGE-capable table format; the *plan shape* (hash join on id, partial
counts) is identical, so everything above this module carries over.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ahnlich_spark.catalog import Catalog, StoreMeta
from ahnlich_spark.types import store_schema

# Fallback partition count when the optimizer has no size estimate.
DEFAULT_BUCKETS = 8
# Versions kept per store after a write: current + previous. The
# previous version keeps already-handed-out lazy DataFrames readable
# across one mutation (the DSL pipeline contract); Engine.vacuum()
# reclaims it. Same idea as Delta's VACUUM retention window.
KEEP_VERSIONS = 2
# Hard cap on derived bucket counts (1000-executor scale still keeps
# task counts sane; AQE coalesces further at runtime).
MAX_BUCKETS = 65536


def read_store(spark: SparkSession, catalog: Catalog, meta: StoreMeta) -> DataFrame:
    """Current snapshot of a store as a DataFrame (empty stores give an
    empty frame with the canonical schema)."""
    if meta.version == 0:
        return spark.createDataFrame([], store_schema())
    return spark.read.parquet(catalog.store_path(meta))


def derive_buckets(df: DataFrame) -> int:
    """Partition count for a store write, derived from Catalyst's size
    estimate over ``spark.sql.files.maxPartitionBytes`` — small stores
    write one file, 100 TB stores write ~one-scan-split-sized files.
    Catalyst over-estimates post-join plans (row-count products), which
    errs toward MORE buckets; the cap and AQE coalescing bound that."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return DEFAULT_BUCKETS
    spark = df.sparkSession
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    digits = "".join(ch for ch in raw if ch.isdigit())
    target = int(digits) if digits else 134217728
    if size <= 0 or size >= (1 << 62):  # unknown / Long.MaxValue sentinel
        return DEFAULT_BUCKETS
    return max(1, min(MAX_BUCKETS, math.ceil(size / target)))


def write_store(
    df: DataFrame,
    catalog: Catalog,
    meta: StoreMeta,
    n_buckets: Optional[int] = None,
) -> StoreMeta:
    """Write ``df`` as the next version of the store and flip the catalog
    pointer. Data is hash-distributed by id before the write so future
    id-joins read co-located files; version dirs older than the
    KEEP_VERSIONS retention window are GC'd after the flip."""
    if n_buckets is None:
        n_buckets = derive_buckets(df)
    new_version = meta.version + 1
    path = catalog.store_path(meta, new_version)
    df.repartition(n_buckets, "id").write.mode("overwrite").parquet(path)
    meta.version = new_version
    catalog.put_store(meta)
    catalog.gc_versions(meta, keep=KEEP_VERSIONS)
    return meta
