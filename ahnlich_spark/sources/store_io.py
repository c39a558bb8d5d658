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

from pyspark.sql import DataFrame, SparkSession

from ahnlich_spark.catalog import Catalog, StoreMeta
from ahnlich_spark.types import store_schema

# Partitions for store data writes. Local tests stay small; at scale this
# would derive from table size / maxPartitionBytes.
DEFAULT_BUCKETS = 8


def read_store(spark: SparkSession, catalog: Catalog, meta: StoreMeta) -> DataFrame:
    """Current snapshot of a store as a DataFrame (empty stores give an
    empty frame with the canonical schema)."""
    if meta.version == 0:
        return spark.createDataFrame([], store_schema())
    return spark.read.parquet(catalog.store_path(meta))


def write_store(
    df: DataFrame,
    catalog: Catalog,
    meta: StoreMeta,
    n_buckets: int = DEFAULT_BUCKETS,
) -> StoreMeta:
    """Write ``df`` as the next version of the store and flip the catalog
    pointer. Data is hash-distributed by id before the write so future
    id-joins read co-located files."""
    new_version = meta.version + 1
    path = catalog.store_path(meta, new_version)
    df.repartition(n_buckets, "id").write.mode("overwrite").parquet(path)
    meta.version = new_version
    catalog.put_store(meta)
    return meta
