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


# Internal index columns embedded in the store files (computed at
# write time so queries never re-project or join them):
#   _ann_sig     BIGINT  LSH random-projection signature   (hnsw analog)
#   _ann_sigp    INT     signature prefix = partition-layout key
#   _ann_bucket  INT     IVF nearest-centroid id = partition-layout key
#   _pred_<key>  STRING  flat copy of meta[<key>].s for an indexed
#                        predicate key — map access gets no parquet
#                        pushdown, a flat column does
ANN_COLUMNS = ("_ann_sig", "_ann_sigp", "_ann_bucket", "_ann_pqcode")
INTERNAL_PREFIXES = ("_ann_", "_pred_")


def internal_columns(df: DataFrame):
    return [c for c in df.columns if c.startswith(INTERNAL_PREFIXES)]


def read_store(
    spark: SparkSession, catalog: Catalog, meta: StoreMeta, canonical: bool = True
) -> DataFrame:
    """Current snapshot of a store as a DataFrame (empty stores give an
    empty frame with the canonical schema). ``canonical=True`` hides the
    internal index columns; index-aware query paths read with
    ``canonical=False`` to use them."""
    if meta.version == 0:
        return spark.createDataFrame([], store_schema())
    df = spark.read.parquet(catalog.store_path(meta))
    if canonical:
        extra = internal_columns(df)
        if extra:
            df = df.drop(*extra)
    return df


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
    layout_col: Optional[str] = None,
    sort_cols: Optional[list] = None,
) -> StoreMeta:
    """Write ``df`` as the next version of the store and flip the catalog
    pointer. Without a ``layout_col`` data is hash-distributed by id so
    future id-joins read co-located files; with one (an ANN index key:
    IVF bucket or LSH sig-prefix) the version is directory-partitioned
    by it so probe filters prune whole files. ``sort_cols`` (indexed
    predicate columns) cluster rows inside each file so row-group
    min/max + dictionary stats prune scans. Version dirs older than
    the KEEP_VERSIONS retention window are GC'd after the flip."""
    if n_buckets is None:
        n_buckets = derive_buckets(df)
    new_version = meta.version + 1
    path = catalog.store_path(meta, new_version)
    if layout_col is not None and layout_col in df.columns:
        # hash-distribute on the layout key so each partition dir is
        # written by one task (one file per dir, not tasks x dirs)
        out = df.repartition(n_buckets, layout_col)
        if sort_cols:
            out = out.sortWithinPartitions(layout_col, *sort_cols)
        out.write.mode("overwrite").partitionBy(layout_col).parquet(path)
    else:
        out = df.repartition(n_buckets, "id")
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        out.write.mode("overwrite").parquet(path)
    meta.version = new_version
    catalog.put_store(meta)
    catalog.gc_versions(meta, keep=KEEP_VERSIONS)
    return meta
