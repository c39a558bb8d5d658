"""Training-corpus export/import: deterministically sharded JSONL —
the interchange format every LLM data pipeline reads and writes (one
JSON object per line, gzip shards).

Shard discipline: a document's shard is ``md5(salt || id) mod
n_shards`` — a pure function of the id, NOT of cluster size, partition
count, or input order (``spark_partition_id`` sharding produces a
different dataset layout on every cluster; hash sharding produces the
same one everywhere). The same derivation as operators/sampling, so a
shard is also a valid deterministic sample of the corpus.

Scale notes (100 TB):
- The write is ONE shuffle (repartition by shard) + a sorted
  scan-local write; each output task owns exactly one shard directory,
  so there are n_shards gzip files regardless of executor count.
- ``sortWithinPartitions(id)`` makes shard CONTENT byte-stable, not
  just row-stable — re-running the export produces identical files
  (training jobs checksum their inputs).
- Reading back is a plain ``spark.read.json`` with an explicit schema:
  never let 100 TB of JSONL pay schema inference (a full extra pass).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def shard_expr(id_col, n_shards: int, salt: str = ""):
    """Deterministic shard in [0, n_shards): md5-derived, portable
    (DuckDB: ('0x' || substring(md5(salt || id), 1, 15))::BIGINT %
    n_shards)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    return (h % n_shards).cast("int")


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    salt: str = "",
    compression: Optional[str] = "gzip",
) -> None:
    """Export as ``path/shard=K/*.json.gz``: hash-sharded, id-sorted
    within each shard, one file per shard."""
    out = df.withColumn("shard", shard_expr(F.col(id_col), n_shards, salt))
    # sort by (shard, id): satisfies the dynamic-partition writer's
    # required ordering up front, so it inserts NO extra sort of its own
    # — a writer-inserted sort on `shard` alone is not stable and would
    # scramble the id order (observed: same rows, different bytes)
    writer = (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read a sharded JSONL corpus with an explicit schema (no inference
    pass); the ``shard`` partition column comes back as INT."""
    return spark.read.schema(schema).option("basePath", path).json(path)
