"""JSONL corpus sink/source: deterministic hash sharding, byte-stable
re-export, lossless round-trip."""

import glob
import gzip
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ahnlich_spark.sources.corpus_io import (
    read_jsonl_corpus, shard_expr, write_jsonl_corpus,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _shard_bytes(path):
    out = {}
    for d in sorted(os.listdir(path)):
        if not d.startswith("shard="):
            continue
        files = sorted(glob.glob(os.path.join(path, d, "*.json.gz")))
        out[d] = b"".join(gzip.open(f, "rb").read() for f in files)
    return out


def test_roundtrip_lossless(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "corpus")
    write_jsonl_corpus(docs, p, n_shards=4)
    back = read_jsonl_corpus(spark, p, SCHEMA)
    assert back.count() == docs.count()
    # text survives byte-for-byte (md5 join finds every doc unchanged)
    a = docs.select("doc_id", F.md5("text").alias("h"))
    b = back.select("doc_id", F.md5("text").alias("h"))
    assert a.join(b, ["doc_id", "h"]).count() == docs.count()
    # shard column present and within range
    mm = back.agg(F.min("shard"), F.max("shard")).first()
    assert mm[0] >= 0 and mm[1] <= 3


def test_export_byte_stable(spark, tmp_path):
    """Two exports of the same data produce IDENTICAL shard bytes —
    the checksum contract training jobs rely on."""
    docs = _docs(spark)
    p1, p2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    write_jsonl_corpus(docs, p1, n_shards=4)
    # second export from a differently-partitioned frame
    write_jsonl_corpus(docs.repartition(13), p2, n_shards=4)
    b1, b2 = _shard_bytes(p1), _shard_bytes(p2)
    assert list(b1) == list(b2) == [f"shard={i}" for i in range(4)]
    assert b1 == b2


def test_shard_expr_matches_python(spark):
    """Shard assignment is the documented md5 derivation."""
    import hashlib

    rows = (
        _docs(spark)
        .select("doc_id", shard_expr(F.col("doc_id"), 8).alias("s"))
        .limit(50)
        .collect()
    )
    for r in rows:
        want = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16) % 8
        assert r["s"] == want
