"""Dedup operator semantics: SimHash spec equivalence, guaranteed
recall of the pigeonhole chunk blocking, empty-doc handling."""

import pytest
from pyspark.sql import functions as F

from ahnlich_spark.functions import text as X
from ahnlich_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (3, ""),  # empty
        (4, None),  # null
        (5, "völlig unrelated 文字 content here"),
        (6, "a"),
        (7, "the quick brown fox leaps over the lazy dog"),  # near-dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_table_matches_hof_spec(docs):
    """The 64-aggregate explode path must be bit-identical to the
    per-row higher-order-function spec (text.simhash64)."""
    fast = D.simhash_table(docs).withColumnRenamed("fp", "fp_fast")
    # simhash_table documents NULL-text -> -1 (empty-doc fingerprint);
    # the per-row spec propagates NULL, so align with coalesce
    spec = docs.select(
        F.col("doc_id").alias("did"),
        F.coalesce(X.simhash64(F.col("text")), F.lit(-1)).alias("fp_spec"),
    )
    joined = fast.join(spec, "did").collect()
    assert len(joined) == 8
    for r in joined:
        assert r["fp_fast"] == r["fp_spec"], f"did={r['did']}"


def test_simhash_empty_and_null_docs_fingerprint_to_minus_one(docs):
    fps = {r["did"]: r["fp"] for r in D.simhash_table(docs).collect()}
    assert fps[3] == -1
    assert fps[4] == -1


def test_simhash_near_dup_blocking_is_exhaustive(docs):
    """Chunk blocking (pigeonhole) must return EXACTLY the pairs a
    brute-force all-pairs Hamming scan returns."""
    fp = D.simhash_table(docs)
    a, b = fp.alias("a"), fp.alias("b")
    brute = {
        (r["i"], r["j"], r["h"])
        for r in a.join(b, F.col("a.did") < F.col("b.did"))
        .select(
            F.col("a.did").alias("i"),
            F.col("b.did").alias("j"),
            F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp"))).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    blocked = {
        (r["i"], r["j"], r["hamming"])
        for r in D.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    assert blocked == brute


def test_simhash_chunk_bounds_cover_64_bits():
    for mh in (1, 2, 3, 5, 7):
        bounds = D.simhash_chunk_bounds(mh)
        assert len(bounds) == mh + 1
        assert sum(w for _, w in bounds) == 64
        pos = 0
        for start, width in bounds:
            assert start == pos and width >= 1
            pos += width


def test_simhash_exact_dups_have_hamming_zero(docs):
    pairs = {
        (r["i"], r["j"]): r["hamming"]
        for r in D.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(0, 2)] == 0  # identical docs
    assert (3, 4) in pairs and pairs[(3, 4)] == 0  # empty & null both -1
