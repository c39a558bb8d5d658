"""BPE trainer/segmenter semantics and the exhaustion edge cases the
gate corpus never reaches: fully-merged one-symbol words (Spark's
sequence(1, 0) is DESCENDING and would index past the symbol array)
and training that dries up before n_merges (the oracle's scalar
subqueries would NULL the replace chain)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ahnlich_spark.operators.bpe import (
    pair_counts,
    segment_tokens,
    train_merges,
    word_vocab,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_fully_merged_word_contributes_no_pairs(spark):
    """A word collapsed to ONE symbol must drop out of pair counting
    instead of crashing the round (regression: element_at past the
    array on sequence(1, 0))."""
    vocab = word_vocab(_docs(spark, ["a a a a b"]))
    merges = train_merges(_docs(spark, ["a a a a b"]), n_merges=6).collect()
    # word 'a' merges to the single symbol 'a</w>' after round 1; later
    # rounds must still run (counting only 'b</w>' pairs) and training
    # stops when nothing is left to merge
    assert [
        (r["left_sym"], r["right_sym"]) for r in merges
    ][0] == ("a", "</w>")
    assert len(merges) <= 3  # a</w>, b</w>, and nothing else
    # and pair_counts itself is safe on an already-collapsed vocab
    collapsed = vocab.withColumn(
        "seq", F.regexp_replace("seq", "\x1fa\x1f\x1f</w>\x1f", "\x1fa</w>\x1f")
    )
    assert pair_counts(collapsed).count() >= 0  # no crash


def test_merge_is_exactly_greedy_left_to_right(spark):
    """'aaa' under merge (a, a) segments as [aa, a] — SQL replace's
    non-overlapping left-to-right semantics ARE greedy BPE."""
    segs = segment_tokens(_docs(spark, ["aaa"]), [("a", "a")]).collect()
    assert [r["sym"] for r in segs] == ["aa", "a", "</w>"]


def test_training_exhaustion_matches_oracle(spark, tmp_path):
    """When the vocabulary fully merges before n_merges rounds, the
    Spark trainer stops early and the segment oracle's replace chain
    must become a NO-OP for the missing rounds, not NULL — both gates'
    SQL replayed here on a corpus that dries up."""
    from ahnlich_spark.entry_queries import _bpe_segment_sql, _bpe_train_sql
    from ahnlich_spark.functions import text as X

    texts = ["aa aa", "aa aa aa"]
    docs = _docs(spark, texts).withColumn("lang", F.lit("xx"))
    d = str(tmp_path / "docs.parquet")
    docs.write.parquet(d)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")

    merges = train_merges(docs, n_merges=6)
    got_train = sorted(tuple(r) for r in merges.collect())
    want_train = sorted(map(tuple, con.sql(_bpe_train_sql(6)).fetchall()))
    assert got_train == want_train
    assert len(got_train) < 6  # training really dried up

    pairs = [(r[1], r[2]) for r in got_train]
    bpe = (
        segment_tokens(docs, pairs, id_col="lang")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("bpe_tokens_trained"))
    )
    ws = docs.groupBy("lang").agg(
        F.sum(X.token_count(F.col("text"))).cast("long").alias("ws_tokens")
    )
    got = sorted(
        tuple(r)
        for r in ws.join(bpe, "lang")
        .select("lang", "ws_tokens", "bpe_tokens_trained")
        .collect()
    )
    want = sorted(map(tuple, con.sql(_bpe_segment_sql(6)).fetchall()))
    assert got == want
    assert all(v is not None for row in want for v in row)


def test_driver_path_trains_thousand_merges_in_o1_jobs(spark, monkeypatch):
    """A realistic vocabulary trains 1100 merges WITHOUT one Spark job
    per round: below DRIVER_VOCAB_BOUND the loop runs driver-side on
    the collected vocab (pair_counts — the per-round job — must never
    be called), and the result is bit-identical to the pure-Python
    reference trainer."""
    import random

    from ahnlich_spark.operators import bpe
    from tests.test_properties import _py_bpe_train

    rng = random.Random(8)
    words = sorted({
        "".join(rng.choice("abcde") for _ in range(8)) for _ in range(400)
    })
    # skewed counts so argmax order is non-trivial
    texts = [" ".join([w] * (1 + (i % 3))) for i, w in enumerate(words)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    monkeypatch.setattr(
        bpe, "pair_counts",
        lambda *_: (_ for _ in ()).throw(
            AssertionError("per-round job path must not run below bound")
        ),
    )
    merges = bpe.train_merges(df, n_merges=1050).collect()
    assert len(merges) == 1050
    assert sorted(tuple(r) for r in merges) == sorted(
        _py_bpe_train(texts, 1050)
    )


def test_forced_per_round_path_matches_driver_path(spark):
    """driver_vocab_bound=0 forces the per-round job path; on the same
    corpus both paths emit identical merge tables (the gate corpus is
    exercised at scale by the entry gates — this pins the switch)."""
    from ahnlich_spark.operators.bpe import train_merges

    docs = _docs(spark, ["low lower lowest", "new newer newest", "low new"])
    a = sorted(tuple(r) for r in train_merges(docs, n_merges=7).collect())
    b = sorted(
        tuple(r)
        for r in train_merges(docs, n_merges=7, driver_vocab_bound=0)
        .collect()
    )
    assert a == b and len(a) == 7
