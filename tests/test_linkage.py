"""Composite-blocked fuzzy record linkage: correctness of the
block->verify->best-match pipeline, losslessness of the (token,
length-bucket) composite keys versus naive token blocking, and the
dropped-block accounting that replaces the old silent recall cliff."""

import pytest
from pyspark.sql import functions as F

from ahnlich_spark.operators.linkage import (
    dropped_block_stats,
    token_blocked_link,
)


def _frames(spark):
    clean = spark.createDataFrame(
        [(1, "red widget"), (2, "blue bolt"), (3, "red wodget"),
         (4, "green gear"), (5, "tiny red widget")],
        "id long, nm string",
    )
    dirty = spark.createDataFrame(
        [(100, "red widgt"),    # 1 del from 'red widget' (d=1); 'red wodget' d=2
         (101, "blue blot"),    # transposition = 2 edits from 'blue bolt'
         (102, "purple cogs")], # shares no close name -> unmatched
        "id long, nm string",
    )
    return dirty, clean


def test_best_match_and_residual(spark):
    dirty, clean = _frames(spark)
    got = {r["dirty_id"]: (r["clean_id"], r["distance"])
           for r in token_blocked_link(dirty, clean, max_distance=2).collect()}
    assert got[100] == (1, 1)      # min distance wins over 'red wodget' (d=2)
    assert got[101] == (2, 2)
    assert 102 not in got          # no verified candidate -> residual, not a row


def test_keep_all_matches_and_tie_break(spark):
    dirty, clean = _frames(spark)
    rows = token_blocked_link(dirty, clean, max_distance=2,
                              keep_all_matches=True).collect()
    per_dirty = {}
    for r in rows:
        per_dirty.setdefault(r["dirty_id"], set()).add((r["clean_id"], r["distance"]))
    assert (3, 2) in per_dirty[100]  # the runner-up IS a verified candidate
    # tie-break: two clean rows at the same distance -> lowest id wins
    clean2 = spark.createDataFrame(
        [(7, "acme corp"), (9, "acme borp")], "id long, nm string"
    )
    dirty2 = spark.createDataFrame([(1, "acme cbrp")], "id long, nm string")
    best = token_blocked_link(dirty2, clean2, max_distance=2).collect()
    assert [(r["clean_id"], r["distance"]) for r in best] == [(7, 1)]


def _edit_fixture(spark, n=120):
    """High-cardinality vocabulary: every name is made of unique-ish
    tokens, dirty names get one deterministic char deletion."""
    firsts = ["alpha", "bravo", "carbon", "delta", "ember", "falcon",
              "gamma", "helix", "ion", "jade", "krypton", "lumen"]
    seconds = ["anchor", "beacon", "cipher", "dynamo", "echo", "flange",
               "girder", "hopper", "ingot", "jigsaw"]
    clean_rows = [(i, f"{firsts[i % 12]} {seconds[i % 10]} mk{i}")
                  for i in range(n)]
    dirty_rows = []
    for i, nm in clean_rows:
        if i % 2:
            continue
        pos = i % len(nm)
        dirty_rows.append((1000 + i, nm[:pos] + nm[pos + 1:]))
    clean = spark.createDataFrame(clean_rows, "id long, nm string")
    dirty = spark.createDataFrame(dirty_rows, "id long, nm string")
    return dirty, clean


def test_composite_keys_equal_naive_blocking(spark):
    """The (token, length-bucket) composite keys with 3-bucket probing
    are LOSSLESS versus plain token blocking: every verified pair of
    the naive plan appears in the composite plan and vice versa (the
    length bucket only removes pairs the levenshtein bound already
    excludes)."""
    dirty, clean = _edit_fixture(spark)
    kw = dict(max_distance=2, keep_all_matches=True, max_block_size=None)
    composite = {
        (r["dirty_id"], r["clean_id"], r["distance"])
        for r in token_blocked_link(dirty, clean,
                                    length_blocking=True, **kw).collect()
    }
    naive = {
        (r["dirty_id"], r["clean_id"], r["distance"])
        for r in token_blocked_link(dirty, clean,
                                    length_blocking=False, **kw).collect()
    }
    assert composite == naive
    assert len(composite) >= 60  # every dirty row finds its source


def test_composite_keys_cut_candidates_on_degenerate_vocab(spark):
    """On a low-cardinality vocabulary (every name shares the token
    'the'), naive token blocking proposes the full cross product while
    composite keys only join within +-1 length bucket."""
    from ahnlich_spark.operators.linkage import _name_key_tables

    clean = spark.createDataFrame(
        [("the " + "x" * (i % 30 + 1),) for i in range(60)], "nm string"
    ).distinct()
    dirty = spark.createDataFrame(
        [("the " + "y" * (i % 30 + 1),) for i in range(20)], "nm string"
    ).distinct()

    def n_candidates(length_blocking):
        d, c = _name_key_tables(dirty, clean, 2, length_blocking)
        return d.join(c, ["tok", "lb"]).select("d_id", "c_id").distinct().count()

    naive, composite = n_candidates(False), n_candidates(True)
    assert naive == 20 * 30          # 'the' alone: all distinct-name pairs
    assert composite < naive / 3     # length buckets restore selectivity


def test_hot_block_cap_and_dropped_accounting(spark):
    """Keys past max_block_size are dropped — but never silently:
    dropped_block_stats reports the dropped keys, their row counts,
    and the dirty records left with NO surviving key."""
    # degenerate vocab: one shared token, identical lengths -> one
    # composite key holding everything
    clean = spark.createDataFrame(
        [(i, f"the item{i:02d}") for i in range(50)], "id long, nm string"
    )
    dirty = spark.createDataFrame(
        [(100, "the item07x")], "id long, nm string"
    )
    # every name is 'the itemNN' (len 10) / dirty len 11: the 'the'
    # key holds 51 entries in the probed buckets -> dropped at cap 20,
    # and the itemNN tokens are each unique so nothing else links 107
    got = token_blocked_link(dirty, clean, max_distance=2, max_block_size=20)
    assert got.count() == 0
    stats = dropped_block_stats(dirty, clean, max_distance=2,
                                max_block_size=20).collect()[0]
    assert stats["n_dropped_keys"] >= 1
    assert stats["dropped_clean_names"] >= 50
    # 'the' was the dirty record's ONLY two-sided key ('item07x'
    # matches no clean token) and it was dropped -> fully blocked
    assert stats["fully_blocked_dirty"] == 1
    # raise the cap: the match comes back and the stats row is all-zero
    got2 = token_blocked_link(dirty, clean, max_distance=2, max_block_size=200)
    assert [(r["clean_id"], r["distance"]) for r in got2.collect()] == [(7, 1)]
    z = dropped_block_stats(dirty, clean, max_distance=2,
                            max_block_size=200).collect()[0]
    assert (z["n_dropped_keys"], z["fully_blocked_dirty"]) == (0, 0)


def test_fully_blocked_dirty_counts_cap_victims(spark):
    """A dirty record whose EVERY two-sided key is dropped is counted
    as fully blocked — the recall-cliff signal."""
    clean = spark.createDataFrame(
        [(i, f"acme {i:03d}") for i in range(40)], "id long, nm string"
    )
    # same length as clean names, shares only 'acme' -> its one
    # two-sided key is the hot one
    dirty = spark.createDataFrame([(100, "acme 0x7")], "id long, nm string")
    stats = dropped_block_stats(dirty, clean, max_distance=2,
                                max_block_size=10).collect()[0]
    assert stats["n_dropped_keys"] >= 1
    assert stats["fully_blocked_dirty"] == 1


def test_single_shuffle_blocking_plan(spark):
    """The candidate build shuffles on skinny key rows; names join
    back only for the levenshtein pass (ids-only distinct)."""
    dirty, clean = _frames(spark)
    df = token_blocked_link(dirty, clean, keep_all_matches=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "levenshtein" in plan.lower()
