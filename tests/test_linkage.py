"""Token-blocked fuzzy record linkage: correctness of the
block->verify->best-match pipeline and the hot-block cap recall trade."""

import pytest
from pyspark.sql import functions as F

from ahnlich_spark.operators.linkage import token_blocked_link


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


def test_hot_block_cap_drops_stopword_keys(spark):
    """A blocking key over the cap contributes no pairs; pairs sharing a
    rarer key survive."""
    clean = spark.createDataFrame(
        [(i, f"the item{i}") for i in range(50)], "id long, nm string"
    )
    dirty = spark.createDataFrame(
        [(100, "the item7x")], "id long, nm string"
    )
    # 'the' block holds 51 records -> dropped at cap 20; 'item7x' shares
    # no key with anything, so NOTHING links
    got = token_blocked_link(dirty, clean, max_distance=2, max_block_size=20)
    assert got.count() == 0
    # raise the cap: 'the' survives and the true match links
    got2 = token_blocked_link(dirty, clean, max_distance=2, max_block_size=200)
    assert [(r["clean_id"], r["distance"]) for r in got2.collect()] == [(7, 1)]


def test_single_shuffle_blocking_plan(spark):
    """The candidate build shuffles on the token key; the verify pass
    adds no corpus-sized exchange (pairs only)."""
    dirty, clean = _frames(spark)
    plan = token_blocked_link(dirty, clean, keep_all_matches=True)._jdf \
        .queryExecution().executedPlan().toString()
    assert "levenshtein" in plan.lower()
