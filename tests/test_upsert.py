"""Upsert matrix (FIXTURES.md F4; mirrors reference db/src/tests/
upsert.rs:16-562): single-match guard, key-only / value-only / both,
merge_metadata per-key overwrite, error cases."""

import pytest

from ahnlich_spark import errors
from ahnlich_spark.operators.predicates import Equals


@pytest.fixture
def store(engine):
    engine.create_store("u", dimension=3)
    engine.set(
        "u",
        [
            ([1.0, 0.0, 0.0], {"id": "a", "x": "1"}),
            ([0.0, 1.0, 0.0], {"id": "b", "x": "2"}),
        ],
    )
    return "u"


def row_by(engine, store, key, val):
    rows = engine.get_pred(store, Equals(key, val)).collect()
    assert len(rows) == 1
    return rows[0]


def test_value_only_replaces_metadata(engine, store):
    r = engine.upsert(store, Equals("id", "a"), new_value={"id": "a", "y": "9"})
    assert (r.inserted, r.updated) == (0, 1)
    row = row_by(engine, store, "id", "a")
    assert set(row["meta"].keys()) == {"id", "y"}  # x gone (replace, not merge)
    assert list(row["key"]) == [1.0, 0.0, 0.0]


def test_merge_metadata_new_wins_per_key(engine, store):
    engine.upsert(store, Equals("id", "a"), new_value={"x": "new", "z": "3"}, merge_metadata=True)
    row = row_by(engine, store, "x", "new")
    m = {k: v[1] for k, v in row["meta"].items()}
    assert m == {"id": "a", "x": "new", "z": "3"}


def test_key_only_rehashes_and_old_key_disappears(engine, store):
    engine.upsert(store, Equals("id", "a"), new_key=[9.0, 9.0, 9.0])
    assert engine.get_key(store, [[1.0, 0.0, 0.0]]).count() == 0
    got = engine.get_key(store, [[9.0, 9.0, 9.0]]).collect()
    assert len(got) == 1 and got[0]["meta"]["id"][1] == "a"
    assert engine.get_store(store).len == 2


def test_both_key_and_value(engine, store):
    engine.upsert(store, Equals("id", "b"), new_key=[5.0, 5.0, 5.0], new_value={"id": "b2"})
    row = row_by(engine, store, "id", "b2")
    assert list(row["key"]) == [5.0, 5.0, 5.0]


def test_zero_matches_errors(engine, store):
    with pytest.raises(errors.UpsertMatchError):
        engine.upsert(store, Equals("id", "nope"), new_value={"a": "1"})


def test_multi_match_errors(engine, store):
    engine.set(store, [([0.0, 0.0, 1.0], {"id": "a"})])  # second id=a row
    with pytest.raises(errors.UpsertMatchError):
        engine.upsert(store, Equals("id", "a"), new_value={"a": "1"})


def test_neither_key_nor_value_errors(engine, store):
    with pytest.raises(ValueError):
        engine.upsert(store, Equals("id", "a"))


def test_new_key_colliding_with_existing_row_overwrites(engine, store):
    """Moving a row onto another row's vector upserts by id (the vector
    is the primary key)."""
    engine.upsert(store, Equals("id", "a"), new_key=[0.0, 1.0, 0.0])
    assert engine.get_store(store).len == 1
    row = engine.get_key(store, [[0.0, 1.0, 0.0]]).collect()[0]
    assert row["meta"]["id"][1] == "a"
