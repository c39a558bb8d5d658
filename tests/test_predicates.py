"""Predicate truth table (FIXTURES.md F3; mirrors the reference's
engine/predicate.rs tests incl. the missing-key edge cases of
NotEquals/NotIn pinned to scan semantics, SURVEY.md §2.2)."""

import pytest

from ahnlich_spark.operators.predicates import And, Equals, In, NotEquals, NotIn, Or
from ahnlich_spark.types import MetadataValue

ROWS = [
    # (vector, meta) — row 3 has an EMPTY meta map (ref predicate.rs:527-530)
    ([1.0, 0.0, 0.0], {"name": "dickens", "country": "Nigeria", "state": "Lagos"}),
    ([0.0, 1.0, 0.0], {"name": "austen", "country": "England", "state": "London"},),
    ([0.0, 0.0, 1.0], {"name": "okri", "country": "Nigeria"}),
    ([0.5, 0.5, 0.0], {}),
]


@pytest.fixture
def store(engine):
    engine.create_store("authors", dimension=3, predicates=["country"])
    engine.set("authors", ROWS)
    return "authors"


def names_of(df):
    return sorted(r["meta"].get("name", ("", "∅", None))[1] if r["meta"] and "name" in r["meta"] else "∅"
                  for r in df.collect())


def test_equals(engine, store):
    got = engine.get_pred(store, Equals("country", "Nigeria"))
    assert names_of(got) == ["dickens", "okri"]


def test_equals_missing_key_no_match(engine, store):
    got = engine.get_pred(store, Equals("state", "Lagos"))
    assert names_of(got) == ["dickens"]


def test_not_equals_includes_missing_key(engine, store):
    got = engine.get_pred(store, NotEquals("country", "Nigeria"))
    # austen (England) + the empty-meta row
    assert names_of(got) == ["austen", "∅"]


def test_in(engine, store):
    got = engine.get_pred(store, In("state", ("Lagos", "London")))
    assert names_of(got) == ["austen", "dickens"]


def test_not_in_includes_missing_key(engine, store):
    got = engine.get_pred(store, NotIn("state", ("Lagos",)))
    # austen(London) + okri(state missing) + empty-meta row
    assert names_of(got) == ["austen", "okri", "∅"]


def test_and_is_intersection(engine, store):
    got = engine.get_pred(store, And(Equals("country", "Nigeria"), Equals("state", "Lagos")))
    assert names_of(got) == ["dickens"]


def test_or_is_union(engine, store):
    got = engine.get_pred(store, Or(Equals("state", "London"), Equals("name", "okri")))
    assert names_of(got) == ["austen", "okri"]


def test_nested(engine, store):
    cond = Or(
        And(Equals("country", "Nigeria"), NotEquals("state", "Lagos")),
        Equals("name", "austen"),
    )
    got = engine.get_pred(store, cond)
    assert names_of(got) == ["austen", "okri"]


def test_unknown_key_equals_empty(engine, store):
    assert engine.get_pred(store, Equals("nope", "x")).count() == 0


def test_unknown_key_not_equals_all(engine, store):
    assert engine.get_pred(store, NotEquals("nope", "x")).count() == len(ROWS)


def test_value_kind_distinguishes_string_from_image(engine):
    """RawString("x") != Image(b"x") (ref metadata.rs:10-17)."""
    engine.create_store("kinds", dimension=2)
    engine.set(
        "kinds",
        [
            ([1.0, 0.0], {"v": MetadataValue.raw_string("x")}),
            ([0.0, 1.0], {"v": MetadataValue.image(b"x")}),
        ],
    )
    got = engine.get_pred("kinds", Equals("v", MetadataValue.raw_string("x")))
    assert got.count() == 1
    got = engine.get_pred("kinds", Equals("v", MetadataValue.image(b"x")))
    assert got.count() == 1


def test_empty_in_matches_nothing(engine, store):
    from ahnlich_spark.operators.predicates import In

    assert engine.get_pred(store, In("label", ())).count() == 0


def test_empty_not_in_matches_everything(engine, store):
    from ahnlich_spark.operators.predicates import NotIn

    total = engine.get_store(store).len
    assert engine.get_pred(store, NotIn("label", ())).count() == total
