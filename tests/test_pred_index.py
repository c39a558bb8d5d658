"""CreatePredIndex physical effect: indexed keys materialize flat
_pred_<key> columns that PUSH DOWN to the parquet scan (map access gets
no pushdown); unindexed keys stay full-scan. Answers never change —
the predicate truth table runs identically either way (reference
backfill semantics: predicate.rs:142-178)."""

import contextlib
import io

import pytest

from ahnlich_spark.operators.predicates import And, Equals, In, NotEquals, Or

ROWS = [
    ([1.0, 0.0, 0.0], {"country": "Nigeria", "state": "Lagos"}),
    ([0.0, 1.0, 0.0], {"country": "England", "state": "London"}),
    ([0.0, 0.0, 1.0], {"country": "Nigeria"}),
    ([0.5, 0.5, 0.0], {}),
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed(plan: str) -> str:
    return plan.split("PushedFilters")[1].split("\n")[0] if "PushedFilters" in plan else ""


@pytest.fixture
def indexed(engine):
    engine.create_store("pidx", dimension=3, predicates=["country"])
    engine.set("pidx", ROWS)
    return engine


def test_indexed_equals_pushes_to_scan(indexed):
    plan = plan_of(indexed.get_pred("pidx", Equals("country", "Nigeria")))
    assert "_pred_country" in pushed(plan), plan


def test_unindexed_key_is_full_scan(indexed):
    plan = plan_of(indexed.get_pred("pidx", Equals("state", "Lagos")))
    assert "_pred_" not in pushed(plan)


def test_answers_identical_with_and_without_index(engine):
    engine.create_store("noidx", dimension=3)
    engine.set("noidx", ROWS)
    engine.create_store("yesidx", dimension=3, predicates=["country", "state"])
    engine.set("yesidx", ROWS)
    cases = [
        Equals("country", "Nigeria"),
        NotEquals("country", "Nigeria"),  # missing key must MATCH
        In("state", ("Lagos", "London")),
        And(Equals("country", "Nigeria"), NotEquals("state", "Lagos")),
        Or(Equals("state", "London"), Equals("country", "Nigeria")),
    ]
    for cond in cases:
        a = sorted(tuple(r["key"]) for r in engine.get_pred("noidx", cond).collect())
        b = sorted(tuple(r["key"]) for r in engine.get_pred("yesidx", cond).collect())
        assert a == b, cond


def test_create_pred_index_backfills_existing_store(engine):
    engine.create_store("late", dimension=3)
    engine.set("late", ROWS)
    meta = engine.catalog.get_store("late")
    raw = engine.spark.read.parquet(engine.catalog.store_path(meta))
    assert "_pred_country" not in raw.columns
    assert engine.create_pred_index("late", ["country"]) == 1
    meta = engine.catalog.get_store("late")
    raw = engine.spark.read.parquet(engine.catalog.store_path(meta))
    assert "_pred_country" in raw.columns
    plan = plan_of(engine.get_pred("late", Equals("country", "Nigeria")))
    assert "_pred_country" in pushed(plan)


def test_get_pred_output_hides_internal_columns(indexed):
    rows = indexed.get_pred("pidx", Equals("country", "Nigeria"))
    assert not [c for c in rows.columns if c.startswith(("_pred_", "_ann_"))]


def test_or_with_unindexed_arm_gets_no_partial_hint(indexed):
    """Or(indexed, unindexed) must NOT push the indexed arm alone —
    that would wrongly prune rows matching only the unindexed arm."""
    cond = Or(Equals("country", "Nigeria"), Equals("state", "London"))
    plan = plan_of(indexed.get_pred("pidx", cond))
    assert "_pred_country" not in pushed(plan)
    got = {r["meta"]["state"]["s"] for r in indexed.get_pred("pidx", cond).collect()
           if "state" in r["meta"]}
    assert "London" in got
