"""Pending gates (entry_queries.PENDING_QUERIES) held to the SAME
oracle contract as registered gates — run against their DuckDB oracles
at sf0.001 exactly like tests/test_entry_oracle.py, so the round-12
registration (registry unfrozen after every existing gate has been
driver-graded) is a dict move, not new validation work."""

import os

import duckdb
import pytest

from ahnlich_spark import entry_queries as EQ
from tests.test_entry_oracle import normalize, value_hash

SF_DIR = os.environ.get("AHNLICH_ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_pending_gates_are_not_registered():
    """Frozen-registry invariant: a pending gate must not also be live
    (the driver window math depends on the registered count staying
    exactly 200 through round 11)."""
    assert not set(EQ.PENDING_QUERIES) & set(EQ.QUERIES)
    assert set(EQ.PENDING_ORACLES) == set(EQ.PENDING_QUERIES)


@pytest.mark.parametrize("name", sorted(EQ.PENDING_QUERIES))
def test_pending_gate_matches_oracle(spark, con, name):
    got_pdf = normalize(EQ.PENDING_QUERIES[name](spark, SF_DIR).toPandas())
    want_pdf = normalize(con.sql(EQ.PENDING_ORACLES[name]).df())
    assert sorted(got_pdf.columns) == sorted(want_pdf.columns)
    assert got_pdf.shape[0] == want_pdf.shape[0]
    assert value_hash(got_pdf) == value_hash(want_pdf)
