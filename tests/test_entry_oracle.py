"""Mini-driver: run every queries() entry against its oracle_sql() via
DuckDB exactly like the round driver — row-count + schema (column names)
+ order-insensitive value hash. This IS the correctness gate rehearsal."""

import hashlib
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

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


def value_hash(pdf) -> str:
    """Order-insensitive deterministic hash: sort columns by name, sort
    rows, stringify, sha256."""
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(tuple(str(v) for v in row) for row in pdf.itertuples(index=False))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def normalize(pdf):
    """Make dtypes comparable across engines: ints stay ints."""
    import pandas as pd

    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]) or str(pdf[c].dtype).startswith("UInt"):
            pdf[c] = pdf[c].astype("int64")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: int(v) if isinstance(v, bool) else v)
    return pdf


QUERY_NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, con, name):
    fn = entry_mod.queries()[name]
    got = fn(spark, SF_DIR)
    got_pdf = normalize(got.toPandas())

    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        assert got_pdf.shape[0] >= 0  # rows-only check
        return

    want_pdf = normalize(con.sql(oracles[name]).df())
    assert sorted(got_pdf.columns) == sorted(want_pdf.columns), (
        f"{name}: column mismatch {sorted(got_pdf.columns)} vs {sorted(want_pdf.columns)}"
    )
    assert got_pdf.shape[0] == want_pdf.shape[0], (
        f"{name}: row count {got_pdf.shape[0]} != {want_pdf.shape[0]}"
    )
    gh, wh = value_hash(got_pdf), value_hash(want_pdf)
    if gh != wh:
        merged = got_pdf.merge(want_pdf, how="outer", indicator=True)
        diff = merged[merged["_merge"] != "both"].head(10)
        pytest.fail(f"{name}: value hash mismatch;\nsample diff:\n{diff}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns == ["vec_id", "rank_n", "score_e4"]
