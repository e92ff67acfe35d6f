"""The correctness gate, locally: every oracle-paired query in
__spark_entry__ must match DuckDB exactly at sf0.01 (the driver's SF)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_con

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf01):
    c = duck_con(sf01)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf01, con):
    sdf = QUERIES[name](spark, sf01)
    odf = con.execute(ORACLES[name]).fetchdf()
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf01):
    df = QUERIES[name](spark, sf01)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
