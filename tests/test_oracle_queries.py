"""Every registry query vs its DuckDB oracle at sf0.01 — the local
replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from textcleaning_spark import queries as Q
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_connect


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_ORACLE)
    yield c
    c.close()


_ORACLE = Q.oracle_sql()
_ALL = Q.queries()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_query_matches_oracle(spark, con, name):
    df = _ALL[name](spark, SF_ORACLE)
    compare(df, con, _ORACLE[name], name)


@pytest.mark.parametrize("name", sorted(set(_ALL) - set(_ORACLE)))
def test_nonoracle_query_runs(spark, name):
    df = _ALL[name](spark, SF_ORACLE)
    assert df.count() >= 0
