"""DuckDB-oracle differential tests — the sqllogictest-style corpus the
reference lacks (SURVEY.md §5 strategy #1).

Every registered query with an oracle runs on Spark AND DuckDB at
sf0.001 and must match exactly (row count, columns, order-insensitive
values, floats bit-for-bit) — the same discipline the driver applies
at sf0.01.
"""

from __future__ import annotations

import duckdb
import pytest

from piper_spark import registry
from scripts.check_oracle import compare, duck_connection
from tests.conftest import SF_SMOKE

QUERIES = registry.all_queries()
ORACLES = registry.all_oracles()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck: duckdb.DuckDBPyConnection, name: str) -> None:
    sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    ddf = duck.execute(ORACLES[name]).df()
    errs = compare(name, sdf, ddf)
    assert not errs, f"{name}: {errs}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name: str) -> None:
    """Engine-hash-based queries (no oracle) must still execute cleanly."""
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0
