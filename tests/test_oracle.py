"""Oracle-differential tests: every gated query vs its DuckDB twin.

Runs at sf0.001 for speed (the driver gate runs sf0.01; run
`python scripts/check_oracle.py` for that). Comparison is the same
as the driver's: row count + column names + order-insensitive values —
here EXACT on floats, because qround (functions/compat.py) guarantees
bit-identical doubles across engines.
"""

import duckdb
import pytest

from parquet_to_clickhouse_schema_spark import registry
from parquet_to_clickhouse_schema_spark.sources.io import TABLES
from scripts.check_oracle import _rows_to_multiset

from tests.conftest import SF_SMOKE

QUERIES = registry.all_queries()
ORACLES = registry.all_oracles()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMOKE)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    # q_parquet_meta's oracle names the driver's gate-SF files literally
    # (the only SF the driver runs oracles at); this suite sweeps the
    # smoke SF, so point the oracle at the same files the Spark side got
    # — the identical substitution scripts/check_oracle.py applies.
    res = duck.execute(ORACLES[name].replace("/root/testdata/sf0.01", SF_SMOKE))
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _rows_to_multiset(s_rows, s_cols) == _rows_to_multiset(d_rows, d_cols)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(name, spark):
    df = QUERIES[name](spark, SF_SMOKE)
    assert len(df.columns) > 0
    assert df.count() >= 0
