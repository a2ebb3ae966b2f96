"""Driver-contract guards: properties every registry entry must hold."""

import re

from parquet_to_clickhouse_schema_spark import registry


def test_oracle_sql_never_references_file_paths():
    """The driver's DuckDB session only has the 10 registered views — an
    oracle that reads files or uses placeholders would pass locally and
    fail in the driver."""
    for name, sql in registry.all_oracles().items():
        assert "read_parquet" not in sql, name
        assert "/root/" not in sql, name
        assert "{" not in sql and "}" not in sql, f"{name}: unexpanded placeholder"


def test_oracles_are_subset_of_queries():
    qs = set(registry.all_queries())
    os_ = set(registry.all_oracles())
    assert os_ <= qs
    assert len(qs) >= 79


def test_no_builtin_round_in_gated_oracles():
    """Gated float outputs must use the floor-quantize (qround/sql_qround);
    a bare round( in oracle SQL reintroduces the cross-engine divergence."""
    for name, sql in registry.all_oracles().items():
        assert not re.search(r"(?<![a-z_])round\s*\(", sql), name
