"""Driver-contract guards: properties every registry entry must hold."""

import decimal
import re

from parquet_to_clickhouse_schema_spark import registry
from scripts.check_oracle import _type_problems


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


def test_contract_keys_register_first():
    """The driver sweeps queries() in dict order under a budget (the r1
    sweep stopped after 50 entries); SURVEY §2.2 contract keys must come
    before the beyond-contract extras."""
    keys = list(registry.all_queries())
    n = len(registry.CONTRACT_KEYS)
    assert tuple(keys[:n]) == registry.CONTRACT_KEYS


def test_type_drift_detector_catches_r1_bug_classes():
    """check_oracle._type_problems must flag exactly the drift classes the
    driver's type-sensitive value-hash fails on (r1: q_grouping_sets
    decimal vs double, q_agg_collect ndarray crash)."""
    assert _type_problems(
        [(decimal.Decimal("506627.000000"),)], ["sum_qty"], [(506627.0,)], ["sum_qty"]
    )
    assert _type_problems([(["A", "B"],)], ["statuses"], [("A,B",)], ["statuses"])
    assert _type_problems([(5,)], ["n"], [(5.0,)], ["n"])
    assert not _type_problems([(5.0, "x")], ["a", "b"], [(5.0, "x")], ["a", "b"])
