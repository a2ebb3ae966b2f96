"""Driver-contract guards: properties every registry entry must hold."""

import decimal
import re

from pyspark.sql import types as T

from parquet_to_clickhouse_schema_spark import registry
from scripts.check_oracle import _type_problems

from tests.conftest import SF_SMOKE


def test_no_registered_query_emits_collection_columns(spark):
    """The driver's pandas row canonicalizer crashes on unhashable cells
    (numpy.ndarray from ArrayType, dict from MapType) — r1's q_agg_collect
    and r2's q_map_funcs both failed exactly this way, and the check must
    cover EVERY registered key, gated or rows-only. Struct is banned too:
    keep driver-facing outputs scalar, serialize with concat_ws/to_json."""
    banned = (T.ArrayType, T.MapType, T.StructType)
    offenders = []
    for name, fn in registry.all_queries().items():
        schema = fn(spark, SF_SMOKE).schema
        for f in schema.fields:
            if isinstance(f.dataType, banned):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, offenders


def test_oracle_sql_never_references_file_paths():
    """The driver's DuckDB session only has the 10 registered views — an
    oracle that reads files or uses placeholders would pass locally and
    fail in the driver.

    Exemption: the footer-metadata family — q_parquet_meta (r9 verdict
    #4: promoted via DuckDB's parquet_file_metadata()/parquet_schema()
    over the gate-SF files) and q_column_sizes (r18: per-column storage
    audit via parquet_metadata() over the same footers). Footer
    physiology is something no registered view exposes, so these alone
    may name the files (pinned to the driver's sf0.01 gate dir; a
    failure there shows as one err row, not a silent pass)."""
    _FOOTER_ORACLES = {"q_parquet_meta", "q_column_sizes"}
    for name, sql in registry.all_oracles().items():
        assert "read_parquet" not in sql, name
        if name not in _FOOTER_ORACLES:
            assert "/root/" not in sql, name
        # an unexpanded f-string placeholder opens with an identifier char
        # ({SAMPLE_QUOTA}, {W - 1}); regex quantifiers like {2,} are legal SQL
        assert not re.search(r"\{\s*[A-Za-z_]", sql), f"{name}: unexpanded placeholder"


def test_oracles_are_subset_of_queries():
    qs = set(registry.all_queries())
    os_ = set(registry.all_oracles())
    assert os_ <= qs
    assert len(qs) >= 79


def test_rows_only_twin_mapping_is_complete_and_gated():
    """r17 (VERDICT r16 task #6): the rows-only ↔ verified-twin convention
    is machine-readable in catalog.ROWS_ONLY_TWINS, not prose. EVERY
    rows-only key (registered query with no oracle) must name either an
    oracle-gated mechanism twin or a golden:<path> artifact test, the
    named twin must itself be oracle-gated, the golden path must exist,
    and no oracle-gated key may appear in the mapping (it needs no twin)."""
    import os

    from parquet_to_clickhouse_schema_spark.catalog import ROWS_ONLY_TWINS

    qs = set(registry.all_queries())
    gated = set(registry.all_oracles())
    rows_only = qs - gated
    assert rows_only == set(ROWS_ONLY_TWINS), (
        rows_only ^ set(ROWS_ONLY_TWINS)
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for key, twin in ROWS_ONLY_TWINS.items():
        if twin.startswith("golden:"):
            assert os.path.exists(os.path.join(repo, twin[7:])), (key, twin)
        else:
            assert twin in gated, (key, twin)


def test_no_builtin_round_in_gated_oracles():
    """Gated float outputs must use the floor-quantize (qround/sql_qround);
    a bare round( in oracle SQL reintroduces the cross-engine divergence."""
    for name, sql in registry.all_oracles().items():
        assert not re.search(r"(?<![a-z_])round\s*\(", sql), name


def test_sweep_priority_then_contract_keys_register_first():
    """The driver sweeps queries() in dict order under a ~50-key budget.
    Round 3 leads with the keys that lack a green CORRECTNESS row (broken,
    changed this round, or never swept), then the remaining contract keys,
    then the twice-verified extras — so after this round every registered
    key has at least one green row across rounds."""
    keys = list(registry.all_queries())
    n_prio = len(registry.SWEEP_PRIORITY)
    assert tuple(keys[:n_prio]) == registry.SWEEP_PRIORITY
    head = set(keys[: n_prio + len(registry.CONTRACT_KEYS)])
    # every contract key still registers inside the priority+contract head
    assert set(registry.CONTRACT_KEYS) <= head | set(registry.SWEEP_PRIORITY)
    # the first 50 (driver budget) are exactly priority keys + contract keys
    for k in keys[:50]:
        assert k in registry.SWEEP_PRIORITY or k in registry.CONTRACT_KEYS, k


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
    # drift appearing only in LATER rows must be caught (ADVICE r2: the
    # first-non-null sample let mid-result int-vs-float drift escape)
    assert _type_problems([(5.0,), (6,)], ["n"], [(5.0,), (6.0,)], ["n"])
    assert _type_problems(
        [(None,), (decimal.Decimal("1"),)], ["n"], [(None,), (1.0,)], ["n"]
    )


def test_registered_function_names_match_their_keys():
    """Regression guard: a helper def accidentally placed between a @_q
    decorator and its query function gets REGISTERED under the query's
    key (bit q_bpe_pairs in r7 — the decorator bound _word_freqs). Every
    registered callable must be named exactly like its key."""
    from parquet_to_clickhouse_schema_spark import registry

    mismatched = {
        key: fn.__name__
        for key, fn in registry.all_queries().items()
        if fn.__name__ != key
    }
    assert not mismatched, mismatched
