"""Guards for the r18 module split (operators/llm.py -> llm_dedup/llm_ann/
llm_cluster/llm_media/llm_eval; functions/text.py -> text_core/text_models).

The split was a mechanical move; these tests pin the two invariants that
keep it invisible to callers:

1. The facade modules re-export EVERY public name the split modules
   define (tests, scripts and downstream users import through the old
   paths), and the merged QUERIES/ORACLES views match the per-module
   registries exactly.
2. No query key is registered twice across the whole registry (a facade
   accidentally added to registry._MODULES would double-register all of
   its keys).

No Spark session needed — pure import/introspection.
"""

from __future__ import annotations

import pytest


def _public_names(mod):
    return {
        n
        for n in vars(mod)
        if not n.startswith("_")
        and n not in ("annotations",)
        and not getattr(getattr(mod, n), "__name__", "").startswith(
            "pyspark"
        )
    }


def test_llm_facade_reexports_every_split_name():
    from parquet_to_clickhouse_schema_spark.operators import (
        llm,
        llm_ann,
        llm_cluster,
        llm_dedup,
        llm_eval,
        llm_media,
    )

    parts = [llm_dedup, llm_ann, llm_cluster, llm_media, llm_eval]
    missing = {
        f"{p.__name__}.{n}"
        for p in parts
        for n in _public_names(p)
        if not hasattr(llm, n)
    }
    assert not missing, f"facade lost names: {sorted(missing)}"
    merged_q = {}
    merged_o = {}
    for p in parts:
        merged_q.update(p.QUERIES)
        merged_o.update(p.ORACLES)
    assert llm.QUERIES == merged_q
    assert llm.ORACLES == merged_o


def test_text_facade_reexports_every_split_name():
    from parquet_to_clickhouse_schema_spark.functions import (
        text,
        text_core,
        text_models,
    )

    parts = [text_core, text_models]
    missing = {
        f"{p.__name__}.{n}"
        for p in parts
        for n in _public_names(p)
        if not hasattr(text, n)
    }
    assert not missing, f"facade lost names: {sorted(missing)}"
    merged_q = {}
    merged_o = {}
    for p in parts:
        merged_q.update(p.QUERIES)
        merged_o.update(p.ORACLES)
    assert text.QUERIES == merged_q
    assert text.ORACLES == merged_o


def test_no_duplicate_key_registration():
    from parquet_to_clickhouse_schema_spark import registry

    seen: dict[str, str] = {}
    dupes = []
    for mod in registry._MODULES:
        for key in mod.QUERIES:
            if key in seen:
                dupes.append(f"{key} ({seen[key]} and {mod.__name__})")
            seen[key] = mod.__name__
    assert not dupes, f"duplicate registrations: {dupes}"
    assert len(registry.all_queries()) == len(seen)


def test_split_modules_not_shadowed_by_facade():
    """registry._MODULES must list the SPLIT modules, never the facades —
    a facade there would re-register every key under a second module and
    make the per-module provenance in the docs wrong."""
    from parquet_to_clickhouse_schema_spark import registry

    names = {m.__name__.rsplit(".", 1)[-1] for m in registry._MODULES}
    assert "llm" not in names
    assert "text" not in names
    for expected in (
        "llm_dedup",
        "llm_ann",
        "llm_cluster",
        "llm_media",
        "llm_eval",
        "text_core",
        "text_models",
    ):
        assert expected in names, f"{expected} missing from registry._MODULES"


def test_underscore_helpers_still_importable():
    """The underscore names tests/scripts import by exact path — the
    star-import skips them, so the facade re-exports them explicitly."""
    from parquet_to_clickhouse_schema_spark.operators.llm import (  # noqa: F401
        _IVF_GRID_SQL,
        _as_double_vec,
        _ascii96_payload,
        _loud_hash,
        _md5_unit_grid,
        _train_coarse_centroids,
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
