"""Operator catalog: discoverability for the 300+ query surface.

A user switching from the reference (or onboarding onto this engine)
needs to answer "what can I run, and is it oracle-verified?" without
reading 19 modules. `describe_queries()` builds that table from the live
registry — key, implementing module, one-line description (the first
docstring sentence), and whether a DuckDB oracle twin gates it — and the
CLI prints it:

    python -m parquet_to_clickhouse_schema_spark.cli --list-queries
    python -m parquet_to_clickhouse_schema_spark.cli --list-queries dedup
"""

from __future__ import annotations

import re
import sys

from parquet_to_clickhouse_schema_spark import registry

# one {token} — no nested braces; `{{` never starts a match because the
# inner char class excludes braces, so format-style escapes pass through
_TOKEN = re.compile(r"\{([^{}]+)\}")


def _first_sentence(doc: str, module_name: str) -> str:
    """First sentence of the first docstring paragraph, with any
    ``{CONSTANT}`` placeholders resolved against the defining module's
    globals (many operator docstrings reference module constants like
    NOVELTY_N without being f-strings — the catalog must not print raw
    template tokens).

    Resolution is per-token, not whole-string str.format (ADVICE r11): a
    single expression placeholder like ``{CDC_MASK + 1}`` used to KeyError
    the format call and leave EVERY token in the string raw. Each token is
    now evaluated independently against the module's globals (the
    docstring is our own source, so this is the same trust level as the
    module code itself); tokens that don't resolve — math notation like
    ``y_{t-1}`` — are left verbatim."""
    first = doc.split("\n\n", 1)[0].replace("\n", " ")
    first = " ".join(first.split())
    if "{" in first:
        mod = sys.modules.get(module_name)
        if mod is not None:
            namespace = dict(vars(mod))

            def _sub(m: re.Match) -> str:
                expr, has_spec, spec = m.group(1).partition(":")
                try:
                    val = eval(expr, {"__builtins__": {}}, namespace)
                    return format(val, spec) if has_spec else str(val)
                except Exception:
                    return m.group(0)

            first = _TOKEN.sub(_sub, first)
            first = first.replace("{{", "{").replace("}}", "}")
    # sentence cut: the first ". " ends it ("e.g." style abbreviations are
    # not used at sentence heads in this codebase); keep em-dash clauses
    cut = first.find(". ")
    if cut != -1:
        first = first[: cut + 1]
    return first


def describe_queries(filter_substr: str | None = None) -> list[dict]:
    """One row per registered query key, sorted by key.

    Fields: key, module (short name), description (first docstring
    sentence, placeholder-resolved), oracle (True when a DuckDB twin
    hash-gates the key). `filter_substr` (case-insensitive) narrows on
    key or description.
    """
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    out: list[dict] = []
    for key in sorted(queries):
        fn = queries[key]
        first = _first_sentence((fn.__doc__ or "").strip(), fn.__module__)
        row = {
            "key": key,
            "module": fn.__module__.rsplit(".", 1)[-1],
            "description": first,
            "oracle": key in oracles,
        }
        if filter_substr:
            s = filter_substr.lower()
            if s not in key.lower() and s not in first.lower():
                continue
        out.append(row)
    return out


def format_catalog(rows: list[dict]) -> str:
    """Plain-text table for the CLI."""
    lines = []
    n_gated = sum(1 for r in rows if r["oracle"])
    lines.append(
        f"{len(rows)} queries ({n_gated} oracle-gated, "
        f"{len(rows) - n_gated} rows-only)"
    )
    for r in rows:
        mark = "oracle" if r["oracle"] else "rows  "
        desc = r["description"]
        if len(desc) > 100:
            desc = desc[:97] + "..."
        lines.append(f"{r['key']:32s} {mark}  [{r['module']}] {desc}")
    return "\n".join(lines) + "\n"
