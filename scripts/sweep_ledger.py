"""Generate the sweep-verification ledger: key -> last driver round.

Reads every CORRECTNESS_r*.json at the repo root and unions them into a
per-key "latest driver row" table, written to docs/SWEEP_LEDGER.md.  Also
prints machine-readable groupings (never-swept / stale / current) so the
SWEEP_PRIORITY rotation in registry.py can be rebuilt from evidence instead
of hand-copied lists (VERDICT r8 task #8).

Usage:  python scripts/sweep_ledger.py [--stale-before N]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def load_rounds() -> dict[int, dict]:
    rounds: dict[int, dict] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        rounds[int(m.group(1))] = json.loads(p.read_text())
    return rounds


def build_ledger(rounds: dict[int, dict]) -> dict[str, dict]:
    """key -> {round, row} for the LATEST round that swept the key."""
    ledger: dict[str, dict] = {}
    for rnd in sorted(rounds):
        for key, row in rounds[rnd].items():
            ledger[key] = {"round": rnd, "row": row}
    return ledger


def row_status(row: dict) -> str:
    if row.get("err") == "no_oracle":
        # By-design rows-only keys (approximate sketches, iterative float
        # fixpoints, string artifacts) have no oracle_sql entry; the driver
        # records err="no_oracle" with spark_rows set iff the query ran.
        return (
            "rows-only (by design)"
            if row.get("spark_rows") is not None
            else "FAIL"
        )
    if row.get("err"):
        return "ERROR"
    if row.get("hash_match"):
        return "pass"
    if row.get("rows_match") and not row.get("schema_match", True):
        return "rows-only(schema)"
    if row.get("rows_match"):
        return "rows-only"
    return "FAIL"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--stale-before",
        type=int,
        default=3,
        help="rounds swept before this are reported as stale",
    )
    args = ap.parse_args()

    from parquet_to_clickhouse_schema_spark import registry

    all_keys = sorted(registry.all_queries())
    oracles = registry.all_oracles()
    rounds = load_rounds()
    ledger = build_ledger(rounds)
    latest = max(rounds) if rounds else 0

    never = [k for k in all_keys if k not in ledger]
    stale = [
        k for k in all_keys if k in ledger and ledger[k]["round"] < args.stale_before
    ]
    current = [
        k for k in all_keys if k in ledger and ledger[k]["round"] >= args.stale_before
    ]

    lines = [
        "# Sweep ledger",
        "",
        f"Latest driver round: r{latest:02d}.  {len(all_keys)} registered keys: "
        f"{len(current)} with a row from r{args.stale_before}+, "
        f"{len(stale)} stale (last swept before r{args.stale_before}), "
        f"{len(never)} never swept.",
        "",
        "Regenerate with `python scripts/sweep_ledger.py` after each driver round.",
        "",
        "| key | oracle | last sweep | status |",
        "|---|---|---|---|",
    ]
    for k in all_keys:
        has_oracle = "sql" if k in oracles else "rows-only"
        if k in ledger:
            rnd = f"r{ledger[k]['round']:02d}"
            st = row_status(ledger[k]["row"])
        else:
            rnd, st = "—", "never swept"
        lines.append(f"| {k} | {has_oracle} | {rnd} | {st} |")
    out = REPO / "docs" / "SWEEP_LEDGER.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")

    def fmt(keys: list[str]) -> str:
        return "\n".join(
            f"    \"{k}\","
            + ("" if k in oracles else "  # rows-only")
            for k in keys
        )

    never_oracle = [k for k in never if k in oracles]
    never_rows_only = [k for k in never if k not in oracles]
    print(f"\n# never swept, oracle-gated ({len(never_oracle)}):")
    print(fmt(never_oracle))
    print(f"\n# never swept, rows-only ({len(never_rows_only)}):")
    print(fmt(never_rows_only))
    print(f"\n# stale before r{args.stale_before:02d} ({len(stale)}):")
    print(fmt(sorted(stale, key=lambda k: ledger[k]["round"])))
    return 0


if __name__ == "__main__":
    sys.exit(main())
