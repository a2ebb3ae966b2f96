"""One-shot post-driver-round finalizer (VERDICT r10 task #3 automation).

Each round the driver drops `BENCH_r{N}.json` / `CORRECTNESS_r{N}.json` at
the repo root; six rounds in a row the judge flagged that these sat
untracked and that `docs/SWEEP_LEDGER.md` lagged one round behind.  This
script ends the recurrence: it stages the newest driver artifacts,
regenerates the sweep ledger and the plan inventory from them, and (with
`--commit`) commits everything in one evidence commit.

Usage:
    python scripts/finalize_round.py            # stage + regen, no commit
    python scripts/finalize_round.py --commit   # also git-commit the result
    python scripts/finalize_round.py --no-plans # skip the (slow) plan audit

The plan audit spins up a local SparkSession and explains all registered
queries (~2 min on local[32]); pass --no-plans when only the ledger needs a
refresh.
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def newest_round() -> int:
    rounds = []
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.name)
        if m:
            rounds.append(int(m.group(1)))
    if not rounds:
        raise SystemExit("no CORRECTNESS_r*.json found at repo root")
    return max(rounds)


def run(cmd: list[str]) -> None:
    print("+", " ".join(cmd))
    subprocess.run(cmd, cwd=REPO, check=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", action="store_true", help="git-commit the result")
    ap.add_argument(
        "--no-plans",
        action="store_true",
        help="skip the SparkSession-backed plan audit (ledger only)",
    )
    args = ap.parse_args()

    n = newest_round()
    artifacts = [
        p.name
        for p in (REPO / f"BENCH_r{n:02d}.json", REPO / f"CORRECTNESS_r{n:02d}.json")
        if p.exists()
    ]
    print(f"latest driver round: r{n:02d}; artifacts: {artifacts}")

    run([sys.executable, "scripts/sweep_ledger.py"])
    if not args.no_plans:
        run([sys.executable, "scripts/plan_audit.py", "--report"])

    to_add = artifacts + ["docs/SWEEP_LEDGER.md"]
    if not args.no_plans:
        to_add.append("docs/PLANS.md")
    run(["git", "add", *to_add])

    if args.commit:
        run(
            [
                "git",
                "commit",
                "-m",
                f"Track r{n:02d} driver artifacts and regenerate evidence ledgers",
            ]
        )
    else:
        print("staged; run with --commit to commit")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
