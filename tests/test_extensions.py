"""SparkSessionExtensions demo gate: the Java Catalyst rule compiles, injects,
and rewrites plans without changing results.

Runs in a subprocess because spark.driver.extraClassPath /
spark.sql.extensions only apply to the first SparkSession of a JVM — the
suite's shared session can't be reused. Skips when no JDK is on PATH
(container guarantee today, but the no-new-dependency rule says gate it).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from parquet_to_clickhouse_schema_spark.extensions import javac_available

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not javac_available(), reason="javac/jar not on PATH")
def test_extension_rule_collapses_nested_case_normalization():
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "extensions_demo.py")],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=_REPO,
    )
    assert proc.returncode == 0, f"demo failed:\n{proc.stdout[-1000:]}\n{proc.stderr[-2000:]}"
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    # analyzed plan keeps the user's nested expression; the injected rule
    # collapses it before the physical plan; semantics are unchanged
    assert out["analyzed_upper"] == 2 and out["analyzed_lower"] == 2
    assert out["optimized_upper"] == 1 and out["optimized_lower"] == 1
    assert out["rows_equal"] is True
