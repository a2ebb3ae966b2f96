"""SparkSessionExtensions integration: custom Catalyst rules for the engine.

The reference is a fixed-function binary with no optimizer to extend; on
Spark the extension surface is `spark.sql.extensions` (SURVEY.md §4.2
stretch). This package carries a real Java optimizer rule
(`java/pcsext/CollapseRedundantCase.java` — collapses idempotent
upper(upper(e)) / lower(lower(e)) chains that layered views produce around
dedup/join keys) plus the injector (`java/pcsext/EngineExtensions.java`),
compiled on demand against the pyspark distribution's own jars.

Usage (the extension must be on the driver classpath at JVM launch, so it
has to be configured on the FIRST SparkSession of the process):

    jar = build_extension_jar()
    spark = (SparkSession.builder
             .config("spark.driver.extraClassPath", jar)
             .config("spark.jars", jar)               # ship to executors
             .config("spark.sql.extensions", EXTENSION_CLASS)
             .getOrCreate())

`scripts/extensions_demo.py` runs the end-to-end proof (fresh process,
nested-case query, asserts the optimized plan lost the redundant
application while results are unchanged); `tests/test_extensions.py` gates
it in the suite via a subprocess.

At 100 TB the value of this path is not this one rule but the mechanism:
organization-wide rewrites (normalization collapsing, enforced broadcast
thresholds, blocking bad plans) ride every session via one config line
instead of per-query hints.
"""

from __future__ import annotations

import glob
import os
import subprocess

EXTENSION_CLASS = "pcsext.EngineExtensions"

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_JAVA_DIR = os.path.join(_PKG_DIR, "java")
_REPO_ROOT = os.path.dirname(os.path.dirname(_PKG_DIR))
_BUILD_DIR = os.path.join(_REPO_ROOT, "build", "ext")
JAR_PATH = os.path.join(_BUILD_DIR, "pcs-extensions.jar")


def _spark_jars_dir() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def javac_available() -> bool:
    from shutil import which

    return which("javac") is not None and which("jar") is not None


def build_extension_jar(force: bool = False) -> str:
    """Compile the Java sources into build/ext/pcs-extensions.jar (cached).

    Rebuilds only when a .java file is newer than the jar. Raises
    RuntimeError when no JDK is present (callers should gate on
    javac_available() and skip, per the no-new-dependencies rule).
    """
    sources = sorted(glob.glob(os.path.join(_JAVA_DIR, "pcsext", "*.java")))
    if not sources:
        raise RuntimeError(f"no Java sources under {_JAVA_DIR}")
    if not javac_available():
        raise RuntimeError("javac/jar not on PATH — cannot build the extension jar")
    if (
        not force
        and os.path.exists(JAR_PATH)
        and os.path.getmtime(JAR_PATH) >= max(os.path.getmtime(s) for s in sources)
    ):
        return JAR_PATH

    classes_dir = os.path.join(_BUILD_DIR, "classes")
    os.makedirs(classes_dir, exist_ok=True)
    cp = os.path.join(_spark_jars_dir(), "*")
    subprocess.run(
        ["javac", "-cp", cp, "-d", classes_dir, *sources],
        check=True,
        capture_output=True,
        text=True,
    )
    subprocess.run(
        ["jar", "cf", JAR_PATH, "-C", classes_dir, "."],
        check=True,
        capture_output=True,
        text=True,
    )
    return JAR_PATH
