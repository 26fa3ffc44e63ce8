"""Standalone pytest plumbing for the bridge tests.

The two test scripts here are primarily driven by the Scala harness
(PythonBridgeSpec / PipelineBridgeSpec), which computes their argv —
driver classpath, fixture dumps, testdata dir — in-process. Under bare
``pytest python/tests`` those inputs are derived here instead:

- ``graft_classes``: the sbt-compiled classes dir (skip if not built);
- ``sf_dir``: the sf0.001 testdata (skip if absent);
- ``bridge_fixture_dir``: the golden fixture+expected parquet pair,
  produced by shelling out to ``graft.tools.BridgeFixture`` over the
  compiled classes + the Spark jars dir (skip if java/jars missing).

Everything skips gracefully when a piece of the environment is missing,
so the suite is collectable anywhere but only asserts where it can run.
"""

import os
import shutil
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_PYTHON_DIR = os.path.join(_REPO, "python")
_SPARK_JARS = os.environ.get("SPARK_JARS_DIR", "/opt/spark/jars")

# make `import graft_iforest` work without an install
if _PYTHON_DIR not in sys.path:
    sys.path.insert(0, _PYTHON_DIR)


def _skip_unless_pyspark():
    try:
        import pyspark  # noqa: F401
    except ImportError:
        pytest.skip("pyspark not importable")


@pytest.fixture(scope="session")
def graft_classes():
    _skip_unless_pyspark()
    classes = os.path.join(_REPO, "target", "scala-2.13", "classes")
    if not os.path.isdir(classes):
        pytest.skip("graft classes not built (run `sbt compile` first)")
    return classes


@pytest.fixture(scope="session")
def sf_dir():
    d = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(d):
        pytest.skip(f"testdata dir not found: {d}")
    return d


@pytest.fixture(scope="session")
def bridge_fixture_dir(graft_classes, tmp_path_factory):
    if shutil.which("java") is None:
        pytest.skip("java not on PATH")
    if not os.path.isdir(_SPARK_JARS):
        pytest.skip(f"Spark jars dir not found: {_SPARK_JARS}")
    # pytest's session tmp dir: retention-managed (old runs pruned
    # automatically), unlike a bare mkdtemp that accretes forever
    work = str(tmp_path_factory.mktemp("bridge-fixture"))
    cp = f"{graft_classes}:{_SPARK_JARS}/*"
    proc = subprocess.run(
        ["java", "--add-exports=java.base/sun.nio.ch=ALL-UNNAMED",
         "-cp", cp, "graft.tools.BridgeFixture", work],
        capture_output=True, text=True, timeout=600)
    if proc.returncode != 0 or "BRIDGE_FIXTURE ok" not in proc.stdout:
        pytest.skip("BridgeFixture dump failed:\n" + proc.stdout + proc.stderr)
    return work
