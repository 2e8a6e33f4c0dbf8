import os
import sys

import pytest

_TESTS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_TESTS)
sys.path.insert(0, _REPO)
# executor Python workers are separate processes: they need the repo AND the
# tests dir on PYTHONPATH to unpickle test-defined classes (must be set
# before the SparkSession/JVM starts)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO, _TESTS, os.environ.get("PYTHONPATH")) if p
)

from simple_stream_processor_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cpus="4")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
