import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
os.environ.setdefault("PYTHONPATH", REPO_ROOT)


@pytest.fixture(scope="session")
def spark():
    from tuatara_spark.session import get_spark
    s = get_spark("tuatara-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def weights():
    from tuatara_spark import weights as wt
    return wt.build_weights(42)
