from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lens_warehouse_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMOKE)


# Deep-sweep profile: `HYPOTHESIS_PROFILE=deep pytest tests/ -k fuzz`
# runs every @given suite at 20x examples (the round-5/7 adversarial
# sweeps used ad-hoc copies of the tests; a named profile makes the
# sweep repeatable and keeps CI fast by default).
try:
    from hypothesis import settings as _hs

    _hs.register_profile("deep", max_examples=5000, deadline=None)
    if os.environ.get("HYPOTHESIS_PROFILE") == "deep":
        _hs.load_profile("deep")
except Exception:  # pragma: no cover - hypothesis always present in CI
    pass
