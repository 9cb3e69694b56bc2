from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from legislative_bills_database_spark.session import get_spark

    spark = get_spark(app_name="lbd-tests", cpus=4, shuffle_partitions=8)
    yield spark
    spark.stop()
