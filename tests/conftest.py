from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiger_etl_spark.session import get_spark  # noqa: E402

# test harness opts into tmpfs scratch (sandbox virtio disk is slow for
# shuffle small-file churn); the library itself defaults to Spark's dir
os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tiger_etl_spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
