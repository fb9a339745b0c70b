"""Shared Spark fixture. One session-scoped local[8] session keeps the whole
suite inside a single JVM; shuffle partitions kept small so tiny tests don't
pay 200-task overheads."""

from __future__ import annotations

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from omnition_opentelemetry_service_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", parallelism=8, shuffle_partitions=8)
    yield s
    s.stop()
