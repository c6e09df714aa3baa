"""Shared Spark fixtures. One session per test run (session scope) — JVM
startup dominates otherwise. local[4] keeps unit tests snappy; scale tests
and the bench harness pick their own parallelism explicitly."""

from __future__ import annotations

import pytest

from job_crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("jcs-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
