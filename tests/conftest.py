"""Shared pytest fixtures: one session-scoped local SparkSession and the
deterministic synthetic `pages`/`series` fixtures from FIXTURES.md."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from diive_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master="local[4]",
        app_name="diive-spark-tests",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.ansi.enabled": "false"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
