"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`diive_spark.queries`. The driver's verify runs
``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from diive_spark import queries as _q  # noqa: E402
from diive_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: min-count-gated 30-min rollup (the reference's
    ``resample_series_to_30MIN``) over the events series at sf0.001."""
    tune_session(spark)
    return _q.q_resample_30min_gated(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in _q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLE_SQL)
